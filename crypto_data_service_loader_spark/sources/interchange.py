"""Columnar interchange: convert a corpus between the on-disk formats a
pipeline meets in the wild (parquet ↔ ORC ↔ JSONL) without losing schema
or partitioning intent.

Why a first-class op: at 100 TB "reformat the corpus" is a real job (ORC
for a Hive-side consumer, parquet for everything else, JSONL for sequence
loaders), and doing it naively loses the properties that make the output
usable — file sizing, sort order within files, and the schema contract.
`convert_corpus` keeps it one distributed pass: scan → (optional
repartition to target file count) → write, with zero driver-side data
movement. Formats are Spark-native readers/writers (predicate pushdown
and column pruning work on BOTH parquet and ORC scans — Catalyst treats
them as v2 file sources with identical pushdown surfaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: formats with full round-trip fidelity for the corpus schemas we ship;
#: json is text-based (timestamps/binary degrade to strings) and is
#: handled by sources/jsonl.py's validated reader instead
_FORMATS = {"parquet", "orc"}


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    n_files: int | None = None,
    sort_within_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write `df` as parquet or ORC. `n_files` bounds output file count
    (a repartition — use it to fix the small-files problem when the
    upstream plan ends narrow); `sort_within_by` sorts WITHIN each file
    (sortWithinPartitions — no extra exchange) so downstream range scans
    and min/max page skipping actually bite. `partition_by` writes a
    hive-partitioned layout; with `n_files` the repartition is keyed on
    the partition columns so each output directory gets whole files
    rather than one sliver per task."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    out = df
    if n_files is not None:
        if partition_by:
            from pyspark.sql import functions as F

            out = out.repartition(
                int(n_files), *[F.col(c) for c in partition_by]
            )
        else:
            out = out.repartition(int(n_files))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    w = out.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    return spark.read.format(fmt).load(path)


def convert_corpus(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    src_fmt: str = "parquet",
    dst_fmt: str = "orc",
    n_files: int | None = None,
    sort_within_by: list[str] | None = None,
) -> int:
    """One-pass format conversion; returns the row count (ridden on the
    write via the scan, not a second pass — count() here is served by
    metadata on both columnar formats)."""
    df = read_columnar(spark, src_path, src_fmt)
    write_columnar(df, dst_path, dst_fmt, n_files, sort_within_by)
    # columnar count() is a metadata/footer read, not a data re-scan
    return read_columnar(spark, dst_path, dst_fmt).count()


def morton_key(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into
    one sort key — the multi-dimensional file-layout trick (Delta/Iceberg
    Z-ORDER, public technique): sorting by the interleaved key keeps rows
    close in BOTH dimensions close on disk, so min/max page skipping
    prunes on either filter column, where a lexicographic (a, b) sort
    only ever prunes on `a`.

    Pure integer bit arithmetic (shift/and/or composed per bit — one
    codegen expression, no UDF). `bits` per dimension, max 31; values are
    masked into [0, 2^bits) — pre-bucket wider domains (e.g.
    `pmod(hash, 2^bits)`).
    """
    from pyspark.sql import functions as F

    if not 0 < bits <= 31:
        raise ValueError("bits must be in (0, 31]")
    mask = (1 << bits) - 1
    a = col_a.cast("long").bitwiseAND(F.lit(mask))
    b = col_b.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    fmt: str = "parquet",
    n_files: int | None = None,
    bits: int = 16,
) -> None:
    """Write with Z-order clustering on (col_a, col_b): range-partition
    by the Morton key (globally clustered files) and sort within each
    file — filters on EITHER column then prune via column min/max
    statistics. The key is layout-only (dropped from the output)."""
    from pyspark.sql import functions as F

    keyed = df.withColumn(
        "_zkey", morton_key(F.col(col_a), F.col(col_b), bits)
    )
    if n_files is not None:
        keyed = keyed.repartitionByRange(int(n_files), F.col("_zkey"))
    out = keyed.sortWithinPartitions("_zkey").drop("_zkey")
    out.write.mode("overwrite").format(fmt).save(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
    sort_within_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """The small-files fix, self-tuned: measure the directory's actual
    data bytes, derive n_files = ceil(bytes / target), and rewrite —
    the OPTIMIZE/maintenance compaction a streaming sink needs after
    thousands of tiny micro-batch files have accumulated (each file
    costs a listing entry, a footer read, and a scheduler task; scans
    over 10k tiny files are dominated by that overhead, not data).

    Returns (files_before, files_after).

    Crash-safety contract (honest version): the rewrite stages to a
    sibling ``._compact`` directory, then swaps via two renames
    (``path`` → ``._old``, ``._compact`` → ``path``). A crash BEFORE the
    first rename leaves the original untouched; a crash BETWEEN the two
    renames leaves no directory at ``path`` but the full pre-compaction
    data intact in ``._old`` — recovery is manual (rename ``._old`` back,
    or finish the swap by renaming ``._compact``). A pre-existing
    ``._old`` from such a crash makes this function REFUSE to run rather
    than fail half-way through the swap. The swap is also not atomic
    across concurrent readers — production tables put a transaction log
    (Delta/Iceberg) in front, which is exactly the part this repo does
    not re-implement (documented non-goal; the data-layout math is the
    portable part).

    Hive-partitioned datasets: pass ``partition_by`` to preserve the
    directory layout. Without it, a dataset detected as partitioned
    (``key=value`` subdirectories) is refused rather than silently
    rewritten flat. `sort_within_by` forwards to the writer so
    compaction can also install the clustering that makes zone maps
    selective (sources/zonemap.py)."""
    import math
    import os
    import shutil

    def data_files(d):
        return [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(d)
            for f in fs
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]

    old = path.rstrip("/") + "._old"
    if os.path.exists(old):
        raise RuntimeError(
            f"stale {old!r} left by an interrupted compaction; the"
            " pre-compaction data is intact there — restore it over"
            f" {path!r} (or delete it if {path!r} is already the"
            " compacted copy) before re-running"
        )
    before = data_files(path)
    part_keys = sorted(
        {
            seg.split("=", 1)[0]
            for f in before
            for seg in os.path.relpath(f, path).split(os.sep)[:-1]
            if "=" in seg
        }
    )
    if part_keys and not partition_by:
        raise ValueError(
            f"dataset at {path!r} is hive-partitioned by {part_keys};"
            " pass partition_by to preserve the layout (compaction"
            " will not silently flatten it)"
        )
    total = sum(os.path.getsize(f) for f in before)
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = read_columnar(spark, path, fmt)
    staged = path.rstrip("/") + "._compact"
    write_columnar(df, staged, fmt, n_files=n_files,
                   sort_within_by=sort_within_by,
                   partition_by=partition_by)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return len(before), len(data_files(path))
