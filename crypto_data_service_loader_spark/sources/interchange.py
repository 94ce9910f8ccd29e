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
) -> None:
    """Write `df` as parquet or ORC. `n_files` bounds output file count
    (a repartition — use it to fix the small-files problem when the
    upstream plan ends narrow); `sort_within_by` sorts WITHIN each file
    (sortWithinPartitions — no extra exchange) so downstream range scans
    and min/max page skipping actually bite."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {sorted(_FORMATS)}, got {fmt!r}")
    out = df
    if n_files is not None:
        out = out.repartition(int(n_files))
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").format(fmt).save(path)


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
