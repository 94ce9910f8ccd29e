"""File-level zone maps: data skipping for NON-partition columns.

Partition pruning only helps on the partition key; real scans filter on
other columns too (timestamps, prices, ids). Parquet row-group stats
prune WITHIN a file, but the driver still lists, opens, and schedules
every file. A zone map lifts the min/max stats to the FILE level as a
tiny queryable table, so a filtered read schedules only the files whose
[min, max] interval intersects the predicate — the Delta/Iceberg
data-skipping idea, self-hosted on plain parquet.

The win compounds with layout: `interchange.zorder_write` clusters
correlated columns so each file covers a NARROW value range, which is
exactly what makes zone intervals selective. Unsorted data gives
full-range zones and no skipping — the map tells you that honestly
(see `zonemap_selectivity`).

Correctness contract: pruning is a superset optimization — a pruned
read UNION the dropped files' rows filtered by the predicate equals the
full filtered scan (pinned by test; min/max intersection can never
false-negative on <=/>= range predicates over non-null values; NULLs
are tracked per file and files that are all-NULL in the column are kept
only when the predicate asks for NULLs).

At 100 TB: the map is one row per (file, column) — millions of files
compress to a broadcastable table; building it is one pass of
per-partition min/max (each parquet file = one zone), and incremental
appends just add rows for new files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pread import read_parquet_pinned


def build_zonemap(
    spark: SparkSession,
    path: str,
    cols: list[str],
) -> DataFrame:
    """One row per (file, column): (file, col_name, min_value, max_value,
    n_rows, n_nulls), values serialized as strings with the column's
    type recorded so the pruner can cast back. One scan of the data,
    grouped by the file each row came from (`input_file_name`), all
    aggregates partial-combined."""
    return _zone_rows(read_parquet_pinned(spark, path), cols)


def _zone_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    base = df.select(
        F.input_file_name().alias("_file"),
        *[F.col(c) for c in cols],
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
        ]
    per_file = base.groupBy("_file").agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(df.schema[c].dataType.simpleString()).alias("col_type"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            F.col(f"_nulls_{c}").alias("n_nulls"),
        )
        for c in cols
    ]
    return per_file.select(
        F.col("_file").alias("file"),
        F.col("_n").alias("n_rows"),
        F.explode(F.array(*entries)).alias("e"),
    ).select(
        "file", "e.col_name", "e.col_type", "e.min_value", "e.max_value",
        "n_rows", "e.n_nulls",
    )


def _native_bound(col_type: str, v, what: str):
    """Parse a caller bound to the zone column's NATIVE Python type, or
    raise — never fall back to comparing raw ``str()`` output (a bound
    like '2024-1-5' or a datetime with microseconds would lexically
    compare wrong against Spark's canonical cast-to-string form and
    silently false-prune, breaking the superset contract)."""
    import datetime
    import decimal

    if v is None:
        return None
    try:
        if col_type in ("bigint", "int", "smallint", "tinyint"):
            return int(v)
        if col_type in ("double", "float"):
            return float(v)
        if col_type.startswith("decimal"):
            return decimal.Decimal(str(v))
        if col_type == "date":
            if isinstance(v, datetime.datetime):
                return v.date()
            if isinstance(v, datetime.date):
                return v
            return datetime.date.fromisoformat(str(v).strip())
        if col_type.startswith("timestamp"):
            if isinstance(v, datetime.datetime):
                return v
            if isinstance(v, datetime.date):
                return datetime.datetime(v.year, v.month, v.day)
            return datetime.datetime.fromisoformat(str(v).strip())
        if col_type == "string":
            if not isinstance(v, str):
                raise ValueError(f"string zone needs a str bound, got {type(v).__name__}")
            return v
    except (ValueError, TypeError, ArithmeticError) as e:
        raise ValueError(
            f"unparseable {what} bound {v!r} for {col_type} zone column"
        ) from e
    raise ValueError(f"zonemap pruning does not support column type {col_type!r}")


def _zone_cast_type(col_type: str) -> str:
    """The Spark type min/max zone strings are cast back to for a TYPED
    interval test (decimal zones compare numerically, never lexically)."""
    if col_type.startswith("decimal"):
        return col_type
    if col_type.startswith("timestamp"):
        return "timestamp"
    return col_type


def prune_files(
    zonemap: DataFrame,
    col_name: str,
    lo=None,
    hi=None,
) -> list[str]:
    """Files whose [min, max] zone for ``col_name`` intersects
    [lo, hi] (either bound may be None for open ranges). The interval
    test runs INSIDE Spark — zone strings cast back to the column's own
    type, bounds parsed to native literals (raising on unparseable input
    rather than comparing reprs) — so only the surviving file paths are
    collected: at 10⁶ files the driver materializes the pruned list, not
    every zone row. All-NULL zones are dropped — a range predicate never
    selects NULLs. Returns the file list (feeds
    `read_parquet_pinned(spark, *files)`)."""
    z = zonemap.where(F.col("col_name") == col_name)
    trow = z.select("col_type").limit(1).collect()
    if not trow:
        return []
    t = trow[0][0]
    cast_t = _zone_cast_type(t)
    # all-NULL zones have NULL min AND max; with a bound present the
    # NULL-valued comparison is already filtered out by SQL semantics,
    # but the open-range case needs the explicit drop
    pred = F.col("min_value").isNotNull() | F.col("max_value").isNotNull()
    if lo is not None:
        pred = pred & (
            F.col("max_value").cast(cast_t) >= F.lit(_native_bound(t, lo, "lo"))
        )
    if hi is not None:
        pred = pred & (
            F.col("min_value").cast(cast_t) <= F.lit(_native_bound(t, hi, "hi"))
        )
    return sorted(r["file"] for r in z.where(pred).select("file").collect())


def prune_files_and(
    zonemap: DataFrame,
    bounds: dict[str, tuple],
) -> list[str]:
    """Multi-column AND pruning: files whose zones intersect EVERY
    (lo, hi) interval in ``bounds`` ({col_name: (lo, hi)}). Each
    column's interval test prunes independently (still superset-safe);
    the intersection happens on the pruned path lists — this is where a
    z-ordered layout pays twice, since BOTH columns' zones are narrow."""
    if not bounds:
        raise ValueError("bounds must name at least one column")
    keep: set[str] | None = None
    for c, (lo, hi) in bounds.items():
        files = set(prune_files(zonemap, c, lo, hi))
        keep = files if keep is None else (keep & files)
        if not keep:
            break
    return sorted(keep or [])


def pruned_read(
    spark: SparkSession,
    zonemap: DataFrame,
    col_name: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Read ONLY the zone-selected files. The caller still applies the
    exact predicate (zones over-cover); an empty selection returns an
    empty frame with the right schema via an impossible filter on one
    file's schema if any exist."""
    files = prune_files(zonemap, col_name, lo, hi)
    if not files:
        any_file = [r["file"] for r in zonemap.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("empty zonemap: nothing to infer a schema from")
        return read_parquet_pinned(spark, any_file[0]).limit(0)
    return read_parquet_pinned(spark, *files)


def zonemap_selectivity(zonemap: DataFrame, col_name: str) -> DataFrame:
    """How skippable is this column's layout? Per column: the average
    zone width relative to the global range (1.0 = every file covers
    the whole range, no skipping possible; near 0 = tightly clustered).
    Numeric columns only. Use it to decide WHETHER a zorder_write by
    this column is worth the rewrite."""
    z = zonemap.where(
        (F.col("col_name") == col_name)
        & F.col("min_value").isNotNull()
    )
    mn = F.col("min_value").cast("double")
    mx = F.col("max_value").cast("double")
    agg = z.agg(
        F.min(mn).alias("_gmin"),
        F.max(mx).alias("_gmax"),
        F.avg(mx - mn).alias("_avg_width"),
        F.count(F.lit(1)).alias("n_files"),
    )
    rel = F.when(
        F.col("_gmax") > F.col("_gmin"),
        F.col("_avg_width") / (F.col("_gmax") - F.col("_gmin")),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.lit(col_name).alias("col_name"),
        "n_files",
        F.round(rel, 6).alias("avg_relative_zone_width"),
    )


def refresh_zonemap(
    spark: SparkSession,
    zonemap_path: str,
    data_path: str,
    cols: list[str],
) -> int:
    """Incremental zone-map maintenance: scan ONLY files that have no
    zone rows yet and append theirs — the post-epoch hook a streaming
    sink (or any appending writer) calls so data skipping keeps up with
    ingestion without ever re-reading mapped history. Idempotent: a
    second call with no new files appends nothing; parquet files are
    immutable once written (rewrites land under new names), so existing
    zone rows never go stale — except via compaction, which REPLACES
    files wholesale (compact then rebuild, or refresh after: vanished
    files' zone rows simply never match a scheduled path again and can
    be vacuumed by rebuilding).

    Listing is a driver-side walk (local FS / HDFS-style semantics; an
    object-store deployment would list via its FS API) — file-count
    sized, no data read. Returns the number of newly mapped files."""
    have: set[str] = set()
    if os.path.isdir(zonemap_path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(zonemap_path)
    ):
        have = {
            r["file"]
            for r in read_parquet_pinned(spark, zonemap_path)
            .select("file").distinct().collect()
        }
    all_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_path)
        for f in fs
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    )
    # input_file_name() reports file: URIs; normalize the listing to match
    missing = [
        f for f in all_files
        if "file://" + os.path.abspath(f) not in have
    ]
    if not missing:
        return 0
    rows = _zone_rows(read_parquet_pinned(spark, *missing), cols).localCheckpoint()
    rows.write.mode("append").parquet(zonemap_path)
    return len(missing)
