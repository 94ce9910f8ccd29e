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
    df = spark.read.parquet(path)
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


def prune_files(
    zonemap: DataFrame,
    col_name: str,
    lo=None,
    hi=None,
) -> list[str]:
    """Files whose [min, max] zone for ``col_name`` intersects
    [lo, hi] (either bound may be None for open ranges). Values compare
    in the column's own type (cast back from the stored strings).
    All-NULL zones are dropped — a range predicate never selects NULLs.
    Returns the file list (driver-side: the map is file-count-sized,
    and the result feeds `spark.read.parquet(*files)`)."""
    z = zonemap.where(F.col("col_name") == col_name)
    rows = z.collect()
    keep = []
    for r in rows:
        if r["min_value"] is None and r["max_value"] is None:
            continue  # all-NULL zone: no range predicate can match
        t = r["col_type"]

        def conv(v):
            if v is None:
                return None
            if t in ("bigint", "int", "smallint", "tinyint"):
                return int(v)
            if t in ("double", "float") or t.startswith("decimal"):
                return float(v)
            return str(v)  # strings/dates/timestamps compare lexically
                           # (ISO forms order correctly)

        zmin, zmax = conv(r["min_value"]), conv(r["max_value"])
        if lo is not None and zmax is not None and zmax < conv(str(lo)):
            continue
        if hi is not None and zmin is not None and zmin > conv(str(hi)):
            continue
        keep.append(r["file"])
    return sorted(keep)


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
        return spark.read.parquet(any_file[0]).limit(0)
    return spark.read.parquet(*files)


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
