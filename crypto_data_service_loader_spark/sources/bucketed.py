"""Bucketed tables — co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of every fact⋈fact join (lineitem⋈orders on
orderkey, registry⋈scan on filename, chunk⋈doc on doc_id) is the shuffle
of both sides. Spark's bucketing pre-partitions a table ON DISK by
`hash(key) % num_buckets` at write time: two tables bucketed on the same
key with the same bucket count join bucket-to-bucket with ZERO exchange —
the shuffle is paid once at ingest, then amortized over every downstream
join/groupBy on that key. `sortBy` additionally pre-orders each bucket so
sort-merge join skips its sort.

This is the Spark-native analogue of the co-located MergeTree layouts the
reference's ClickHouse tables get from ORDER BY (clickhouse_ddl.sql) —
except declared once and exploited by Catalyst automatically.

Sizing rule at scale: num_buckets ~ total_size / target_file_size
(128-512 MiB per bucket file per partition); too few buckets caps join
parallelism, too many makes small files. Bucket counts must match across
join sides (or be integer multiples with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: list[str] | str,
    path: str | None = None,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) table.

    `path` makes it an external table (data at an explicit location);
    otherwise it lands in the session warehouse. Bucketing metadata lives
    in the catalog — readers must come through `spark.table(name)`, not
    `read.parquet(path)`, or the bucketing is invisible to the planner.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves bucketing metadata for the planner."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket specs the physical
    plan is exchange-free on both sides (asserted in
    tests/test_partitioning.py) — at scale this removes the two largest
    shuffles of the query."""
    on = [on] if isinstance(on, str) else list(on)
    return bucketed_table(spark, left_table).join(
        bucketed_table(spark, right_table), on=on, how=how
    )
