"""Testdata loading + deterministic fixture derivations.

The driver's tables (TESTDATA.md) are TPC-H-ish; the reference's control
plane works on a (filename, create_date, status) registry (FIXTURES.md F2).
We derive a deterministic registry from `orders` — both in DataFrame API
(for `queries()`) and as a SQL CTE fragment (for the DuckDB `oracle_sql()`)
— so every registry operator is oracle-checkable.

Determinism rules shared by both sides:
- filename  = 'file_' || orderkey
- create_date = CAST(o_orderdate AS DATE)
- status    = STATUSES[o_orderkey % 6]
- TODAY is a fixed literal inside the data's date range (never
  current_date(), which would desync Spark from the oracle at midnight).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import STATUSES

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Fixed "today" for the status machine, inside orders' 1995..2001 range.
TODAY = "1998-07-15"

#: Schema memo per (sf_dir, table): the first read infers from the
#: parquet footer as before; later reads pin that schema, which skips
#: per-call footer inference (80 ms -> 11 ms per read measured warm —
#: round 16, guide §6: at 100 TB the same listing+footer round trip
#: happens against an object store, and production engines pin known
#: table schemas for exactly this reason). Metadata only — every read
#: still scans the parquet data; results are byte-identical because the
#: pinned schema IS the inferred one.
_SCHEMA_MEMO: dict[tuple[str, str], object] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan, pushdown-capable).

    `events.parquet` stores TIMESTAMP(NANOS), which Spark reads only as
    long-nanos (legacy conf); convert to micros exactly like DuckDB's
    ns->us truncation so both engines see identical timestamps.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        memo = _SCHEMA_MEMO.get((sf_dir, name))
        df = (
            spark.read.schema(memo).parquet(path)
            if memo is not None
            else spark.read.parquet(path)
        )
        _SCHEMA_MEMO[(sf_dir, name)] = df.schema
        # normalize ts to TIMESTAMP (ltz, session tz = UTC) whatever the
        # writer emitted: nano-sourced files read as long (legacy conf),
        # micros-NTZ files read as timestamp_ntz (both appear across
        # driver-generated testdata vintages), re-staged copies (e.g. scale
        # probes) already carry a proper timestamp. Values are identical to
        # DuckDB's read in every case (UTC session).
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    memo = _SCHEMA_MEMO.get((sf_dir, name))
    if memo is not None:
        return spark.read.schema(memo).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_MEMO[(sf_dir, name)] = df.schema
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def _status_case(key_col: str) -> F.Column:
    col = F.col(key_col) % 6
    expr = F.lit(STATUSES[-1])
    # Build CASE from the tail so the chain reads in STATUSES order.
    for i in range(len(STATUSES) - 2, -1, -1):
        expr = F.when(col == i, STATUSES[i]).otherwise(expr)
    return expr


def registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-shaped DataFrame derived from `orders` (FIXTURES.md F5)."""
    return load(spark, sf_dir, "orders").select(
        F.concat(F.lit("file_"), F.col("o_orderkey").cast("string")).alias("filename"),
        F.col("o_orderdate").cast("date").alias("create_date"),
        _status_case("o_orderkey").alias("status"),
    )


#: DuckDB CTE body equivalent to :func:`registry`. Keep in lockstep.
REGISTRY_SQL = """
SELECT 'file_' || CAST(o_orderkey AS VARCHAR) AS filename,
       CAST(o_orderdate AS DATE)              AS create_date,
       CASE CAST(o_orderkey % 6 AS INT)
            WHEN 0 THEN 'DISCOVERED'
            WHEN 1 THEN 'DOWNLOADING'
            WHEN 2 THEN 'READY_FOR_PROCESSING'
            WHEN 3 THEN 'IN_PROGRESS'
            WHEN 4 THEN 'FINISHED'
            ELSE 'ERROR' END                   AS status
FROM orders
"""


def fs_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files-on-disk view for the registry⋈filesystem join (SURVEY.md O13).

    Derived from `lineitem` so only filenames with at least one lineitem
    appear (a strict subset of registry filenames — like a disk that has not
    yet materialized every registered file). create_date comes from the
    registry derivation, making (create_date, filename) a composite key.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    ords = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey, "inner")
        .select(
            F.concat(F.lit("file_"), F.col("l_orderkey").cast("string")).alias("filename"),
            F.col("o_orderdate").cast("date").alias("create_date"),
        )
    )


FS_FILES_SQL = """
SELECT 'file_' || CAST(l.l_orderkey AS VARCHAR) AS filename,
       CAST(o.o_orderdate AS DATE)              AS create_date
FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


def discovered_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newly-discovered file candidates for the dedup anti-join (O5).

    Shift the key by +7 so the candidate set part-overlaps the registry:
    overlapping names must be dropped, novel names must survive — exactly the
    reference's semi-join dedup contract (SaveNewFilesToDbFlow.java:222-236).
    """
    return load(spark, sf_dir, "orders").select(
        F.concat(F.lit("file_"), (F.col("o_orderkey") + 7).cast("string")).alias("filename"),
        F.col("o_orderdate").cast("date").alias("create_date"),
    )


DISCOVERED_SQL = """
SELECT 'file_' || CAST(o_orderkey + 7 AS VARCHAR) AS filename,
       CAST(o_orderdate AS DATE)                  AS create_date
FROM orders
"""
