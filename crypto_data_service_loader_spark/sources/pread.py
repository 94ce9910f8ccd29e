"""Schema-pinned parquet reads for the persisted index stores
(round 16, guide §6).

Every index probe re-ran parquet footer inference per `read.parquet`
call — measured at 80 ms warm vs 11 ms with a pinned schema on this
box, and 2–5 such reads per indexed query. Each store's schema is
fixed by its writer, so the FIRST read of a path infers (exactly as
before) and the memo pins that schema for later reads of the same
path. Metadata only: every read still lists and scans the parquet
files, so appends/rewrites are picked up — the stores never change
schema in place (their writers are the schema). At 100 TB the same
inference is a listing + footer fetch against an object store per
query plan; pinning known store schemas is standard production
practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_parquet_pinned"]

_SCHEMA_MEMO: dict[str, object] = {}


def read_parquet_pinned(spark: SparkSession, *paths: str) -> DataFrame:
    """`spark.read.parquet(*paths)` with the schema memoised per path
    set. The first read infers; later reads of the same path set pin
    the inferred schema and skip footer inference."""
    key = "\x00".join(paths)
    memo = _SCHEMA_MEMO.get(key)
    if memo is not None:
        return spark.read.schema(memo).parquet(*paths)
    df = spark.read.parquet(*paths)
    _SCHEMA_MEMO[key] = df.schema
    return df
