"""Idempotent (exactly-once) batch sink — SURVEY.md §7.

The reference is at-least-once: a failed bundle restarts the whole GZIP
stream and can double-insert ticks (TickersDataLoader.java:112-158 restarts;
ClickHouse dedup not configured). Inside Spark's foreachBatch the batch id
is stable across replays of the same epoch, so a sink keyed on batch_id is
exactly-once:

- parquet flavor: each batch writes to `<path>/batch_id=<id>` with
  overwrite — a replayed epoch overwrites its own output, never appends a
  duplicate;
- JDBC flavor (ClickHouse): write batch_id as a column and use
  `ReplacingMergeTree`/`INSERT ... SELECT WHERE batch_id NOT IN` patterns
  server-side (documented, not exercised here: no server in this env).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class IdempotentParquetSink:
    """Exactly-once parquet sink: one partition dir per batch id, replay
    overwrites in place (dynamic partition overwrite)."""

    path: str

    def write(self, df: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is None:
            # an unkeyed write would silently land in (and clobber) batch 0
            raise ValueError("IdempotentParquetSink requires an explicit batch_id")
        bid = int(batch_id)
        (
            df.withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
