"""Structured Streaming tests: stateful running totals
(applyInPandasWithState), watermarked tumbling-window aggregation, and
batch/stream equivalence of the stateful operator."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.streaming.stateful import (
    running_totals_batch,
    start_running_totals_stream,
)

TS = datetime.datetime

EVENTS = [
    (1, TS(2024, 1, 1, 10, 0, 0), 7, "click", 1.5),
    (2, TS(2024, 1, 1, 10, 1, 0), 7, "view", 2.5),
    (3, TS(2024, 1, 1, 10, 2, 0), 9, "click", 10.0),
    (4, TS(2024, 1, 1, 11, 0, 0), 7, "click", 4.0),
]
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture()
def events_dir(spark, tmp_path):
    p = str(tmp_path / "events_parquet")
    spark.createDataFrame(EVENTS, SCHEMA).write.parquet(p)
    return p


def test_stateful_running_totals_stream(spark, events_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    q = start_running_totals_stream(
        stream, str(tmp_path / "ckpt"), query_name="rt_test"
    )
    q.awaitTermination(120)
    out = {r["user_id"]: (r["n"], r["total"])
           for r in spark.sql("SELECT * FROM rt_test").collect()}
    assert out[7] == (3, 8.0)
    assert out[9] == (1, 10.0)


def test_batch_twin_matches_stream_semantics(spark):
    df = spark.createDataFrame(EVENTS, SCHEMA)
    rows = running_totals_batch(df).collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n"], r["total"])  # last row per user wins
    assert final[7] == (3, 8.0) and final[9] == (1, 10.0)


def test_watermarked_tumbling_window(spark, events_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ww_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["w"]["start"]), r["user_id"]): (r["n"], r["v"])
        for r in spark.sql("SELECT * FROM ww_test").collect()
    }
    assert got[("2024-01-01 10:00:00", 7)] == (2, 4.0)
    assert got[("2024-01-01 10:00:00", 9)] == (1, 10.0)
    assert got[("2024-01-01 11:00:00", 7)] == (1, 4.0)
