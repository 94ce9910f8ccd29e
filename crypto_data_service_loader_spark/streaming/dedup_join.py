"""Streaming dedup and stream-stream joins — the watermark-bounded-state
operators a continuous ingest pipeline needs beyond the file/status flows.

Reference parity note: the reference dedups file registrations via a DB
semi-join per flush (SaveNewFilesToDbFlow.java:222-236) — unbounded-history
dedup delegated to ClickHouse. The streaming-native equivalent must bound
its own state: `dropDuplicatesWithinWatermark` keeps a key's state only
until the watermark passes it, so state is O(arrival rate × delay), not
O(history). For true unbounded-history dedup keep the foreachBatch
anti-join against the registry table (streaming/discovery.py) — the
table, not executor memory, holds the history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def dedup_within_watermark_stream(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark delay.

    Exactly the at-least-once -> effectively-once repair for replayed
    sources: a key seen again within `delay` is dropped; once the
    watermark passes, its state is evicted. Unlike plain dropDuplicates
    on a stream (state grows forever), this is safe at 100 TB/day.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str = "ts",
    r_ts: str = "r_ts",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-range bound.

    The range condition (`l_ts <= r_ts <= l_ts + within`) plus watermarks
    on BOTH sides is what lets Spark evict buffered rows — without it the
    join state is unbounded. Right-side columns must be pre-renamed to
    avoid collisions (the caller owns naming; this keeps the operator a
    pure DataFrame -> DataFrame function).
    """
    l = left.withWatermark(l_ts, within)
    r = right.withWatermark(r_ts, within)
    cond = (
        (l[key] == r[f"r_{key}"])
        & (r[r_ts] >= l[l_ts])
        & (r[r_ts] <= l[l_ts] + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how)
