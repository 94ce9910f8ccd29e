"""Custom stateful operators (SURVEY.md §2B streaming-stateful row).

The engine's primary stateful pattern is foreachBatch + registry-table merge
(state survives restarts in the table itself — §7 decision). This module
adds the *in-memory keyed state* surface for operators that genuinely need
it (running per-key aggregates emitted per micro-batch):

- `running_totals_batch`: the batch-mode equivalent (applyInPandas grouped
  cumsum) — same semantics, oracle-checkable.
- `start_running_totals_stream`: applyInPandasWithState over a stream,
  emitting updated per-key totals each batch; state is (count, total).

Scale: state is partitioned by key across executors; with RocksDB state
store (config) it spills; watermark bounds retention.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n long, total double"

#: Spark's bundled RocksDB-backed state store (no extra jars). At 100 TB
#: streaming state (e.g. dedup keys or per-entity aggregates over billions
#: of keys) the default HDFSBackedStateStoreProvider keeps every key in JVM
#: heap — GC pressure grows with state size until executors stall. RocksDB
#: keeps state off-heap + on local disk with bounded memory, and changelog
#: checkpointing uploads per-batch DELTAS instead of full snapshots, so
#: checkpoint cost is O(updated keys), not O(total state).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def configure_state_store(
    spark, provider: str = "rocksdb", changelog_checkpointing: bool = True
) -> None:
    """Select the state-store backend for subsequently STARTED streaming
    queries (the provider is read from session conf at query start and
    pinned into the query's checkpoint thereafter — don't flip it for an
    existing checkpoint)."""
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true" if changelog_checkpointing else "false",
        )
    elif provider == "hdfs":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", HDFS_PROVIDER
        )
    else:  # pragma: no cover - guard against typos in callers
        raise ValueError(f"unknown state store provider: {provider}")


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Per-key running totals via grouped-map Pandas UDF (Arrow path).

    Batch twin of the streaming stateful op: rows sorted by event time
    inside each group, cumulative count/sum emitted per row. Matches the
    window-function formulation exactly (same per-key order, same
    sequential double adds).
    """

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "n": range(1, len(pdf) + 1),
                "total": pdf["value"].cumsum(),
            }
        )
        return out

    # explicit numbered repartition: AQE's bytes-based coalescing would
    # shrink this CPU-bound Arrow stage to ~2 tasks (rows are small, the
    # per-row Python cost isn't); a pinned partition count keeps the
    # grouped-map fanned out across cores
    n_parts = events.sparkSession.sparkContext.defaultParallelism
    return events.select("event_id", "user_id", "ts", "value").repartition(
        n_parts, "user_id"
    ).groupBy("user_id").applyInPandas(
        per_user, schema="event_id long, user_id long, n long, total double"
    )


def _update_running_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    # NOTE: GroupState.get is a PROPERTY (calling the returned tuple
    # raises); only multi-batch runs reach this branch, which the
    # single-drain totals test never did — caught by the EWMA twin's test
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})


def start_running_totals_tws(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "running_totals_tws",
    available_now: bool = True,
) -> StreamingQuery:
    """Running totals via `transformWithStateInPandas` — Spark 4's
    successor stateful API (SPARK-46815): typed per-key state handles
    (ValueState/ListState/MapState), timers, and TTL replace the single
    opaque tuple of `applyInPandasWithState`. It REQUIRES the RocksDB
    state store, which this helper configures; semantics here are
    identical to `start_running_totals_stream` (asserted in tests).

    At 100 TB this is the API that scales: per-key state lives in RocksDB
    column families (off-heap, spillable), and state variables are read
    lazily per key instead of deserialized wholesale per batch.

    Environment gate: the API's state-server wire protocol imports
    google.protobuf at query start; images without protobuf raise
    ImportError from the Spark driver worker — callers should fall back to
    `start_running_totals_stream` (identical semantics, legacy API).
    """
    import pandas as pd  # noqa: F811 — executor-side import parity

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    configure_state_store(events_stream.sparkSession, "rocksdb")
    out = (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_running_totals_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "running_totals",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming stateful running totals -> in-memory table `query_name`.

    applyInPandasWithState: state schema (n long, total double) per user_id,
    update-mode emission each micro-batch. No timeout: totals are global
    over the stream (a TTL'd variant would use ProcessingTimeTimeout).

    `state_store="rocksdb"` selects the spill-capable RocksDB backend for
    this (fresh-checkpoint) query — the production choice once keyed state
    outgrows executor heap.
    """
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_SCHEMA,
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming EWMA — the RECURSIVE exponential moving average (y' = y/2 + x/2,
# alpha = 1/2). This is the op that genuinely needs keyed state: the batch
# engine's window form (suite.q_win_ewma) must truncate to a trailing frame
# because the exact prefix-sum formulation overflows (1-a)^-k, while keyed
# state carries y across micro-batches forever in O(1) per key.
# ---------------------------------------------------------------------------

EWMA_SCHEMA = "user_id long, ewma double"


def ewma_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the streaming EWMA: the same y/2 + x/2 recurrence run
    per key over (ts, event_id)-ordered rows, emitting the final state.
    Used by tests to prove stream == batch on identical input."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        y = None
        for x in pdf["value"]:
            x = float(x)
            y = x if y is None else y / 2.0 + x / 2.0
        return pd.DataFrame({"user_id": pdf["user_id"].iloc[:1], "ewma": [y]})

    n_parts = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("event_id", "user_id", "ts", "value")
        .repartition(n_parts, "user_id")
        .groupBy("user_id")
        .applyInPandas(per_user, schema=EWMA_SCHEMA)
    )


def _update_ewma(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    y = state.get[0] if state.exists else None
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for x in rows["value"]:
        x = float(x)
        y = x if y is None else y / 2.0 + x / 2.0
    state.update((y,))
    yield pd.DataFrame({"user_id": [user_id], "ewma": [y]})


def start_ewma_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "ewma",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming recursive EWMA -> in-memory table `query_name`.

    State is one double per key (the current average) — the minimal
    demonstration that keyed state makes an unbounded-horizon recursive
    aggregate O(1) per key, where any windowed formulation either
    truncates or overflows. Rows are ordered (ts, event_id) within each
    micro-batch; cross-batch order is the stream's arrival order, exactly
    like the reference-model EWMA over a live feed.
    """
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma,
            outputStructType=EWMA_SCHEMA,
            stateStructType="y double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming CUSUM — the live twin of profile.cusum_alerts. The batch op
# uses the running-extremum window identity over a total order; a stream
# has no such order to re-window per batch, but the TEXTBOOK recursion
# (C+ = max(0, C+ + d - slack), C- = max(0, C- - d - slack)) is O(1)
# keyed state — exactly what applyInPandasWithState carries across
# micro-batches. The two forms are provably equal (pinned in
# tests/test_profile.py), so stream output == batch output on the same
# in-order rows (equality-tested). Contract: per-key event-time order
# across batches (the standard keyed-recursion contract, same as the
# streaming EWMA above); rows within a batch are sorted by ts here.
# ---------------------------------------------------------------------------

CUSUM_SCHEMA = (
    "user_id long, ts timestamp, value double, "
    "cusum_pos double, cusum_neg double, is_alert boolean"
)


def _cusum_updater(target: float, slack: float, threshold: float):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cp, cn = state.get if state.exists else (0.0, 0.0)
        pdf = pd.concat(list(pdfs)).sort_values("ts")
        cps, cns = [], []
        for x in pdf["value"]:
            d = float(x) - target
            cp = max(0.0, cp + d - slack)
            cn = max(0.0, cn - d - slack)
            cps.append(round(cp, 6))
            cns.append(round(cn, 6))
        state.update((cp, cn))
        out = pd.DataFrame({
            "user_id": key[0],
            "ts": pdf["ts"],
            "value": pdf["value"],
            "cusum_pos": cps,
            "cusum_neg": cns,
        })
        out["is_alert"] = (out["cusum_pos"] > threshold) | (
            out["cusum_neg"] > threshold
        )
        yield out

    return update


def start_cusum_stream(
    events_stream: DataFrame,
    checkpoint: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
    query_name: str = "cusum",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming CUSUM change-point alerts -> in-memory table
    `query_name`. State per key is TWO floats no matter how long the
    stream runs (the recursion folds history into the pair), update-mode
    emission per micro-batch — each row's statistic lands exactly once."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cusum_updater(float(target), float(slack), float(threshold)),
            outputStructType=CUSUM_SCHEMA,
            stateStructType="cp double, cn double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming heavy hitters — space-saving sketch (Metwally et al. 2005,
# public algorithm) in keyed state: at most `capacity` tracked items per
# key no matter how long the stream runs. Guarantee carried per item:
# count_est - error <= true_count <= count_est, and any item with true
# frequency > N/capacity is guaranteed tracked. With capacity >= the
# key's distinct-item count the sketch IS exact (equality-tested against
# a plain batch groupBy count). The live twin of the batch
# approx_top_k key.
# ---------------------------------------------------------------------------

HEAVY_HITTERS_SCHEMA = (
    "group string, item string, count_est long, error long, rank int"
)


def _heavy_hitters_updater(capacity: int, k: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errors = state.get
            table = {
                it: [int(c), int(e)]
                for it, c, e in zip(items, counts, errors)
            }
        else:
            table = {}
        pdf = pd.concat(list(pdfs))
        for it in pdf["item"].astype(str):
            if it in table:
                table[it][0] += 1
            elif len(table) < capacity:
                table[it] = [1, 0]
            else:
                evict = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
                mc = evict[1][0]
                del table[evict[0]]
                table[it] = [mc + 1, mc]
        state.update((
            list(table.keys()),
            [v[0] for v in table.values()],
            [v[1] for v in table.values()],
        ))
        top = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        yield pd.DataFrame({
            "group": key[0],
            "item": [it for it, _ in top],
            "count_est": [v[0] for _, v in top],
            "error": [v[1] for _, v in top],
            "rank": list(range(1, len(top) + 1)),
        })

    return update


def heavy_hitters_transform(
    items_stream: DataFrame, capacity: int = 64, k: int = 5
) -> DataFrame:
    """The keyed-state heavy-hitters transformation alone — compose it
    with any fault-tolerant sink (foreachBatch/parquet) when checkpoint
    RECOVERY matters; the memory sink `start_heavy_hitters_stream` uses
    for tests does not support restart."""
    return (
        items_stream.select("group", "item")
        .groupBy("group")
        .applyInPandasWithState(
            _heavy_hitters_updater(int(capacity), int(k)),
            outputStructType=HEAVY_HITTERS_SCHEMA,
            stateStructType=(
                "items array<string>, counts array<long>, errors array<long>"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def start_heavy_hitters_stream(
    items_stream: DataFrame,
    checkpoint: str,
    capacity: int = 64,
    k: int = 5,
    query_name: str = "heavy_hitters",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming per-group top-k heavy hitters -> in-memory table
    `query_name`. Input needs (group string, item string) columns.
    State per key is bounded at `capacity` (item, count, error) triples
    — independent of stream length; each micro-batch emits the key's
    refreshed top-k snapshot (update mode), so the latest rank table per
    group is always the last emission."""
    if state_store is not None:
        configure_state_store(items_stream.sparkSession, state_store)
    out = heavy_hitters_transform(items_stream, capacity, k)
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming OLS trend — the live twin of profile.ols_trend. The five
# moments (n, Sx, Sy, Sxy, Sxx, Syy) are associative, so keyed state
# carries them across micro-batches in O(1) per key; each batch emits the
# key's refreshed slope/intercept/r2 snapshot. Pairs with the streaming
# CUSUM: CUSUM pages when a level shifts, the trend line reports how fast
# it is drifting RIGHT NOW. Matches the batch operator exactly while the
# moments stay inside double's exact-integer range (the batch twin
# decimal-accumulates; callers map x to small numbers — same contract as
# ols_trend's docstring); equality is pinned in tests on such data.
# ---------------------------------------------------------------------------

TREND_SCHEMA = (
    "key string, n long, slope double, intercept double, r2 double"
)


def _trend_updater():
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sx, sy, sxy, sxx, syy = (
            state.get if state.exists else (0, 0.0, 0.0, 0.0, 0.0, 0.0)
        )
        pdf = pd.concat(list(pdfs))
        for x, y in zip(pdf["x"], pdf["y"]):
            x, y = float(x), float(y)
            n += 1
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
            syy += y * y
        state.update((n, sx, sy, sxy, sxx, syy))
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        dxy = n * sxy - sx * sy
        slope = round(dxy / dxx, 6) if dxx > 0 else None
        intercept = (
            round((sy - (dxy / dxx) * sx) / n, 6) if dxx > 0 else None
        )
        r2 = (
            round((dxy * dxy) / (dxx * dyy), 6)
            if dxx > 0 and dyy > 0
            else None
        )
        yield pd.DataFrame({
            "key": [key[0]],
            "n": [n],
            "slope": [slope],
            "intercept": [intercept],
            "r2": [r2],
        })

    return update


def start_trend_stream(
    points_stream: DataFrame,
    checkpoint: str,
    query_name: str = "trend",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming per-key least-squares trend -> in-memory table
    `query_name`. Input needs (key string, x double, y double) columns.
    State per key is SIX numbers regardless of stream length; each
    micro-batch emits one refreshed (slope, intercept, r2) row per key
    seen (update mode) — the latest row per key is the live trend."""
    if state_store is not None:
        configure_state_store(points_stream.sparkSession, state_store)
    out = (
        points_stream.select("key", "x", "y")
        .groupBy("key")
        .applyInPandasWithState(
            _trend_updater(),
            outputStructType=TREND_SCHEMA,
            stateStructType=(
                "n long, sx double, sy double, "
                "sxy double, sxx double, syy double"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming HLL distinct counting — the live twin of sketch.hll_*: the
# per-key state IS the 64-register table (64 small ints, constant no
# matter how long the stream runs or how many distinct values pass),
# merged with per-batch maxima exactly like sketch.hll_merge. The
# Python-side hash derivation replicates the batch column expressions
# bit-for-bit (hashlib.md5 == engine md5; same hex slices, same rank
# rule), so after draining identical rows the streaming estimate EQUALS
# sketch.hll_cardinality on the union (equality-tested) — the
# distinct-users-per-key monitor a stream cannot compute exactly
# without unbounded state.
# ---------------------------------------------------------------------------

HLL_STREAM_SCHEMA = (
    "event_type string, n_registers int, reg_sum long, est_distinct double"
)

_HLL_M = 64


def _hll_py_parts(value) -> tuple[int, int]:
    """(register, rank) of one value — the Python replica of
    sketch.hll_registers' column expressions (md5 of the string form,
    2 hex chars -> register mod 64, next 12 -> 48-bit rank field)."""
    import hashlib

    h = hashlib.md5(str(value).encode()).hexdigest()
    reg = int(h[:2], 16) % _HLL_M
    v = int(h[2:14], 16)
    rank = 49 if v == 0 else 48 - v.bit_length() + 1
    return reg, rank


def _hll_estimate_py(regs: list[int]) -> tuple[int, int, float]:
    """(n_registers, reg_sum, estimate) — the Python replica of
    sketch.hll_estimate's exact-int64 arithmetic."""
    from ..operators.sketch import hll_numerator

    reg_sum = sum(1 << (49 - r) for r in regs if r > 0)
    reg_sum += sum(1 for r in regs if r == 0) * (1 << 49)
    n_hit = sum(1 for r in regs if r > 0)
    return n_hit, reg_sum, hll_numerator(_HLL_M) / float(reg_sum)


def _hll_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    regs = list(state.get[0]) if state.exists else [0] * _HLL_M
    for pdf in pdfs:
        for v in pdf["user_id"]:
            if v is None or pd.isna(v):
                continue
            reg, rank = _hll_py_parts(int(v))
            if rank > regs[reg]:
                regs[reg] = rank
    state.update((regs,))
    n_hit, reg_sum, est = _hll_estimate_py(regs)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_registers": [n_hit],
            "reg_sum": [reg_sum],
            "est_distinct": [est],
        }
    )


def start_hll_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "hll",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming distinct-user estimate per event type -> in-memory
    table `query_name`, update mode (one running-estimate row per key
    per micro-batch). State per key: the 64 register maxima — the
    bounded-state answer to COUNT(DISTINCT) over an unbounded stream,
    and the register layout is the PORTABLE one (sketch.py), so the
    state could be persisted and merged with batch-built sketches."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _hll_updater,
            outputStructType=HLL_STREAM_SCHEMA,
            stateStructType="regs array<int>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Moments-sketch twin: running power sums -> Cornish-Fisher p90
# ---------------------------------------------------------------------------

MOMENTS_STREAM_SCHEMA = (
    "event_type string, n long, s1 double, s2 double, s3 double, "
    "s4 double, q_est double"
)

_CF_Z = 1.2815515655446004  # standard normal p90 quantile


def _moments_est_py(n: int, sums: list[int]) -> tuple:
    """(s1..s4 as double, q_est) — Python replica of
    sketch.moments_quantile's IEEE expression tree, term for term, so
    the streaming row equals the batch key bit-for-bit (pinned by
    test_stateful_streaming)."""
    z = _CF_Z
    s = [float(x) for x in sums]
    m1 = s[0] / 1_000_000 / n
    m2 = s[1] / 1_000_000 / n
    m3 = s[2] / 1_000_000 / n
    m4 = s[3] / 1_000_000 / n
    var = m2 - m1 * m1
    sigma = math.sqrt(max(var, 0.0))
    mu3 = (m3 - (3 * m1) * m2) + (((2 * m1) * m1) * m1)
    mu4 = ((m4 - (4 * m1) * m3) + (((6 * m1) * m1) * m2)) - (
        (((3 * m1) * m1) * m1) * m1
    )
    safe = n >= 2 and var > 0
    g1 = mu3 / ((sigma * sigma) * sigma) if safe else 0.0
    g2 = mu4 / (var * var) - 3.0 if safe else 0.0
    c1, c2, c3 = z * z - 1.0, z * z * z - 3.0 * z, 2.0 * z * z * z - 5.0 * z
    w = z + (c1 * g1) / 6 + (c2 * g2) / 24 - ((c3 * g1) * g1) / 36
    est = m1 + sigma * w if safe else m1
    est = round(est, 6) + 0.0
    return s[0], s[1], s[2], s[3], est


def _moments_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # power sums are exact Python ints (arbitrary precision — the batch
    # twin's DECIMAL(38,0)); persisted as strings because the state
    # schema has no decimal type
    if state.exists:
        n = int(state.get[0])
        sums = [int(x) for x in state.get[1]]
    else:
        n, sums = 0, [0, 0, 0, 0]
    for pdf in pdfs:
        for v in pdf["value"]:
            if v is None or pd.isna(v):
                continue
            x = float(v)
            n += 1
            p = x
            for i in range(4):
                sums[i] += math.floor(p * 1_000_000 + 0.5)
                p = p * x
    state.update((n, [str(x) for x in sums]))
    s1, s2, s3, s4, est = _moments_est_py(n, sums)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n": [n],
            "s1": [s1],
            "s2": [s2],
            "s3": [s3],
            "s4": [s4],
            "q_est": [est],
        }
    )


def start_moments_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "moments",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming distributional monitor per event type -> in-memory
    table `query_name`: running fixed-point power sums (exact ints in
    state) + the Cornish-Fisher p90 — one bounded state row per key for
    an unbounded stream, equal to the batch `moments_quantile` key on
    the same prefix (pinned by test). The sums use the batch sketch's
    cell layout, so persisted state merges with batch-built sketches
    by plain addition."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _moments_updater,
            outputStructType=MOMENTS_STREAM_SCHEMA,
            stateStructType="n long, sums array<string>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Count-min twin: running d x w cells in keyed state
# ---------------------------------------------------------------------------

CM_STREAM_SCHEMA = "event_type string, row int, bucket int, cnt long"

_CM_D, _CM_W = 4, 256


def _cm_bucket_py(row: int, value) -> int:
    """Python replica of sketch._cm_bucket: md5(row|value) first 8 hex
    chars mod w — identical cells to the batch builder."""
    import hashlib

    h = hashlib.md5(f"{row}|{value}".encode()).hexdigest()
    return int(h[:8], 16) % _CM_W


def _cm_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # state: flat d*w cell counts (only a dict of touched cells is
    # carried — the sketch bound d*w caps it regardless of stream size)
    if state.exists:
        cells = dict(zip(state.get[0], state.get[1]))
    else:
        cells = {}
    for pdf in pdfs:
        for v in pdf["user_id"]:
            if v is None or pd.isna(v):
                continue
            for r in range(_CM_D):
                k = r * _CM_W + _cm_bucket_py(r, int(v))
                cells[k] = cells.get(k, 0) + 1
    ks = sorted(cells)
    state.update((ks, [cells[k] for k in ks]))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(ks),
            "row": [k // _CM_W for k in ks],
            "bucket": [k % _CM_W for k in ks],
            "cnt": [cells[k] for k in ks],
        }
    )


def start_countmin_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "cms",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming count-min sketch per event type -> in-memory table
    `query_name` (complete-sketch rows per micro-batch, update mode).
    State per key is at most d*w cells — the bounded-state frequency
    answer over an unbounded stream — and the cell layout IS the batch
    builder's (sketch.countmin_build with the same md5 bucket), so the
    streamed cells merge with batch-built sketches by plain SUM and
    equality with the batch sketch on the same prefix is pinned by
    test. Completes the streaming-sketch twins: HLL, space-saving
    heavy hitters, moments, and now count-min."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _cm_updater,
            outputStructType=CM_STREAM_SCHEMA,
            stateStructType="ks array<long>, cnts array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Bloom twin: running filter words in keyed state
# ---------------------------------------------------------------------------

BLOOM_STREAM_SCHEMA = "event_type string, word int, bits long"

_BLOOM_WORDS, _BLOOM_K, _BLOOM_WORD_BITS = 64, 3, 63


def _bloom_positions_py(value) -> list[int]:
    """Python replica of sketch.bloom_build's k bit positions (the
    row-salted md5 family, 63-bit words)."""
    import hashlib

    nbits = _BLOOM_WORDS * _BLOOM_WORD_BITS
    out = []
    for j in range(_BLOOM_K):
        h = hashlib.md5(f"{j}|{value}".encode()).hexdigest()
        out.append(int(h[:8], 16) % nbits)
    return out


def _bloom_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    words = list(state.get[0]) if state.exists else [0] * _BLOOM_WORDS
    for pdf in pdfs:
        for v in pdf["user_id"]:
            if v is None or pd.isna(v):
                continue
            for pos in _bloom_positions_py(int(v)):
                words[pos // _BLOOM_WORD_BITS] |= 1 << (pos % _BLOOM_WORD_BITS)
    state.update((words,))
    nz = [(w, b) for w, b in enumerate(words) if b]
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(nz),
            "word": [w for w, _ in nz],
            "bits": [b for _, b in nz],
        }
    )


def start_bloom_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "bloom",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming Bloom filter per event type -> in-memory table
    `query_name` (non-zero words per micro-batch, update mode). State
    per key: 64 int64 words — bounded membership over an unbounded
    stream. Word layout matches sketch.bloom_build exactly, so the
    streamed filter merges with batch-built filters by BIT_OR and
    stream == batch is pinned word-for-word by test. This completes
    the streaming twins for every batch sketch kind: HLL, count-min,
    Bloom, space-saving heavy hitters, moments."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _bloom_updater,
            outputStructType=BLOOM_STREAM_SCHEMA,
            stateStructType="words array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# KLL twin: canonical compactor state in keyed state -> running quantiles
# ---------------------------------------------------------------------------

KLL_STREAM_SCHEMA = (
    "event_type string, n long, p50 double, p90 double, n_items int"
)

_KLL_STREAM_K = 128


def kll_fold_py(batches, k: int = _KLL_STREAM_K):
    """Sequential per-batch fold: items <- canonicalize(items U batch).
    This IS the streaming twin's state evolution — the batch-side
    reference the stream is pinned against (the KLL state is a
    deterministic function of the batch SEQUENCE; unlike the monoid
    sketches, folding per-batch differs from one-shot canonicalization
    because each compaction discards items, so the twin replays the
    same fold)."""
    from ..operators.kll import kll_canonicalize_py

    items: list[tuple[int, float]] = []
    for batch in batches:
        items = items + [(0, float(v)) for v in batch if v is not None]
        items = kll_canonicalize_py(items, k)
    return items


def _kll_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from ..operators.kll import kll_canonicalize_py, kll_quantile_py

    if state.exists:
        items = list(zip(state.get[0], state.get[1]))
    else:
        items = []
    vals = []
    for pdf in pdfs:
        vals.extend(float(v) for v in pdf["value"] if not pd.isna(v))
    items = kll_canonicalize_py(
        items + [(0, v) for v in vals], _KLL_STREAM_K
    )
    state.update((
        [int(lv) for lv, _ in items],
        [float(v) for _, v in items],
    ))
    n = sum(1 << int(lv) for lv, _ in items)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n": [n],
            "p50": [kll_quantile_py(items, 0.5)],
            "p90": [kll_quantile_py(items, 0.9)],
            "n_items": [len(items)],
        }
    )


def start_kll_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "kll",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming rank-error-bounded quantiles per event type -> in-memory
    table `query_name`: the KLL compactor state (operators/kll.py, same
    canonical Python core) lives in keyed state as two parallel arrays —
    bounded at <= (k+1) * levels items per key for an unbounded stream;
    n (total item weight) stays EXACT under compaction. The state layout
    is the persisted sketch-table layout, so a snapshot merges with
    batch-built sketches via kll_merge. Pinned equal to the sequential
    fold `kll_fold_py` over the same micro-batches (the KLL state is
    fold-deterministic, not a monoid — see kll_fold_py)."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _kll_updater,
            outputStructType=KLL_STREAM_SCHEMA,
            stateStructType="levels array<int>, vals array<double>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Rolling-HLL twin: per-day register tables in keyed state -> window
# estimates per anchor day (the streaming face of sketch.hll_rolling)
# ---------------------------------------------------------------------------

HLL_ROLLING_STREAM_SCHEMA = (
    "event_type string, win_day date, n_registers int, reg_sum long, "
    "est_distinct double"
)

_HLL_ROLL_WINDOW = 7


def _hll_rolling_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State: parallel arrays (days, 64 regs per day), pruned to the
    trailing window — bounded at window_days * 64 ints per key forever.
    Emits one row per anchor day touched by this batch; because the
    window looks BACKWARD only, an anchor's row is final as soon as its
    own day stops receiving data (event-time-ordered input), so the
    last emission per (key, win_day) equals the batch operator's row —
    registers are max-monoids, no fold-order dependence (pinned by
    test_streaming_hll_rolling_matches_batch)."""
    import datetime

    if state.exists:
        days = [datetime.date.fromisoformat(d) for d in state.get[0]]
        flat = list(state.get[1])
    else:
        days, flat = [], []
    regs = {d: flat[i * _HLL_M:(i + 1) * _HLL_M] for i, d in enumerate(days)}

    touched = set()
    for pdf in pdfs:
        for ts, v in zip(pdf["ts"], pdf["user_id"]):
            if v is None or pd.isna(v) or pd.isna(ts):
                continue
            d = ts.date() if hasattr(ts, "date") else ts
            reg, rank = _hll_py_parts(int(v))
            day_regs = regs.setdefault(d, [0] * _HLL_M)
            if rank > day_regs[reg]:
                day_regs[reg] = rank
            touched.add(d)

    # emit FIRST (a batch can carry both an old day's last rows and a
    # new day that would prune it — backward windows make the old
    # anchor's estimate correct over the pre-prune state), THEN prune:
    # future anchors never look further back than max_day - (w-1)
    out = []
    for anchor in sorted(touched):
        lo = anchor - datetime.timedelta(days=_HLL_ROLL_WINDOW - 1)
        merged = [0] * _HLL_M
        for d, r in regs.items():
            if lo <= d <= anchor:
                for i in range(_HLL_M):
                    if r[i] > merged[i]:
                        merged[i] = r[i]
        n_hit, reg_sum, est = _hll_estimate_py(merged)
        out.append((key[0], anchor, n_hit, reg_sum, est))

    if regs:
        cutoff = max(regs) - datetime.timedelta(days=_HLL_ROLL_WINDOW - 1)
        regs = {d: r for d, r in regs.items() if d >= cutoff}
    days = sorted(regs)
    state.update((
        [d.isoformat() for d in days],
        [x for d in days for x in regs[d]],
    ))
    yield pd.DataFrame(
        out, columns=["event_type", "win_day", "n_registers", "reg_sum",
                      "est_distinct"],
    )


def start_hll_rolling_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "hll_rolling",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming 7-day rolling distinct users per event type -> in-memory
    table `query_name`, update mode: per-day register maxima live in
    keyed state (pruned to the trailing window — bounded forever), and
    each batch emits the window estimate for every anchor day it
    touched. The register layout is sketch.hll_rolling's, so the final
    row per (key, day) equals the batch key exactly."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select("event_type", "ts", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(
            _hll_rolling_updater,
            outputStructType=HLL_ROLLING_STREAM_SCHEMA,
            stateStructType="days array<string>, regs array<int>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming interval islands (round 11) — the gaps-and-islands merge of
# relational.merge_intervals run incrementally: keyed state is just the one
# OPEN island per key (start, running-max end, count), O(1) per key forever.
# Contract (same as the rolling-HLL twin): event-time-ordered input by
# interval start; each batch emits every island it closed plus the current
# open island (provisional — overwritten in update mode), so the LAST
# emission per (key, island_start) equals the batch operator's row exactly
# (pinned by test_streaming_interval_islands_matches_batch).
# ---------------------------------------------------------------------------

ISLANDS_STREAM_SCHEMA = (
    "event_type string, island_start timestamp, island_end timestamp, "
    "n_intervals long"
)


def _islands_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cur = list(state.get) if state.exists else None  # [start_us, end_us, n]
    out = []

    def _emit(island):
        out.append((
            key[0],
            pd.to_datetime(island[0], unit="us", utc=True),
            pd.to_datetime(island[1], unit="us", utc=True),
            island[2],
        ))

    rows = []
    for pdf in pdfs:
        rows.extend(zip(pdf["start_us"], pdf["end_us"], pdf["event_id"]))
    # merge_intervals orders by (start, end, tiebreaks) — replicate so
    # within-batch processing order matches the batch window order
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    for s, e, _ in rows:
        s, e = int(s), int(e)
        if cur is None:
            cur = [s, e, 1]
        elif s <= cur[1]:  # overlap or touch: start <= running max end
            cur[1] = max(cur[1], e)
            cur[2] += 1
        else:
            _emit(cur)
            cur = [s, e, 1]
    if cur is not None:
        _emit(cur)  # provisional open island; final row per start wins
        state.update(tuple(cur))
    yield pd.DataFrame(
        out,
        columns=["event_type", "island_start", "island_end", "n_intervals"],
    )


def start_interval_islands_stream(
    intervals_stream: DataFrame,
    checkpoint: str,
    query_name: str = "interval_islands",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming gaps-and-islands -> in-memory table `query_name` (update
    mode). Input: a stream with (event_type, event_id, iv_start, iv_end)
    — the same interval table q_interval_islands builds. Keyed state is
    ONE open island per event_type: bounded at three scalars per key no
    matter how many intervals flow through, which is the whole point of
    the incremental form at 100 TB/day interval volumes."""
    if state_store is not None:
        configure_state_store(intervals_stream.sparkSession, state_store)
    out = (
        intervals_stream.select(
            "event_type",
            "event_id",
            F.unix_micros("iv_start").alias("start_us"),
            F.unix_micros("iv_end").alias("end_us"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            _islands_updater,
            outputStructType=ISLANDS_STREAM_SCHEMA,
            stateStructType="start_us long, end_us long, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming TWAP bars (round 11) — q_twap_bars run incrementally per
# (event_type, hour bar). The batch key weights each observation by the
# time to the NEXT observation (last holds to bar end), accumulating the
# products as DECIMAL(38,6); the stream keeps (last_us, last_val, closed
# decimal numerator, closed duration, n) per bar in keyed state — an
# observation's weight closes when its successor arrives, and each batch
# emits the bar AS IF the stream ended now (last obs held to bar end), so
# every emission equals the batch key over the prefix seen so far and the
# final emission equals the batch row bit-for-bit (decimal quantization
# mirrors Spark's double->DECIMAL(38,6) HALF_UP cast; pinned by
# test_streaming_twap_matches_batch).
# ---------------------------------------------------------------------------

TWAP_STREAM_SCHEMA = (
    "event_type string, bar_start timestamp, twap double, held_us long, "
    "n_obs long"
)

def _twap_dec6(x: float):
    """Spark's CAST(double AS DECIMAL(38,6)): exact binary value of the
    double, then scale 6 with HALF_UP — decimal.Decimal(float) is the
    same exact binary expansion."""
    import decimal

    return decimal.Decimal(x).quantize(
        decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
    )


def _twap_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import decimal

    if state.exists:
        last_us, last_val, n, closed_dt, num_str, end_us = state.get
        num = decimal.Decimal(num_str)
    else:
        last_us = None
        last_val = 0.0
        n = 0
        closed_dt = 0
        num = decimal.Decimal(0)
        end_us = 0

    rows = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["us"], pdf["value"], pdf["event_id"], pdf["end_us"])
        )
    rows.sort(key=lambda r: (r[0], r[2]))  # batch orders by (_us, event_id)
    for us, val, _, bar_end in rows:
        us, bar_end = int(us), int(bar_end)
        if last_us is not None:
            dt = us - last_us
            num += _twap_dec6(last_val * dt)
            closed_dt += dt
        last_us, last_val, end_us = us, float(val), bar_end
        n += 1

    out = []
    if n:
        tail_dt = end_us - last_us
        total_num = num + _twap_dec6(last_val * tail_dt)
        den = closed_dt + tail_dt
        if den > 0:
            # Spark: round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
            twap = float(
                decimal.Decimal(float(total_num) / float(den)).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
        else:
            twap = None
        out.append((
            key[0], pd.to_datetime(key[1], unit="us", utc=True), twap, den, n,
        ))
        state.update((last_us, last_val, n, closed_dt, str(num), end_us))
    yield pd.DataFrame(
        out,
        columns=["event_type", "bar_start", "twap", "held_us", "n_obs"],
    )


def start_twap_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "twap_bars",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming TWAP per (event_type, hour) -> in-memory table
    `query_name` (update mode). State per bar is five scalars + one
    decimal string — O(1) per (key, bar) regardless of tick volume, and
    bars stop receiving state once event time moves past them (a
    production variant would add event-time TTL to drop closed bars).
    Same ordered-input contract as the other twins."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    bar = F.date_trunc("hour", "ts")
    out = (
        events_stream.select(
            "event_type",
            "event_id",
            "value",
            F.unix_micros(bar).alias("bar_us"),
            F.unix_micros("ts").alias("us"),
            F.unix_micros(bar + F.expr("INTERVAL 1 HOUR")).alias("end_us"),
        )
        .groupBy("event_type", "bar_us")
        .applyInPandasWithState(
            _twap_updater,
            outputStructType=TWAP_STREAM_SCHEMA,
            stateStructType=(
                "last_us long, last_val double, n long, closed_dt long, "
                "num_str string, end_us long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming OHLC + VWAP bars (round 11) — the other two canonical tick bars,
# run incrementally per (key, bar). Unlike the islands/TWAP twins these are
# ORDER-INDEPENDENT: open/close track the min/max (ts, id) composite key in
# state and high/low/sums are commutative monoids, so batches may arrive in
# any order and the final emission still equals the batch operator
# (rel.ohlc_bars / rel.vwap_bars) bit-for-bit — decimal sums use the same
# HALF_UP quantization mirror as the TWAP twin.
# ---------------------------------------------------------------------------

OHLC_STREAM_SCHEMA = (
    "series string, bar_start timestamp, open double, high double, "
    "low double, close double, volume double, n_ticks long"
)


def _ohlc_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import decimal

    if state.exists:
        (o_us, o_id, o_val, c_us, c_id, c_val,
         high, low, vol_str, n) = state.get
        vol = decimal.Decimal(vol_str)
    else:
        o_us = o_id = c_us = c_id = None
        o_val = c_val = high = low = 0.0
        vol = decimal.Decimal(0)
        n = 0

    for pdf in pdfs:
        for us, eid, val in zip(pdf["us"], pdf["event_id"], pdf["value"]):
            us, eid, val = int(us), int(eid), float(val)
            if o_us is None or (us, eid) < (o_us, o_id):
                o_us, o_id, o_val = us, eid, val
            if c_us is None or (us, eid) > (c_us, c_id):
                c_us, c_id, c_val = us, eid, val
            if n == 0 or val > high:
                high = val
            if n == 0 or val < low:
                low = val
            vol += _twap_dec6(val)  # dsum mirror: per-value DECIMAL(38,6)
            n += 1

    out = []
    if n:
        out.append((
            key[0], pd.to_datetime(key[1], unit="us", utc=True),
            o_val, high, low, c_val, float(vol), n,
        ))
        state.update((o_us, o_id, o_val, c_us, c_id, c_val,
                      high, low, str(vol), n))
    yield pd.DataFrame(
        out,
        columns=["series", "bar_start", "open", "high", "low", "close",
                 "volume", "n_ticks"],
    )


def start_ohlc_stream(
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "ohlc_bars",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming OHLC per (event_type, hour) -> in-memory table
    `query_name` (update mode). State per bar is ten scalars — O(1)
    per (key, bar) at any tick volume; every emission equals
    rel.ohlc_bars over the data seen so far, in ANY arrival order."""
    if state_store is not None:
        configure_state_store(events_stream.sparkSession, state_store)
    out = (
        events_stream.select(
            "event_type",
            "event_id",
            "value",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("bar_us"),
            F.unix_micros("ts").alias("us"),
        )
        .groupBy("event_type", "bar_us")
        .applyInPandasWithState(
            _ohlc_updater,
            outputStructType=OHLC_STREAM_SCHEMA,
            stateStructType=(
                "o_us long, o_id long, o_val double, c_us long, c_id long, "
                "c_val double, high double, low double, vol_str string, "
                "n long"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


VWAP_STREAM_SCHEMA = (
    "key string, bar_start timestamp, vwap double, volume double, "
    "n_trades long"
)


def _vwap_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import decimal

    if state.exists:
        num_str, den_str, n = state.get
        num, den = decimal.Decimal(num_str), decimal.Decimal(den_str)
    else:
        num, den, n = decimal.Decimal(0), decimal.Decimal(0), 0

    for pdf in pdfs:
        for price, qty in zip(pdf["price"], pdf["qty"]):
            # batch mirror: (price*qty) and qty each CAST to DECIMAL(38,6)
            num += _twap_dec6(float(price) * float(qty))
            den += _twap_dec6(float(qty))
            n += 1

    out = []
    if n:
        if den > 0:
            vwap = float(
                decimal.Decimal(float(num) / float(den)).quantize(
                    decimal.Decimal("0.000001"),
                    rounding=decimal.ROUND_HALF_UP,
                )
            )
        else:
            vwap = None
        out.append((key[0], pd.to_datetime(key[1], unit="us", utc=True),
                    vwap, float(den), n))
        state.update((str(num), str(den), n))
    yield pd.DataFrame(
        out, columns=["key", "bar_start", "vwap", "volume", "n_trades"],
    )


def start_vwap_stream(
    trades_stream: DataFrame,
    checkpoint: str,
    query_name: str = "vwap_bars",
    key_col: str = "event_type",
    ts_col: str = "ts",
    price_col: str = "value",
    qty_col: str = "qty",
    bar: str = "hour",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming VWAP per (key, bar) -> in-memory table `query_name`
    (update mode). State per bar is two decimal strings + a count —
    O(1) per (key, bar); order-independent (commutative sums), every
    emission equals rel.vwap_bars over the data seen so far."""
    if state_store is not None:
        configure_state_store(trades_stream.sparkSession, state_store)
    out = (
        trades_stream.select(
            F.col(key_col).alias("key"),
            F.col(price_col).alias("price"),
            F.col(qty_col).alias("qty"),
            F.unix_micros(F.date_trunc(bar, ts_col)).alias("bar_us"),
        )
        .groupBy("key", "bar_us")
        .applyInPandasWithState(
            _vwap_updater,
            outputStructType=VWAP_STREAM_SCHEMA,
            stateStructType="num_str string, den_str string, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming point-in-time (as-of) join (round 12, VERDICT r11 #6) — the
# temporal-join family's stream==batch twin; the domain's hot path (tick
# enrichment: attach the latest quote at-or-before each tick). One keyed
# stream carries BOTH sides (side 0 = build/quotes, side 1 = probe/ticks),
# which is how a stream-stream as-of fits applyInPandasWithState's single
# grouped stream. State is the last-seen build row per key — two scalars,
# O(1) regardless of tick volume. Every probe emission equals
# asof.asof_join (direction="backward") over the prefix seen so far,
# under the same per-key time-ordered-across-batches contract as the
# islands/TWAP twins (within a micro-batch any order: rows sort on
# (ts, side, row_id), build side first at equal timestamps — exactly the
# batch operator's at-or-before tie rule).
# ---------------------------------------------------------------------------

ASOF_STREAM_SCHEMA = (
    "key string, ts timestamp, row_id long, value_asof double, "
    "ts_asof timestamp"
)


def _asof_updater(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rt = rv = None
    if state.exists:
        rt, rv = state.get
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["us", "side", "row_id"], kind="mergesort")
    out = []
    for us, side, rid, val in zip(
        rows["us"], rows["side"], rows["row_id"], rows["value"]
    ):
        us, side = int(us), int(side)
        if side == 0:  # build side: advance the last-value state
            rt, rv = us, float(val)
        else:  # probe side: emit the carried build row (nulls if none yet)
            out.append((
                key[0],
                pd.to_datetime(us, unit="us", utc=True),
                int(rid),
                rv,
                pd.to_datetime(rt, unit="us", utc=True)
                if rt is not None else pd.NaT,
            ))
    if rt is not None:
        state.update((rt, rv))
    yield pd.DataFrame(
        out, columns=["key", "ts", "row_id", "value_asof", "ts_asof"]
    )


def start_asof_join_stream(
    pair_stream: DataFrame,
    checkpoint: str,
    query_name: str = "asof_join",
    key_col: str = "key",
    side_col: str = "side",
    ts_col: str = "ts",
    id_col: str = "row_id",
    value_col: str = "value",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming backward as-of join -> in-memory table `query_name`
    (update mode; each probe row is emitted exactly once). Input is the
    tagged union of both sides: side 0 rows carry the build stream's
    (ts, value), side 1 rows are probes. Emissions equal
    asof.asof_join(left, right, by=[key], value_cols=[value, ts]) on the
    prefix seen so far — pinned by the twin test on mid-stream batch
    splits and cross-batch state carry."""
    if state_store is not None:
        configure_state_store(pair_stream.sparkSession, state_store)
    out = (
        pair_stream.select(
            F.col(key_col).alias("key"),
            F.col(side_col).alias("side"),
            F.col(id_col).alias("row_id"),
            F.col(value_col).alias("value"),
            F.unix_micros(ts_col).alias("us"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _asof_updater,
            outputStructType=ASOF_STREAM_SCHEMA,
            stateStructType="rt long, rv double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming k-anonymity / l-diversity audit — twin #20, the live form of
# contract.k_anonymity_audit. A privacy gate on a GROWING dataset cannot
# re-scan the corpus per micro-batch; the audit state per QI class is
# (row count, the distinct sensitive-value set) — bounded by the
# sensitive DOMAIN (bands/categories, small by construction of any
# sensible sensitive bucketing), not by row count. Update mode: the last
# emission per class is the audit of the full prefix, pinned equal to
# the batch operator in tests (including an l_ok flip that only a
# cross-batch distinct-set carry can produce).
# ---------------------------------------------------------------------------

KANON_SCHEMA = (
    "qi string, class_size long, n_sensitive long, k_ok boolean, "
    "l_ok boolean"
)


def _kanon_updater(k: int, l: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, seen = state.get
            sset = set(seen)
        else:
            n, sset = 0, set()
        for pdf in pdfs:
            n += len(pdf)
            sset.update(int(v) for v in pdf["sens"])
        state.update((n, sorted(sset)))
        yield pd.DataFrame(
            {
                "qi": [key[0]],
                "class_size": [n],
                "n_sensitive": [len(sset)],
                "k_ok": [n >= k],
                "l_ok": [len(sset) >= l],
            }
        )

    return update


def start_k_anonymity_stream(
    rows_stream: DataFrame,
    checkpoint: str,
    k: int = 3,
    l: int = 2,
    query_name: str = "kanon",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming k-anonymity + distinct-l-diversity audit -> in-memory
    table `query_name`. Input contract: (qi string, sens long) — the
    caller pre-concatenates multi-column quasi-identifiers and
    pre-bands the sensitive column, exactly as the batch operator's
    caller does. Emissions are per-class snapshots; the final one per
    class equals contract.k_anonymity_audit over everything seen."""
    if state_store is not None:
        configure_state_store(rows_stream.sparkSession, state_store)
    out = (
        rows_stream.select("qi", "sens")
        .groupBy("qi")
        .applyInPandasWithState(
            _kanon_updater(k, l),
            outputStructType=KANON_SCHEMA,
            stateStructType="n long, seen array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming reservoir sample — twin #21, the live form of
# relational.sample_reservoir. The batch operator's "reservoir" is
# deterministic bottom-k by a seeded multiplicative id hash (no RNG
# state), which makes the streaming form EXACTLY mergeable: keep the k
# smallest (hash, id) pairs per group across micro-batches and the
# sample over any prefix equals the batch operator over that prefix —
# the fixed-size dataset-card sample computed on a live feed without
# ever re-reading history. State per group is <= k pairs of longs.
# ---------------------------------------------------------------------------

RESERVOIR_SCHEMA = "grp string, doc_id long, sample_rank int, n_seen long"


def _reservoir_updater(k: int, seed: int):
    def h(i: int) -> int:
        # replicates sample_reservoir's column expression exactly:
        # pmod(pmod(id + seed, 2^31) * KNUTH, 2^32)
        return ((int(i) + seed) % (2 ** 31)) * 2654435761 % (2 ** 32)

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, hs, ids = state.get
            res = list(zip(hs, ids))
        else:
            n, res = 0, []
        for pdf in pdfs:
            n += len(pdf)
            res.extend((h(i), int(i)) for i in pdf["doc_id"])
        res = sorted(res)[:k]
        state.update(
            (n, [int(a) for a, _ in res], [int(b) for _, b in res])
        )
        yield pd.DataFrame(
            {
                "grp": key[0],
                "doc_id": [i for _, i in res],
                "sample_rank": list(range(1, len(res) + 1)),
                "n_seen": n,
            }
        )

    return update


def start_reservoir_sample_stream(
    rows_stream: DataFrame,
    checkpoint: str,
    k: int = 5,
    seed: int = 42,
    query_name: str = "reservoir",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming per-group fixed-size sample -> in-memory table
    `query_name`. Input contract: (grp string, doc_id long). Each batch
    emits the group's CURRENT sample (rank order = the batch operator's
    (hash, id) order); the final emission per group equals
    relational.sample_reservoir over everything seen — including
    late-arriving ids that displace earlier winners, which only the
    carried bottom-k state can reproduce."""
    if state_store is not None:
        configure_state_store(rows_stream.sparkSession, state_store)
    out = (
        rows_stream.select("grp", "doc_id")
        .groupBy("grp")
        .applyInPandasWithState(
            _reservoir_updater(k, seed),
            outputStructType=RESERVOIR_SCHEMA,
            stateStructType="n long, hs array<long>, ids array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming exact dedup — twin #22, the live form of dedup.exact_dedup's
# winner selection: a crawl feed where only the FIRST arrival of each
# normalized fingerprint survives, with the seen-set carried across
# micro-batches (the reference's dedup anti-join shape, DataLoader.java's
# duplicate-file guard, applied to content fingerprints on a stream).
# State shards by a fingerprint prefix so no single group holds the
# whole seen-set; at 100 TB the state store IS the fingerprint index —
# the same contract as sources/minhash_index.py's persisted form, kept
# exact here. Emission contract: first ARRIVAL wins; when ids arrive in
# ascending order this equals the batch operator's min-id winner on any
# prefix (pinned in tests), the standard keyed-recursion ordering
# contract the other twins document.
# ---------------------------------------------------------------------------

DEDUP_STREAM_SCHEMA = "doc_id long, fingerprint string"


def _exact_dedup_updater():
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        out_ids, out_fps = [], []
        for did, fp in zip(pdf["doc_id"], pdf["fingerprint"]):
            if fp in seen:
                continue
            seen.add(fp)
            out_ids.append(int(did))
            out_fps.append(fp)
        state.update((sorted(seen),))
        yield pd.DataFrame(
            {"doc_id": pd.Series(out_ids, dtype="int64"),
             "fingerprint": pd.Series(out_fps, dtype="object")}
        )

    return update


def start_exact_dedup_stream(
    docs_stream: DataFrame,
    checkpoint: str,
    query_name: str = "dedup",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming first-occurrence exact dedup -> in-memory table
    `query_name`. Input contract: (doc_id long, text string); the
    fingerprint (md5 of whitespace-normalized lowercase text — the
    batch operator's exact rule) is computed JVM-side before the
    stateful stage, and state shards on the fingerprint's first two hex
    chars (256 groups)."""
    from ..operators.dedup import normalized_fingerprint

    if state_store is not None:
        configure_state_store(docs_stream.sparkSession, state_store)
    fp = normalized_fingerprint(F.col("text"))
    keyed = docs_stream.select(
        F.col("doc_id"),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 2).alias("shard"),
    )
    out = keyed.groupBy("shard").applyInPandasWithState(
        _exact_dedup_updater(),
        outputStructType=DEDUP_STREAM_SCHEMA,
        stateStructType="seen array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming token-budget fill — twin #23, the live form of
# training.token_budget_fill: a corpus feed where each group (source)
# fills a fixed token budget and everything after the fill line drops.
# State per group is ONE long (the running total); a document is kept
# iff the total BEFORE it is still under budget — the batch operator's
# exact rule, so with ids arriving in ascending order (the keyed-
# recursion contract the other twins document) emissions equal the
# batch fill on any prefix, including a budget line crossed mid-batch
# off state accumulated in earlier batches.
# ---------------------------------------------------------------------------

BUDGET_SCHEMA = (
    "source string, doc_id long, n_tokens long, cum_before long, "
    "kept boolean"
)


def _budget_updater(budget: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        befores, kepts = [], []
        for n in pdf["n_tokens"]:
            befores.append(total)
            kepts.append(total < budget)
            if total < budget:
                total += int(n)
        state.update((total,))
        yield pd.DataFrame(
            {
                "source": key[0],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "cum_before": befores,
                "kept": kepts,
            }
        )

    return update


def start_token_budget_stream(
    docs_stream: DataFrame,
    checkpoint: str,
    budget: int,
    query_name: str = "budget",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming per-source budget fill -> in-memory table `query_name`.
    Input contract: (source string, doc_id long, n_tokens long), ids
    ascending across batches. Kept docs mirror
    training.token_budget_fill(order_col=None); dropped docs emit
    kept=false (the stream variant reports them — a live feed wants the
    overflow visible, the batch operator's cum_before audit column
    generalized)."""
    if state_store is not None:
        configure_state_store(docs_stream.sparkSession, state_store)
    out = (
        docs_stream.select("source", "doc_id", "n_tokens")
        .groupBy("source")
        .applyInPandasWithState(
            _budget_updater(int(budget)),
            outputStructType=BUDGET_SCHEMA,
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming WebDataset sample assembly — twin #24, the live form of
# sources/tar_blobs.group_tar_samples: member rows arrive in ANY order
# across micro-batches (a shard reader emits them as it walks archives),
# and a sample emits exactly once — when its member count reaches the
# pipeline's per-sample modality count — off state carried across
# batches. State per (shard, sample) holds (ext, n_bytes, content md5)
# triples, never payload bytes: at 100 TB the assembled sample carries
# content POINTERS and the downstream decode re-reads the blob store;
# the md5 stands in for the pointer here so the twin stays value-exact
# against the batch flatten. Members order by (ext, n_bytes, md5) on
# BOTH sides — group_tar_samples' array_sort key is exactly this triple
# (ADVICE r14: a raw-content third key would diverge from state, which
# never sees payload bytes) — so ties on (ext, size) with different
# content still flatten identically. A sample emits only when its
# member count EXACTLY reaches the modality count; overshoot declines
# (see the updater).
# ---------------------------------------------------------------------------

SAMPLE_STREAM_SCHEMA = (
    "shard_id long, sample_key string, n_members int, total_bytes long, "
    "exts string, content_md5 string"
)


def _sample_assembly_updater(n_expected: int):
    import hashlib

    def empty():
        return pd.DataFrame({
            "shard_id": pd.Series([], dtype="int64"),
            "sample_key": pd.Series([], dtype="object"),
            "n_members": pd.Series([], dtype="int32"),
            "total_bytes": pd.Series([], dtype="int64"),
            "exts": pd.Series([], dtype="object"),
            "content_md5": pd.Series([], dtype="object"),
        })

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists and int(state.get[3]) != 0:
            # TOMBSTONED (ADVICE r15 / VERDICT r15 low #1): this
            # (shard, sample) already EMITTED (1) or DECLINED (2).
            # Late/duplicate members must never restart accumulation —
            # a fresh partial could later reach exactly n_expected and
            # emit a plausible-but-wrong subset sample that matches no
            # batch-side group. The tombstone is a 4th state field, not
            # state.remove(), precisely so re-arrival finds it. It
            # persists for the stream's lifetime; a production
            # deployment evicts via GroupStateTimeout once the shard
            # reader is known to have passed the sample.
            yield empty()
            return
        exts, sizes, hashes = (
            (list(state.get[0]), list(state.get[1]), list(state.get[2]))
            if state.exists else ([], [], [])
        )
        pdf = pd.concat(list(pdfs))
        for e, nb, hx in zip(pdf["ext"], pdf["n_bytes"], pdf["content_md5"]):
            exts.append(str(e))
            sizes.append(int(nb))
            hashes.append(str(hx))
        if len(exts) > n_expected:
            # Overshoot = malformed shard (duplicate member rows, or
            # more members than the pipeline's modality count). Folding
            # the extras in would emit a sample no batch-side group
            # matches (ADVICE r14) — DECLINE: keep a declined tombstone
            # (arrays emptied, state stays tiny) so members of the same
            # malformed sample arriving in LATER batches can never
            # re-assemble from empty into a subset sample. Mirrors
            # group_tar_samples' decline-never-misread contract.
            state.update(([], [], [], 2))
            yield empty()
        elif len(exts) == n_expected:
            order = sorted(range(len(exts)),
                           key=lambda i: (exts[i], sizes[i], hashes[i]))
            joined = "|".join(hashes[i] for i in order)
            yield pd.DataFrame({
                "shard_id": pd.Series([int(key[0])], dtype="int64"),
                "sample_key": [str(key[1])],
                "n_members": pd.Series([len(exts)], dtype="int32"),
                "total_bytes": pd.Series([sum(sizes)], dtype="int64"),
                "exts": [",".join(exts[i] for i in order)],
                "content_md5": [hashlib.md5(joined.encode()).hexdigest()],
            })
            # Emitted tombstone: a late duplicate member must not
            # re-create state and eventually emit a second, bogus
            # sample for the same key (ADVICE r15).
            state.update(([], [], [], 1))
        else:
            state.update((exts, sizes, hashes, 0))
            yield empty()

    return update


def start_sample_assembly_stream(
    members_stream: DataFrame,
    checkpoint: str,
    n_expected: int,
    query_name: str = "samples",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming WebDataset sample assembly -> in-memory table
    `query_name`. Input contract: (shard_id long, sample_key string,
    ext string, n_bytes int, content_md5 string) — one row per tar
    member, arriving in any order across batches; every sample carries
    exactly `n_expected` members (the pipeline's modality count). A
    sample emits once, on completion; partial samples persist in state
    across batches and die with the stream (a production deployment
    would add a GroupStateTimeout eviction for orphans)."""
    if state_store is not None:
        configure_state_store(members_stream.sparkSession, state_store)
    out = (
        members_stream.select(
            "shard_id", "sample_key", "ext", "n_bytes", "content_md5"
        )
        .groupBy("shard_id", "sample_key")
        .applyInPandasWithState(
            _sample_assembly_updater(int(n_expected)),
            outputStructType=SAMPLE_STREAM_SCHEMA,
            stateStructType=(
                "exts array<string>, sizes array<int>, "
                "hashes array<string>, done int"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming sequence-packing assignment — twin #25, the live form of
# training.pack_sequences' sharded bin formula: docs arrive id-ascending
# across micro-batches (the same arrival contract as the budget twin),
# each id-range shard carries ONE running token total in state, and the
# emitted bin ids are the batch operator's shard*2^32 + cum DIV budget
# EXACTLY — so a live packing feed and a batch re-pack of the same
# corpus agree bit-for-bit. This is the write-ahead half of the
# WebDataset shard writer: the assignment is derivable from carried
# state alone, no global sort, no look-back.
# ---------------------------------------------------------------------------

PACK_STREAM_SCHEMA = (
    "doc_id long, n_tokens long, bin_id long, bin_offset long"
)


def _pack_assign_updater(budget: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        shard = int(key[0])
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        bins, offs = [], []
        for n in pdf["n_tokens"]:
            bins.append(shard * (1 << 32) + cum // budget)
            offs.append(cum % budget)
            cum += int(n)
        state.update((cum,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "bin_id": pd.Series(bins, dtype="int64"),
                "bin_offset": pd.Series(offs, dtype="int64"),
            }
        )

    return update


def start_pack_assignment_stream(
    docs_stream: DataFrame,
    checkpoint: str,
    budget: int,
    shard_docs: int = 1 << 20,
    query_name: str = "packing",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming sequence-packing assignment -> in-memory table
    `query_name`. Input contract: (doc_id long, n_tokens long), ids
    ascending across batches (a shard writer consumes an ordered feed).
    Groups by the id-range shard (doc_id DIV shard_docs) — the SAME
    partition key as batch pack_sequences — so each shard's running
    token total is one long in state and the emitted (bin_id,
    bin_offset) equal training.pack_sequences(budget, shard_docs=...)
    on the full corpus, including across a shard boundary mid-stream."""
    if state_store is not None:
        configure_state_store(docs_stream.sparkSession, state_store)
    # Exact integer quotient (`div`) — same arithmetic as batch
    # pack_sequences' shard key after the ADVICE-r15 fix; float-rounded
    # division could split a shard near 2^53-scale ids.
    shard = F.expr(f"cast(doc_id as bigint) div {int(shard_docs)}")
    out = (
        docs_stream.select(shard.alias("_shard"), "doc_id", "n_tokens")
        .groupBy("_shard")
        .applyInPandasWithState(
            _pack_assign_updater(int(budget)),
            outputStructType=PACK_STREAM_SCHEMA,
            stateStructType="cum long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming WebDataset shard WRITER — twin #26 (round 16, VERDICT r15
# #4): the live form of webdataset_write_pipeline's shard assignment.
# Docs arrive id-ascending across micro-batches, each doc carrying its
# member rows (doc-atomic batches — a sample never splits across
# shards, so it never splits across a state update either); each
# id-range shard carries ONE running BYTE total in state, and every
# member row is emitted with the byte-budgeted shard id equal to batch
# `pack_sequences(budget, tokens_col=bytes)` joined back to the member
# relation — bit-for-bit, including a shard straddling two
# micro-batches and an id-range boundary mid-stream. This is the
# writer's manifest: downstream, `encode_tar_shards` groups by exactly
# this shard id, so a live feed and a batch re-pack of the same corpus
# produce byte-identical archives.
# ---------------------------------------------------------------------------

WRITER_STREAM_SCHEMA = (
    "doc_id long, member_name string, n_bytes int, shard_id long"
)


def _shard_writer_updater(budget: int):
    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        shard = int(key[0])
        pdf = pd.concat(list(pdfs)).sort_values(["doc_id", "member_name"])
        bins: list[int] = []
        # exact Python integer arithmetic — the same cum // budget the
        # batch operator computes via SQL div on longs
        for _, grp in pdf.groupby("doc_id", sort=True):
            b = shard * (1 << 32) + cum // budget
            bins.extend([b] * len(grp))
            cum += int(grp["n_bytes"].sum())
        state.update((cum,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "member_name": pdf["member_name"].to_numpy(),
                "n_bytes": pdf["n_bytes"].to_numpy(),
                "shard_id": pd.Series(bins, dtype="int64").to_numpy(),
            }
        )

    return update


def start_shard_writer_stream(
    members_stream: DataFrame,
    checkpoint: str,
    budget: int,
    shard_docs: int = 1 << 20,
    query_name: str = "shard_writer",
    available_now: bool = True,
    state_store: str | None = None,
) -> StreamingQuery:
    """Streaming WebDataset shard-writer assignment -> in-memory table
    `query_name`. Input contract: (doc_id long, member_name string,
    n_bytes int) — one row per member, docs id-ascending across
    batches, every doc's members WITHIN one micro-batch (the feed is
    doc-atomic; an assembler upstream — twin #24 — guarantees whole
    samples). Groups by the id-range shard (doc_id DIV shard_docs, the
    SAME exact-quotient key as batch pack_sequences) so the running
    byte total is one long in state; the emitted shard_id equals
    training.pack_sequences(budget, tokens_col=<doc byte total>) on the
    full corpus — the downstream tar packer shards a live feed exactly
    like a batch re-pack."""
    if state_store is not None:
        configure_state_store(members_stream.sparkSession, state_store)
    shard = F.expr(f"cast(doc_id as bigint) div {int(shard_docs)}")
    out = (
        members_stream.select(
            shard.alias("_shard"), "doc_id", "member_name", "n_bytes"
        )
        .groupBy("_shard")
        .applyInPandasWithState(
            _shard_writer_updater(int(budget)),
            outputStructType=WRITER_STREAM_SCHEMA,
            stateStructType="cum long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
