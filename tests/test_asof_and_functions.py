"""As-of join semantics vs a pandas merge_asof reference; scalar helpers."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators.asof import asof_join

TS = datetime.datetime


def test_asof_join_matches_pandas_merge_asof(spark):
    quotes = [
        ("A", TS(2024, 1, 1, 10, 0, 0), 100.0),
        ("A", TS(2024, 1, 1, 10, 0, 5), 101.0),
        ("A", TS(2024, 1, 1, 10, 0, 9), 99.5),
        ("B", TS(2024, 1, 1, 10, 0, 2), 50.0),
    ]
    trades = [
        (1, "A", TS(2024, 1, 1, 10, 0, 3)),   # -> 100.0
        (2, "A", TS(2024, 1, 1, 10, 0, 5)),   # tie -> 101.0 (<= semantics)
        (3, "A", TS(2024, 1, 1, 10, 0, 30)),  # -> 99.5
        (4, "B", TS(2024, 1, 1, 10, 0, 1)),   # before any quote -> null
        (5, "C", TS(2024, 1, 1, 10, 0, 1)),   # no quotes at all -> null
    ]
    l = spark.createDataFrame(trades, "trade_id long, sym string, ts timestamp")
    r = spark.createDataFrame(quotes, "sym string, ts timestamp, px double")
    out = asof_join(l, r, by=["sym"], left_time="ts", right_time="ts",
                    value_cols=["px"]).collect()
    got = {row["trade_id"]: row["px_asof"] for row in out}
    assert got == {1: 100.0, 2: 101.0, 3: 99.5, 4: None, 5: None}

    # cross-check the whole result against pandas merge_asof
    lp = pd.DataFrame(trades, columns=["trade_id", "sym", "ts"]).sort_values("ts")
    rp = pd.DataFrame(quotes, columns=["sym", "ts", "px"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="sym", direction="backward")
    exp_map = {int(t): (None if pd.isna(p) else p)
               for t, p in zip(exp["trade_id"], exp["px"])}
    assert got == exp_map


def test_asof_join_null_value_in_matched_row_not_skipped(spark):
    """Regression (review finding): a NULL value inside the matched right
    row must be returned as NULL — not skipped in favor of a stale older
    value (merge_asof/ASOF JOIN attach the row, nulls included)."""
    quotes = [("A", TS(2024, 1, 1, 10, 0, 0), 5.0),
              ("A", TS(2024, 1, 1, 10, 0, 2), None)]
    trades = [(1, "A", TS(2024, 1, 1, 10, 0, 3))]
    l = spark.createDataFrame(trades, "trade_id long, sym string, ts timestamp")
    r = spark.createDataFrame(quotes, "sym string, ts timestamp, px double")
    out = asof_join(l, r, ["sym"], "ts", "ts", ["px"]).collect()
    assert out[0]["px_asof"] is None  # matched row is t=2 whose px IS null


def test_asof_join_with_tolerance(spark):
    quotes = [("A", TS(2024, 1, 1, 10, 0, 0), 100.0)]
    trades = [(1, "A", TS(2024, 1, 1, 10, 0, 2)),    # 2s old -> match
              (2, "A", TS(2024, 1, 1, 10, 0, 30))]   # 30s old -> too stale
    l = spark.createDataFrame(trades, "trade_id long, sym string, ts timestamp")
    r = spark.createDataFrame(quotes, "sym string, ts timestamp, px double")
    out = {row["trade_id"]: row["px_asof"]
           for row in asof_join(l, r, ["sym"], "ts", "ts", ["px"],
                                tolerance_seconds=5).collect()}
    assert out == {1: 100.0, 2: None}

    lp = pd.DataFrame(trades, columns=["trade_id", "sym", "ts"]).sort_values("ts")
    rp = pd.DataFrame(quotes, columns=["sym", "ts", "px"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="sym", direction="backward",
                        tolerance=pd.Timedelta(seconds=5))
    exp_map = {int(t): (None if pd.isna(p) else p)
               for t, p in zip(exp["trade_id"], exp["px"])}
    assert out == exp_map


def test_scalar_helpers(spark):
    from crypto_data_service_loader_spark.functions.scalars import (
        filename_date, log_event_json, ticker_from_filename, to_tsv_line,
    )

    df = spark.createDataFrame(
        [("/data/2024-03-14/AVA-USDT_PST_2024-03-14",)], "path string"
    )
    row = df.select(
        filename_date(F.col("path")).alias("d"),
        ticker_from_filename(F.element_at(F.split("path", "/"), -1)).alias("t"),
        to_tsv_line(F.lit("f"), F.lit("2024-03-14"), F.lit("DISCOVERED")).alias("tsv"),
        log_event_json(F.lit("INFO"), F.lit("main"), F.lit("hello"),
                       F.create_map(F.lit("k"), F.lit("v"))).alias("j"),
    ).collect()[0]
    assert str(row["d"]) == "2024-03-14"
    assert row["t"] == "AVA-USDT"
    assert row["tsv"] == "f\t2024-03-14\tDISCOVERED"
    assert '"severity":"INFO"' in row["j"] and '"k":"v"' in row["j"]


def test_pandas_udf_mid_price(spark):
    from crypto_data_service_loader_spark.functions.scalars import mid_price

    df = spark.createDataFrame([(10.0, 12.0), (1.0, 2.0)], "bid double, ask double")
    out = [r["mid"] for r in df.select(mid_price("bid", "ask").alias("mid")).collect()]
    assert out == [11.0, 1.5]


def test_range_join_matches_naive_theta_join(spark):
    from crypto_data_service_loader_spark.operators import relational as rel
    from crypto_data_service_loader_spark.plans.explain import physical_plan
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, "2024-01-01 05:59:59"), (2, "2024-01-01 06:00:00"),
         (3, "2024-01-01 11:59:59"), (4, "2024-01-01 12:00:00"),
         (5, "2024-01-03 00:00:00")],
        "event_id long, ts string",
    ).select("event_id", F.to_timestamp("ts").alias("ts"))
    w = spark.createDataFrame(
        [(10, "2024-01-01 06:00:00", "2024-01-01 12:00:00"),
         (11, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
         (12, "2024-01-02 23:00:00", "2024-01-03 01:00:00")],
        "w_id int, s string, e string",
    ).select("w_id", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))

    got = sorted(
        (r["event_id"], r["w_id"])
        for r in rel.range_join(ev, w, "ts", "s", "e", bin_width_sec=3600).collect()
    )
    naive = sorted(
        (r["event_id"], r["w_id"])
        for r in ev.crossJoin(w)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    )
    # start inclusive / end exclusive at exact bin boundaries
    assert got == naive == [(1, 11), (2, 10), (3, 10), (5, 12)]
    plan = physical_plan(rel.range_join(ev, w, "ts", "s", "e"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_rejects_right_outer(spark):
    from crypto_data_service_loader_spark.operators import relational as rel
    from pyspark.sql import functions as F
    import pytest

    ev = spark.createDataFrame([(1, "2024-01-01 05:00:00")], "event_id long, ts string") \
        .select("event_id", F.to_timestamp("ts").alias("ts"))
    w = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")], "w_id int, s string, e string"
    ).select("w_id", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    with pytest.raises(ValueError, match="right/full outer"):
        rel.range_join(ev, w, "ts", "s", "e", how="right")
    # left-flavored joins remain supported
    assert rel.range_join(ev, w, "ts", "s", "e", how="left").count() == 1


def test_forward_fill_carries_last_observation(spark):
    from crypto_data_service_loader_spark.operators.asof import forward_fill
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 10.0), ("a", 3, None), ("a", 4, 20.0),
         ("a", 5, None), ("b", 1, None)],
        "k string, t int, v double",
    )
    out = {(r["k"], r["t"]): r["v_filled"]
           for r in forward_fill(df, "k", "t", "v").collect()}
    assert out[("a", 1)] is None          # before first observation
    assert out[("a", 3)] == 10.0          # carried forward
    assert out[("a", 4)] == 20.0          # new observation wins
    assert out[("a", 5)] == 20.0
    assert out[("b", 1)] is None          # fills never cross keys


def test_asof_nearest_ties_prefer_backward(spark):
    from crypto_data_service_loader_spark.operators.asof import asof_join
    from pyspark.sql import functions as F
    import pandas as pd

    l = spark.createDataFrame([(1, 1, 10)], "trade_id long, k int, t long") \
        .select("trade_id", "k", F.timestamp_seconds("t").alias("ts"))
    # quotes equidistant at t-2 and t+2
    r = spark.createDataFrame([(1, 8, 100.0), (1, 12, 200.0)], "k int, t long, px double") \
        .select("k", F.timestamp_seconds("t").alias("ts"), "px")
    got = asof_join(l, r, ["k"], "ts", "ts", ["px"], direction="nearest").collect()
    assert got[0]["px_asof"] == 100.0  # tie -> backward, pandas parity
    exp = pd.merge_asof(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime([10], unit="s")}),
        pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime([8, 12], unit="s"),
                      "px": [100.0, 200.0]}),
        on="ts", by="k", direction="nearest",
    )
    assert exp["px"][0] == 100.0


def test_funnel_ordering_semantics(spark):
    """Stage k+1 counts only strictly AFTER the first stage-k event: a
    click before the first view must not advance the funnel."""
    from datetime import datetime

    from crypto_data_service_loader_spark.operators import relational as rel

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: click BEFORE first view -> stuck at stage 1
        (2, "click", t(1)), (2, "view", t(2)), (2, "purchase", t(3)),
        # wait - purchase after view but no click after view: still stage 1
        # user 3: view then click, purchase before click -> stage 2
        (3, "purchase", t(1)), (3, "view", t(2)), (3, "click", t(3)),
        # user 4: no funnel events at all
        (4, "error", t(1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["user_id"]: r for r in rel.funnel(ev).collect()}
    assert out[1]["funnel_stage"] == 3
    assert out[2]["funnel_stage"] == 1 and not out[2]["reached_click"]
    assert out[3]["funnel_stage"] == 2 and not out[3]["reached_purchase"]
    assert out[4]["funnel_stage"] == 0


def test_retention_cohorts_reconciles(spark, sf_dir):
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import relational as rel
    from crypto_data_service_loader_spark.tables import load

    ev = load(spark, sf_dir, "events")
    out = rel.retention_cohorts(ev)
    day0 = out.filter(F.col("day_offset") == 0)
    # every user appears in their own cohort's day-0 cell
    assert day0.agg(F.sum("n_users")).collect()[0][0] == ev.select("user_id").distinct().count()
    assert out.filter(F.col("day_offset") < 0).count() == 0


def test_win_ewma_semantics(spark, monkeypatch, tmp_path):
    """Constant series -> EWMA equals the constant; a step change moves
    the EWMA strictly toward the new level, most-recent value weighted
    highest (half-life weights)."""
    from datetime import datetime

    import crypto_data_service_loader_spark.suite as suite

    rows = [
        (i, datetime(2024, 1, 1, 0, i), 1, "click", 10.0 if i < 5 else 20.0, "{}")
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    # post-split: q_win_ewma lives in suites.relational_ext, which
    # binds load from suites.shared — patch where it is LOOKED UP
    from crypto_data_service_loader_spark.suites import relational_ext

    monkeypatch.setattr(relational_ext, "load", lambda s, d, t: ev)
    out = {r["event_id"]: r["ewma"] for r in suite.q_win_ewma(spark, "unused").collect()}
    assert out[0] == 10.0 and out[4] == 10.0           # constant prefix
    assert 10.0 < out[5] < 20.0                         # step begins
    assert out[5] > 14.9                                # newest dominates (w=1/2)
    assert out[9] > out[5]                              # converging to 20
