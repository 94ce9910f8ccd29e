"""Semantics for the time-series monitoring trio: ACF, EWMA control
chart, seasonal decomposition — constructed series with known answers,
warm-up/degenerate behavior, and the additive identity."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import profile

T0 = datetime(2024, 1, 1)


def _series(spark, values, key="k"):
    rows = [(key, T0 + timedelta(hours=i), i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, ts timestamp, i long, v double")


# --------------------------------------------------------------------------
# ACF
# --------------------------------------------------------------------------


def test_acf_alternating_series(spark):
    """+1/-1 alternation: lag-1 autocorrelation is exactly -1, lag-2 +1."""
    df = _series(spark, [1, -1] * 20)
    got = {r["lag"]: r for r in profile.acf(df, "k", ["ts", "i"], "v", 2).collect()}
    assert abs(got[1]["acf"] - (-1.0)) < 1e-9
    assert abs(got[2]["acf"] - 1.0) < 1e-9
    assert got[1]["n_pairs"] == 39 and got[2]["n_pairs"] == 38


def test_acf_constant_series_is_null(spark):
    df = _series(spark, [5.0] * 10)
    rows = profile.acf(df, "k", ["ts", "i"], "v", 2).collect()
    assert rows and all(r["acf"] is None for r in rows)


def test_acf_short_series_has_no_pairs(spark):
    df = _series(spark, [1.0])
    assert profile.acf(df, "k", ["ts", "i"], "v", 3).count() == 0


# --------------------------------------------------------------------------
# EWMA control chart
# --------------------------------------------------------------------------


def test_control_chart_flags_spike_only(spark):
    vals = [10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 9.0, 10.0, 11.0,
            10.0, 9.0, 500.0, 10.0, 11.0, 10.0]
    df = _series(spark, vals)
    out = profile.ewma_control_chart(
        df, "k", ["ts", "i"], "v", window=50, n_sigma=3.0, min_periods=4
    ).orderBy("i").collect()
    alerts = [r["i"] for r in out if r["is_alert"]]
    assert 12 in alerts  # the spike
    assert all(a == 12 for a in alerts), alerts


def test_control_chart_warmup_rows(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    out = profile.ewma_control_chart(
        df, "k", ["ts", "i"], "v", min_periods=4
    ).orderBy("i").collect()
    for r in out[:4]:
        assert r["ewma_pred"] is None and r["is_alert"] is False
    for r in out[4:]:
        assert r["ewma_pred"] is not None


def test_control_chart_constant_series_never_alerts(spark):
    df = _series(spark, [7.0] * 20)
    out = profile.ewma_control_chart(df, "k", ["ts", "i"], "v", min_periods=2).collect()
    assert all(not r["is_alert"] for r in out)


def test_control_chart_prediction_is_halving_fold(spark):
    """With min_periods=1 the prediction for row i is the normalized
    halving fold over the prior rows: check row 2 of [a, b, .]:
    pred = (a/2 + b) / (1/2 + 1)."""
    df = _series(spark, [4.0, 8.0, 0.0])
    out = {
        r["i"]: r
        for r in profile.ewma_control_chart(
            df, "k", ["ts", "i"], "v", min_periods=1
        ).collect()
    }
    expected = (4.0 / 2 + 8.0) / (1.0 / 2 + 1.0)
    assert abs(out[2]["ewma_pred"] - expected) < 1e-12


# --------------------------------------------------------------------------
# seasonal decomposition
# --------------------------------------------------------------------------


def _daily(spark, day_values, n_weeks=4):
    """One row per day; value = day_values[day % 7] (pure weekly shape)."""
    rows = []
    for d in range(7 * n_weeks):
        ts = T0 + timedelta(days=d)
        rows.append(("k", ts, float(day_values[d % 7])))
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_seasonal_pure_weekly_shape_has_zero_residual(spark):
    df = _daily(spark, [10, 20, 30, 40, 50, 60, 70])
    out = profile.seasonal_decompose(df, "k", "ts", "v", period=7).collect()
    assert all(abs(r["residual"]) < 1e-9 for r in out)
    # key mean is the overall mean
    assert all(abs(r["key_mean"] - 40.0) < 1e-9 for r in out)
    # seasonal components sum to ~0 across the 7 buckets
    by_bucket = {r["season_bucket"]: r["seasonal"] for r in out}
    assert len(by_bucket) == 7
    assert abs(sum(by_bucket.values())) < 1e-9


def test_seasonal_additive_identity(spark, sf_dir):
    from crypto_data_service_loader_spark.tables import load

    ev = load(spark, sf_dir, "events")
    out = profile.seasonal_decompose(ev, "event_type", "ts", "value").limit(200).collect()
    for r in out:
        assert abs(r["value"] - (r["key_mean"] + r["seasonal"] + r["residual"])) < 1e-6


def test_seasonal_bucket_is_epoch_stable(spark):
    """Bucket depends only on the epoch day — the same wall-clock day
    always lands in the same bucket regardless of row order/partitioning."""
    df = _daily(spark, [1, 2, 3, 4, 5, 6, 7], n_weeks=2)
    out = profile.seasonal_decompose(df.repartition(7), "k", "ts", "v").collect()
    seen = {}
    for r in out:
        day = (r["ts"] - T0).days % 7
        seen.setdefault(day, set()).add(r["season_bucket"])
    assert all(len(v) == 1 for v in seen.values())
