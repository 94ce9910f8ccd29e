"""Profiling operators: single-pass column profile and fixed-width
histogram (charter EXT — dataset-card / data-quality layer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import profile


def test_profile_columns_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 10), (3, "b", None), (4, "a", 30)],
        "id long, tag string, v long",
    )
    rows = {r["column"]: r for r in profile.profile_columns(df).collect()}
    assert set(rows) == {"id", "tag", "v"}
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert rows["tag"]["n_nulls"] == 1 and rows["v"]["n_nulls"] == 1
    # distinct excludes nulls (count-distinct semantics on both engines)
    assert rows["tag"]["n_distinct"] == 2
    assert rows["v"]["n_distinct"] == 2
    assert (rows["id"]["min_value"], rows["id"]["max_value"]) == ("1", "4")
    assert (rows["tag"]["min_value"], rows["tag"]["max_value"]) == ("a", "b")


def test_profile_columns_single_scan_and_approx_mode(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("m")
    )
    prof = profile.profile_columns(df, columns=["id", "m"])
    # one aggregation job over one scan: exactly one FileScan/Range source
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 1000") == 1
    # approx mode keeps the plan Expand-free (no exact-distinct blowup)
    approx = profile.profile_columns(
        df, columns=["id", "m"], exact_distinct=False
    )
    aplan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in aplan
    got = {r["column"]: r for r in approx.collect()}
    # HLL estimate lands near the exact counts at this cardinality
    assert abs(got["id"]["n_distinct"] - 1000) < 60
    assert got["m"]["n_distinct"] == 13  # tiny cardinality: exact


def test_numeric_histogram_bins_and_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (49.999,), (50.0,), (499.999,), (500.0,),
         (1000.0,), (None,)],
        "value double",
    )
    out = {r["bin_id"]: r for r in
           profile.numeric_histogram(df, "value", 0.0, 500.0, 10).collect()}
    assert out[-1]["n_rows"] == 1            # underflow
    assert out[0]["n_rows"] == 2             # [0, 50): 0.0 and 49.999
    assert out[1]["n_rows"] == 1             # [50, 100)
    assert out[9]["n_rows"] == 1             # [450, 500)
    assert out[10]["n_rows"] == 2            # overflow: 500.0 and 1000.0
    assert sum(r["n_rows"] for r in out.values()) == 7  # null dropped
    assert (out[0]["bin_lo"], out[0]["bin_hi"]) == (0.0, 50.0)
    assert (out[9]["bin_lo"], out[9]["bin_hi"]) == (450.0, 500.0)


def test_numeric_histogram_rejects_bad_dials(spark):
    import pytest

    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError):
        profile.numeric_histogram(df, "value", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        profile.numeric_histogram(df, "value", 10.0, 10.0, 4)


def test_agg_median_exact_interpolation(spark):
    """percentile() must interpolate exactly: median of [1,2,3,4] is 2.5,
    p25 is 1.75 (pos = p * (n-1))."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)], "g string, v double"
    )
    r = df.groupBy("g").agg(
        F.percentile("v", F.lit(0.25)).alias("p25"),
        F.percentile("v", F.lit(0.5)).alias("med"),
    ).collect()[0]
    assert (r["p25"], r["med"]) == (1.75, 2.5)


def test_exact_quantiles_matches_builtin_percentile(spark):
    """The frequency-table quantile must equal Spark's exact percentile
    (percentile_cont semantics) on ties, nulls, and ragged group sizes —
    while distributing the heavy aggregation instead of buffering whole
    groups in single tasks."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", float(rng.randint(0, 50)) / 2 if i % 11 else None)
        for i in range(500)
    ] + [("g3", 42.0)]  # single-row group: all quantiles = the value
    df = spark.createDataFrame(rows, "g string, v double")
    qs = {"p10": 0.1, "p50": 0.5, "p99": 0.99}
    got = {r["g"]: (r["p10"], r["p50"], r["p99"]) for r in
           profile.exact_quantiles(df, "g", "v", qs).collect()}
    ref = {r["g"]: (r["p10"], r["p50"], r["p99"]) for r in
           df.groupBy("g").agg(
               F.round(F.percentile("v", F.lit(0.1)), 6).alias("p10"),
               F.round(F.percentile("v", F.lit(0.5)), 6).alias("p50"),
               F.round(F.percentile("v", F.lit(0.99)), 6).alias("p99"),
           ).collect()}
    assert got == ref
    assert got["g3"] == (42.0, 42.0, 42.0)


def test_key_skew_report_semantics(spark):
    """Heaviest key first with its share; NULL keys are counted as a key;
    ranks are dense; share denominators cover ALL rows (not just top-k)."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators.profile import (
        key_skew_report,
    )

    rows = [("hot",)] * 60 + [("warm",)] * 25 + [(None,)] * 10 + [
        (f"cold{i}",) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_k=3).collect()
    assert [r["skew_rank"] for r in out] == [1, 2, 3]
    assert (out[0]["key"], out[0]["n_rows"], out[0]["share"]) == ("hot", 60, 0.6)
    assert (out[1]["key"], out[1]["n_rows"]) == ("warm", 25)
    assert out[2]["key"] is None and out[2]["n_rows"] == 10  # null is a key


def test_mad_outliers_robust_to_masking(spark):
    """The defining property vs z-score: one extreme value inflates the
    stddev enough to hide a second, moderate outlier — MAD flags both."""
    from crypto_data_service_loader_spark.operators.profile import (
        mad_outliers,
    )

    vals = [10.0] * 5 + [11.0] * 5 + [9.0] * 5 + [25.0, 1000.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r["id"]: r["is_outlier"] for r in
           mad_outliers(df, "g", "v", "id").collect()}
    assert out[16]  # the extreme value
    assert out[15]  # the moderate one MAD still sees (z-score masks it)
    assert not any(out[i] for i in range(15))
    # degenerate group: MAD = 0 (majority at the median) -> any nonzero
    # deviation flags
    const = spark.createDataFrame(
        [("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0), ("c", 4, 5.1)],
        "g string, id long, v double",
    )
    flags = {r["id"]: r["is_outlier"] for r in
             mad_outliers(const, "g", "v", "id").collect()}
    assert flags == {1: False, 2: False, 3: False, 4: True}


def test_histogram_drift_semantics(spark):
    """TVD bounds and bin alignment: identical windows -> 0, disjoint
    support -> 1, a bin vanishing counts as mass moving, the first
    window emits nothing, and linf ties break to the lowest bin id."""
    import datetime as dt

    from crypto_data_service_loader_spark.operators.profile import (
        histogram_drift,
    )

    w = lambda d: dt.datetime(2024, 1, d)
    rows = [
        # w1: bins {0: 2, 1: 2}; w2 identical -> tvd 0
        (w(1), 0, 2), (w(1), 1, 2),
        (w(2), 0, 2), (w(2), 1, 2),
        # w3: disjoint support {2: 4} -> tvd 1 vs w2
        (w(3), 2, 4),
        # w4: half the mass moves 2 -> 3: tvd 0.5; linf tie between
        # bins 2 (-0.5) and 3 (+0.5) -> lowest bin id wins
        (w(4), 2, 2), (w(4), 3, 2),
    ]
    df = spark.createDataFrame(
        rows, "win_start timestamp, bin_id int, n_rows long"
    )
    out = {r["win_start"].day: r for r in histogram_drift(df).collect()}
    assert set(out) == {2, 3, 4}  # the first window has no predecessor
    assert out[2]["tvd"] == 0.0
    assert out[3]["tvd"] == 1.0
    assert out[4]["tvd"] == 0.5
    assert out[4]["linf"] == 0.5 and out[4]["linf_bin_id"] == 2
    assert out[3]["prev_win_start"] == w(2)
    # single-window input: no pairs at all
    one = spark.createDataFrame(
        [(w(1), 0, 5)], "win_start timestamp, bin_id int, n_rows long"
    )
    assert histogram_drift(one).count() == 0


def test_cusum_matches_textbook_recursion(spark):
    """The running-extremum window identity must equal the textbook
    recursive form C+ = max(0, C+ + (x - target - slack)),
    C- = max(0, C- - (x - target + slack)) point-for-point, including a
    sustained small shift that per-point gates would never flag."""
    from crypto_data_service_loader_spark.operators.profile import (
        cusum_alerts,
    )

    # mean 10 with a sustained +2 shift from i=10 (never a big spike)
    vals = [10.0, 10.5, 9.5, 10.0, 9.8, 10.2, 10.0, 9.9, 10.1, 10.0] + \
        [12.0, 12.1, 11.9, 12.0, 12.2, 11.8, 12.0, 12.1, 11.9, 12.0]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = {r["i"]: r for r in cusum_alerts(
        df, "k", ["i"], "v", target=10.0, slack=0.5, threshold=5.0
    ).collect()}
    cp = cn = 0.0
    fired_at = None
    for i, x in enumerate(vals):
        cp = max(0.0, cp + (x - 10.0 - 0.5))
        cn = max(0.0, cn - (x - 10.0) - 0.5)
        assert abs(out[i]["cusum_pos"] - round(cp, 6)) < 1e-9, i
        assert abs(out[i]["cusum_neg"] - round(cn, 6)) < 1e-9, i
        alert = round(cp, 6) > 5.0 or round(cn, 6) > 5.0
        assert out[i]["is_alert"] == alert, i
        if alert and fired_at is None:
            fired_at = i
    # the sustained shift accumulates past the threshold within the
    # shifted run — a 2-sigma-ish step no single point would flag
    assert fired_at is not None and 10 < fired_at < 20
    # empty order_cols refused
    import pytest

    with pytest.raises(ValueError, match="order_cols"):
        cusum_alerts(df, "k", [], "v", target=10.0)


def test_cusum_shift_present_from_first_row(spark):
    """S0 = 0 baseline regression: a level shift present from the FIRST
    row (cumsum never dips below its first value) must measure from the
    implicit zero start, not from the first prefix sum. Textbook: value
    12, target 10, slack 0.5 gives C+ = 1.5 on row one — the unclamped
    running-min identity gave 0 and understated every later row by the
    running min. Mirror case on the C- side (first value far below
    target - slack)."""
    from crypto_data_service_loader_spark.operators.profile import (
        cusum_alerts,
    )

    hi = [12.0, 12.0, 12.0, 12.0]   # C+ = 1.5, 3.0, 4.5, 6.0 (alert at i=3)
    lo = [8.0, 8.0, 8.0, 8.0]       # C- = 1.5, 3.0, 4.5, 6.0 (alert at i=3)
    rows = [("hi", i, v) for i, v in enumerate(hi)] + \
        [("lo", i, v) for i, v in enumerate(lo)]
    df = spark.createDataFrame(rows, "k string, i int, v double")
    out = {(r["k"], r["i"]): r for r in cusum_alerts(
        df, "k", ["i"], "v", target=10.0, slack=0.5, threshold=5.0
    ).collect()}
    for i in range(4):
        assert out[("hi", i)]["cusum_pos"] == round(1.5 * (i + 1), 6), i
        assert out[("lo", i)]["cusum_neg"] == round(1.5 * (i + 1), 6), i
    assert not out[("hi", 2)]["is_alert"] and out[("hi", 3)]["is_alert"]
    assert not out[("lo", 2)]["is_alert"] and out[("lo", 3)]["is_alert"]


def test_ols_trend_recovers_exact_line_and_guards(spark):
    """A noiseless line comes back exactly (slope 2, intercept 3, r2 1);
    zero x-variance nulls slope/intercept/r2; constant y gives slope 0
    with r2 null (dyy == 0) — the explicit guards that keep Spark's
    div-by-zero NULL and DuckDB's inf from diverging."""
    from crypto_data_service_loader_spark.operators.profile import ols_trend

    rows = (
        [("line", float(x), 2.0 * x + 3.0) for x in range(10)]
        + [("flat_x", 5.0, float(v)) for v in range(4)]
        + [("flat_y", float(x), 7.0) for x in range(4)]
    )
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in ols_trend(df, "k", "x", "y").collect()}
    assert out["line"]["slope"] == 2.0
    assert out["line"]["intercept"] == 3.0
    assert out["line"]["r2"] == 1.0
    assert out["flat_x"]["slope"] is None
    assert out["flat_x"]["intercept"] is None
    assert out["flat_x"]["r2"] is None
    assert out["flat_y"]["slope"] == 0.0
    assert out["flat_y"]["intercept"] == 7.0
    assert out["flat_y"]["r2"] is None


def test_equi_depth_histogram_equal_mass_and_edges(spark):
    """0..99 in one group: 4 bins of exactly 25 rows; edges are the
    interpolated quartiles (24.75 / 49.5 / 74.25); adjacent bins share
    their edge (hi of bin i == lo of bin i+1); n_bins=1 degenerates to
    one [min, max] bucket holding everything."""
    from crypto_data_service_loader_spark.operators.profile import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "k string, v double"
    )
    rows = sorted(
        equi_depth_histogram(df, "k", "v", n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["n_rows"] for r in rows] == [25, 25, 25, 25]
    assert [r["lo"] for r in rows] == [0.0, 24.75, 49.5, 74.25]
    assert [r["hi"] for r in rows] == [24.75, 49.5, 74.25, 99.0]
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] == b["lo"]

    one = equi_depth_histogram(df, "k", "v", n_bins=1).collect()
    assert len(one) == 1
    assert (one[0]["lo"], one[0]["hi"], one[0]["n_rows"]) == (0.0, 99.0, 100)


def test_equi_depth_histogram_skewed_beats_fixed_width(spark):
    """The design point: on a heavy-tailed distribution every bin still
    holds the same mass (fixed-width binning would pile ~all rows into
    bucket 1)."""
    from crypto_data_service_loader_spark.operators.profile import (
        equi_depth_histogram,
    )

    vals = [float(i) for i in range(96)] + [1e4, 1e5, 1e6, 1e7]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "k string, v double"
    )
    rows = equi_depth_histogram(df, "k", "v", n_bins=4).collect()
    assert sorted(r["n_rows"] for r in rows) == [25, 25, 25, 25]


def test_winsorize_clamps_tails_only(spark):
    """0..99 at 5/95: values below 4.95 clamp up, above 94.05 clamp
    down, the middle passes through untouched; nulls stay null; a
    group with only nulls keeps rows unclamped with null bounds."""
    from crypto_data_service_loader_spark.operators.profile import winsorize

    rows = [("g", i, float(i)) for i in range(100)] + [
        ("g", 100, None),
        ("empty", 101, None),
    ]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    out = {r["id"]: r for r in winsorize(df, "k", "v").collect()}
    assert out[0]["v_winsorized"] == 4.95
    assert out[4]["v_winsorized"] == 4.95
    assert out[50]["v_winsorized"] == 50.0
    assert out[99]["v_winsorized"] == 94.05
    assert out[0]["q_lo"] == 4.95 and out[0]["q_hi"] == 94.05
    assert out[100]["v_winsorized"] is None
    assert out[101]["v_winsorized"] is None and out[101]["q_lo"] is None
    # row count preserved — winsorization never drops
    assert len(out) == 102


def test_category_drift_detects_mix_shift(spark):
    """Three days: day2 repeats day1's 50/50 mix (TVD 0); day3 swaps b
    out for c and skews to 90/10 — TVD 0.5 with the linf pointer naming
    the category that lost the most share; a category absent one day
    counts as share zero."""
    import datetime as dt

    from crypto_data_service_loader_spark.operators.profile import (
        category_drift,
    )

    def rows(day, mix):
        out = []
        for cat, n in mix.items():
            out += [(dt.datetime(2024, 1, day, 12), cat)] * n
        return out

    df = spark.createDataFrame(
        rows(1, {"a": 5, "b": 5}) + rows(2, {"a": 5, "b": 5})
        + rows(3, {"a": 9, "c": 1}),
        "ts timestamp, cat string",
    )
    out = {r["win_start"].day: r for r in
           category_drift(df, "cat").collect()}
    assert out[2]["tvd"] == 0.0
    # day3 vs day2: a 0.5->0.9 (+0.4), b 0.5->0 (-0.5), c 0->0.1 (+0.1)
    assert abs(out[3]["tvd"] - 0.5) < 1e-9
    assert abs(out[3]["linf"] - 0.5) < 1e-9
    assert out[3]["linf_bin_id"] == "b"
