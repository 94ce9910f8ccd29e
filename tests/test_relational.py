

def test_rolling_corr_semantics(spark):
    """A perfectly co-moving pair reads 1.0 once the window has two
    points; an anti-moving pair reads -1.0; constant y gives NULL (zero
    variance guard); the first row of each key is NULL (n < 2); the
    trailing frame forgets history past `window` rows."""
    from crypto_data_service_loader_spark.operators.relational import (
        rolling_corr,
    )

    rows = (
        [("pos", i, float(i), 2.0 * i + 1.0) for i in range(6)]
        + [("neg", i, float(i), -3.0 * i) for i in range(4)]
        + [("flat", i, float(i), 5.0) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    out = {
        (r["k"], r["t"]): r["rolling_corr"]
        for r in rolling_corr(df, "k", ["t"], "x", "y", window=3).collect()
    }
    for k in ("pos", "neg", "flat"):
        assert out[(k, 0)] is None
    assert out[("pos", 1)] == 1.0 and out[("pos", 5)] == 1.0
    assert out[("neg", 3)] == -1.0
    assert all(out[("flat", t)] is None for t in range(4))

    # window forgetting: switch y's regime at t >= 3; with window=3 the
    # correlation at t=5 sees only the new regime (pure anti-movement)
    rows2 = [("s", t, float(t), float(t)) for t in range(3)] + [
        ("s", t, float(t), -float(t)) for t in range(3, 6)
    ]
    df2 = spark.createDataFrame(rows2, "k string, t int, x double, y double")
    out2 = {
        r["t"]: r["rolling_corr"]
        for r in rolling_corr(df2, "k", ["t"], "x", "y", window=3).collect()
    }
    assert out2[5] == -1.0


def test_merge_grouped_sums_equals_full_recompute(spark, sf_dir):
    """Incremental maintenance contract: state(old) + delta(new) merged
    == one aggregate over everything; schema guards raise."""
    import pytest
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import relational as rel
    from crypto_data_service_loader_spark.tables import load

    orders = load(spark, sf_dir, "orders")
    cut = "1997-01-01"

    def partials(df):
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("total_dec"),
        )

    merged = rel.merge_grouped_sums(
        partials(orders.where(F.col("o_orderdate") < cut)),
        partials(orders.where(F.col("o_orderdate") >= cut)),
        ["o_custkey"],
    ).select(
        "o_custkey",
        F.col("order_cnt").cast("long").alias("order_cnt"),
        F.col("total_dec").cast("double").alias("total_price"),
    )
    full = partials(orders).select(
        "o_custkey",
        F.col("order_cnt").cast("long").alias("order_cnt"),
        F.col("total_dec").cast("double").alias("total_price"),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    with pytest.raises(ValueError, match="schemas differ"):
        rel.merge_grouped_sums(
            partials(orders), partials(orders).drop("total_dec"), ["o_custkey"]
        )
    with pytest.raises(ValueError, match="no partial"):
        rel.merge_grouped_sums(
            partials(orders).select("o_custkey"),
            partials(orders).select("o_custkey"),
            ["o_custkey"],
        )


def test_merge_intervals_islands(spark):
    """Gaps-and-islands edges: overlapping, touching (start == prev end
    merges), nested, identical intervals, and per-key isolation."""
    from crypto_data_service_loader_spark.operators.relational import (
        merge_intervals,
    )

    rows = [
        # key a: [0,10) + [5,12) overlap; [12,20) touches -> one island;
        # [25,30) gap -> second island; [26,27) nested into it
        ("a", 0, 10), ("a", 5, 12), ("a", 12, 20),
        ("a", 25, 30), ("a", 26, 27),
        # key b: identical intervals collapse into one island of 2
        ("b", 1, 2), ("b", 1, 2),
        # key c: single interval
        ("c", 7, 8),
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = {
        (r["k"], r["island_start"], r["island_end"]): r["n_intervals"]
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == {
        ("a", 0, 20): 3,
        ("a", 25, 30): 2,
        ("b", 1, 2): 2,
        ("c", 7, 8): 1,
    }
    assert merge_intervals(df.limit(0), ["k"], "s", "e").count() == 0
