"""Portable sketch semantics: mergeability (the 100-TB roll-up
contract), the count-min >= guarantee, Bloom no-false-negatives, and
estimate sanity vs exact truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import sketch
from crypto_data_service_loader_spark.tables import load


def _events(spark, sf_dir):
    return load(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------------


def test_hll_merge_equals_whole(spark, sf_dir):
    """Registers built per-slice then merged == registers built over the
    union — the property that lets per-day sketches roll up without
    re-reading raw data."""
    ev = _events(spark, sf_dir)
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = sketch.hll_merge(
        [
            sketch.hll_registers(a, ["event_type"], "user_id"),
            sketch.hll_registers(b, ["event_type"], "user_id"),
        ],
        ["event_type"],
    )
    whole = sketch.hll_registers(ev, ["event_type"], "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    # and the estimates (one more agg on top) agree too
    em = sketch.hll_estimate(merged, ["event_type"]).collect()
    ew = sketch.hll_estimate(whole, ["event_type"]).collect()
    assert sorted(map(tuple, em)) == sorted(map(tuple, ew))


def test_hll_corrected_estimate_tracks_small_truth(spark, sf_dir):
    """n << m: the raw harmonic estimate is known-biased; the
    linear-counting branch is the accurate one there."""
    ev = _events(spark, sf_dir)
    est = {
        r["event_type"]: r["est_distinct"]
        for r in sketch.hll_cardinality(
            ev, ["event_type"], "user_id", small_range_correction=True
        ).collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(true)
    for t, n in true.items():
        assert 0.7 * n <= est[t] <= 1.4 * n, (t, n, est[t])


def test_hll_raw_estimate_tracks_large_truth(spark):
    """n >> m: the raw harmonic estimate's own regime — the one the
    oracle-exact key pins. Standard error ~ 1.04/sqrt(64) = 13%."""
    df = spark.range(5000).select((F.col("id") * 7 + 13).alias("v"))
    row = sketch.hll_cardinality(
        df.withColumn("g", F.lit("all")), ["g"], "v", m=64
    ).collect()[0]
    assert 0.65 * 5000 <= row["est_distinct"] <= 1.35 * 5000, row


def test_hll_ignores_nulls_and_validates_m(spark, sf_dir):
    ev = _events(spark, sf_dir)
    with_nulls = ev.withColumn(
        "user_id", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("user_id"))
    )
    # nulls contribute nothing: registers over non-null slice == registers
    # over the null-injected frame
    a = sketch.hll_registers(with_nulls, ["event_type"], "user_id")
    b = sketch.hll_registers(
        with_nulls.where(F.col("user_id").isNotNull()), ["event_type"], "user_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError):
        sketch.hll_registers(ev, ["event_type"], "user_id", m=48)


def test_hll_sketch_is_bounded(spark, sf_dir):
    """The register table never exceeds groups * m rows however big the
    input — the constant-size contract."""
    regs = sketch.hll_registers(_events(spark, sf_dir), ["event_type"], "user_id", m=16)
    per_group = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= 16 for r in per_group)


# --------------------------------------------------------------------------
# count-min
# --------------------------------------------------------------------------


def test_countmin_never_underestimates(spark, sf_dir):
    ev = _events(spark, sf_dir)
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    sk = sketch.countmin_build(keyed, "k", d=4, w=16)  # narrow: force collisions
    truth = keyed.groupBy("k").agg(F.count("*").alias("true_cnt"))
    est = sketch.countmin_lookup(sk, truth, "k", d=4, w=16)
    rows = est.collect()
    assert rows and all(r["est_count"] >= r["true_cnt"] for r in rows)
    # sketch is bounded by d * w cells
    assert sk.count() <= 4 * 16


def test_countmin_merge_equals_whole(spark, sf_dir):
    ev = _events(spark, sf_dir).select(F.col("user_id").cast("string").alias("k"))
    a = ev.limit(300)
    # complement via subtract-free split: hash parity on the value
    lo = ev.where(F.conv(F.substring(F.md5("k"), 1, 2), 16, 10) % 2 == 0)
    hi = ev.where(F.conv(F.substring(F.md5("k"), 1, 2), 16, 10) % 2 == 1)
    merged = sketch.countmin_merge(
        [sketch.countmin_build(lo, "k"), sketch.countmin_build(hi, "k")]
    )
    whole = sketch.countmin_build(ev, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    del a


def test_countmin_weight_col(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 2), ("b", 7)], "k string, w int"
    )
    sk = sketch.countmin_build(df, "k", d=2, w=64, weight_col="w")
    est = sketch.countmin_lookup(
        sk, spark.createDataFrame([("a",), ("b",)], "k string"), "k", d=2, w=64
    )
    got = {r["k"]: r["est_count"] for r in est.collect()}
    assert got["a"] >= 5 and got["b"] >= 7


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fpr(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    members = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    bloom = sketch.bloom_build(members, "k", n_words=64, k=3)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    flags = sketch.bloom_probe(bloom, cust, "k", n_words=64, k=3)
    truth = {r["k"] for r in members.distinct().collect()}
    rows = flags.collect()
    neg = [r for r in rows if r["k"] in truth and not r["in_bloom"]]
    assert not neg, f"false negatives: {neg[:5]}"
    non_members = [r for r in rows if r["k"] not in truth]
    if non_members:
        fpr = sum(r["in_bloom"] for r in non_members) / len(non_members)
        assert fpr < 0.9  # degenerate-saturation guard, not a tuning claim
    # the filter itself is at most n_words rows
    assert bloom.count() <= 64


def test_bloom_merge_equals_whole(spark, sf_dir):
    ev = _events(spark, sf_dir).select(F.col("user_id").alias("k"))
    lo = ev.where(F.col("k") % 2 == 0)
    hi = ev.where(F.col("k") % 2 == 1)
    merged = (
        sketch.bloom_build(lo, "k")
        .unionByName(sketch.bloom_build(hi, "k"))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = sketch.bloom_build(ev, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_probe_duplicates_preserved_and_reserved_names_raise(spark):
    """Regression (r7 ADVICE): the d-row fold-back used to groupBy the
    probe VALUES, silently collapsing duplicate probe rows; and probe
    frames carrying the internal column names broke the fan-out
    undetected. Duplicates now round-trip 1:1 and collisions raise."""
    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 3, "k string")
    cm = sketch.countmin_build(df, "k", d=4, w=64)
    bl = sketch.bloom_build(df, "k", n_words=16, k=3)

    probes = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    est = sketch.countmin_lookup(cm, probes, "k", d=4, w=64).collect()
    assert len(est) == 3
    assert sorted(r["est_count"] for r in est) == [3, 10, 10]
    flags = sketch.bloom_probe(bl, probes, "k", n_words=16, k=3).collect()
    assert len(flags) == 3 and all(r["in_bloom"] for r in flags)

    bad_cm = spark.createDataFrame([("a", 1)], "k string, bucket int")
    with pytest.raises(ValueError, match="bucket"):
        sketch.countmin_lookup(cm, bad_cm, "k", d=4, w=64)
    bad_bl = spark.createDataFrame([("a", 1)], "k string, word int")
    with pytest.raises(ValueError, match="word"):
        sketch.bloom_probe(bl, bad_bl, "k", n_words=16, k=3)


def test_join_size_estimate_overestimates_and_tracks_truth(spark, sf_dir):
    """CM inner-product estimate: >= true join size always; close when
    w >> distinct keys; mergeable sketches give the same estimate."""
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    true_n = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    est = sketch.join_size_estimate(
        orders, cust, "o_custkey", "c_custkey", d=4, w=4096
    ).collect()[0]["est_pairs"]
    assert est >= true_n
    assert est <= true_n * 1.2  # w=4096 >> ~1.5k custkeys at sf0.01

    # a coarse sketch still upper-bounds, just looser
    est_small = sketch.join_size_estimate(
        orders, cust, "o_custkey", "c_custkey", d=4, w=64
    ).collect()[0]["est_pairs"]
    assert est_small >= true_n


def test_moments_merge_equals_whole_and_estimates_track_truth(spark, sf_dir):
    """The quantile member of the sketch family: power sums merge by
    plain addition (halves == whole, cell-exact); the Cornish-Fisher
    p90 estimate lands near the exact percentile on the events value
    distribution; degenerate groups (n<2 or zero variance) fall back
    to the mean instead of dividing by zero."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    half_a = ev.where(F.col("value") < 250)
    half_b = ev.where((F.col("value") >= 250) | F.col("value").isNull())
    merged = sketch.moments_merge([
        sketch.moments_build(half_a, ["event_type"], "value"),
        sketch.moments_build(half_b, ["event_type"], "value"),
    ])
    whole = sketch.moments_build(ev, ["event_type"], "value")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    est = {r["event_type"]: r["q_est"]
           for r in sketch.moments_quantile(whole, 0.9).collect()}
    exact = {
        r["event_type"]: r["p90"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.9)").alias("p90"))
        .collect()
    }
    for k, p90 in exact.items():
        spread = p90 or 1.0
        assert abs(est[k] - p90) / abs(spread) < 0.25, (k, est[k], p90)

    import pytest

    degenerate = spark.createDataFrame(
        [("a", 5.0), ("b", 7.0), ("b", 7.0)], "k string, value double"
    )
    dsk = sketch.moments_build(degenerate, ["k"], "value")
    vals = {r["k"]: r["q_est"] for r in sketch.moments_quantile(dsk, 0.9).collect()}
    assert vals == {"a": 5.0, "b": 7.0}  # mean fallback, no div-by-zero
    with pytest.raises(ValueError, match="q must be"):
        sketch.moments_quantile(dsk, 0.37)


def test_hll_set_ops_tracks_true_overlap(spark):
    """Inclusion-exclusion over mergeable registers: union/intersection
    estimates track constructed overlaps (A: 0..599, B: 300..899 ->
    union 900, intersect 300; C disjoint 10k..10.2k); one-sided
    registers count in the union (the full-outer fan-out); all pairs
    appear exactly once with a < b."""
    rows = ([("A", i) for i in range(600)]
            + [("B", i) for i in range(300, 900)]
            + [("C", i) for i in range(10000, 10200)])
    df = spark.createDataFrame(rows, "src string, user_id long")
    regs = sketch.hll_registers(df, ["src"], "user_id", m=256)
    out = {(r["group_a"], r["group_b"]): r
           for r in sketch.hll_set_ops(regs, "src", m=256).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    # m=256 -> ~6.5% relative error; allow 3x headroom
    assert abs(ab["est_union"] - 900) / 900 < 0.2
    assert abs(ab["est_intersect"] - 300) / 300 < 0.5
    assert abs(ab["est_a"] - 600) / 600 < 0.2
    ac = out[("A", "C")]
    # I-E error scales with the UNION (documented caveat): a true-zero
    # intersection reads as noise on the order of the union's HLL error
    assert ac["est_intersect"] < 0.25 * ac["est_union"]
    assert abs(ac["est_union"] - 800) / 800 < 0.2


def test_join_size_estimate_empty_side_is_zero(spark):
    """Regression (r8 ADVICE): MIN over the zero-row inner-product frame
    used to return NULL est_pairs when either side was empty; the true
    join size is 0 and callers do arithmetic on it."""
    a = spark.createDataFrame([(1,), (2,)], "k long")
    empty = a.limit(0)
    for left, right in ((a, empty), (empty, a), (empty, empty)):
        est = sketch.join_size_estimate(
            left, right, "k", "k", d=4, w=64
        ).collect()[0]["est_pairs"]
        assert est == 0


def test_hll_set_ops_group_cardinality_guard(spark):
    """Regression (r8 VERDICT): the |groups|^2/2 pair table gets an
    up-front distinct-count guard — a high-cardinality group column
    raises instead of silently building a runaway pair join; raising
    the cap explicitly is the documented opt-in."""
    rows = [(f"src{i}", i) for i in range(40)]
    df = spark.createDataFrame(rows, "src string, user_id long")
    regs = sketch.hll_registers(df, ["src"], "user_id", m=64)
    with pytest.raises(ValueError, match="max_groups"):
        sketch.hll_set_ops(regs, "src", m=64, max_groups=8)
    # explicit opt-in: 40 groups -> 780 pairs, fine when intended
    n = sketch.hll_set_ops(regs, "src", m=64, max_groups=64).count()
    assert n == 40 * 39 // 2
