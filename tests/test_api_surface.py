"""Direct tests for the small public helpers no other test exercises —
every exported function gets at least one behavioral pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.tables import load


def test_minhash_signature_shape_and_determinism(spark):
    from crypto_data_service_loader_spark.operators.dedup import (
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["sig"] for r in docs.select(
        "doc_id", minhash_signature(F.col("text"), num_hashes=8).alias("sig")
    ).collect()}
    assert all(len(s) == 8 for s in out.values())
    assert out[1] == out[2]          # identical text -> identical signature
    assert out[1] != out[3]
    rerun = {r["doc_id"]: r["sig"] for r in docs.select(
        "doc_id", minhash_signature(F.col("text"), num_hashes=8).alias("sig")
    ).collect()}
    assert rerun == out              # no RNG anywhere


def test_registry_from_listing_builds_typed_rows(spark):
    import datetime

    from crypto_data_service_loader_spark.sources.fs_scan import (
        registry_from_listing,
    )

    reg = registry_from_listing(
        spark,
        [("A_PST_2024-03-13", datetime.date(2024, 3, 13), "DISCOVERED")],
    )
    row = reg.collect()[0]
    assert row["filename"] == "A_PST_2024-03-13"
    assert str(row["create_date"]) == "2024-03-13"
    assert row["status"] == "DISCOVERED"


def test_resize_images_fake_passthrough(spark):
    from crypto_data_service_loader_spark.operators.multimodal import (
        resize_images,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"pixels"), "image/png", 640, 480, None)],
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    out = resize_images(media, width=64, height=64, fake=True).collect()[0]
    assert (out["width"], out["height"]) == (64, 64)
    assert bytes(out["payload"]) == b"pixels"  # fake passes bytes through


def test_top_k_per_group_matches_sorted_heads(spark, sf_dir):
    from crypto_data_service_loader_spark.operators.relational import (
        top_k_per_group,
    )

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    got = top_k_per_group(ev, ["event_type"], "value", k=3).collect()
    by_type: dict = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    expect = {
        r["event_type"]: r["vs"]
        for r in ev.groupBy("event_type")
        .agg(F.slice(F.sort_array(F.collect_list("value"), False), 1, 3).alias("vs"))
        .collect()
    }
    assert set(by_type) == set(expect)
    for ty, vals in by_type.items():
        assert sorted(vals, reverse=True) == list(expect[ty])


def test_validate_lines_filters_like_predicate(spark):
    from crypto_data_service_loader_spark.sources.csv_ingest import (
        validate_lines,
    )

    good = "AVA-USDT,1,0.5,10,0.51,5,0.49,7,1710400000000"
    lines = spark.createDataFrame(
        [(good,), ("short,line",), (good + ",extra",)], "line string"
    )
    kept = [r["line"] for r in validate_lines(lines).collect()]
    assert kept == [good]


def test_whole_stage_codegen_spans_counts(spark, sf_dir):
    from crypto_data_service_loader_spark.plans.explain import (
        whole_stage_codegen_spans,
    )

    df = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert whole_stage_codegen_spans(df) >= 1  # agg pipeline is codegen'd


def test_approx_distinct_within_hll_error_bound(spark, sf_dir):
    """The rows-only HLL key is still ACCURACY-tested: estimates must land
    within 3x the default relative standard deviation (rsd 0.05) of the
    exact distinct counts."""
    from crypto_data_service_loader_spark.suite import QUERIES

    got = QUERIES["agg_approx_distinct"](spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events")
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_id").alias("e"),
    ).collect()[0]
    for est, true in ((got["approx_users"], exact["u"]),
                      (got["approx_events"], exact["e"])):
        assert abs(est - true) <= max(3, 0.15 * true)


def test_approx_quantile_within_rank_tolerance(spark, sf_dir):
    """percentile_approx estimates must sit between nearby exact
    percentiles (p50 in [p40, p60]; p99 in [p95, p100]) per group."""
    from crypto_data_service_loader_spark.suite import QUERIES

    got = {r["l_returnflag"]: r for r in
           QUERIES["agg_approx_quantile"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.4)").alias("p40"),
        F.expr("percentile(l_extendedprice, 0.6)").alias("p60"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
        F.max("l_extendedprice").alias("p100"),
    ).collect()}
    for flag, r in got.items():
        e = exact[flag]
        assert float(e["p40"]) <= float(r["p50_approx"]) <= float(e["p60"])
        assert float(e["p95"]) <= float(r["p99_approx"]) <= float(e["p100"])
