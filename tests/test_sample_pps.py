"""PPS systematic sampling semantics: exact-k total multiplicity,
heavy-item guarantees, determinism under repartitioning, edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import relational as rel
from crypto_data_service_loader_spark.tables import load


def test_total_multiplicity_is_exactly_k(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    for k in (1, 7, 50):
        out = rel.sample_pps(docs, "doc_id", "n_chars", k=k, seed=42)
        assert out.agg(F.sum("multiplicity")).collect()[0][0] == k


def test_heavy_item_always_selected(spark):
    """An item with w >= W/k must appear (its segment spans a full
    stride, so it contains a grid point for ANY offset); here one item
    holds half the mass with k=4 — multiplicity >= 2."""
    rows = [(0, 100)] + [(i, 2) for i in range(1, 51)]  # W = 200
    df = spark.createDataFrame(rows, "doc_id long, w long")
    for seed in range(5):
        got = {
            r["doc_id"]: r["multiplicity"]
            for r in rel.sample_pps(df, "doc_id", "w", k=4, seed=seed).collect()
        }
        assert got.get(0, 0) >= 2, (seed, got)


def test_partitioning_invariance(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = rel.sample_pps(docs, "doc_id", "n_chars", k=25, seed=7)
    b = rel.sample_pps(docs.repartition(13), "doc_id", "n_chars", k=25, seed=7)
    assert sorted(map(tuple, a.select("doc_id", "multiplicity").collect())) == sorted(
        map(tuple, b.select("doc_id", "multiplicity").collect())
    )


def test_seed_changes_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in rel.sample_pps(docs, "doc_id", "n_chars", 20, seed=1).collect()}
    b = {r["doc_id"] for r in rel.sample_pps(docs, "doc_id", "n_chars", 20, seed=2).collect()}
    assert a != b


def test_nonpositive_weights_excluded_and_empty_input(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "doc_id long, w long"
    )
    out = rel.sample_pps(df, "doc_id", "w", k=3).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert sum(r["multiplicity"] for r in out) == 3
    empty = spark.createDataFrame([], "doc_id long, w long")
    assert rel.sample_pps(empty, "doc_id", "w", k=5).count() == 0
    all_zero = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    assert rel.sample_pps(all_zero, "doc_id", "w", k=5).count() == 0


def test_inclusion_probability_tracks_weight(spark):
    """Across many seeds, a weight-9x item should be drawn ~9x as often
    as a weight-1x item (PPS property, loose band)."""
    rows = [(0, 90)] + [(i, 10) for i in range(1, 100)]  # W=1080
    df = spark.createDataFrame(rows, "doc_id long, w long").cache()
    heavy = light = 0
    for seed in range(30):
        got = {r["doc_id"] for r in rel.sample_pps(df, "doc_id", "w", k=10, seed=seed).collect()}
        heavy += 0 in got
        light += 1 in got
    df.unpersist()
    # P(heavy) = 10*90/1080 = 0.833; P(light) = 10*10/1080 = 0.093
    assert heavy >= 18
    assert light <= 12


def test_guards_overflow_and_bucket_uniformity(spark):
    """Regression (r7 ADVICE): (k+1)*W beyond int64 used to wrap
    inside the grid expression (ANSI Spark aborts mid-job); n_buckets off 256
    skewed the 2-hex-char bucket draw. Both now raise up-front."""
    import pytest

    big = spark.createDataFrame(
        [(1, 2**61), (2, 2**61)], "doc_id int, w long"
    )
    with pytest.raises(ValueError, match="overflows"):
        rel.sample_pps(big, "doc_id", "w", k=2)

    small = spark.createDataFrame([(1, 5), (2, 7)], "doc_id int, w long")
    with pytest.raises(ValueError, match="n_buckets"):
        rel.sample_pps(small, "doc_id", "w", k=1, n_buckets=48)
    # a legal divisor still works
    assert rel.sample_pps(small, "doc_id", "w", k=1, n_buckets=4).count() == 1
