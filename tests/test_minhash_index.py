"""Persisted MinHash index semantics: query == inline recompute,
append/delete/compact lifecycle, dial persistence, guards."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import dedup
from crypto_data_service_loader_spark.sources import minhash_index as mhi
from crypto_data_service_loader_spark.tables import load


def _split(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    return corpus, batch


def _inline_truth(corpus, batch, num=1, den=2, nh=8):
    """Ground truth via the inline machinery: banded candidates between
    batch and corpus, verified by signature agreement — exactly the
    semantics the index must reproduce from its stored state."""
    qb = dedup.minhash_buckets(batch).select(
        F.col("doc").alias("_q"), "band", "band_hash"
    )
    ib = dedup.minhash_buckets(corpus).select(
        F.col("doc").alias("_i"), "band", "band_hash"
    )
    cand = qb.join(ib, ["band", "band_hash"]).select("_q", "_i").distinct()
    qs = dedup.minhash_sig_table(batch).select(
        F.col("doc").alias("_q"), *[F.col(f"h{i}").alias(f"q{i}") for i in range(nh)]
    )
    is_ = dedup.minhash_sig_table(corpus).select(
        F.col("doc").alias("_i"), *[F.col(f"h{i}").alias(f"i{i}") for i in range(nh)]
    )
    agree = sum((F.col(f"q{i}") == F.col(f"i{i}")).cast("int") for i in range(nh))
    return {
        (r["_q"], r["_i"], r["a"])
        for r in cand.join(qs, "_q").join(is_, "_i")
        .withColumn("a", agree)
        .where(den * F.col("a") >= num * nh)
        .collect()
    }


def test_index_query_equals_inline(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "mh")
    n = mhi.write_minhash_index(corpus, path)
    assert n > 0
    meta = json.load(open(f"{path}/_minhash_meta.json"))
    assert meta["num_hashes"] == 8 and meta["id_type"] == "bigint"

    got = {
        (r["doc_id"], r["dup_of"], r["n_agree"])
        for r in mhi.near_dups_against_index(spark, path, batch).collect()
    }
    assert got == _inline_truth(corpus, batch) and got


def test_delete_then_query_and_compact(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "mh")
    mhi.write_minhash_index(corpus, path)
    base = mhi.near_dups_against_index(spark, path, batch)
    victims = [r["dup_of"] for r in base.limit(3).collect()]
    assert victims
    assert mhi.delete_from_minhash_index(spark, path, victims) == len(set(victims))
    assert mhi.delete_from_minhash_index(spark, path, victims) == 0  # idempotent

    after = {
        (r["doc_id"], r["dup_of"])
        for r in mhi.near_dups_against_index(spark, path, batch).collect()
    }
    assert not {d for _, d in after} & set(victims)
    # compaction folds tombstones; results unchanged
    assert mhi.compact_minhash_index(spark, path) == len(set(victims))
    assert mhi.compact_minhash_index(spark, path) == 0
    again = {
        (r["doc_id"], r["dup_of"])
        for r in mhi.near_dups_against_index(spark, path, batch).collect()
    }
    assert again == after


def test_append_batch_then_self_check(spark, sf_dir, tmp_path):
    """Cross-epoch shape: append the batch, re-check it against the
    index — self-matches are excluded, near-dups (including new-vs-new)
    appear; equality with a fresh full rebuild pins append correctness."""
    corpus, batch = _split(spark, sf_dir)
    path, path2 = str(tmp_path / "a"), str(tmp_path / "b")
    mhi.write_minhash_index(corpus, path)
    assert mhi.append_to_minhash_index(batch, path) > 0

    everything = corpus.unionByName(batch)
    mhi.write_minhash_index(everything, path2)
    q = batch.limit(50)
    a = {
        (r["doc_id"], r["dup_of"])
        for r in mhi.near_dups_against_index(spark, path, q).collect()
    }
    b = {
        (r["doc_id"], r["dup_of"])
        for r in mhi.near_dups_against_index(spark, path2, q).collect()
    }
    assert a == b and a
    assert not {(x, y) for x, y in a if x == y}  # no self-matches


def test_threshold_guard(spark, sf_dir, tmp_path):
    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "mh")
    mhi.write_minhash_index(corpus.limit(20), path)
    with pytest.raises(ValueError, match="threshold"):
        mhi.near_dups_against_index(spark, path, batch, 3, 2)


def test_band_join_survives_disabled_type_inference(spark, sf_dir, tmp_path):
    """Regression (r8 ADVICE): the hive partition column `band` reads
    back as an inferred int while the signing side emits string; the
    join now casts explicitly, so it still matches when partition
    column type inference is OFF (band reads back as raw string —
    previously the int/string coercion was load-bearing)."""
    corpus, batch = _split(spark, sf_dir)
    path = str(tmp_path / "mh")
    mhi.write_minhash_index(corpus, path)
    want = mhi.near_dups_against_index(spark, path, batch).count()
    assert want > 0

    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        got = mhi.near_dups_against_index(spark, path, batch).count()
    finally:
        spark.conf.set(key, old)
    assert got == want
