"""Persisted media-fingerprint index: query == inline recompute,
append lifecycle + self-check safety, dial persistence, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import multimodal
from crypto_data_service_loader_spark.sources import media_index as mdi
from crypto_data_service_loader_spark.tables import load


def _media(spark, sf_dir, pred):
    docs = load(spark, sf_dir, "documents").where(pred)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.md5("text"), "UTF-8").alias("payload"),
    )


def _variants(spark, sf_dir, pred, offset=100000):
    docs = load(spark, sf_dir, "documents").where(pred)
    return docs.select(
        (F.col("doc_id") + offset).alias("media_id"),
        F.encode(
            F.concat(
                F.substring(F.md5("text"), 1, 30),
                F.substring(F.md5(F.concat(F.col("text"), F.lit("v2"))), 31, 2),
            ),
            "UTF-8",
        ).alias("payload"),
    )


def test_index_query_equals_inline(spark, sf_dir, tmp_path):
    """Querying the persisted index reproduces the inline banded join's
    pairs exactly (the index stores state, not different semantics)."""
    corpus_pred = (F.col("doc_id") < 80) & (F.col("doc_id") % 7 != 0)
    corpus = _media(spark, sf_dir, corpus_pred)
    batch = _variants(spark, sf_dir, F.col("doc_id") < 80)
    path = str(tmp_path / "mfp")
    n = mdi.write_media_index(corpus, path)
    assert n == corpus.count()

    got = {
        (r["media_id"], r["dup_of"], r["hamming"])
        for r in mdi.near_dups_against_media_index(spark, path, batch).collect()
    }
    # inline truth: fingerprint the union, banded join, keep cross pairs
    fps = multimodal.byte_grid_fingerprint(
        corpus.unionByName(batch), n_cells=32, threshold=9
    )
    inline = {
        (r["id_b"], r["id_a"], r["hamming"])
        for r in multimodal.fingerprint_near_dup_join(
            fps, n_cells=32, bands=4, max_hamming=3
        ).collect()
        if (r["id_b"] >= 100000) != (r["id_a"] >= 100000)  # cross only
    }
    assert got == inline and len(got) > 0


def test_append_then_self_check_excludes_self(spark, sf_dir, tmp_path):
    """Appending a batch then re-querying it finds its corpus twins but
    never itself (self-matches excluded by id inequality)."""
    corpus = _media(spark, sf_dir, F.col("doc_id") < 60)
    batch = _variants(spark, sf_dir, F.col("doc_id") < 60)
    path = str(tmp_path / "mfp")
    mdi.write_media_index(corpus, path)
    before = mdi.near_dups_against_media_index(spark, path, batch).count()
    assert before == 60  # every twin within hamming 2 of its base

    assert mdi.append_to_media_index(batch, path) == 60
    after = {
        (r["media_id"], r["dup_of"])
        for r in mdi.near_dups_against_media_index(spark, path, batch).collect()
    }
    # same twin pairs as before; no (x, x) self rows from the append
    assert all(a != b for a, b in after)
    assert {(a, b) for a, b in after if b < 100000} == {
        (i + 100000, i) for i in range(60)
    }


def test_dials_persist_and_guard(spark, sf_dir, tmp_path):
    corpus = _media(spark, sf_dir, F.col("doc_id") < 20)
    path = str(tmp_path / "mfp")
    with pytest.raises(ValueError, match="bands"):
        mdi.write_media_index(corpus, path, n_cells=32, bands=5)
    mdi.write_media_index(corpus, path, n_cells=16, bands=4, threshold=8)
    meta = mdi._read_meta(path)
    assert (meta["n_cells"], meta["bands"], meta["threshold"]) == (16, 4, 8)
    # the query side picks the stored dials (16-cell fps, 4-bit bands)
    out = mdi.near_dups_against_media_index(
        spark, path, _variants(spark, sf_dir, F.col("doc_id") < 20)
    )
    assert out.count() >= 20  # 4-bit bands collide often; twins all found
    assert set(out.columns) == {"media_id", "dup_of", "hamming"}
