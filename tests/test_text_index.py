"""Persisted postings index: exact equality with the inline BM25
operator, partition-pruned query scans, and exact-stat appends."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import text
from crypto_data_service_loader_spark.sources import text_index
from crypto_data_service_loader_spark.tables import load

QUERIES = [(1, "fast table scan"), (2, "customer join query")]


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in df.collect()
    )


def test_index_query_equals_inline_bm25(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "pidx")
    n = text_index.write_postings_index(docs, path, n_buckets=16)
    assert n == docs.count()
    qdf = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    inline = text.bm25_topk(docs, qdf, k=5)
    via_index = text_index.postings_index_bm25(spark, path, QUERIES, k=5)
    assert _rows(via_index) == _rows(inline)


def test_index_query_prunes_to_probe_buckets(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "pidx")
    text_index.write_postings_index(docs, path, n_buckets=16)
    q = text_index.postings_index_bm25(spark, path, [(1, "fast scan")], k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the bucket filter must reach the file listing, not a post-scan filter
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:120]
    probes = {
        text_index._bucket_of(t, 16) for t in ("fast", "scan")
    }
    # only the probed directories are read
    import glob

    touched = {int(p.rsplit("=", 1)[1])
               for p in glob.glob(f"{path}/postings/bucket=*")}
    assert probes <= touched  # probe dirs exist on disk
    # a term's postings live in exactly one bucket: df derived from the
    # pruned scan is complete, which the equality test above relies on


def test_probe_set_uses_corpus_tokenizer(spark, tmp_path):
    """Probe buckets must come from the SPARK-tokenized terms: Python's
    str.split also breaks on NBSP (which the corpus \\s+ tokenizer does
    not), so a Python-derived probe set would look in the wrong bucket
    for a term containing one and silently return nothing."""
    term = "hot word"  # NBSP inside: ONE term to \s+, two to Python
    docs = spark.createDataFrame(
        [(1, f"{term} extra"), (2, "other text")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pidx")
    text_index.write_postings_index(docs, path, n_buckets=64)
    hits = text_index.postings_index_bm25(spark, path, [(1, term)], k=5)
    got = [r["doc_id"] for r in hits.collect()]
    assert got == [1]


def test_string_id_corpus_and_empty_schema_agreement(spark, tmp_path):
    """The id column type is recorded in the sidecar so a zero-doc
    index returns the same schema as a populated one (string ids)."""
    schema = "doc_id string, text string"
    path = str(tmp_path / "pidx_str")
    docs = spark.createDataFrame([("a", "alpha beta"), ("b", "beta")], schema)
    text_index.write_postings_index(docs, path, n_buckets=4, id_col="doc_id")
    full = text_index.postings_index_bm25(spark, path, [(1, "beta")], k=5)
    assert [r["doc_id"] for r in full.collect()] == ["a", "b"] or \
        sorted(r["doc_id"] for r in full.collect()) == ["a", "b"]
    empty_path = str(tmp_path / "pidx_empty")
    text_index.write_postings_index(
        docs.filter(F.lit(False)), empty_path, n_buckets=4, id_col="doc_id"
    )
    empty = text_index.postings_index_bm25(spark, empty_path, [(1, "beta")], k=5)
    # names + types must agree (nullability legitimately differs:
    # row_number makes the populated path's rank non-nullable)
    assert [(f.name, f.dataType) for f in empty.schema] == \
        [(f.name, f.dataType) for f in full.schema]
    assert empty.unionByName(full).count() == full.count()


def test_append_keeps_exact_stats_and_equality(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "pidx")
    text_index.write_postings_index(first, path, n_buckets=8)
    text_index.append_to_postings_index(second, path)
    meta = text_index._read_meta(path)
    assert meta["n_docs"] == docs.count()
    qdf = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    inline = text.bm25_topk(docs, qdf, k=5)
    via_index = text_index.postings_index_bm25(spark, path, QUERIES, k=5)
    assert _rows(via_index) == _rows(inline)


def test_delete_then_query_equals_rebuild_then_query(spark, sf_dir, tmp_path):
    """Tombstoned deletes: the index answers EXACTLY like an index
    rebuilt on the surviving corpus (stats adjust exactly via doclens,
    postings anti-join the tombstones), deletes are idempotent, appends
    after deletes stay exact, and compaction changes nothing."""
    docs = load(spark, sf_dir, "documents")
    keep = docs.filter(F.col("doc_id") % 5 != 0)
    gone_ids = [r["doc_id"] for r in
                docs.filter(F.col("doc_id") % 5 == 0).collect()]
    path = str(tmp_path / "pidx")
    text_index.write_postings_index(docs, path, n_buckets=16)
    n = text_index.delete_from_postings_index(spark, path, gone_ids)
    assert n == len(gone_ids)
    # idempotent: a replayed delete adjusts nothing
    assert text_index.delete_from_postings_index(spark, path, gone_ids) == 0
    # unknown ids adjust nothing
    assert text_index.delete_from_postings_index(spark, path, [10**12]) == 0
    rebuilt = str(tmp_path / "pidx_rebuilt")
    text_index.write_postings_index(keep, rebuilt, n_buckets=16)
    got = text_index.postings_index_bm25(spark, path, QUERIES, k=5)
    want = text_index.postings_index_bm25(spark, rebuilt, QUERIES, k=5)
    assert _rows(got) == _rows(want)
    # no deleted doc can surface
    assert not set(gone_ids) & {r["doc_id"] for r in got.collect()}
    # stats adjusted exactly
    ma, mb = text_index._read_meta(path), text_index._read_meta(rebuilt)
    assert (ma["n_docs"], ma["total_tokens"]) == \
        (mb["n_docs"], mb["total_tokens"])
    # compaction folds tombstones; answers unchanged; tombstones cleared
    assert text_index.compact_postings_index(spark, path) == len(gone_ids)
    import os

    assert not os.path.isdir(f"{path}/tombstones")
    assert _rows(
        text_index.postings_index_bm25(spark, path, QUERIES, k=5)
    ) == _rows(want)
    # re-running compaction is a no-op (crash-window self-healing)
    assert text_index.compact_postings_index(spark, path) == 0


def test_append_after_delete_stays_exact(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") < 300)
    extra = docs.filter(F.col("doc_id") >= 300)
    gone = [r["doc_id"] for r in
            first.filter(F.col("doc_id") % 7 == 0).collect()]
    path = str(tmp_path / "pidx")
    text_index.write_postings_index(first, path, n_buckets=8)
    text_index.delete_from_postings_index(spark, path, gone)
    text_index.append_to_postings_index(extra, path)
    live = docs.filter(
        (F.col("doc_id") >= 300)
        | ((F.col("doc_id") < 300) & (F.col("doc_id") % 7 != 0))
    )
    qdf = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    inline = text.bm25_topk(live, qdf, k=5)
    via_index = text_index.postings_index_bm25(spark, path, QUERIES, k=5)
    assert _rows(via_index) == _rows(inline)


def test_indexed_hybrid_equals_inline_hybrid(spark, sf_dir, tmp_path):
    """The composed retrieval path: postings-index BM25 candidates into
    the shared rerank_cosine stage equal the inline hybrid_topk row for
    row — the precompute-once story extended to the composition."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pidx_h")
    text_index.write_postings_index(docs, path, n_buckets=16)
    qdf = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    inline = text.hybrid_topk(docs, emb, qdf, k=5, n_candidates=20)
    cands = text_index.postings_index_bm25(
        spark, path, QUERIES, k=20
    ).select("query_id", "doc_id", F.col("score").alias("bm25_score"))
    via_index = text.rerank_cosine(cands, emb, k=5)
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["doc_id"], r["bm25_score"], r["cosine"], r["rank"])
        for r in df.collect()
    )
    assert key(via_index) == key(inline)
