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

    touched = {int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{path}/bucket=*")}
    assert probes <= touched  # probe dirs exist on disk
    # a term's postings live in exactly one bucket: df derived from the
    # pruned scan is complete, which the equality test above relies on


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
