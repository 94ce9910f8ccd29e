"""Persisted kNN-graph index: exact equality with the inline pipeline
(triangles + PageRank), partition-pruned point lookups, and the
no-recompute read path."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import graph, similarity
from crypto_data_service_loader_spark.sources import graph_index
from crypto_data_service_loader_spark.tables import load


def _edges_df(spark, path):
    return graph_index.read_knn_graph(spark, path).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )


def test_index_edges_equal_inline_knn_graph(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "gidx")
    n = graph_index.write_knn_graph(emb, path, k=3, n_planes=4)
    assert n == emb.count()
    inline = similarity.knn_graph(emb, k=3, n_planes=4)
    stored = graph_index.read_knn_graph(spark, path)
    key = lambda r: (r["vec_id"], r["rank"])
    assert sorted(map(tuple, stored.collect()), key=lambda t: (t[0], t[3])) \
        == sorted(map(tuple, inline.collect()), key=lambda t: (t[0], t[3]))


def test_analytics_over_index_equal_inline(spark, sf_dir, tmp_path):
    """Triangle counts AND PageRank over the stored edges equal the
    inline rebuild — the index-vs-inline contract for the graph family
    (same pattern the ANN / postings indexes are held to)."""
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "gidx")
    graph_index.write_knn_graph(emb, path, k=3, n_planes=4)
    inline_edges = similarity.knn_graph(emb, k=3, n_planes=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    nodes = graph_index.read_knn_nodes(spark, path)
    for fn, kw in ((graph.triangle_counts, {}),
                   (graph.pagerank, {"iters": 2})):
        a = fn(_edges_df(spark, path), nodes, id_col="vec_id", **kw)
        b = fn(inline_edges, emb.select("vec_id"), id_col="vec_id", **kw)
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))


def test_read_path_is_scan_only(spark, sf_dir, tmp_path):
    """The stored edge read must be ONE parquet scan of the index —
    no LSH rebuild (no join/exchange/embedding reference) in its plan."""
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "gidx")
    graph_index.write_knn_graph(emb, path, k=3, n_planes=4)
    df = graph_index.read_knn_graph(spark, path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
    for op in ("Join", "Exchange", "Window"):
        assert op not in plan, (op, plan)
    files = df.inputFiles()
    assert files and all("gidx/edges" in f for f in files)


def test_lookup_prunes_to_probe_buckets(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "gidx")
    graph_index.write_knn_graph(emb, path, k=3, n_planes=4, n_buckets=16)
    ids = [r["vec_id"] for r in emb.select("vec_id").head(3)]
    q = graph_index.knn_neighbors_lookup(spark, path, ids)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "src_bucket" in plan.split("PartitionFilters")[1][:160]
    got = {r["vec_id"] for r in q.collect()}
    # every looked-up node with stored edges comes back, nothing else
    inline = similarity.knn_graph(emb, k=3, n_planes=4)
    expect = {r["vec_id"] for r in
              inline.filter(F.col("vec_id").isin(ids)).collect()}
    assert got == expect


def test_driver_and_spark_bucket_arithmetic_agree(spark):
    """_bucket_of (driver Python) and _bucket_col (Spark) must place the
    same id in the same bucket — for long AND string ids — or lookups
    probe the wrong directory."""
    ids = [(0,), (1,), (42,), (2**40 + 7,)]
    df = spark.createDataFrame(ids, "id long").select(
        "id", graph_index._bucket_col(F.col("id"), 16).alias("b")
    )
    for r in df.collect():
        assert r["b"] == graph_index._bucket_of(r["id"], 16)
    sdf = spark.createDataFrame([("a",), ("doc-9",)], "id string").select(
        "id", graph_index._bucket_col(F.col("id"), 16).alias("b")
    )
    for r in sdf.collect():
        assert r["b"] == graph_index._bucket_of(r["id"], 16)


def test_empty_corpus_index(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").filter(F.lit(False))
    path = str(tmp_path / "gidx_empty")
    assert graph_index.write_knn_graph(emb, path, k=3, n_planes=4) == 0
    assert graph_index.is_built(path)
    assert graph_index.read_knn_graph(spark, path).count() == 0
    assert graph_index.read_knn_nodes(spark, path).count() == 0
    assert graph_index.knn_neighbors_lookup(spark, path, [1]).count() == 0


def test_incomplete_build_not_marked_built(tmp_path):
    """The meta sidecar is the completion marker — a directory without
    it (crashed build) must not be treated as a usable index."""
    p = tmp_path / "gidx_partial"
    (p / "edges").mkdir(parents=True)
    assert not graph_index.is_built(str(p))
