"""Persisted ANN indexes: index queries must (a) return exactly what the
inline operators return, and (b) provably prune to the probed partition
directories — the 100-TB query path made concrete."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import similarity
from crypto_data_service_loader_spark.plans.explain import physical_plan
from crypto_data_service_loader_spark.sources import ann_index
from crypto_data_service_loader_spark.tables import load


def _query_vec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row["embedding"]]


def test_lsh_index_topk_matches_inline_operator(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "lsh_idx")
    planes = ann_index.write_lsh_index(emb, path, n_planes=4)
    assert planes == 4
    got = ann_index.lsh_index_topk(spark, path, q, k=10).collect()
    want = similarity.cosine_topk_lsh(emb, q, k=10, n_planes=4).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]
    assert len(got) > 0


def test_lsh_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    """The bucket filter must reach the FileIndex as a PartitionFilter —
    only the probed bucket's directory is scanned."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "lsh_idx")
    ann_index.write_lsh_index(emb, path, n_planes=4)
    plan = physical_plan(ann_index.lsh_index_topk(spark, path, q, k=5))
    assert "PartitionFilters" in plan
    # the equality predicate on the partition column is in the filter list
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "bucket" in pf and "=" in pf


def test_lsh_index_auto_planes_default(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    path = str(tmp_path / "lsh_auto")
    planes = ann_index.write_lsh_index(emb, path, n_vectors_hint=n)
    assert planes == similarity.auto_planes(n)


def test_lsh_append_uses_frozen_planes(spark, sf_dir, tmp_path):
    """Appending buckets with the SAVED planes: a query over the refreshed
    index equals the inline operator over the full corpus at the same
    plane count."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q = _query_vec(emb)
    path = str(tmp_path / "lsh_idx")
    ann_index.write_lsh_index(emb.filter(F.col("vec_id") % 2 == 0), path,
                              n_planes=3)
    ann_index.append_to_lsh_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    assert spark.read.parquet(f"{path}/vectors").count() == emb.count()
    got = ann_index.lsh_index_topk(spark, path, q, k=10).collect()
    want = similarity.cosine_topk_lsh(emb, q, k=10, n_planes=3).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]


def test_ivf_index_topk_matches_inline_operator(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "ivf_idx")
    ann_index.write_ivf_index(emb, path, k_centroids=8, train_iters=1)
    got = ann_index.ivf_index_topk(spark, path, q, k=10, nprobe=3).collect()
    want = similarity.ivf_topk(
        emb, q, k=10, k_centroids=8, nprobe=3, train_iters=1
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]
    assert len(got) > 0


def test_ivf_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "ivf_idx")
    ann_index.write_ivf_index(emb, path, k_centroids=8)
    plan = physical_plan(ann_index.ivf_index_topk(spark, path, q, nprobe=2))
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "centroid_id" in pf


def test_ivf_append_uses_frozen_centroids_and_probe_all_is_exact(
    spark, sf_dir, tmp_path
):
    """Appending a new crawl must assign with the SAVED quantizer (no
    retrain — old partitions would go stale), and probing every partition
    of the refreshed index is exact brute-force search over the full
    corpus."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    q = _query_vec(emb)
    path = str(tmp_path / "ivf_idx")
    centroids = ann_index.write_ivf_index(first, path, k_centroids=4)
    ann_index.append_to_ivf_index(second, path)

    idx = spark.read.parquet(f"{path}/vectors")
    assert idx.count() == emb.count()
    # appended rows sit in the partition the frozen quantizer dictates
    expect = similarity._assign_to_centroids(
        second, centroids, "embedding", "vec_id"
    )
    mismatch = (
        idx.select("vec_id", "centroid_id")
        .join(
            expect.select("vec_id", F.col("centroid_id").alias("want")),
            "vec_id",
        )
        .filter(F.col("centroid_id") != F.col("want"))
        .count()
    )
    assert mismatch == 0
    # probe-all == exact search over the whole (original + appended) corpus
    got = ann_index.ivf_index_topk(spark, path, q, k=10, nprobe=4).collect()
    want = similarity.cosine_topk(emb, q, k=10).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]


def test_multiprobe_recall_monotone_and_pruned(spark, sf_dir, tmp_path):
    """Multi-probe LSH: nprobe=1 equals the inline single-bucket path;
    growing nprobe never loses a result and climbs toward brute force;
    the probe set still reaches the file listing as a partition filter;
    nprobe = 2^planes recovers brute force exactly."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "lsh_idx")
    ann_index.write_lsh_index(emb, path, n_planes=4)
    brute = {r["vec_id"] for r in
             similarity.cosine_topk(emb, q, k=10).collect()}
    prev_hits = -1
    prev_scores: dict[int, float] = {}
    for nprobe in (1, 2, 4, 5):  # 5 = qbucket + all 4 single-bit flips
        res = ann_index.lsh_index_topk(spark, path, q, k=10, nprobe=nprobe)
        rows = res.collect()
        got = {r["vec_id"]: r["score"] for r in rows}
        hits = len(set(got) & brute)
        assert hits >= prev_hits  # recall never drops as probes grow
        prev_hits = hits
        # a candidate can only be displaced by a BETTER one: the k-th
        # best score is monotone non-decreasing in nprobe
        if prev_scores and rows:
            assert min(got.values()) >= min(prev_scores.values()) or \
                len(prev_scores) < 10
        prev_scores = got
    # single-bit probing reaches hamming-distance-1 buckets only — it is
    # a recall DIAL, not brute force (distance-2+ buckets stay unprobed)
    # single probe == the inline operator
    one = ann_index.lsh_index_topk(spark, path, q, k=10, nprobe=1)
    want = similarity.cosine_topk_lsh(emb, q, k=10, n_planes=4)
    assert [(r["vec_id"], r["score"]) for r in one.collect()] == \
        [(r["vec_id"], r["score"]) for r in want.collect()]
    # and the multi-bucket filter is still partition pruning, not a scan
    plan = physical_plan(
        ann_index.lsh_index_topk(spark, path, q, k=10, nprobe=4)
    )
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:160]


def test_ann_delete_then_query_equals_rebuild(spark, sf_dir, tmp_path):
    """Tombstoned ANN deletes (both kinds): delete-then-query equals an
    index rebuilt on the surviving vectors; deletes are idempotent;
    compaction folds the tombstones and changes nothing."""
    emb = load(spark, sf_dir, "embeddings")
    keep = emb.filter(F.col("vec_id") % 4 != 1)
    gone = [r["vec_id"] for r in
            emb.filter(F.col("vec_id") % 4 == 1).select("vec_id").collect()]
    q = _query_vec(emb)
    for kind in ("lsh", "ivf"):
        path = str(tmp_path / f"{kind}_idx")
        rebuilt = str(tmp_path / f"{kind}_rebuilt")
        if kind == "lsh":
            ann_index.write_lsh_index(emb, path, n_planes=3)
            ann_index.write_lsh_index(keep, rebuilt, n_planes=3)
            run = lambda p: ann_index.lsh_index_topk(spark, p, q, k=10,
                                                     nprobe=3)
        else:
            ann_index.write_ivf_index(emb, path, k_centroids=4)
            # rebuild must keep the SAME quantizer for equality: the
            # seed centroids depend on the vector set, so rebuild here
            # means compacting a copy, not retraining
            ann_index.write_ivf_index(emb, rebuilt, k_centroids=4)
            ann_index.delete_from_ann_index(spark, rebuilt, gone)
            ann_index.compact_ann_index(spark, rebuilt)
            run = lambda p: ann_index.ivf_index_topk(spark, p, q, k=10,
                                                     nprobe=4)
        assert ann_index.delete_from_ann_index(spark, path, gone) == len(gone)
        assert ann_index.delete_from_ann_index(spark, path, gone) == 0
        got = [(r["vec_id"], r["score"]) for r in run(path).collect()]
        want = [(r["vec_id"], r["score"]) for r in run(rebuilt).collect()]
        assert got == want
        assert not set(gone) & {v for v, _ in got}
        # compaction: same answers, tombstones gone
        assert ann_index.compact_ann_index(spark, path) == len(gone)
        import os

        assert not os.path.isdir(f"{path}/tombstones")
        assert [(r["vec_id"], r["score"]) for r in run(path).collect()] == want
        assert ann_index.compact_ann_index(spark, path) == 0


def test_ann_delete_string_ids(spark, sf_dir, tmp_path):
    """Regression (r7 ADVICE): the tombstone schema must come from the
    sidecar's recorded id_type — a hardcoded `long` failed createDataFrame
    (or type-mismatched the anti-join) on string-id corpora."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    q = _query_vec(load(spark, sf_dir, "embeddings"))
    path = str(tmp_path / "lsh_str")
    ann_index.write_lsh_index(emb, path, n_planes=3)
    import json

    meta = json.load(open(f"{path}/_ann_meta.json"))
    assert meta["id_type"] == "string"
    gone = ["doc-0", "doc-1", "doc-2"]
    assert ann_index.delete_from_ann_index(spark, path, gone) == 3
    assert ann_index.delete_from_ann_index(spark, path, gone) == 0
    ids = {r["vec_id"] for r in
           ann_index.lsh_index_topk(spark, path, q, k=50, nprobe=8).collect()}
    assert not set(gone) & ids and ids
    # compaction folds the string tombstones the same way
    assert ann_index.compact_ann_index(spark, path) == 3
    ids2 = {r["vec_id"] for r in
            ann_index.lsh_index_topk(spark, path, q, k=50, nprobe=8).collect()}
    assert ids2 == ids


def _dir_bytes(d):
    import os

    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_int8_lsh_index_recall_size_and_pruning(spark, sf_dir, tmp_path):
    """The int8 storage mode: (a) probe semantics identical (buckets from
    true floats) and top-10 recall >= 9 vs the float index, (b) vectors/
    on disk < 60% of the float index, (c) the scan still partition-prunes,
    (d) appends inherit int8 from the sidecar and stay queryable."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    fpath, qpath = str(tmp_path / "f_idx"), str(tmp_path / "q_idx")
    ann_index.write_lsh_index(emb, fpath, n_planes=4)
    ann_index.write_lsh_index(emb, qpath, n_planes=4, int8=True)

    fl = {r["vec_id"] for r in ann_index.lsh_index_topk(spark, fpath, q, k=10).collect()}
    qt = ann_index.lsh_index_topk(spark, qpath, q, k=10)
    qs = {r["vec_id"] for r in qt.collect()}
    assert len(fl & qs) >= 9

    import os

    assert _dir_bytes(os.path.join(qpath, "vectors")) < 0.6 * _dir_bytes(
        os.path.join(fpath, "vectors")
    )
    assert "PartitionFilters" in physical_plan(qt)

    extra = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    ).limit(20)
    ann_index.append_to_lsh_index(extra, qpath)
    after = ann_index.lsh_index_topk(spark, qpath, q, k=10).collect()
    assert len(after) == 10


def test_int8_ivf_index_recall_and_append(spark, sf_dir, tmp_path):
    """IVF int8: recall >= 9/10 vs the float IVF index at the same frozen
    quantizer; appends assign with saved centroids AND quantize per the
    sidecar."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    fpath, qpath = str(tmp_path / "fivf"), str(tmp_path / "qivf")
    ann_index.write_ivf_index(emb, fpath, k_centroids=8)
    ann_index.write_ivf_index(emb, qpath, k_centroids=8, int8=True)
    fl = {r["vec_id"] for r in ann_index.ivf_index_topk(spark, fpath, q, k=10).collect()}
    qs = {r["vec_id"] for r in ann_index.ivf_index_topk(spark, qpath, q, k=10).collect()}
    assert len(fl & qs) >= 9

    extra = emb.select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"
    ).limit(10)
    ann_index.append_to_ivf_index(extra, qpath)
    assert len(ann_index.ivf_index_topk(spark, qpath, q, k=10).collect()) == 10


def test_int8_index_delete_compact_equals_rebuild(spark, sf_dir, tmp_path):
    """Tombstone-delete then compact on an INT8 index: queries equal a
    fresh int8 rebuild on the surviving corpus, the tombstone store is
    cleared, and the compacted files keep the (scale, qvec) schema —
    compaction used to select the nonexistent float vector column."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "q_del")
    ann_index.write_lsh_index(emb, path, n_planes=4, int8=True)
    victims = [r["vec_id"] for r in ann_index.lsh_index_topk(
        spark, path, q, k=3).collect()]
    ann_index.delete_from_ann_index(spark, path, victims)
    folded = ann_index.compact_ann_index(spark, path)
    assert folded == len(victims)

    import os

    assert not os.path.isdir(os.path.join(path, "tombstones"))
    cols = set(spark.read.parquet(os.path.join(path, "vectors")).columns)
    assert {"scale", "qvec"} <= cols and "embedding" not in cols

    rebuilt = str(tmp_path / "q_rebuilt")
    survivors = emb.filter(~F.col("vec_id").isin(victims))
    ann_index.write_lsh_index(survivors, rebuilt, n_planes=4, int8=True)
    got = [(r["vec_id"], r["score"]) for r in ann_index.lsh_index_topk(
        spark, path, q, k=10).collect()]
    want = [(r["vec_id"], r["score"]) for r in ann_index.lsh_index_topk(
        spark, rebuilt, q, k=10).collect()]
    assert got == want


def test_ivfpq_index_topk_matches_inline_operator(spark, sf_dir, tmp_path):
    """The persisted compressed index returns EXACTLY what the inline
    ivfpq_topk returns: same frozen quantizers, same micro-int ADC."""
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "ivfpq_idx")
    ann_index.write_ivfpq_index(emb, path, k_centroids=8, m=4, n_codes=8)
    got = ann_index.ivfpq_index_topk(spark, path, q, k=5, nprobe=2).collect()
    want = similarity.ivfpq_topk(
        emb, q, k=5, k_centroids=8, nprobe=2, m=4, n_codes=8
    ).collect()
    assert [(r["vec_id"], r["adc_micro"], r["rank"]) for r in got] == [
        (r["vec_id"], r["adc_micro"], r["rank"]) for r in want
    ]
    assert len(got) == 5


def test_ivfpq_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    q = _query_vec(emb)
    path = str(tmp_path / "ivfpq_idx")
    ann_index.write_ivfpq_index(emb, path, k_centroids=8)
    plan = physical_plan(
        ann_index.ivfpq_index_topk(spark, path, q, nprobe=2))
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "centroid_id" in pf


def test_ivfpq_append_uses_frozen_quantizers(spark, sf_dir, tmp_path):
    """Append encodes against the SAVED coarse centroids + codebook.
    Writing from a batch that contains the quantizer-seed ids
    (0..k_centroids+n_codes-1) and appending the rest must equal the
    inline operator over the full corpus (whose deterministic seeds are
    those same ids)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q = _query_vec(emb)
    path = str(tmp_path / "ivfpq_idx")
    first = emb.filter((F.col("vec_id") < 16) | (F.col("vec_id") % 2 == 0))
    rest = emb.filter((F.col("vec_id") >= 16) & (F.col("vec_id") % 2 == 1))
    ann_index.write_ivfpq_index(first, path, k_centroids=8, m=4, n_codes=8)
    ann_index.append_to_ivfpq_index(rest, path)
    assert spark.read.parquet(f"{path}/vectors").count() == emb.count()
    got = ann_index.ivfpq_index_topk(spark, path, q, k=5, nprobe=8).collect()
    want = similarity.ivfpq_topk(
        emb, q, k=5, k_centroids=8, nprobe=8, m=4, n_codes=8
    ).collect()
    assert [(r["vec_id"], r["adc_micro"]) for r in got] == [
        (r["vec_id"], r["adc_micro"]) for r in want
    ]


def test_ivfpq_index_tombstones(spark, sf_dir, tmp_path):
    """Deleting the top hit removes it from results without touching
    the code partitions (anti-join), like the other index kinds."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    q = _query_vec(emb)
    path = str(tmp_path / "ivfpq_idx")
    ann_index.write_ivfpq_index(emb, path, k_centroids=8)
    before = ann_index.ivfpq_index_topk(spark, path, q, k=5, nprobe=8).collect()
    top_id = before[0]["vec_id"]
    ann_index.delete_from_ann_index(spark, path, [top_id])
    after = ann_index.ivfpq_index_topk(spark, path, q, k=5, nprobe=8).collect()
    assert top_id not in {r["vec_id"] for r in after}
    assert [r["vec_id"] for r in after] == [
        r["vec_id"] for r in before[1:]] + [after[-1]["vec_id"]]
