"""Whole-suite physical-plan audit — the would-this-survive-100× check.

Every registered query's plan is inspected:
- no CartesianProduct / BroadcastNestedLoopJoin except the allowlisted
  pair-generation operators whose join condition is a genuine inequality
  (documented O(n²) verify stages with LSH/IVF scale paths);
Column-pruning for representative queries is asserted in test_plans.py.
"""

from __future__ import annotations

import pytest

from crypto_data_service_loader_spark.plans.explain import (
    nested_loop_build_rows,
    physical_plan,
)
from crypto_data_service_loader_spark.suite import QUERIES

#: the only tolerated nested-loop shapes: broadcasts of provably tiny
#: (constant-size) single-row/centroid tables. Pair-generation queries are
#: NOT allowlisted — dedup_ngram_jaccard rides the MinHash-LSH candidate
#: equi-join and dedup_embedding_cosine the block-partitioned task
#: equi-join, so the whole suite plans zero data-dependent nested loops.
#:
#: RATCHET: each entry maps to the max row count its nested-loop build
#: side is allowed to reach — asserted against the EXECUTED plan's
#: metrics (test_allowlisted_build_sides_stay_tiny), so the
#: justification is executable, not a comment: fattening an allowlisted
#: broadcast fails the audit instead of hiding behind the allowlist.
NESTED_LOOP_OK = {
    "sim_cosine_topk_ivf": 16,  # broadcast of a 16-row centroid table
    # IVF-PQ coarse quantizer: broadcast of the 8-row coarse-centroid
    # table (assignment argmin); the search key also crosses the 1-row
    # query vector onto that same 8-row table for probe selection:
    "ivfpq_encode": 8,
    "sim_topk_ivfpq": 8,
    "semantic_dedup": 8,  # broadcast of an 8-row centroid table (quantizer)
    # histogram-ntile total: the single-row corpus count crossed onto
    # every row for the ntile size arithmetic:
    "curriculum_order": 1,
    "tpch_q22": 1,  # scalar-subquery threshold: single-row aggregate broadcast
    "tpch_q11": 1,  # HAVING scalar subquery: single-row aggregate broadcast
    "text_tfidf_top_terms": 1,  # corpus-count N: single-row aggregate broadcast
    "bm25_topk": 1,  # corpus stats (N, avgdl): single-row aggregate broadcast
    # same (N, avgdl) single-row broadcast, computed from the doclens
    # store since tombstone-exact stats:
    "bm25_topk_indexed": 1,
    "key_skew_report": 1,  # total row count: single-row aggregate broadcast
    "hybrid_search": 1,  # BM25 stage's same single-row (N, avgdl) broadcast
    # constant-size broadcasts twice over: the (N, avgdl) single row in
    # the BM25 member list plus the 4-row query-vector set the semantic
    # member list broadcasts onto one embedding scan:
    "hybrid_rrf": 4,
    # the postings index's doclens-derived (N, avgdl) single-row
    # broadcast riding inside the composed retrieval path:
    "hybrid_search_indexed": 1,
    # two single-row count aggregates crossed into the one recall row:
    "ann_recall_at_k": 1,
    "dedup_pair_recall": 1,
    # the d-row sketch inner-product crossed with the single-row true
    # count (the audit column); both sides bounded by construction:
    "join_size_estimate": 4,
    # the pair generator is an inequality join of the distinct GROUP
    # list with itself (|groups|^2 keys, never data; register tables
    # join by equi-key afterwards); the group column is source-count
    # sized and hll_set_ops now hard-caps it at max_groups:
    "hll_source_overlap": 64,
}

#: RATCHET #2 (VERDICT r12 #6): gate keys that PIN an LSH/centroid dial
#: for oracle determinism (n_planes / k_centroids as fixed literals
#: instead of the production auto-dial). A pinned dial is safe ONLY
#: while its input fixture stays bounded — SCALE_NOTES measured the
#: pinned hard_negative_mining config going quadratic at a 30x corpus
#: (241.6 s) while the auto-dialed entry point held 13.6 s. Each entry
#: maps the key to (scan label fragment, max rows that scan may emit in
#: the executed plan): attaching a pinned-dial gate key to an unbounded
#: input fails the audit the moment the fixture outgrows the bound,
#: instead of silently shipping a quadratic regime.
PINNED_DIAL_OK = {
    "hard_negative_mining": ("embeddings", 2000),  # pins n_planes=4
    "contrastive_triplets": ("embeddings", 2000),  # pins n_planes=4
    "knn_graph_lsh": ("embeddings", 2000),         # pins n_planes=4
    "semantic_dedup": ("embeddings", 2000),        # pins k_centroids=8
}


@pytest.mark.parametrize("name", sorted(PINNED_DIAL_OK))
def test_pinned_dial_inputs_stay_bounded(name, spark, sf_dir):
    """Run each pinned-dial gate key and read every matching scan's
    ACTUAL output row count from the executed plan — it must stay within
    the documented fixture bound (2000 = the largest shipped fixture,
    sf0.1's embeddings table; the 30x quadratic regime starts far
    above it)."""
    from crypto_data_service_loader_spark.plans.explain import (
        scan_output_rows,
    )

    from crypto_data_service_loader_spark.tables import load

    fragment, bound = PINNED_DIAL_OK[name]
    scans = [
        (label, rows)
        for label, rows in scan_output_rows(QUERIES[name](spark, sf_dir))
        if fragment in label
    ]
    if scans:
        for label, rows in scans:
            assert 0 <= rows <= bound, (
                f"{name}: pinned-dial input scan '{label}' emitted {rows} "
                f"rows (documented fixture bound {bound}) — pin the dial "
                "only on bounded fixtures or switch the key to the "
                "auto-dialed path"
            )
    else:
        # materialize-once operators (semantic_dedup, contrastive
        # triplets) localCheckpoint the embeddings early, truncating the
        # lineage before the final plan — the scan ran in a prior job.
        # These keys consume the whole unfiltered table, so the fixture
        # count IS the pinned path's input bound.
        n = load(spark, sf_dir, fragment).count()
        assert n <= bound, (
            f"{name}: pinned-dial fixture '{fragment}' has {n} rows "
            f"(documented bound {bound}) — the pinned dial is no longer "
            "attached to a bounded input"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(name, spark, sf_dir):
    plan = physical_plan(QUERIES[name](spark, sf_dir))
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )


@pytest.mark.parametrize("name", sorted(NESTED_LOOP_OK))
def test_allowlisted_build_sides_stay_tiny(name, spark, sf_dir):
    """The allowlist ratchet: run each allowlisted query and read every
    nested-loop build side's ACTUAL output row count from the executed
    plan's SQL metrics — it must stay within the documented constant
    bound. A query may legitimately plan zero nested loops at this SF
    (AQE replans a tiny side into a hash join); what it may never do is
    plan one with a fat build side."""
    rows = nested_loop_build_rows(QUERIES[name](spark, sf_dir))
    bound = NESTED_LOOP_OK[name]
    for r in rows:
        assert r is not None and r <= bound, (
            f"{name}: nested-loop build side reached {r} rows "
            f"(documented bound {bound}) — the allowlist justification "
            "no longer holds"
        )


def test_runtime_bloom_filter_fires_when_thresholds_met(spark, sf_dir):
    """Runtime bloom-filter join pushdown is enabled session-wide; its
    size gates (creation <= 10 MiB, application-side scan >= 10 GiB) mean
    it only fires on big facts — never at test SF. Prove the machinery is
    live by dropping the application gate: a dim-filtered fact join must
    then plan a bloom filter (might_contain) on the fact side's scan."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.tables import load

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    key = "spark.sql.optimizer.runtime.bloomFilter."
    prev = spark.conf.get(key + "applicationSideScanSizeThreshold")
    spark.conf.set(key + "applicationSideScanSizeThreshold", "0")
    # the static broadcast threshold must not swallow the join: bloom
    # filters are injected for shuffle joins (no point pre-filtering a
    # broadcast probe) — force SMJ by disabling static broadcast
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, sf_dir, "lineitem")
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        plan = physical_plan(
            li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
                "o_orderpriority"
            ).count()
        )
        assert "might_contain" in plan or "bloom_filter" in plan.lower(), plan
    finally:
        spark.conf.set(key + "applicationSideScanSizeThreshold", prev)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
