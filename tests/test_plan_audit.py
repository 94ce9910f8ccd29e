"""Whole-suite physical-plan audit — the would-this-survive-100× check.

Every registered query's plan is inspected:
- no CartesianProduct / BroadcastNestedLoopJoin except the allowlisted
  pair-generation operators whose join condition is a genuine inequality
  (documented O(n²) verify stages with LSH/IVF scale paths);
Column-pruning for representative queries is asserted in test_plans.py.
"""

from __future__ import annotations

import pytest

from crypto_data_service_loader_spark.plans.explain import physical_plan
from crypto_data_service_loader_spark.suite import QUERIES

#: the only tolerated nested-loop shapes: broadcasts of provably tiny
#: (constant-size) single-row/centroid tables. Pair-generation queries are
#: NOT allowlisted — dedup_ngram_jaccard rides the MinHash-LSH candidate
#: equi-join and dedup_embedding_cosine the block-partitioned task
#: equi-join, so the whole suite plans zero data-dependent nested loops.
NESTED_LOOP_OK = {
    "sim_cosine_topk_ivf",  # broadcast of a 16-row centroid table
    "semantic_dedup",  # broadcast of an 8-row centroid table (quantizer)
    "tpch_q22",  # scalar-subquery threshold: single-row aggregate broadcast
    "tpch_q11",  # HAVING scalar subquery: single-row aggregate broadcast
    "text_tfidf_top_terms",  # corpus-count N: single-row aggregate broadcast
    "bm25_topk",  # corpus stats (N, avgdl): single-row aggregate broadcast
    # same (N, avgdl) single-row broadcast, computed from the doclens
    # store since tombstone-exact stats:
    "bm25_topk_indexed",
    "key_skew_report",  # total row count: single-row aggregate broadcast
    "hybrid_search",  # BM25 stage's same single-row (N, avgdl) broadcast
    # constant-size broadcasts twice over: the (N, avgdl) single row in
    # the BM25 member list plus the 4-row query-vector set the semantic
    # member list broadcasts onto one embedding scan:
    "hybrid_rrf",
    # the postings index's doclens-derived (N, avgdl) single-row
    # broadcast riding inside the composed retrieval path:
    "hybrid_search_indexed",
    # two single-row count aggregates crossed into the one recall row:
    "ann_recall_at_k",
    "dedup_pair_recall",
    # the d-row sketch inner-product crossed with the single-row true
    # count (the audit column); both sides bounded by construction:
    "join_size_estimate",
    # the pair generator is an inequality join of the distinct GROUP
    # list with itself (|groups|^2 keys, never data; register tables
    # join by equi-key afterwards):
    "hll_source_overlap",
}

@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(name, spark, sf_dir):
    plan = physical_plan(QUERIES[name](spark, sf_dir))
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
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
