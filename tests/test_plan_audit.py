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
    "tpch_q22",  # scalar-subquery threshold: single-row aggregate broadcast
    "tpch_q11",  # HAVING scalar subquery: single-row aggregate broadcast
    "text_tfidf_top_terms",  # corpus-count N: single-row aggregate broadcast
}

@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_accidental_cartesian(name, spark, sf_dir):
    plan = physical_plan(QUERIES[name](spark, sf_dir))
    if name not in NESTED_LOOP_OK:
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )
