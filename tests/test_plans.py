"""Plan-shape tests: the 100-TB design assertions. Values being right is
necessary; these check the plan is the one we'd want on a 1000-executor
cluster — filters pushed to the scan, column pruning, broadcast vs
sort-merge choices, top-k planned as TakeOrderedAndProject."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import relational as rel
from crypto_data_service_loader_spark.plans.explain import (
    formatted_plan,
    has_pushed_filter,
    physical_plan,
    reads_only_columns,
    uses_broadcast_join,
    uses_sortmerge_join,
)
from crypto_data_service_loader_spark.tables import load, registry


def test_filter_pushdown_to_parquet(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") == 42).select("l_quantity")
    assert has_pushed_filter(li, "l_orderkey")


def test_column_pruning(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    assert reads_only_columns(li, {"l_orderkey", "l_quantity"})


def test_registry_derivation_prunes_columns(spark, sf_dir):
    # registry needs only 3 of orders' 6 columns; scan must not read more
    assert reads_only_columns(
        registry(spark, sf_dir), {"o_orderkey", "o_orderdate", "o_orderstatus"}
    )


def test_broadcast_join_is_broadcast(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = rel.broadcast_join(li, part, li.l_partkey == part.p_partkey)
    assert uses_broadcast_join(j)


def test_sortmerge_join_is_sortmerge(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey")
    j = rel.sortmerge_join(li, orders, ["okey"])
    assert uses_sortmerge_join(j)


def test_topk_plans_take_ordered(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    k = rel.top_k(orders, "o_totalprice", 10)
    assert "TakeOrderedAndProject" in physical_plan(k)


def test_anti_join_dedup_no_cartesian(spark, sf_dir):
    from crypto_data_service_loader_spark.operators.registry import dedup_new_files
    from crypto_data_service_loader_spark.tables import discovered_candidates

    j = dedup_new_files(discovered_candidates(spark, sf_dir), registry(spark, sf_dir))
    plan = formatted_plan(j)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The as-of composite must cost ONE exchange + ONE window — the same
    as a single sort-merge join; more means the union trick regressed."""
    from crypto_data_service_loader_spark.suite import q_asof_last_tick

    plan = physical_plan(q_asof_last_tick(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_flagship_partial_aggregation(spark, sf_dir):
    """groupBy must plan partial (map-side) agg before the shuffle."""
    from crypto_data_service_loader_spark.suite import q_flagship

    plan = physical_plan(q_flagship(spark, sf_dir))
    assert "partial" in plan.lower()
    assert plan.lower().count("hashaggregate") >= 2


def test_hot_queries_stay_in_whole_stage_codegen(spark, sf_dir):
    """The charter's 'stay JVM-side' bar, measured: the flagship scan-agg
    and a TPC-H join pipeline must run inside WholeStageCodegen spans
    (final adaptive plan, counted post-execution). Zero spans would mean
    an interpreted pipeline — a silent 2-10x regression."""
    from crypto_data_service_loader_spark.plans.explain import (
        whole_stage_codegen_spans,
    )
    from crypto_data_service_loader_spark.suite import QUERIES

    for name in ("flagship_pricing_summary", "tpch_q3", "win_moving_avg"):
        spans = whole_stage_codegen_spans(QUERIES[name](spark, sf_dir))
        assert spans >= 1, f"{name} runs with no codegen span"
