"""Partition-layout proofs: the 100 TB storage-layout claims, demonstrated
on real partitioned writes — date-partition pruning on the registry,
salting correctness under heavy key skew."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators.relational import salted_join
from crypto_data_service_loader_spark.plans.explain import formatted_plan
from crypto_data_service_loader_spark.schemas import REGISTRY

D = datetime.date


def test_date_partitioned_registry_prunes(spark, tmp_path):
    """A create_date-partitioned registry scan with a date filter must read
    only the matching partition (PartitionFilters, not a full scan)."""
    rows = [
        (f"f{i}", D(2024, 3, 10 + (i % 3)), "FINISHED") for i in range(30)
    ]
    path = str(tmp_path / "registry_parts")
    spark.createDataFrame(rows, REGISTRY).write.partitionBy(
        "create_date"
    ).parquet(path)

    df = spark.read.parquet(path).filter(
        F.col("create_date") == F.lit("2024-03-11").cast("date")
    )
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the pruned scan touches 1 of 3 partitions
    assert df.count() == 10
    pruned = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "create_date" in pruned


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides of a recurring big-big join on the join key
    removes the per-query shuffle entirely — the 100 TB recipe for
    fact⋈fact joins that run every cycle. Asserts the joined plan has NO
    Exchange on either side."""
    from crypto_data_service_loader_spark.sources.bucketed import (
        cobucketed_join,
        write_bucketed,
    )
    from crypto_data_service_loader_spark.tables import load

    # warehouse dir is a static conf, set in the session fixture
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    try:
        write_bucketed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
            .withColumnRenamed("l_orderkey", "okey"),
            "bucketdemo.li_b", buckets=8, keys="okey",
        )
        write_bucketed(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
            .withColumnRenamed("o_orderkey", "okey"),
            "bucketdemo.ord_b", buckets=8, keys="okey",
        )

        # disable auto-broadcast so the join strategy is the bucketed SMJ
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = cobucketed_join(spark, "bucketdemo.li_b", "bucketdemo.ord_b",
                                on="okey")
            plan = formatted_plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: zero shuffle
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_salted_join_correct_under_skew(spark):
    """90%-hot-key skew: salted join must return exactly the plain join's
    rows (salting is a physical rewrite, never a semantic one)."""
    n = 20_000
    left = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = left.join(right, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    salted = salted_join(left, right, "k", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])
    assert plain["n"] >= n * 9 // 10  # the hot key really is hot


def test_incremental_dedup_over_bucketed_index_no_index_shuffle(spark, sf_dir):
    """The production incremental-dedup layout: the corpus fingerprint
    index is a bucketed table (shuffle paid once at ingest), each new
    crawl's fingerprints bucket the same way, and the anti-join is then
    exchange-free — at 100 TB the index (the big side) is never reshuffled
    per batch. Correctness must equal the plain DataFrame path."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import dedup
    from crypto_data_service_loader_spark.sources.bucketed import write_bucketed
    from crypto_data_service_loader_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 < 2)
    index = docs.filter(F.col("doc_id") % 10 >= 2)
    expected = {r["fingerprint"] for r in dedup.incremental_dedup(batch, index).collect()}

    spark.sql("CREATE DATABASE IF NOT EXISTS dedupdemo")
    try:
        write_bucketed(
            index.select(
                dedup.normalized_fingerprint(F.col("text")).alias("fingerprint")
            ).distinct(),
            "dedupdemo.fp_index", buckets=8, keys="fingerprint",
        )
        write_bucketed(
            dedup.exact_dedup(batch),
            "dedupdemo.fp_batch", buckets=8, keys="fingerprint",
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            survivors = spark.table("dedupdemo.fp_batch").join(
                spark.table("dedupdemo.fp_index"), "fingerprint", "left_anti"
            )
            plan = formatted_plan(survivors)
            assert "Exchange" not in plan  # both sides pre-bucketed
            assert {r["fingerprint"] for r in survivors.collect()} == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP DATABASE IF EXISTS dedupdemo CASCADE")
