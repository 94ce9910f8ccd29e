"""Zone-map data skipping: pruned read == full filtered scan, files
actually skipped on clustered layouts, honest no-skip on random ones,
all-NULL zones and open ranges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.sources import zonemap


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """12 files, each covering a narrow o_totalprice band (sorted
    write), plus one all-NULL file — the layout zone maps exist for."""
    d = tmp_path_factory.mktemp("zm")
    path = str(d / "orders")
    rows = [(i, float(i * 10), "F" if i % 2 else "O") for i in range(1200)]
    df = spark.createDataFrame(rows, "o_orderkey long, price double, status string")
    df.repartitionByRange(12, "price").write.mode("overwrite").parquet(path)
    nulls = spark.createDataFrame(
        [(9000 + i, None, "F") for i in range(5)],
        "o_orderkey long, price double, status string",
    )
    nulls.coalesce(1).write.mode("append").parquet(path)
    return path


def test_pruned_read_equals_full_filtered_scan(spark, clustered):
    zm = zonemap.build_zonemap(spark, clustered, ["price", "o_orderkey"])
    full = (
        spark.read.parquet(clustered)
        .where((F.col("price") >= 3000.0) & (F.col("price") <= 4500.0))
    )
    pruned = (
        zonemap.pruned_read(spark, zm, "price", 3000.0, 4500.0)
        .where((F.col("price") >= 3000.0) & (F.col("price") <= 4500.0))
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))
    # and it actually skipped: the band covers ~2 of 12 range files
    n_files = len(zonemap.prune_files(zm, "price", 3000.0, 4500.0))
    total = zm.select("file").distinct().count()
    assert n_files <= 4 < total

    # all-NULL file is never selected by a range predicate
    files = zonemap.prune_files(zm, "price", 0.0, 1e9)
    nulls_only = [
        r["file"] for r in zm.where(
            (F.col("col_name") == "price") & F.col("min_value").isNull()
        ).collect()
    ]
    assert nulls_only and not set(nulls_only) & set(files)


def test_open_ranges_and_empty_selection(spark, clustered):
    zm = zonemap.build_zonemap(spark, clustered, ["price"])
    hi_only = zonemap.prune_files(zm, "price", lo=11000.0)
    assert len(hi_only) == 1  # only the top range file reaches 11990
    nothing = zonemap.pruned_read(spark, zm, "price", lo=1e9)
    assert nothing.count() == 0
    assert set(nothing.columns) == {"o_orderkey", "price", "status"}


def test_selectivity_tells_clustered_from_random(spark, clustered, tmp_path):
    zm = zonemap.build_zonemap(spark, clustered, ["price"])
    sel = zonemap.zonemap_selectivity(zm, "price").collect()[0]
    assert sel["avg_relative_zone_width"] < 0.2  # tight zones

    rnd = str(tmp_path / "rnd")
    df = spark.range(1200).select(
        F.col("id").alias("o_orderkey"),
        (F.hash("id") % 1000).cast("double").alias("price"),
    )
    df.repartition(12).write.mode("overwrite").parquet(rnd)
    zr = zonemap.build_zonemap(spark, rnd, ["price"])
    sel_r = zonemap.zonemap_selectivity(zr, "price").collect()[0]
    assert sel_r["avg_relative_zone_width"] > 0.8  # no skipping possible


def test_zorder_layout_makes_zones_selective(spark, tmp_path):
    """The two features compose: the SAME rows written randomly give
    full-range zones (no skipping), written with zorder_write give
    tight zones on BOTH clustered columns — and a range predicate then
    actually skips files. This is the decision loop the selectivity
    report exists for: measure, re-layout, measure again."""
    from crypto_data_service_loader_spark.sources import interchange

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("x"),
        ((F.col("id") * 7) % 64).cast("double").alias("y"),
    )
    rnd = str(tmp_path / "rnd")
    df.orderBy(F.hash("k")).repartition(8).write.mode("overwrite").parquet(rnd)
    zo = str(tmp_path / "zo")
    interchange.zorder_write(df, zo, "x", "y", n_files=8)

    sel_rnd = zonemap.zonemap_selectivity(
        zonemap.build_zonemap(spark, rnd, ["x"]), "x").collect()[0]
    zm_zo = zonemap.build_zonemap(spark, zo, ["x", "y"])
    sel_x = zonemap.zonemap_selectivity(zm_zo, "x").collect()[0]
    sel_y = zonemap.zonemap_selectivity(zm_zo, "y").collect()[0]
    assert sel_rnd["avg_relative_zone_width"] > 0.9
    assert sel_x["avg_relative_zone_width"] < 0.6
    assert sel_y["avg_relative_zone_width"] < 0.6

    # and the pruner skips: a narrow x band hits a strict subset of files
    n_hit = len(zonemap.prune_files(zm_zo, "x", 0.0, 7.0))
    assert 0 < n_hit < 8
    got = (
        zonemap.pruned_read(spark, zm_zo, "x", 0.0, 7.0)
        .where(F.col("x").between(0.0, 7.0))
    )
    want = spark.read.parquet(zo).where(F.col("x").between(0.0, 7.0))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
