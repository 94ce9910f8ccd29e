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


def test_prune_typed_bounds_and_unparseable_raise(spark, tmp_path):
    """Regression (r8 ADVICE): date/timestamp/decimal zones compare in
    the column's NATIVE type — a non-canonical bound ('2024-1-5', a
    datetime with microseconds) either parses correctly or raises; it
    never silently lexical-compares and false-prunes."""
    import datetime

    path = str(tmp_path / "typed")
    df = spark.sql("""
        SELECT id,
               DATE'2024-01-01' + make_interval(0,0,0, CAST(id AS INT)) AS d,
               TIMESTAMP'2024-01-01 00:00:00' + make_interval(0,0,0,0,0, CAST(id AS INT) * 7) AS ts,
               CAST(id AS DECIMAL(12,2)) * 1.5 AS dec_v
        FROM range(240)
    """)
    df.repartitionByRange(6, "id").write.mode("overwrite").parquet(path)
    zm = zonemap.build_zonemap(spark, path, ["d", "ts", "dec_v"])

    full = spark.read.parquet(path)

    # date bound given as datetime (would stringify with a time suffix)
    lo = datetime.datetime(2024, 1, 10, 0, 0, 0)
    hi = datetime.date(2024, 1, 20)
    got = zonemap.pruned_read(spark, zm, "d", lo, hi).where(
        F.col("d").between(F.lit(lo.date()), F.lit(hi))
    )
    want = full.where(F.col("d").between(F.lit(lo.date()), F.lit(hi)))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert len(zonemap.prune_files(zm, "d", lo, hi)) < 6

    # timestamp bound with microseconds (non-canonical string form)
    t_lo = datetime.datetime(2024, 1, 1, 2, 30, 0, 123456)
    files_ts = zonemap.prune_files(zm, "ts", t_lo, None)
    got_ts = spark.read.parquet(*files_ts).where(F.col("ts") >= F.lit(t_lo))
    want_ts = full.where(F.col("ts") >= F.lit(t_lo))
    assert got_ts.count() == want_ts.count() > 0

    # decimal zone: numeric, not lexical ('99.00' < '100.00' must hold)
    files_dec = zonemap.prune_files(zm, "dec_v", 99, 150)
    got_dec = spark.read.parquet(*files_dec).where(
        F.col("dec_v").between(99, 150)
    )
    want_dec = full.where(F.col("dec_v").between(99, 150))
    assert sorted(r["id"] for r in got_dec.collect()) == sorted(
        r["id"] for r in want_dec.collect()
    )

    # unparseable bounds raise instead of comparing reprs
    with pytest.raises(ValueError, match="unparseable"):
        zonemap.prune_files(zm, "d", "2024-1-5", None)
    with pytest.raises(ValueError, match="unparseable"):
        zonemap.prune_files(zm, "ts", "not a time", None)


def test_prune_files_and_multi_column(spark, tmp_path):
    """Multi-column AND pruning over a z-ordered layout: the file set
    is the intersection of the per-column prunes and the read still
    covers the exact filtered scan (superset contract)."""
    from crypto_data_service_loader_spark.sources import interchange

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 64).cast("double").alias("x"),
        ((F.col("id") * 7) % 64).cast("double").alias("y"),
    )
    zo = str(tmp_path / "zo")
    interchange.zorder_write(df, zo, "x", "y", n_files=8)
    zm = zonemap.build_zonemap(spark, zo, ["x", "y"])

    both = zonemap.prune_files_and(zm, {"x": (0.0, 7.0), "y": (0.0, 15.0)})
    only_x = zonemap.prune_files(zm, "x", 0.0, 7.0)
    assert set(both) <= set(only_x) and 0 < len(both) <= len(only_x)

    pred = F.col("x").between(0.0, 7.0) & F.col("y").between(0.0, 15.0)
    got = spark.read.parquet(*both).where(pred)
    want = spark.read.parquet(zo).where(pred)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    with pytest.raises(ValueError, match="at least one column"):
        zonemap.prune_files_and(zm, {})


def test_prune_100k_files_subsecond(spark):
    """Scale check (r8 VERDICT #4): the interval test runs inside Spark,
    so a 10^5-file zonemap prunes in well under a second instead of a
    driver-side Python loop with per-row string conversions."""
    import time

    zm = spark.range(100_000).select(
        F.concat(F.lit("f"), F.col("id")).alias("file"),
        F.lit("ts").alias("col_name"),
        F.lit("bigint").alias("col_type"),
        (F.col("id") * 10).cast("string").alias("min_value"),
        (F.col("id") * 10 + 9).cast("string").alias("max_value"),
        F.lit(100).alias("n_rows"),
        F.lit(0).alias("n_nulls"),
    ).localCheckpoint()
    t0 = time.monotonic()
    files = zonemap.prune_files(zm, "ts", 500_000, 500_099)
    dt = time.monotonic() - t0
    assert len(files) == 10  # ids 50000..50009
    assert dt < 1.0, f"prune took {dt:.2f}s"


def test_refresh_zonemap_incremental(spark, tmp_path):
    """Incremental maintenance: two write waves, refresh after each —
    only new files are scanned/appended, a no-new-files refresh is a
    no-op, and the stored map prunes exactly like a from-scratch
    rebuild (superset contract over the stored map)."""
    data = str(tmp_path / "d")
    zmap = str(tmp_path / "zm")
    w1 = spark.range(0, 600).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("double").alias("price")
    )
    w1.repartitionByRange(3, "price").write.mode("append").parquet(data)
    assert zonemap.refresh_zonemap(spark, zmap, data, ["price"]) == 3

    w2 = spark.range(600, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("double").alias("price")
    )
    w2.repartitionByRange(2, "price").write.mode("append").parquet(data)
    assert zonemap.refresh_zonemap(spark, zmap, data, ["price"]) == 2
    assert zonemap.refresh_zonemap(spark, zmap, data, ["price"]) == 0

    stored = spark.read.parquet(zmap)
    scratch = zonemap.build_zonemap(spark, data, ["price"])
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    got = zonemap.pruned_read(spark, stored, "price", 2000.0, 7000.0).where(
        F.col("price").between(2000.0, 7000.0)
    )
    want = spark.read.parquet(data).where(
        F.col("price").between(2000.0, 7000.0)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert len(zonemap.prune_files(stored, "price", 2000.0, 7000.0)) < 5
