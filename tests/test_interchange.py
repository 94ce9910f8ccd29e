"""Columnar interchange (parquet ↔ ORC): round-trip fidelity, file-count
control, in-file ordering, and pushdown parity on the ORC scan."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.sources import interchange
from crypto_data_service_loader_spark.tables import load


def test_parquet_to_orc_round_trip(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    dst = str(tmp_path / "docs_orc")
    n = interchange.convert_corpus(
        spark, f"{sf_dir}/documents.parquet", dst, "parquet", "orc"
    )
    assert n == docs.count()
    back = interchange.read_columnar(spark, dst, "orc")
    assert back.schema == docs.schema  # full type fidelity
    a = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert a == b


def test_write_columnar_file_count_and_order(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    dst = str(tmp_path / "out")
    interchange.write_columnar(
        df, dst, "orc", n_files=3, sort_within_by=["k", "id"]
    )
    files = glob.glob(f"{dst}/part-*")
    assert len(files) == 3
    # within every file rows arrive (k, id)-sorted — the property that
    # makes ORC min/max stripe skipping effective
    for f in files:
        rows = [(r["k"], r["id"]) for r in spark.read.orc(f).collect()]
        assert rows == sorted(rows)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    dst = str(tmp_path / "docs_orc")
    interchange.convert_corpus(
        spark, f"{sf_dir}/documents.parquet", dst, "parquet", "orc"
    )
    q = (
        interchange.read_columnar(spark, dst, "orc")
        .filter(F.col("source") == "src1")
        .select("doc_id", "n_chars")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "source" in plan.split(
        "PushedFilters"
    )[1][:120]
    # 3-column ReadSchema: the filter column + the 2 projected
    rs = plan.split("ReadSchema")[1][:160]
    assert "text" not in rs  # the wide column never leaves the scan


def test_interchange_rejects_unknown_format(spark, tmp_path):
    df = spark.range(3)
    with pytest.raises(ValueError, match="fmt"):
        interchange.write_columnar(df, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="fmt"):
        interchange.read_columnar(spark, str(tmp_path / "x"), "csvish")


def test_morton_key_interleave_values(spark):
    from crypto_data_service_loader_spark.sources.interchange import morton_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (5, 5)], "a long, b long"
    )
    got = {(r["a"], r["b"]): r["z"] for r in
           df.select("a", "b", morton_key(F.col("a"), F.col("b"), 4)
                     .alias("z")).collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                   (2, 3): 14, (5, 5): 51}
    with pytest.raises(ValueError):
        morton_key(F.col("a"), F.col("b"), 0)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order files bound BOTH dimensions (the pruning property);
    a lexicographic (a, b) sort would leave b spanning the full range
    in every file."""
    import itertools

    from crypto_data_service_loader_spark.sources.interchange import (
        zorder_write,
    )

    grid = [(a, b) for a, b in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(grid, "a long, b long")
    dst = str(tmp_path / "z")
    zorder_write(df, dst, "a", "b", n_files=4, bits=5)
    files = glob.glob(f"{dst}/part-*")
    assert len(files) == 4
    for f in files:
        rows = spark.read.parquet(f).collect()
        spread_a = max(r["a"] for r in rows) - min(r["a"] for r in rows)
        spread_b = max(r["b"] for r in rows) - min(r["b"] for r in rows)
        # each quarter of the Z-curve covers a half-plane slab: at least
        # one dimension is bounded to half the range, and neither file
        # degenerates to "all of b for a sliver of a"
        assert min(spread_a, spread_b) <= 16
        assert spread_a < 32 or spread_b < 32


def test_compact_small_files(spark, tmp_path):
    """Self-tuned compaction: 24 tiny files collapse to the byte-derived
    count (1 at a generous target), rows and values survive exactly,
    and the staged-swap leaves no leftover directories."""
    import os

    from crypto_data_service_loader_spark.sources.interchange import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    df = spark.range(6000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(24).write.mode("overwrite").parquet(path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    before, after = compact_small_files(spark, path, target_mb=128)
    assert before == 24 and after == 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._compact")
    assert not os.path.exists(path + "._old")


def test_compact_refuses_stale_old_dir(spark, tmp_path):
    """Regression (r8 ADVICE): a crash between the two swap renames
    leaves the pre-compaction data in `._old`; a rerun must refuse
    up front (recovery is manual) instead of failing half-way."""
    import os

    from crypto_data_service_loader_spark.sources.interchange import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    spark.range(100).write.mode("overwrite").parquet(path)
    os.makedirs(path + "._old")
    with pytest.raises(RuntimeError, match="interrupted compaction"):
        compact_small_files(spark, path, target_mb=128)


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    """Regression (r8 ADVICE): a hive-partitioned dataset is refused
    without partition_by (no silent flatten); with it, the directory
    layout and every row survive the compaction."""
    import glob as _glob
    import os

    from crypto_data_service_loader_spark.sources.interchange import (
        compact_small_files,
    )

    path = str(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    )
    df.repartition(8).write.mode("overwrite").partitionBy("p").parquet(path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_before = len(_glob.glob(f"{path}/p=*/part-*"))
    assert n_before >= 24  # 8 tasks x 3 partition values

    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_small_files(spark, path, target_mb=128)

    before, after = compact_small_files(
        spark, path, target_mb=128, partition_by=["p"]
    )
    assert before == n_before and after < n_before
    assert sorted(os.listdir(path))[-3:] == ["p=0", "p=1", "p=2"]
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._old")
