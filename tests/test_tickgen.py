"""Custom Python DataSource (tickgen): schema, partition planning,
determinism, and exactness of the generated id space."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.sources import tickgen


def _read(spark, **opts):
    tickgen.register(spark)
    r = spark.read.format("tickgen")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_tickgen_rowcount_schema_and_partitions(spark):
    df = _read(spark, rows=1000, partitions=8, tickers=5)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == [
        "ticker", "sequence", "price", "size", "ts",
    ]
    assert df.rdd.getNumPartitions() == 8  # planned parallelism honored
    # the sequence space is exactly [0, rows) — no partition overlap/gap
    agg = df.agg(
        F.countDistinct("sequence").alias("d"),
        F.min("sequence").alias("lo"),
        F.max("sequence").alias("hi"),
    ).collect()[0]
    assert (agg["d"], agg["lo"], agg["hi"]) == (1000, 0, 999)
    assert df.select("ticker").distinct().count() == 5


def test_tickgen_is_deterministic_and_partitioning_invariant(spark):
    """Same (seed, rows) -> identical content regardless of partition
    count; different seed -> different content."""
    a = {tuple(r) for r in _read(spark, rows=300, partitions=3).collect()}
    b = {tuple(r) for r in _read(spark, rows=300, partitions=7).collect()}
    assert a == b
    c = {tuple(r) for r in _read(spark, rows=300, partitions=3, seed=7).collect()}
    assert a != c


def test_tickgen_rows_match_python_reference(spark):
    rows = {r["sequence"]: r for r in _read(spark, rows=50, tickers=3).collect()}
    for i in (0, 17, 49):
        t = tickgen.tick_row(42, i, 3)
        r = rows[i]
        assert (r["ticker"], r["price"], r["size"]) == (t[0], t[2], t[3])
        assert r["ts"] == t[4]


def test_tickgen_feeds_the_engine_operators(spark):
    """The synthetic source composes with the real operator surface —
    e.g. per-ticker OHLC-style aggregation over generated ticks."""
    df = _read(spark, rows=2000, partitions=4, tickers=4)
    agg = (
        df.groupBy("ticker")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("price").alias("avg_px"))
        .collect()
    )
    assert len(agg) == 4
    assert sum(r["n"] for r in agg) == 2000
    assert all(100.0 <= r["avg_px"] <= 200.0 for r in agg)


def test_tickgen_streaming_batches_continue_the_sequence(spark, tmp_path):
    """The streaming reader advances the index offset per micro-batch and
    a restart from the checkpoint resumes exactly where it stopped —
    offsets are plain row indexes, so the assertion is a gap-free,
    duplicate-free sequence across two separate runs."""
    tickgen.register(spark)
    out: list = []

    def sink(batch, _bid):
        out.extend(r["sequence"] for r in batch.collect())

    def run_once():
        q = (
            spark.readStream.format("tickgen")
            .option("rows_per_batch", 25)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = list(out)
    assert len(first) > 0
    assert sorted(first) == list(range(len(first)))  # gap-free from 0

    run_once()  # restart from checkpoint: continues, never repeats
    assert sorted(out) == list(range(len(out)))
    assert len(out) > len(first)


def test_tickgen_zero_rows_is_an_empty_frame(spark):
    """ADVICE r5: rows=0 must be a legal empty load, not a range() crash
    in partition planning."""
    df = _read(spark, rows=0, partitions=4)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "ticker", "sequence", "price", "size", "ts",
    ]
