"""Streaming windowed histograms — the live twin of
`operators/profile.numeric_histogram` (the distribution monitor a
pipeline runs over its ingest stream: value drift shows up as bin-mass
movement between windows long before any downstream metric breaks).

The bin-assignment arithmetic is literally shared with the batch
operator (`profile.histogram_bin_expr`), so a window's streaming
histogram equals the batch histogram of that window's rows by
construction (equality-tested). State per window is n_bins + 2 counters
— bounded — and the watermark retires windows, so state size is
(windows-in-flight x bins), independent of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.profile import histogram_bin_expr, histogram_edge_exprs


def windowed_histogram(
    stream: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window histogram transformation (attach your own sink):
    (win_start, bin_id, bin_lo, bin_hi, n_rows) per closed window.
    Late rows beyond `delay` are dropped by the watermark — the standard
    completeness/latency trade."""
    x = F.col(value_col).cast("double")
    return (
        stream.withWatermark(ts_col, delay)
        .filter(x.isNotNull())
        .select(
            F.col(ts_col),
            histogram_bin_expr(x, lo, hi, n_bins).alias("bin_id"),
        )
        .groupBy(F.window(ts_col, window).alias("w"), "bin_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("w.start").alias("win_start"),
            "bin_id",
            *histogram_edge_exprs(lo, hi, n_bins),
            "n_rows",
        )
    )


def histogram_drift_alerts(
    spark, table: str, threshold: float = 0.1
) -> DataFrame:
    """Drift alerts over the CLOSED windows a histogram stream has
    emitted (the table `start_histogram_stream` writes): the batch
    `profile.histogram_drift` runs over the emitted rows — the math is
    literally shared, so a stream-then-alert pipeline equals the batch
    backfill by construction (equality-tested) — filtered to consecutive
    window pairs whose total-variation distance exceeds `threshold`.

    Run it per trigger epoch (foreachBatch) or as a scheduled batch job
    over the sink table; append mode means a window emits exactly once,
    so each pair's alert fires exactly once. State is the emitted
    histogram rows themselves (windows x bins — bounded), never raw
    events."""
    from ..operators.profile import histogram_drift

    return histogram_drift(spark.table(table)).filter(
        F.col("tvd") > float(threshold)
    )


def start_histogram_stream(
    stream: DataFrame,
    checkpoint: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "1 hour",
    query_name: str = "histogram",
    available_now: bool = True,
) -> StreamingQuery:
    """Run the windowed histogram into an in-memory table `query_name`
    (append mode: a window emits once, when the watermark closes it)."""
    out = windowed_histogram(
        stream, value_col, lo, hi, n_bins, ts_col, window, delay
    )
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_category_counts(
    stream: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "1 hour",
) -> DataFrame:
    """Tumbling-window category counts — the categorical twin of
    `windowed_histogram` (bins are the category values). Output
    (win_start, <cat_col>, n_rows) per closed window feeds
    `profile.category_drift`'s comparator unchanged; state per window is
    one counter per live category, watermark-retired."""
    return (
        stream.withWatermark(ts_col, delay)
        .filter(F.col(cat_col).isNotNull())
        .groupBy(F.window(ts_col, window).alias("w"), F.col(cat_col))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("w.start").alias("win_start"), cat_col, "n_rows")
    )


def category_drift_alerts(
    spark, table: str, cat_col: str, threshold: float = 0.1
) -> DataFrame:
    """Mix-shift alerts over the closed windows a category-count stream
    emitted: the batch drift comparator runs over the emitted rows (math
    literally shared with `profile.category_drift`), filtered to window
    pairs whose TVD exceeds `threshold` — fires when the live
    event/source/language mix moves."""
    from ..operators.profile import histogram_drift

    return histogram_drift(
        spark.table(table),
        window_col="win_start",
        bin_col=cat_col,
        count_col="n_rows",
    ).filter(F.col("tvd") > float(threshold))


def start_category_mix_stream(
    stream: DataFrame,
    checkpoint: str,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "1 hour",
    query_name: str = "category_mix",
    available_now: bool = True,
) -> StreamingQuery:
    """Windowed category counts -> in-memory table `query_name`
    (append mode: a window emits exactly once when the watermark closes
    it, so downstream drift alerts fire exactly once per pair)."""
    out = windowed_category_counts(stream, cat_col, ts_col, window, delay)
    writer = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
