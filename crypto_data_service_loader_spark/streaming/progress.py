"""Streaming observability: a StreamingQueryListener that captures per-batch
progress into a queryable DataFrame.

Reference parity: the reference logs throughput MDC fields per bundle
(CompressionHandler.java:113-134) and upload wall-time per cycle
(UploadTickerFilesStatusAndDataFlow.java:199-206). In Structured Streaming
the engine already measures every micro-batch; this listener surfaces those
measurements (rows, rates, durations, state-store size) the same way the
batch path's `functions/metrics.py` surfaces its timers — as rows, so the
metrics land in the same log table a `tickers_logs`-style sink reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.localrel import local_values_df
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "input_rows_per_sec double, process_rows_per_sec double, "
    "batch_duration_ms long, state_rows_total long"
)


class ProgressCapture(StreamingQueryListener):
    """Collects QueryProgressEvents driver-side (listener callbacks run on
    the driver; volume is one row per micro-batch, not per record)."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in (p.stateOperators or []))
        self.rows.append(
            (
                p.name or str(p.id),
                p.batchId,
                p.numInputRows,
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(p.durationMs.get("triggerExecution", 0)),
                state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        return local_values_df(spark, self.rows, PROGRESS_SCHEMA)
