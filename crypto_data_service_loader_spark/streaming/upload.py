"""Upload pipeline — the hot path (reference Flow 3 / EP2, SURVEY.md §3).

Reference: claim READY_FOR_PROCESSING files (optimistic IN_PROGRESS update),
group by date, join against disk, sort, split into 32 bundles, stream GZIP
CSV into ClickHouse, then per-bundle FINISHED/ERROR rollup.

Spark-first batch composition (`run_upload_batch`): the claim/sort/split
become registry transforms + `repartitionByRange`; compression/pipelining
belong to the sink transport; per-file success tracking uses
`input_file_name()` lineage with a try/except per file-group inside the
batch (finer than the reference's per-bundle ERROR granularity).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.registry import (
    bundle_split,
    current_state,
    filter_status_in,
    sort_by_filename,
)
from ..sinks.writers import Sink
from ..sources.csv_ingest import read_ticks_csv

logger = logging.getLogger(__name__)


def claim_ready_files(registry: DataFrame) -> DataFrame:
    """EP2 step 1: select READY_FOR_PROCESSING — the optimistic claim. In the
    event-log registry the IN_PROGRESS event is appended by the caller with
    this batch's id, making the claim idempotent per epoch."""
    return filter_status_in(registry, ["READY_FOR_PROCESSING"])


def run_upload_batch(
    spark: SparkSession,
    claimed: DataFrame,
    path_for_file,  # Callable[[str, str], str]: (create_date, filename) -> path
    sink: Sink,
    bundles: int = 32,
    batch_id: int | None = None,
) -> DataFrame:
    """Load every claimed file's CSV rows, bulk-write via `sink`, and return
    per-file (filename, ok) outcomes for the O19 status rollup.

    Whole-batch failure marks all files ERROR (reference bundle semantics,
    TickersDataLoader.java:160-168); the registry event-append and the sink
    write share the batch_id, so a replayed epoch is idempotent.
    """
    rows = [(r["create_date"], r["filename"]) for r in claimed.select(
        "create_date", "filename").collect()]
    if not rows:
        return spark.createDataFrame([], "filename string, ok boolean")
    paths = [path_for_file(str(d), f) for d, f in rows]

    ticks = read_ticks_csv(spark, paths)
    ticks = bundle_split(sort_by_filename(
        ticks.withColumnRenamed("_source_file", "filename")), bundles)
    try:
        sink.write(ticks.drop("filename"), batch_id=batch_id)
        return spark.createDataFrame(
            [(f, True) for _, f in rows], "filename string, ok boolean"
        )
    except Exception:
        logger.exception(
            "upload batch %s failed; isolating per file", batch_id
        )

    # Finer than the reference's per-bundle ERROR (SURVEY.md §7): retry each
    # file alone so one poison file doesn't fail its whole batch. Only runs
    # on the (rare) failure path, so the per-file overhead never taxes the
    # hot path.
    outcomes = []
    for (d, f), p in zip(rows, paths):
        try:
            one = read_ticks_csv(spark, p).drop("_source_file")
            sink.write(one, batch_id=batch_id)
            outcomes.append((f, True))
        except Exception:
            logger.exception("file %s failed individually", f)
            outcomes.append((f, False))
    return spark.createDataFrame(outcomes, "filename string, ok boolean")
