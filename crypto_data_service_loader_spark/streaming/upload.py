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


def claim_ready_files(
    registry: DataFrame, current_batch: int | None = None
) -> DataFrame:
    """EP2 step 1: select READY_FOR_PROCESSING — the optimistic claim. In the
    event-log registry the IN_PROGRESS event is appended by the caller with
    this batch's id, making the claim idempotent per epoch.

    With `current_batch`, stale IN_PROGRESS claims from older batches are
    RECLAIMED: a crash between the claim append and the FINISHED/ERROR
    rollup would otherwise leave those files stuck forever (the reference
    has the same gap — a killed process orphans its IN_PROGRESS rows).
    """
    ready = filter_status_in(registry, ["READY_FOR_PROCESSING"])
    if current_batch is None:
        return ready
    stale = registry.filter(
        (F.col("status") == "IN_PROGRESS") & (F.col("batch_id") < current_batch)
    )
    return ready.unionByName(stale, allowMissingColumns=True)


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

    # Finer than the reference's per-bundle ERROR (SURVEY.md §7): parse each
    # file alone so one poison file maps to one ERROR, then commit the
    # parseable set in a SINGLE sink write. One write per batch_id is what
    # keeps the idempotent (dynamic-partition-overwrite) sink exactly-once —
    # multiple writes under the same batch_id would clobber each other.
    outcomes, good_dfs, good_files = [], [], []
    for (d, f), p in zip(rows, paths):
        try:
            one = read_ticks_csv(spark, p).drop("_source_file")
            # force the parse to surface per-file errors; count() is
            # disallowed here (corrupt-record-only column pruning)
            one.foreach(lambda _: None)
            good_dfs.append(one)
            good_files.append(f)
        except Exception:
            logger.exception("file %s failed to parse", f)
            outcomes.append((f, False))
    if good_dfs:
        combined = good_dfs[0]
        for df in good_dfs[1:]:
            combined = combined.unionByName(df)
        try:
            sink.write(combined, batch_id=batch_id)
            outcomes.extend((f, True) for f in good_files)
        except Exception:
            logger.exception("retry write for batch %s failed", batch_id)
            outcomes.extend((f, False) for f in good_files)
    return spark.createDataFrame(outcomes, "filename string, ok boolean")
