"""The assembled service: the reference's four concurrent flows as ONE
linear pipeline per cycle (SURVEY.md §3 — DB-status coordination between
racing flows becomes sequential composition; the only concurrency that
remains is Spark's own task parallelism).

Cycle semantics (reference MainApplication.java:54-91):
  1. discover   — scan root/<date>/ for unregistered files -> DISCOVERED
  2. progress   — status machine: today's DISCOVERED -> DOWNLOADING,
                  past DISCOVERED/DOWNLOADING -> READY_FOR_PROCESSING
  3. upload     — claim READY -> IN_PROGRESS, bulk-load CSVs to the sink,
                  per-file FINISHED/ERROR rollup
  4. cleanup    — delete FINISHED files older than the retention window

State lives in an append-only registry event log (parquet, date-partitioned
at scale); every step appends events keyed by (cycle seq, batch id) so a
replayed cycle is idempotent.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.registry import (
    apply_status_update,
    current_state,
    dedup_new_files,
    transition_statuses,
    upload_status_rollup,
)
from ..schemas import REGISTRY_EVENTS
from ..sinks.writers import Sink
from ..sources.fs_scan import scan_directory
from .cleanup import run_cleanup
from .upload import claim_ready_files, run_upload_batch

logger = logging.getLogger(__name__)


class RegistryLog:
    """Append-only registry event log on parquet."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def events(self) -> DataFrame:
        try:
            return self.spark.read.schema(REGISTRY_EVENTS).parquet(self.path)
        except Exception:  # noqa: BLE001 — first cycle: log does not exist
            return self.spark.createDataFrame([], REGISTRY_EVENTS)

    def state(self) -> DataFrame:
        return current_state(self.events())

    def append(self, rows: DataFrame) -> None:
        rows.select(*[f.name for f in REGISTRY_EVENTS.fields]).write.mode(
            "append"
        ).parquet(self.path)

    def next_cycle(self) -> int:
        """Resume-safe cycle numbering: seq values must never repeat across
        restarts or latest-wins compaction becomes ambiguous."""
        row = self.events().agg(F.max("batch_id")).first()
        return 0 if row is None or row[0] is None else int(row[0]) + 1

    def compact(self) -> int:
        """Rewrite the log as its current state (one event per filename).

        Read amplification grows with event count; compaction resets it.
        Parquet can't overwrite a path being read, so the snapshot lands in
        a side dir which then atomically replaces the log. Returns rows
        kept. At scale, run per date-partition instead of whole-log.

        NOT safe concurrently with a live reader of the log path: run it
        between polling cycles, or let the streaming service's in-epoch
        `compact_every` hook do it (inside an epoch nothing else reads).
        """
        import shutil

        snapshot = self.state()
        side = self.path.rstrip("/") + "__compacting"
        snapshot.write.mode("overwrite").parquet(side)
        n = self.spark.read.schema(REGISTRY_EVENTS).parquet(side).count()
        shutil.rmtree(self.path, ignore_errors=True)
        os.replace(side, self.path)
        return n


def start_service_stream(
    spark: SparkSession,
    root: str,
    registry_path: str,
    sink: Sink,
    checkpoint: str,
    today: str | None = None,
    trigger_seconds: int = 15,
    available_now: bool = False,
    max_files_per_trigger: int | None = 10_000,
    compact_every: int = 50,
):
    """Structured-Streaming service mode: the discovery stream drives the
    WHOLE pipeline — each micro-batch of newly-appeared files is registered,
    progressed, uploaded, and rolled up inside one foreachBatch epoch.

    Differences from the polling `run_cycle`: the file source's checkpoint
    replaces the backfill scan (restart = resume, no re-listing), and epoch
    ids key both the registry events and the sink writes, so a replayed
    epoch is idempotent; stale IN_PROGRESS claims from a crashed epoch are
    reclaimed by the next one. Cleanup stays a scheduled batch job.

    `today=None` re-evaluates the calendar day PER EPOCH (a frozen value
    would stall the status machine after midnight); pass a fixed date only
    in tests. Caveat: a stateless foreachBatch query fires only when new
    files arrive — on quiet days no epoch runs, so pending transitions wait
    for the next file (or a scheduled `run_cycle`, which progresses state
    unconditionally).

    The registry event log is compacted in-line every `compact_every`
    epochs — inside the epoch is the one point where no concurrent reader
    holds a listing of the log path (0 disables).
    """
    import datetime as _dt

    from .discovery import discovered_files_stream

    base = RegistryLog(spark, registry_path).next_cycle()  # resume-safe seqs

    def _epoch(batch: DataFrame, epoch_id: int) -> None:
        spark_ = batch.sparkSession
        log = RegistryLog(spark_, registry_path)
        cycle_id = base + epoch_id
        seq_base = cycle_id * 10
        epoch_today = today or _dt.date.today().isoformat()
        # register the epoch's novel files
        novel = dedup_new_files(batch, log.state().select("filename"))
        log.append(
            novel.select(
                "filename", "create_date", "status",
                F.lit(seq_base).cast("long").alias("seq"),
                F.lit(cycle_id).cast("long").alias("batch_id"),
            )
        )
        # progress + upload, same composition as the polling cycle
        cur = log.state()
        changed = (
            transition_statuses(cur, epoch_today).alias("a")
            .join(cur.select("filename", F.col("status").alias("old_status")),
                  "filename")
            .filter(F.col("status") != F.col("old_status"))
            .select(
                "filename", "create_date", "status",
                F.lit(seq_base + 1).cast("long").alias("seq"),
                F.lit(cycle_id).cast("long").alias("batch_id"),
            )
            .localCheckpoint(eager=True)
        )
        log.append(changed)
        ready = claim_ready_files(
            log.state(), current_batch=cycle_id
        ).localCheckpoint(eager=True)
        log.append(
            ready.select(
                "filename", "create_date", F.lit("IN_PROGRESS").alias("status"),
                F.lit(seq_base + 2).cast("long").alias("seq"),
                F.lit(cycle_id).cast("long").alias("batch_id"),
            )
        )
        outcomes = run_upload_batch(
            spark_, ready, lambda d, f: os.path.join(root, d, f), sink,
            batch_id=cycle_id,
        )
        finished = upload_status_rollup(outcomes).join(
            ready.select("filename", "create_date"), "filename", "inner"
        )
        log.append(
            finished.select(
                "filename", "create_date", "status",
                F.lit(seq_base + 3).cast("long").alias("seq"),
                F.lit(cycle_id).cast("long").alias("batch_id"),
            )
        )
        if compact_every and cycle_id > 0 and cycle_id % compact_every == 0:
            log.compact()  # safe here: no concurrent reader inside the epoch

    stream = discovered_files_stream(spark, root, max_files_per_trigger)
    writer = (
        stream.writeStream.foreachBatch(_epoch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def run_cycle(
    spark: SparkSession,
    root: str,
    registry_path: str,
    sink: Sink,
    today: str,
    cycle: int = 0,
    do_cleanup: bool = False,
) -> dict:
    """One full service cycle; returns counters for observability."""
    log = RegistryLog(spark, registry_path)
    seq_base = cycle * 10
    stats: dict[str, int] = {}

    def scan_or_empty() -> DataFrame:
        # an empty/missing tree is a quiet cycle, not a failure (the
        # reference falls back and retries, SaveNewFilesToDbFlow.java:139-163)
        try:
            return scan_directory(spark, root)  # load() lists eagerly
        except Exception:  # noqa: BLE001
            return spark.createDataFrame(
                [], "filename string, create_date date, status string"
            )

    # 1. discover (reference Flow 1: backfill scan + dedup + insert).
    # localCheckpoint pins each step's delta BEFORE appending: .cache()
    # would be re-materialized by the append's recacheByPath with a fresh
    # file listing (the step would see its own output), and an unpinned
    # plan would re-run the whole scan+anti-join for the counter.
    novel = dedup_new_files(scan_or_empty(), log.state().select("filename"))
    new_events = novel.select(
        "filename",
        "create_date",
        F.lit("DISCOVERED").alias("status"),
        F.lit(seq_base).cast("long").alias("seq"),
        F.lit(cycle).cast("long").alias("batch_id"),
    ).localCheckpoint(eager=True)
    log.append(new_events)
    stats["discovered"] = new_events.count()

    # 2. progress (reference Flow 2: the status-machine CASE)
    cur = log.state()
    advanced = transition_statuses(cur, today)
    changed = (
        advanced.alias("a")
        .join(cur.select("filename", F.col("status").alias("old_status")), "filename")
        .filter(F.col("status") != F.col("old_status"))
        .select(
            "filename", "create_date", "status",
            F.lit(seq_base + 1).cast("long").alias("seq"),
            F.lit(cycle).cast("long").alias("batch_id"),
        )
        .localCheckpoint(eager=True)
    )
    log.append(changed)
    stats["progressed"] = changed.count()

    # 3. upload (reference Flow 3: claim -> bulk load -> rollup; stale
    # IN_PROGRESS claims orphaned by a crashed older cycle are reclaimed)
    ready = claim_ready_files(
        log.state(), current_batch=cycle
    ).localCheckpoint(eager=True)
    log.append(
        ready.select(
            "filename", "create_date", F.lit("IN_PROGRESS").alias("status"),
            F.lit(seq_base + 2).cast("long").alias("seq"),
            F.lit(cycle).cast("long").alias("batch_id"),
        )
    )
    outcomes = run_upload_batch(
        spark,
        ready,
        lambda d, f: os.path.join(root, d, f),
        sink,
        batch_id=cycle,
    )
    rolled = upload_status_rollup(outcomes)
    finished = rolled.join(
        ready.select("filename", "create_date"), "filename", "inner"
    )
    log.append(
        finished.select(
            "filename", "create_date", "status",
            F.lit(seq_base + 3).cast("long").alias("seq"),
            F.lit(cycle).cast("long").alias("batch_id"),
        )
    )
    # outcomes is a small driver-built DataFrame; counting it is trivial
    stats["uploaded"] = outcomes.filter("ok").count()
    stats["failed"] = outcomes.filter("NOT ok").count()

    # 4. cleanup (reference Flow 4), gated like the reference's 3 h cycle
    if do_cleanup:
        state = log.state()
        fs = scan_or_empty().select("filename", "create_date")
        last = state.filter(F.col("status") == "FINISHED").agg(
            F.max("create_date")
        ).first()[0]
        if last is not None:
            stats.update(run_cleanup(state, fs, root, today, str(last)))
    return stats
