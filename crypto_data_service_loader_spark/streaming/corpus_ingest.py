"""Streaming corpus ingestion with cross-batch incremental dedup.

The streaming twin of ``operators.dedup.incremental_dedup``: document
files land in a directory; each micro-batch collapses within itself
(min-id per fingerprint), anti-joins against the persistent fingerprint
index built by all PRIOR epochs, then appends the surviving documents to
the corpus and their fingerprints to the index.

Exactly-once under crash-replay, by construction:

- both sinks are ``IdempotentParquetSink`` (one ``batch_id=<epoch>``
  partition per foreachBatch epoch, dynamic partition overwrite) — a
  replayed epoch overwrites its own first attempt, never appends;
- the index read EXCLUDES the current epoch's partition. Without that, a
  crash between the index write and the checkpoint commit would make the
  replay dedup the batch against its own first attempt and silently drop
  every document in it (the classic reprocess-vs-self bug; pinned by
  tests/test_corpus_ingest.py::test_replayed_epoch_is_idempotent);
- the survivor set is localCheckpoint'd once so the two writes commit the
  SAME decision — otherwise the second write would lazily recompute the
  dedup after the first had already changed on-disk state.

Scale shape (100 TB corpus, rolling crawls): only fingerprints shuffle —
the index side is 32-byte digests, the batch side collapses before the
anti-join, and document bodies move once (semi-join into the corpus
write). Persist the index bucketed on fingerprint (sources/bucketed.py)
to make the per-epoch anti-join exchange-free on the index side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.dedup import exact_dedup
from ..sinks.idempotent import IdempotentParquetSink

#: schema of the incoming document files (matches the documents table)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@dataclass
class CorpusIngest:
    """foreachBatch pipeline: (optional quality gate) -> within-batch
    collapse -> anti-join vs the prior-epoch fingerprint index ->
    idempotent corpus + index appends.

    `quality_gate` is any DataFrame -> DataFrame filter (e.g.
    ``lambda df: df.join(gopher_quality_flags(df).filter("passes_gopher")
    .select("doc_id"), "doc_id", "left_semi")``) applied BEFORE dedup, so
    rejected documents never enter the fingerprint index — a later clean
    copy of gated-out content can still be admitted, matching the batch
    pipeline's gate-then-dedup order (q_training_set_pipeline)."""

    input_dir: str
    corpus_dir: str
    index_dir: str
    checkpoint_dir: str
    id_col: str = "doc_id"
    text_col: str = "text"
    schema: str = DOC_SCHEMA
    quality_gate: object = None  # Callable[[DataFrame], DataFrame] | None
    #: optional REWRITE applied before gate+dedup (e.g. per-batch
    #: boilerplate-line removal): must return the same schema with
    #: `text_col` rewritten. Fingerprints, the index, and the stored
    #: corpus all see the cleaned text, so two docs that differ only in
    #: boilerplate collapse. Per-BATCH semantics by construction (a
    #: micro-batch only sees its own line frequencies — the streaming
    #: analogue of CCNet's per-snapshot cleaning).
    pre_transform: object = None  # Callable[[DataFrame], DataFrame] | None
    _corpus: IdempotentParquetSink = field(init=False)
    _index: IdempotentParquetSink = field(init=False)

    def __post_init__(self) -> None:
        self._corpus = IdempotentParquetSink(self.corpus_dir)
        self._index = IdempotentParquetSink(self.index_dir)

    def _prior_index(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        """Fingerprints committed by epochs OTHER than `batch_id` (a replay
        must never dedup a batch against its own first attempt)."""
        try:
            idx = spark.read.parquet(self.index_dir)
        except AnalysisException:
            return None  # bootstrap: no index yet
        return idx.filter(F.col("batch_id") != batch_id).select("fingerprint")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        spark = batch_df.sparkSession
        if self.pre_transform is not None:
            batch_df = self.pre_transform(batch_df)
        if self.quality_gate is not None:
            batch_df = self.quality_gate(batch_df)
        fresh = exact_dedup(batch_df, self.text_col, self.id_col)
        prior = self._prior_index(spark, bid)
        if prior is not None:
            fresh = fresh.join(prior, ["fingerprint"], "left_anti")
        # one materialized decision feeds BOTH sinks (see module docstring)
        survivors = fresh.localCheckpoint()
        kept_docs = batch_df.join(
            survivors.select(F.col("keep_id").alias(self.id_col)),
            [self.id_col],
            "left_semi",
        )
        self._corpus.write(kept_docs, bid)
        self._index.write(survivors.select("fingerprint"), bid)

    def start(self, available_now: bool = True):
        """Start the stream (availableNow drains what's on disk then stops
        — the test/backfill mode; pass False for a continuous watcher)."""
        spark = SparkSession.getActiveSession()
        stream = (
            spark.readStream.schema(self.schema).parquet(self.input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def corpus(self, spark: SparkSession) -> DataFrame:
        return self._corpus.read(spark)

    def index(self, spark: SparkSession) -> DataFrame:
        return self._index.read(spark)

    def compact_index(self, spark: SparkSession) -> None:
        """Fold committed epochs' fingerprints into one base partition —
        the small-files fix for the per-epoch anti-join's listing cost.
        Full fold/tip/crash-safety semantics live in
        `IdempotentParquetSink.compact`; fingerprints dedup on themselves
        (the folded base is the distinct set)."""
        self._index.compact(spark, dedup_cols=["fingerprint"])

    def compact_corpus(self, spark: SparkSession) -> int:
        """Corpus-side small-files fold: same tip-as-delta discipline as
        the index, deduped on the document id — which also makes a
        crash-between-commit-and-delete self-healing (the refold
        collapses base ∪ leftover epochs back to one row per doc).
        Readers in the crash window may transiently see a doc twice; run
        compaction in quiet windows or have readers collapse on id."""
        return self._corpus.compact(spark, dedup_cols=[self.id_col])
