"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-data interchange (one document object per line; what most
public corpus releases and sequence loaders consume).

Read path mirrors csv_ingest's validation contract: PERMISSIVE parse
with a `_corrupt_record` spill column, so one mangled line quarantines
instead of failing a 100 TB ingest; schema is explicit (inference would
scan the data twice and silently widen types between crawls). Write path
reuses the training shard layout: range-sharded, in-shard ordered,
gzip-compressed JSON lines.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

#: explicit schema for the documents-shaped corpus interchange files;
#: extend per-dataset rather than inferring (inference double-scans and
#: drifts across crawls)
DOCUMENT_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Validated JSONL read: returns (good_rows, quarantined_lines, scan).

    PERMISSIVE mode parses what it can; a line that fails to parse (or
    whose types don't cast) lands whole in `_corrupt_record` with nulls
    elsewhere. Callers ship `quarantined` to a dead-letter location and
    continue — a single bad line must never fail a corpus ingest.

    The third return is the CACHED parsed scan both branches share (the
    cache is required — see inline note). Call `scan.unpersist()` once
    good/bad are drained, or use `open_documents_jsonl` which does it for
    you; repeated ingest calls would otherwise accumulate cached plans in
    executor storage.
    """
    raw = (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark refuses to answer queries that reference ONLY the corrupt
        # column from a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_
        # CORRUPT_RECORD_COLUMN); marking the parsed scan cached is the
        # documented way to make the quarantine branch legal.
        .cache()
    )
    good = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("line")
    )
    return good, bad, raw


@contextmanager
def open_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_JSONL_SCHEMA,
):
    """Context-manager form of `read_documents_jsonl`: yields (good, bad)
    and unpersists the shared cached scan on exit, so repeated ingests
    never leak executor storage."""
    good, bad, raw = read_documents_jsonl(spark, path, schema)
    try:
        yield good, bad
    finally:
        raw.unpersist()


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shards: int,
    order_col: str = "doc_id",
    compression: str = "gzip",
) -> None:
    """Write the corpus as globally ordered gzip JSONL shards (the layout
    sequence loaders stream): one range shuffle (`repartitionByRange`
    samples boundaries), in-shard sort, shard k's keys all precede shard
    k+1's. Spark's json sink emits one object per line — exactly the
    interchange format."""
    (
        df.repartitionByRange(shards, F.col(order_col).asc())
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("compression", compression)
        .json(path)
    )
