"""Persisted inverted (postings) index — the precompute-once /
query-many path for BM25 retrieval, the text twin of
`sources/ann_index.py`.

The inline `text.bm25_topk` re-tokenizes the whole corpus per query
batch — right for one-shot curation jobs, wasteful for a query service.
The production shape at 100 TB: write the postings (term, doc, tf, dl)
PARTITIONED BY a term-hash bucket, then every query prunes to its
terms' buckets — Spark's FileIndex lists only the probed directories,
so query cost is per-bucket, not per-corpus (plan-tested: the scan
shows a ``PartitionFilters`` entry).

Layout under `path`:

- ``postings/`` — (id, term, tf, dl) PARTITIONED BY ``bucket``
  (= md5(term) mod n_buckets — md5 so the DRIVER can compute probe
  buckets in plain Python, no JVM round-trip). A term's postings land
  in exactly ONE bucket, so per-term document frequencies computed from
  the pruned scan are complete.
- ``doclens/`` — one (id, dl) row per indexed document, INCLUDING
  token-less documents (which have no postings rows): the delete path
  needs every doc's exact token count to keep the corpus stats exact.
- ``tombstones/`` — deleted doc ids. Queries anti-join them (broadcast:
  tombstones are small between compactions); `compact_postings_index`
  folds them into the postings for good. The standard
  delete-as-metadata design every postings store uses.
- ``_postings_meta.json`` — exact integer corpus stats (N, total token
  count, so avgdl never drifts), the id column name/type, bucket count.

Correctness contract: the scoring core is literally shared with the
inline operator (`text.bm25_rank`) and the sidecar stats adjust EXACTLY
on append and delete, so an index query returns EXACTLY what
`text.bm25_topk` returns on the same live corpus — after any sequence
of appends and deletes (equality-tested, including
delete-then-query == rebuild-then-query and post-compaction equality).

Refresh strategy: appends land in their term buckets and the sidecar
integers add up; deletes are tombstones honored at query time and
folded at compaction (the `IdempotentParquetSink.compact` discipline:
survivors localCheckpoint so the rewrite never reads the directory it
overwrites; a crash before the tombstone clear is self-healing because
re-applying a tombstone to already-compacted postings is a no-op
anti-join and the sidecar only adjusts for NEWLY tombstoned ids).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.localrel import local_values_df

from .pread import read_parquet_pinned
from ..operators.text import _tokens, bm25_rank, query_terms

_META = "_postings_meta.json"


def _bucket_of(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _bucket_col(term_col, n_buckets: int):
    # same arithmetic as _bucket_of: first 8 hex chars of md5, mod n
    return F.pmod(
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    ).cast("int")


def _postings_dir(path: str) -> str:
    return os.path.join(path, "postings")


def _doclens_dir(path: str) -> str:
    return os.path.join(path, "doclens")


def _tombstones_dir(path: str) -> str:
    return os.path.join(path, "tombstones")


def _postings(docs: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    toks = _tokens(F.col(text_col))
    with_dl = docs.select(
        F.col(id_col), F.size(toks).cast("double").alias("dl"),
        F.explode(toks).alias("term"),
    )
    return (
        with_dl.groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .withColumn("bucket", _bucket_col(F.col("term"), n_buckets))
    )


def _doclens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.size(_tokens(F.col(text_col))).cast("long").alias("dl"),
    )


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def _corpus_totals(docs: DataFrame, text_col: str) -> tuple[int, int]:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.size(_tokens(F.col(text_col))).cast("long")), F.lit(0)
        ).alias("t"),
    ).head()
    return int(row["n"]), int(row["t"])


def _tombstones(spark: SparkSession, path: str, id_col: str, id_type: str) -> DataFrame:
    """The tombstoned doc ids (empty frame when none exist yet)."""
    d = _tombstones_dir(path)
    if not os.path.isdir(d):
        return local_values_df(spark, [], f"{id_col} {id_type}")
    return read_parquet_pinned(spark, d)


def write_postings_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Build the postings index: one tokenize scan -> per-(doc, term) tf
    with the doc length denormalized onto each posting row (the BM25
    norm needs dl per candidate; a separate dl table would re-join the
    full corpus per query) -> write partitioned by term bucket, plus the
    per-doc length table the delete path needs. Returns the number of
    documents indexed."""
    postings = _postings(docs, text_col, id_col, n_buckets)
    (
        postings.select(id_col, "term", "tf", "dl", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(_postings_dir(path))
    )
    _doclens(docs, text_col, id_col).write.mode("overwrite").parquet(
        _doclens_dir(path)
    )
    n_docs, total_tokens = _corpus_totals(docs, text_col)
    _write_meta(path, {
        "n_buckets": int(n_buckets), "n_docs": n_docs,
        "total_tokens": total_tokens, "id_col": id_col,
        "id_type": docs.schema[id_col].dataType.simpleString(),
    })
    return n_docs


def append_to_postings_index(
    new_docs: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Append a new crawl: postings land in their existing term buckets
    and the sidecar's exact integer totals add up (avgdl stays exact —
    no drift across any number of appends). Caller contract: doc ids are
    new (replays go through an idempotent upstream, the same contract
    every append path in this repo uses)."""
    meta = _read_meta(path)
    postings = _postings(
        new_docs, text_col, meta["id_col"], meta["n_buckets"]
    )
    (
        postings.select(meta["id_col"], "term", "tf", "dl", "bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(_postings_dir(path))
    )
    _doclens(new_docs, text_col, meta["id_col"]).write.mode("append").parquet(
        _doclens_dir(path)
    )
    n_docs, total_tokens = _corpus_totals(new_docs, text_col)
    meta["n_docs"] += n_docs
    meta["total_tokens"] += total_tokens
    _write_meta(path, meta)


def delete_from_postings_index(
    spark: SparkSession, path: str, doc_ids: list
) -> int:
    """Delete documents as TOMBSTONES — no postings rewrite: the ids
    land in the tombstone store, queries anti-join them, and the sidecar
    stats adjust exactly using the per-doc length table (so BM25's N and
    avgdl behave as if the docs were never indexed — equality with a
    rebuild on the surviving corpus is tested). Returns how many ids
    were NEWLY deleted.

    Idempotent by construction: already-tombstoned ids are skipped
    (never double-subtracted) and ids absent from the index adjust
    nothing. Tombstones accumulate until `compact_postings_index` folds
    them into the postings for good."""
    meta = _read_meta(path)
    id_col, id_type = meta["id_col"], meta.get("id_type", "bigint")
    if not doc_ids or meta["n_docs"] == 0:
        return 0
    ids = local_values_df(
        spark,
        [(i,) for i in doc_ids], f"{id_col} {id_type}"
    ).distinct()
    fresh = ids.join(
        _tombstones(spark, path, id_col, id_type), [id_col], "left_anti"
    )
    # only ids actually in the corpus count (and carry their exact token
    # totals) — doclens includes token-less docs, so N stays exact even
    # for docs that never produced a posting row
    matched = (
        read_parquet_pinned(spark, _doclens_dir(path))
        .join(F.broadcast(fresh), [id_col], "left_semi")
        .localCheckpoint()  # two consumers below: stats agg + tombstone write
    )
    row = matched.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
    ).head()
    n_del, tok_del = int(row["n"]), int(row["t"])
    if n_del == 0:
        return 0
    matched.select(id_col).write.mode("append").parquet(_tombstones_dir(path))
    meta["n_docs"] -= n_del
    meta["total_tokens"] -= tok_del
    _write_meta(path, meta)
    return n_del


def compact_postings_index(spark: SparkSession, path: str) -> int:
    """Fold tombstones into the postings for good: rewrite postings and
    doclens without the deleted docs, then clear the tombstone store.
    Returns the number of tombstoned ids folded (0 = nothing to do).

    Crash-safe in the `IdempotentParquetSink.compact` discipline: the
    survivor sets localCheckpoint BEFORE the overwrite (the write never
    reads the directory it replaces), and a crash before the tombstone
    clear self-heals — re-running re-applies the anti-join to postings
    that already lack those docs (a no-op) and the sidecar was already
    adjusted at delete time, never at compaction."""
    meta = _read_meta(path)
    id_col, id_type = meta["id_col"], meta.get("id_type", "bigint")
    tomb_dir = _tombstones_dir(path)
    if not os.path.isdir(tomb_dir):
        return 0
    tombs = read_parquet_pinned(spark, tomb_dir).localCheckpoint()
    n = tombs.count()
    surviving_postings = (
        read_parquet_pinned(spark, _postings_dir(path))
        .join(F.broadcast(tombs), [id_col], "left_anti")
        .localCheckpoint()
    )
    surviving_lens = (
        read_parquet_pinned(spark, _doclens_dir(path))
        .join(F.broadcast(tombs), [id_col], "left_anti")
        .localCheckpoint()
    )
    (
        surviving_postings.select(id_col, "term", "tf", "dl", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(_postings_dir(path))
    )
    surviving_lens.write.mode("overwrite").parquet(_doclens_dir(path))
    shutil.rmtree(tomb_dir)
    return n


def postings_index_bm25(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, str]],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k against the persisted index. Probe buckets are computed
    DRIVER-side from the query terms (plain Python md5 — no corpus
    touch), `bucket IN (probes)` prunes the scan to those directories,
    tombstoned docs anti-join out (broadcast — small between
    compactions), and the shared `text.bm25_rank` core scores the pruned
    postings with the sidecar's exact corpus stats. Equality with the
    inline `text.bm25_topk` on the same live corpus is by construction
    (tested across appends, deletes, and compaction)."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    # indexes written before id_type landed in the sidecar were all long
    id_type = meta.get("id_type", "bigint")
    if meta["n_docs"] == 0:
        # a zero-doc index wrote no parquet files (nothing to scan) —
        # answer the vacuous query without touching the path, with the
        # same id type the non-empty path would return
        return local_values_df(
            spark,
            [], f"query_id int, {id_col} {id_type}, score double, rank int"
        )
    qdf = local_values_df(
        spark,
        queries, "query_id int, query_text string"
    )
    qterms = query_terms(qdf)
    # driver-side probe set: collect the SPARK-tokenized distinct terms
    # (a tiny, driver-safe set — queries are a driver-side list already)
    # instead of re-tokenizing in Python: Python's str.split breaks on
    # Unicode whitespace (NBSP, U+2028) that the corpus tokenizer's \s+
    # does not, which would probe the wrong buckets and silently miss
    # the bucket holding the real term.
    terms = sorted(r["term"] for r in qterms.select("term").distinct().collect())
    probes = sorted({_bucket_of(t, meta["n_buckets"]) for t in terms})
    scan = (
        read_parquet_pinned(spark, _postings_dir(path))
        .filter(F.col("bucket").isin(probes))
        .join(
            F.broadcast(_tombstones(spark, path, id_col, id_type)),
            [id_col],
            "left_anti",
        )
    )
    tf = (
        scan.join(F.broadcast(qterms.select("term").distinct()), "term")
        .select(id_col, "term", "tf", "dl")
    )
    n_docs = float(meta["n_docs"])
    # zero-doc index: scores are vacuously empty, but avgdl must not
    # divide by zero building the stats row
    avgdl = float(meta["total_tokens"]) / n_docs if n_docs else 0.0
    stats = local_values_df(
        spark,
        [(n_docs, avgdl)], "n_docs double, avgdl double"
    )
    # tf carries dl straight off the postings row: bm25_rank skips its
    # dl re-join, so the dropDuplicates+join pair this path used to pay
    # (an extra exchange over the pruned postings) is gone (round 16).
    return bm25_rank(
        tf.select(id_col, "term", "tf", "dl"),
        tf.select(id_col, "dl").dropDuplicates([id_col]),
        stats, qterms, k1=k1, b=b, k=k, id_col=id_col,
    )
