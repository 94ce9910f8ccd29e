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

Correctness contract: a term's postings land in exactly ONE bucket
(bucket = md5(term) mod n_buckets — md5 so the DRIVER can compute probe
buckets in plain Python, no JVM round-trip), so per-term document
frequencies computed from the pruned scan are complete, and the scoring
core is literally shared with the inline operator (`text.bm25_rank`) —
an index query returns EXACTLY what `text.bm25_topk` returns on the
same corpus (equality-tested). Corpus-wide stats (N, total token count)
ride in an ``_postings_meta.json`` sidecar as exact integers; appends
update them exactly, so avgdl never drifts.

Refresh strategy: append-friendly like the LSH index — a new crawl's
postings append into their term buckets and the sidecar integers add
up; no global rebuild. (Deletes require a rebuild or a doc-id tombstone
join — same tradeoff every postings store makes.)
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

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
    full corpus per query) -> write partitioned by term bucket. Returns
    the number of documents indexed."""
    postings = _postings(docs, text_col, id_col, n_buckets)
    (
        postings.select(id_col, "term", "tf", "dl", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
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
        .parquet(path)
    )
    n_docs, total_tokens = _corpus_totals(new_docs, text_col)
    meta["n_docs"] += n_docs
    meta["total_tokens"] += total_tokens
    _write_meta(path, meta)


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
    and the shared `text.bm25_rank` core scores the pruned postings with
    the sidecar's exact corpus stats. Equality with the inline
    `text.bm25_topk` on the same corpus is by construction (tested)."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    # indexes written before id_type landed in the sidecar were all long
    id_type = meta.get("id_type", "bigint")
    if meta["n_docs"] == 0:
        # a zero-doc index wrote no parquet files (nothing to scan) —
        # answer the vacuous query without touching the path, with the
        # same id type the non-empty path would return
        return spark.createDataFrame(
            [], f"query_id int, {id_col} {id_type}, score double, rank int"
        )
    qdf = spark.createDataFrame(
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
    scan = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    tf = (
        scan.join(F.broadcast(qterms.select("term").distinct()), "term")
        .select(id_col, "term", "tf", "dl")
    )
    n_docs = float(meta["n_docs"])
    # zero-doc index: scores are vacuously empty, but avgdl must not
    # divide by zero building the stats row
    avgdl = float(meta["total_tokens"]) / n_docs if n_docs else 0.0
    stats = spark.createDataFrame(
        [(n_docs, avgdl)], "n_docs double, avgdl double"
    )
    return bm25_rank(
        tf.select(id_col, "term", "tf"),
        tf.select(id_col, "dl").dropDuplicates([id_col]),
        stats, qterms, k1=k1, b=b, k=k, id_col=id_col,
    )
