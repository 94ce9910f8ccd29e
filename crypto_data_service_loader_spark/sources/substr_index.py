"""Persisted exact-substring window index: ExactSubstr dedup of NEW
batches against an already-indexed corpus, without re-hashing the corpus.

Completes the incremental story for the substring family the way
`minhash_index` does for near-dup and `dedup.incremental_dedup` does for
whole-document exact dedup: `dedup.exact_substring_spans` finds
duplicated >=L-char spans WITHIN one corpus, but production dedup is
batch N+1 against batches 1..N (Lee et al. 2022 run their suffix array
over train ∪ new data for the same reason). This index persists the
corpus's window-hash FREQUENCIES once; a new batch enumerates its own
stride-1 windows, joins them against the stored frequencies, and a
window position is duplicated when (batch occurrences + indexed
occurrences) >= 2 — i.e. duplicated within the batch OR anywhere in the
indexed corpus. Span merging is the same threshold-islands reduction as
the inline operator.

Layout under ``path``:

- ``windows/`` — (wh, n_occ) parquet segments, append-only: writes add a
  segment, queries SUM n_occ per wh across segments (so append never
  rewrites), ``compact_substr_index`` folds segments into one;
- ``_substr_meta.json`` — min_len / column names. Queries re-derive
  window hashes with THESE dials; md5 over explicit substrings is
  engine- and time-stable, so a window hashed today equals one hashed at
  index time.

At 100 TB: the index is ~32 bytes per corpus character — the honest
price of character-exact dedup without a monolithic suffix array (which
is O(corpus) single-node RAM). It is append-only parquet, bucketable by
``wh`` for a co-partitioned probe join, and the probe shuffles only the
NEW batch's windows. Run the 13-gram prefilter
(`duplicated_ngram_spans_sampled`) first and index/probe only flagged
documents to cut the constant — the staged recipe as one more stage.

Reference parity: the reference's registry keeps already-ingested state
so each cycle only processes NEW files (SaveNewFilesToDbFlow.java:
222-236); this is the same incremental contract applied to substring
dedup per the charter.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pread import read_parquet_pinned
from ..operators import dedup

_META = "_substr_meta.json"


def _windows_dir(path: str) -> str:
    return os.path.join(path, "windows")


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def write_substr_index(
    docs: DataFrame,
    path: str,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Build the index: one stride-1 window pass over ``docs``,
    frequencies aggregated map-side before the single fingerprint
    shuffle. Returns the number of DISTINCT windows indexed."""
    os.makedirs(path, exist_ok=True)
    freq = (
        dedup.substring_windows(docs, min_len, text_col, id_col)
        .groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .localCheckpoint()
    )
    freq.write.mode("overwrite").parquet(_windows_dir(path))
    _write_meta(path, {
        "kind": "substr",
        "min_len": int(min_len),
        "text_col": text_col,
        "id_col": id_col,
    })
    return freq.count()


def append_to_substr_index(new_docs: DataFrame, path: str) -> int:
    """Hash and append a new batch's window frequencies as one more
    segment (queries sum across segments — no rewrite). Returns the
    batch's distinct window count."""
    meta = _read_meta(path)
    freq = (
        dedup.substring_windows(
            new_docs, meta["min_len"], meta["text_col"], meta["id_col"]
        )
        .groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .localCheckpoint()
    )
    freq.write.mode("append").parquet(_windows_dir(path))
    return freq.count()


def compact_substr_index(spark: SparkSession, path: str) -> int:
    """Fold the append segments into one (wh, n_occ) row per window;
    returns the distinct window count after compaction."""
    folded = (
        read_parquet_pinned(spark, _windows_dir(path))
        .groupBy("wh")
        .agg(F.sum("n_occ").alias("n_occ"))
        .localCheckpoint()
    )
    folded.write.mode("overwrite").parquet(_windows_dir(path))
    return folded.count()


def spans_against_index(
    spark: SparkSession, path: str, new_docs: DataFrame
) -> DataFrame:
    """Exact duplicate spans of ``new_docs`` against the indexed corpus
    AND within the batch itself: a window position is duplicated when
    its corpus-wide occurrence total (batch + index) is >= 2 — exactly
    `exact_substring_spans` semantics over (indexed corpus ∪ batch),
    restricted to spans inside the batch. Same output schema as the
    inline operator: (id, span_start, span_len, n_windows).

    Plan: one window pass over the batch (materialized once — the
    frequency count and the probe both read it), one fingerprint-keyed
    aggregation per side, one join on wh. The corpus is touched only
    through the stored frequency table."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    wins = dedup.substring_windows(
        new_docs, meta["min_len"], meta["text_col"], id_col
    ).localCheckpoint()
    batch_freq = wins.groupBy("wh").agg(
        F.count(F.lit(1)).alias("n_batch")
    )
    idx_freq = (
        read_parquet_pinned(spark, _windows_dir(path))
        .groupBy("wh")
        .agg(F.sum("n_occ").alias("n_idx"))
    )
    dup = (
        batch_freq.join(idx_freq, "wh", "left")
        .filter(
            F.col("n_batch") + F.coalesce(F.col("n_idx"), F.lit(0)) >= 2
        )
        .select("wh")
    )
    return dedup.merge_window_spans(
        wins.join(dup, "wh"), meta["min_len"], id_col
    )
