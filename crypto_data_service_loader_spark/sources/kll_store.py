"""Persisted KLL sketch store — the quantile member of the persisted
sketch/index family (beside minhash_index / ann_index / text_index).

A KLL sketch is already a tiny (group, level, value) table, so the
store IS a parquet dataset plus a meta file pinning the dials. The
lifecycle mirrors the other indexes:

- ``write_kll_store``: sketch the corpus once, persist.
- ``append_to_kll_store``: sketch ONLY the new batch (one scan of the
  batch, the history is never re-read) and append its items — reads
  stay correct immediately because querying canonicalizes the item
  union per group (kll_canonicalize_py is a pure function of the item
  multiset).
- ``compact_kll_store``: fold the appended partials into the canonical
  per-group state for good — idempotent (canonicalization is), run it
  on any maintenance cadence.
- ``store_quantiles``: rank-error-bounded quantiles straight off the
  store.

Exactness notes: the total item weight — the row COUNT n — is exact
under every operation (compaction preserves weight); quantile
estimates carry the deterministic rank-error bound pinned in
tests/test_kll.py. Append-then-compact is NOT bit-identical to a
from-scratch rebuild (the compactor is fold-deterministic, not a
monoid — each compaction discards items), but both states satisfy the
same bound; the tests pin exactly that contract, not a false equality.

At 100 TB: appends touch only the new partition's data; the store
stays O(k · levels) rows per group forever; a day's sketches roll up
into month/year stores with ``kll_merge`` semantics (same canonical
union).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .pread import read_parquet_pinned
from ..operators.kll import kll_build, kll_quantiles

_META = "_kll_meta.json"


def _items_dir(path: str) -> str:
    return os.path.join(path, "items")


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def write_kll_store(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
) -> int:
    """Sketch ``df`` per group and persist. Returns the stored item
    count (<= (k+1) * levels per group)."""
    os.makedirs(path, exist_ok=True)
    sk = kll_build(df, group_cols, value_col, k).localCheckpoint()
    sk.write.mode("overwrite").parquet(_items_dir(path))
    _write_meta(path, {
        "kind": "kll",
        "k": k,
        "group_cols": list(group_cols),
        "value_col": value_col,
    })
    return sk.count()


def append_to_kll_store(new_rows: DataFrame, path: str) -> int:
    """Sketch ONLY the new batch with the stored dials and append its
    items — the history is never rescanned; the next read canonicalizes
    the union. Returns the appended item count."""
    meta = _read_meta(path)
    sk = kll_build(
        new_rows, meta["group_cols"], meta["value_col"], meta["k"]
    ).localCheckpoint()
    sk.write.mode("append").parquet(_items_dir(path))
    return sk.count()


def _merged(spark: SparkSession, path: str) -> DataFrame:
    from ..operators.kll import _merge_items, _group_schema

    meta = _read_meta(path)
    items = read_parquet_pinned(spark, _items_dir(path))
    schema = _group_schema(items, meta["group_cols"], "level int, value double")
    return _merge_items(items, meta["group_cols"], meta["k"], schema)


def compact_kll_store(spark: SparkSession, path: str) -> int:
    """Fold appended partials into the canonical per-group state and
    rewrite. Idempotent (canonicalization is a fixed point); returns
    the item count after compaction."""
    merged = _merged(spark, path).localCheckpoint()
    merged.write.mode("overwrite").parquet(_items_dir(path))
    return merged.count()


def store_quantiles(
    spark: SparkSession, path: str, qs: list[float]
) -> DataFrame:
    """Quantile estimates per group straight off the store (canonical
    merge on read — correct immediately after appends, no compaction
    required first)."""
    meta = _read_meta(path)
    return kll_quantiles(_merged(spark, path), meta["group_cols"], qs)
