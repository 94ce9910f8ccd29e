"""Persisted media-fingerprint index: cross-epoch media near-dup without
re-fingerprinting the corpus.

The media twin of sources/minhash_index.py: the corpus's byte-grid
fingerprints (operators/multimodal.byte_grid_fingerprint, fixed
blockhash-style threshold — the locality-preserving rule) persist once;
each new batch is fingerprinted with ONE scan of the batch and probed
against the stored band postings by equi-join. Layout:

- ``buckets/`` — (band int, band_val, id) parquet, partitioned by band
  (partition-pruned probes; band is stored as a NATIVE INT column from
  day one — the minhash index's string/int partition-inference trap,
  fixed there by an explicit cast, is designed out here);
- ``fps/`` — (id, fp) for the exact Hamming verify;
- ``_media_meta.json`` — n_cells / bands / threshold / id column + type.

Scale shape: appends touch only the new batch; probes shuffle only
(band, band_val) keys; the verify is one integer xor per candidate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .pread import read_parquet_pinned
from ..operators.multimodal import byte_grid_fingerprint

_META = "_media_meta.json"


def _buckets_dir(path: str) -> str:
    return os.path.join(path, "buckets")


def _fps_dir(path: str) -> str:
    return os.path.join(path, "fps")


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def _bands(fps: DataFrame, id_col: str, n_cells: int, bands: int) -> DataFrame:
    r = n_cells // bands
    mask = (1 << r) - 1
    return fps.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright("fp", j * r).bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                )
                for j in range(bands)
            ])
        ).alias("b"),
    ).select(id_col, "b.band", "b.band_val")


def write_media_index(
    media: DataFrame,
    path: str,
    n_cells: int | None = 32,
    bands: int = 4,
    threshold: int = 9,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> int:
    """Fingerprint the corpus once and persist fps + band postings.
    Returns the indexed media count. ``n_cells=None`` resolves the width
    dial from the corpus size (multimodal.auto_grid_cells); whatever
    value is used is FROZEN in the index metadata — appends and probes
    always fingerprint with the stored dial, never a re-derived one
    (a re-derived dial on a grown corpus would silently partition new
    fingerprints differently from the stored postings)."""
    if n_cells is None:
        from ..operators.multimodal import auto_grid_cells
        from ..operators.similarity import corpus_count

        n_cells = auto_grid_cells(corpus_count(media), bands=bands)
    if n_cells % bands != 0:
        raise ValueError(f"bands must divide n_cells: {bands} vs {n_cells}")
    os.makedirs(path, exist_ok=True)
    fps = byte_grid_fingerprint(
        media, n_cells=n_cells, threshold=threshold,
        id_col=id_col, payload_col=payload_col,
    ).select(id_col, "fp").localCheckpoint()
    _bands(fps, id_col, n_cells, bands).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(_buckets_dir(path))
    fps.write.mode("overwrite").parquet(_fps_dir(path))
    _write_meta(path, {
        "kind": "media_grid_fp",
        "n_cells": n_cells,
        "bands": bands,
        "threshold": threshold,
        "id_col": id_col,
        "payload_col": payload_col,
        "id_type": media.schema[id_col].dataType.simpleString(),
    })
    return fps.count()


def append_to_media_index(new_media: DataFrame, path: str) -> int:
    """Fingerprint ONLY the new batch with the stored dials and append —
    the indexed corpus is never re-read."""
    meta = _read_meta(path)
    fps = byte_grid_fingerprint(
        new_media, n_cells=meta["n_cells"], threshold=meta["threshold"],
        id_col=meta["id_col"], payload_col=meta["payload_col"],
    ).select(meta["id_col"], "fp").localCheckpoint()
    _bands(fps, meta["id_col"], meta["n_cells"], meta["bands"]).write.mode(
        "append"
    ).partitionBy("band").parquet(_buckets_dir(path))
    fps.write.mode("append").parquet(_fps_dir(path))
    return fps.count()


def near_dups_against_media_index(
    spark: SparkSession,
    path: str,
    new_media: DataFrame,
    max_hamming: int | None = None,
) -> DataFrame:
    """Near-duplicates of ``new_media`` against the INDEXED corpus:
    (new id, dup_of, hamming) for candidates sharing a fingerprint band,
    verified by exact bit_count(xor) <= max_hamming (default bands-1,
    the 100%-recall pigeonhole threshold). Self-matches are excluded so
    an appended batch can be re-checked safely. One scan of the batch;
    the corpus is touched only through the (band, band_val) postings."""
    meta = _read_meta(path)
    id_col = meta["id_col"]
    if max_hamming is None:
        max_hamming = meta["bands"] - 1
    q_fps = byte_grid_fingerprint(
        new_media, n_cells=meta["n_cells"], threshold=meta["threshold"],
        id_col=id_col, payload_col=meta["payload_col"],
    ).select(F.col(id_col).alias("_qid"), F.col("fp").alias("_qfp"))
    q_fps = q_fps.localCheckpoint()
    q_buckets = _bands(
        q_fps.select(F.col("_qid"), F.col("_qfp").alias("fp")),
        "_qid", meta["n_cells"], meta["bands"],
    )
    idx_buckets = read_parquet_pinned(spark, _buckets_dir(path)).select(
        F.col(id_col).alias("_iid"), "band", "band_val"
    )
    cand = (
        q_buckets.join(idx_buckets, ["band", "band_val"])
        .where(F.col("_qid") != F.col("_iid"))
        .select("_qid", "_iid")
        .distinct()
    )
    i_fps = read_parquet_pinned(spark, _fps_dir(path)).select(
        F.col(id_col).alias("_iid"), F.col("fp").alias("_ifp")
    )
    ham = F.bit_count(F.col("_qfp").bitwiseXOR(F.col("_ifp"))).cast("int")
    return (
        cand.join(q_fps, "_qid")
        .join(i_fps, "_iid")
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select(
            F.col("_qid").alias(id_col),
            F.col("_iid").alias("dup_of"),
            "hamming",
        )
    )
