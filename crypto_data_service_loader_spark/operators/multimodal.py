"""Multimodal column plumbing (LLM-pipeline EXT).

Image/audio/video are opaque `binary` columns + typed metadata (schemas.MEDIA).
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partitioning — is real and tested; the codec calls are STUBS (this container
has no image/audio libraries): decode raises NotImplementedError unless
`fake=True`, in which case a clearly-marked deterministic fake derived from
md5(payload) stands in so batch shape / downstream feature plumbing can be
tested end-to-end.

Scale notes: mapInPandas streams Arrow batches (bounded memory per task —
never collect binaries); `spark.sql.files.maxPartitionBytes` sizes blob-scan
partitions; feature extraction output is columnar (array<double>), ready for
the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

DECODE_SCHEMA = (
    "media_id long, kind string, mime string, "
    "feature array<double>, decode_ok boolean"
)


def _fake_feature(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """DETERMINISTIC FAKE: md5-derived unit-scale vector. Stands in for a
    real decoder+encoder (PIL/torchvision/ffmpeg) which is not installed."""
    if payload is None:
        payload = b""
    h = hashlib.md5(bytes(payload)).digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_and_featurize(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary payloads and emit fixed-width feature vectors.

    Real implementation would dispatch per `kind` to PIL/torchaudio/ffmpeg
    inside the batch loop. STUBBED: raises NotImplementedError unless
    fake=True (deterministic md5 features).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "pass fake=True for the deterministic test double"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                    "decode_ok": [p is not None for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(_batches, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Image resize plumbing. STUBBED codec: fake=True passes payload through
    with updated metadata (a real impl re-encodes via PIL)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError("image codec not available; fake=True for tests")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"],
                }
            )

    return media.filter("kind = 'image'").mapInPandas(_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, payload binary"


def sample_frames(media: DataFrame, every_ms: int, fake: bool = False) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.
    STUBBED decoder: fake=True emits md5-derived frame payloads at the
    correct cadence from duration_ms (a real impl would call ffmpeg)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if not fake:
                raise NotImplementedError("video codec not available; fake=True for tests")
            # vectorized repeat/explode inside the Arrow batch — one output
            # row per sampled frame, no per-row Python loop over the batch
            # clip: a negative/corrupt duration must yield zero frames (as
            # the per-row loop did), not a ValueError from np.repeat that
            # poisons the whole Arrow batch
            n_frames = (
                (pdf["duration_ms"].fillna(0).astype("int64") // every_ms)
                .clip(lower=0)
                .to_numpy()
            )
            ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            idx = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(n_frames) else np.array([], dtype="int64")
            # frame payload itself is the codec stub: md5(media_id:idx)
            payloads = [
                hashlib.md5(f"{m}:{i}".encode()).digest()
                for m, i in zip(ids, idx)
            ]
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idx, "payload": payloads}
            )

    return media.filter("kind = 'video'").mapInPandas(_batches, schema=FRAME_SCHEMA)
