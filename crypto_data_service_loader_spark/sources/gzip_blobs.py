"""Read-side GZIP decode of blob columns — the ingestion-edge capability
the reference exercises on its WRITE path (CompressionHandler.java:43-46
streams gzip members schema-blind into ClickHouse; `sinks/
clickhouse_http.py` re-expresses that), applied to READS: web-corpus
pipelines store documents as per-record gzip members (WARC/WET-style),
and the engine must inflate them executor-side without a codec library.

Stdlib `gzip` only. Scale shape: scan-local Arrow `mapInPandas` — one
pass over the blob scan, no shuffle, bounded memory per task (each
Arrow batch inflates and is released); the same shape as the media
decoders in `operators/multimodal.py`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

GZIP_TEXT_SCHEMA = (
    "doc_id long, text string, n_compressed int, n_bytes int, decode_ok boolean"
)


def _gunzip(payload: bytes | None) -> bytes | None:
    """Inflate one gzip member; None for anything that isn't valid gzip
    (bad magic, truncated stream, CRC mismatch — wbits=31 verifies the
    trailer CRC32 exactly as `gzip.decompress` does) or anything over
    the `_MAX_DECOMPRESSED_BYTES` bomb cap (ADVICE r13)."""
    import zlib

    if payload is None:
        return None
    payload = bytes(payload)
    if len(payload) < 18 or payload[:2] != b"\x1f\x8b":
        return None
    try:
        return _bounded_decompress(zlib.decompressobj(31), payload)
    except (OSError, EOFError, zlib.error):
        return None


def decode_gzip_text(
    blobs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL gzip decode of per-record compressed documents: inflate each
    member with stdlib gzip (trailer CRC verified), decode UTF-8, and
    emit (id, text, n_compressed, n_bytes, decode_ok). The id column
    keeps its CALLER-GIVEN name in the output (the output schema is
    built from id_col, as substring_windows does — ADVICE r12). Invalid
    members yield decode_ok=false with NULL text instead of poisoning
    the batch — the decoders' shared convention."""
    out_schema = GZIP_TEXT_SCHEMA.replace("doc_id", id_col, 1)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = _gunzip(p)
                if raw is None:
                    rows.append((did, None, None, None, False))
                else:
                    try:
                        text = raw.decode("utf-8")
                    except UnicodeDecodeError:
                        rows.append((did, None, None, None, False))
                        continue
                    rows.append((
                        did, text,
                        len(bytes(p)) if p is not None else None,
                        len(raw), True,
                    ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "text", "n_compressed", "n_bytes",
                         "decode_ok"],
            )

    return blobs.mapInPandas(_batches, schema=out_schema)


GZIP_ENCODE_SCHEMA = "doc_id long, payload binary"


def encode_gzip_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    mtime: int = 0, level: int = 6,
) -> DataFrame:
    """Deflate each document's UTF-8 bytes into a gzip member (fixed
    mtime so payloads are deterministic). The test/gate twin of
    `decode_gzip_text` — gzip round-trips losslessly, so decoded output
    can be oracle-checked against the original text."""
    import gzip
    import io

    def _one(text: str) -> bytes:
        buf = io.BytesIO()
        with gzip.GzipFile(
            fileobj=buf, mode="wb", compresslevel=level, mtime=mtime
        ) as gz:
            gz.write(text.encode("utf-8"))
        return buf.getvalue()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "payload": [_one(t) for t in pdf[text_col]],
            })

    return docs.mapInPandas(_batches, schema=GZIP_ENCODE_SCHEMA)


# ---------------------------------------------------------------------------
# Multi-codec decode (round 13): real corpus dumps mix compression —
# WARC/WET members are gzip, Wikipedia dumps ship .bz2, many archive
# dumps .xz — and the ingestion edge must sniff the magic per RECORD
# (the reference's schema-blind byte handling, CompressionHandler.java:
# 43-46, generalized across codecs). All three decoders are stdlib
# (gzip/bz2/lzma), all three verify integrity (gzip trailer CRC, bz2
# block CRCs, xz check field), and dispatch is by magic bytes exactly
# like IMAGE_CODECS routes image payloads.
# ---------------------------------------------------------------------------

CODEC_TEXT_SCHEMA = (
    "doc_id long, codec string, text string, n_compressed int, "
    "n_bytes int, decode_ok boolean"
)


#: Decompression-bomb guard (ADVICE r13): bz2/xz reach amplification
#: ratios far beyond gzip's, so a small crafted record could expand to
#: gigabytes inside one executor before any downstream check sees it.
#: Every decode is capped at this output size and DECLINES past it —
#: 64 MiB per record is far above any real document in the profile.
_MAX_DECOMPRESSED_BYTES = 1 << 26


def _bounded_decompress(d, payload: bytes):
    """Run an incremental decompressor with the output cap; returns the
    raw bytes or None when the stream exceeds the cap, is truncated, or
    carries trailing garbage (single-member profile — decline, never
    misread)."""
    raw = d.decompress(payload, _MAX_DECOMPRESSED_BYTES + 1)
    if len(raw) > _MAX_DECOMPRESSED_BYTES:
        return None
    if not d.eof or d.unused_data:
        return None
    return raw


def _sniff_decompress(payload: bytes | None):
    """(codec, raw bytes) by magic — gzip 1f 8b, bzip2 'BZh', xz
    fd '7zXZ' 00 — or (None, None) when no codec accepts the payload.
    Integrity failures, output-cap hits, truncation, and trailing
    garbage all decline rather than raise; xz additionally caps decoder
    memory so a crafted dictionary size can't allocate gigabytes."""
    import bz2
    import gzip
    import lzma
    import zlib

    if payload is None:
        return None, None
    payload = bytes(payload)
    if payload[:2] == b"\x1f\x8b":
        try:
            # wbits=31 validates the gzip header and trailer CRC exactly
            # as gzip.decompress does; decompressobj natively exposes
            # the (eof, unused_data) surface the bounded loop needs
            raw = _bounded_decompress(zlib.decompressobj(31), payload)
        except (OSError, EOFError, zlib.error):
            return None, None
        return ("gzip", raw) if raw is not None else (None, None)
    if payload[:3] == b"BZh":
        try:
            raw = _bounded_decompress(bz2.BZ2Decompressor(), payload)
        except (OSError, EOFError, ValueError):
            return None, None
        return ("bz2", raw) if raw is not None else (None, None)
    if payload[:6] == b"\xfd7zXZ\x00":
        try:
            raw = _bounded_decompress(
                lzma.LZMADecompressor(memlimit=1 << 28), payload
            )
        except lzma.LZMAError:
            return None, None
        return ("xz", raw) if raw is not None else (None, None)
    return None, None


def decode_compressed_text(
    blobs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Magic-sniffing decode of per-record gzip/bz2/xz documents: emit
    (id, codec, text, n_compressed, n_bytes, decode_ok), caller-named id
    column, invalid or unrecognized members as decode_ok=false rows
    instead of poisoning the batch. Scan-local mapInPandas, no shuffle."""
    out_schema = CODEC_TEXT_SCHEMA.replace("doc_id", id_col, 1)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                codec, raw = _sniff_decompress(p)
                if raw is None:
                    rows.append((did, None, None, None, None, False))
                    continue
                try:
                    text = raw.decode("utf-8")
                except UnicodeDecodeError:
                    rows.append((did, None, None, None, None, False))
                    continue
                rows.append((
                    did, codec, text, len(bytes(p)), len(raw), True,
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "codec", "text", "n_compressed",
                         "n_bytes", "decode_ok"],
            )

    return blobs.mapInPandas(_batches, schema=out_schema)


def encode_compressed_text(
    docs: DataFrame, codec_col: str, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-row codec choice (the `codec_col` value picks gzip/bz2/xz) —
    the test/gate twin of `decode_compressed_text`; all three round-trip
    losslessly and deterministically (gzip pinned at mtime=0, bz2/xz are
    deterministic for fixed presets)."""
    import bz2
    import gzip
    import io
    import lzma

    def _one(text: str, codec: str) -> bytes:
        raw = text.encode("utf-8")
        if codec == "gzip":
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(raw)
            return buf.getvalue()
        if codec == "bz2":
            return bz2.compress(raw)
        if codec == "xz":
            return lzma.compress(raw)
        raise ValueError(f"unknown codec {codec!r}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "payload": [
                    _one(t, c) for t, c in zip(pdf[text_col], pdf[codec_col])
                ],
            })

    # keep the id column's NAME, symmetric with decode_compressed_text
    # (ADVICE r13: the fixed schema silently renamed it to doc_id)
    out_schema = GZIP_ENCODE_SCHEMA.replace("doc_id", id_col, 1)
    return docs.mapInPandas(_batches, schema=out_schema)
