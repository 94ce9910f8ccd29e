"""Streaming corpus ingestion with cross-batch incremental dedup:
end-to-end dedup across epochs, and exactly-once under epoch replay —
including the reprocess-vs-self trap (a replayed epoch must dedup against
the PRIOR index, not its own first attempt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.streaming.corpus_ingest import CorpusIngest


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture
def ingest(tmp_path):
    return CorpusIngest(
        input_dir=str(tmp_path / "in"),
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "cp"),
    )


def test_stream_dedups_within_and_across_epochs(spark, ingest, tmp_path):
    wave1 = _docs(spark, [(0, "alpha beta gamma"), (1, "alpha beta gamma"),
                          (2, "delta epsilon zeta")])
    wave2 = _docs(spark, [(3, "alpha beta gamma"),   # dup of epoch-1 content
                          (4, "eta theta iota"),
                          (5, "eta theta iota")])    # within-batch dup
    wave1.write.parquet(str(tmp_path / "in"), mode="append")
    q = ingest.start(available_now=True)
    q.awaitTermination(120)
    wave2.write.parquet(str(tmp_path / "in"), mode="append")
    q = ingest.start(available_now=True)
    q.awaitTermination(120)

    corpus = ingest.corpus(spark).collect()
    kept = {r["doc_id"] for r in corpus}
    # first occurrence wins within a batch; cross-epoch dups dropped
    assert kept == {0, 2, 4}
    index = ingest.index(spark)
    assert index.count() == index.select("fingerprint").distinct().count() == 3


def test_replayed_epoch_is_idempotent(spark, ingest):
    """Calling process_batch twice with the same epoch id (the crash-replay
    path: sink committed, checkpoint didn't) must leave corpus and index
    EXACTLY as after the first call — in particular the batch must NOT be
    deduplicated against its own first attempt and dropped."""
    batch = _docs(spark, [(0, "alpha beta gamma"), (1, "delta epsilon zeta")])
    ingest.process_batch(batch, 0)
    first = sorted(r["doc_id"] for r in ingest.corpus(spark).collect())
    assert first == [0, 1]
    ingest.process_batch(batch, 0)  # replay
    again = sorted(r["doc_id"] for r in ingest.corpus(spark).collect())
    assert again == first
    assert ingest.index(spark).count() == 2

    # and a LATER epoch still dedups against epoch 0's index
    ingest.process_batch(
        _docs(spark, [(2, "alpha beta gamma"), (3, "fresh new content")]), 1
    )
    kept = sorted(r["doc_id"] for r in ingest.corpus(spark).collect())
    assert kept == [0, 1, 3]


def test_bootstrap_without_index(spark, ingest):
    ingest.process_batch(_docs(spark, [(7, "only doc")]), 5)
    assert [r["doc_id"] for r in ingest.corpus(spark).collect()] == [7]
    assert ingest.index(spark).count() == 1


def test_quality_gate_runs_before_dedup(spark, tmp_path):
    """Gated-out docs never enter the fingerprint index, so a later CLEAN
    duplicate of rejected content is still admitted (gate-then-dedup order,
    matching the batch training pipeline)."""
    gate = lambda df: df.filter(F.col("n_chars") >= 15)  # noqa: E731
    ingest = CorpusIngest(
        input_dir=str(tmp_path / "in"),
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "cp"),
        quality_gate=gate,
    )
    short = "alpha beta"  # 10 chars -> gated out in epoch 0
    ingest.process_batch(_docs(spark, [(0, short), (1, "long enough document")]), 0)
    assert sorted(r["doc_id"] for r in ingest.corpus(spark).collect()) == [1]
    # epoch 1 re-submits the same short content padded past the gate: its
    # fingerprint differs (different text), but also re-submits the SHORT
    # text verbatim — still gated, never deduped
    ingest.process_batch(_docs(spark, [(2, short), (3, "another long document here")]), 1)
    assert sorted(r["doc_id"] for r in ingest.corpus(spark).collect()) == [1, 3]
    assert ingest.index(spark).count() == 2  # only admitted docs indexed


def test_compact_index_preserves_dedup_and_replay(spark, ingest):
    """Compaction folds settled epochs into batch_id=-1, keeps the
    replayable tip epoch as a delta, and changes neither dedup behavior
    nor replay idempotence."""
    import os

    ingest.process_batch(_docs(spark, [(0, "alpha beta gamma")]), 0)
    ingest.process_batch(_docs(spark, [(1, "delta epsilon zeta")]), 1)
    ingest.process_batch(_docs(spark, [(2, "eta theta iota")]), 2)
    ingest.compact_index(spark)

    parts = sorted(
        int(d.split("=")[1])
        for d in os.listdir(ingest.index_dir)
        if d.startswith("batch_id=")
    )
    assert parts == [-1, 2]  # epochs 0,1 folded; tip 2 kept as delta
    assert ingest.index(spark).select("fingerprint").distinct().count() == 3

    # dedup against the compacted index still works
    ingest.process_batch(
        _docs(spark, [(3, "alpha beta gamma"), (4, "fresh content here")]), 3
    )
    kept = sorted(r["doc_id"] for r in ingest.corpus(spark).collect())
    assert kept == [0, 1, 2, 4]

    # replay of the tip epoch after compaction stays idempotent
    ingest.process_batch(
        _docs(spark, [(3, "alpha beta gamma"), (4, "fresh content here")]), 3
    )
    assert sorted(r["doc_id"] for r in ingest.corpus(spark).collect()) == kept


def test_pre_transform_cleans_before_dedup_and_storage(spark, tmp_path):
    """Streaming curation: a boilerplate-cleaning pre_transform rewrites
    text BEFORE fingerprinting, so (a) the stored corpus is cleaned and
    (b) two docs that differ only in boilerplate collapse to one."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators.dedup import (
        remove_boilerplate_lines,
    )

    def clean(batch):
        cleaned = remove_boilerplate_lines(batch, max_doc_freq=2)
        return (
            batch.drop("text", "n_chars")
            .join(cleaned.select("doc_id",
                                 F.col("text_clean").alias("text")),
                  "doc_id")
            .withColumn("n_chars", F.length("text"))
            .filter(F.col("text") != "")
        )

    ingest = CorpusIngest(
        input_dir=str(tmp_path / "in"),
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "cp"),
        pre_transform=clean,
    )
    hdr = "COOKIE BANNER"
    wave = _docs(spark, [
        (0, f"{hdr}\nunique body one"),
        (1, f"{hdr}\nunique body two"),
        (2, f"{hdr}\nunique body one"),   # same as 0 after cleaning
        (3, f"{hdr}"),                    # all boilerplate -> dropped
    ])
    wave.write.parquet(str(tmp_path / "in"), mode="append")
    q = ingest.start(available_now=True)
    q.awaitTermination(120)

    corpus = {r["doc_id"]: r["text"] for r in ingest.corpus(spark).collect()}
    assert set(corpus) == {0, 1}          # 2 collapsed into 0; 3 emptied out
    assert all(hdr not in t for t in corpus.values())  # stored text cleaned
    assert corpus[0] == "unique body one"


def test_compact_corpus_folds_and_preserves_content(spark, ingest):
    """Corpus compaction mirrors index compaction: settled epochs fold to
    batch_id=-1, the replayable tip stays a delta, content is unchanged,
    and a tip replay after compaction is still idempotent."""
    import os

    ingest.process_batch(_docs(spark, [(0, "alpha beta gamma")]), 0)
    ingest.process_batch(_docs(spark, [(1, "delta epsilon zeta")]), 1)
    ingest.process_batch(_docs(spark, [(2, "eta theta iota")]), 2)
    before = sorted(r["doc_id"] for r in ingest.corpus(spark).collect())
    folded = ingest.compact_corpus(spark)
    assert folded == 2  # epochs 0 and 1

    parts = sorted(
        int(d.split("=")[1])
        for d in os.listdir(ingest.corpus_dir)
        if d.startswith("batch_id=")
    )
    assert parts == [-1, 2]
    assert sorted(r["doc_id"] for r in ingest.corpus(spark).collect()) == before

    # tip replay after compaction overwrites its own partition, no dups
    ingest.process_batch(_docs(spark, [(2, "eta theta iota")]), 2)
    assert sorted(r["doc_id"] for r in ingest.corpus(spark).collect()) == before


def test_compact_corpus_crash_recovery_self_heals(spark, ingest, tmp_path):
    """Crash window: the folded base committed but the epoch deletions did
    not happen. Re-running compaction must collapse the duplicated rows
    (dedup on doc_id) back to one row per document."""
    import shutil

    ingest.process_batch(_docs(spark, [(0, "alpha beta gamma")]), 0)
    ingest.process_batch(_docs(spark, [(1, "delta epsilon zeta")]), 1)
    ingest.process_batch(_docs(spark, [(2, "eta theta iota")]), 2)

    # simulate the crash: preserve epoch 0's partition, compact, restore it
    saved = str(tmp_path / "saved_epoch0")
    shutil.copytree(f"{ingest.corpus_dir}/batch_id=0", saved)
    ingest.compact_corpus(spark)
    shutil.copytree(saved, f"{ingest.corpus_dir}/batch_id=0")

    # doc 0 now exists in base AND the resurrected epoch dir
    assert ingest.corpus(spark).filter("doc_id = 0").count() == 2
    ingest.compact_corpus(spark)  # recovery run
    docs = [r["doc_id"] for r in ingest.corpus(spark).collect()]
    assert sorted(docs) == [0, 1, 2]  # self-healed, one row per doc


def test_gzip_blob_decode_and_corruption(spark):
    """Read-side gzip: round trip preserves bytes exactly (multi-byte
    UTF-8 included), trailer CRC damage and truncation yield
    decode_ok=false with NULL text, and non-gzip payloads are declined
    by magic check — never a wrong answer."""
    from crypto_data_service_loader_spark.sources.gzip_blobs import (
        _gunzip, decode_gzip_text, encode_gzip_text)

    texts = ["plain ascii", "naïve café  ", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    blobs = encode_gzip_text(docs)
    out = {r["doc_id"]: r for r in decode_gzip_text(blobs).collect()}
    for i, t in enumerate(texts):
        assert out[i]["decode_ok"] and out[i]["text"] == t
        assert out[i]["n_bytes"] == len(t.encode("utf-8"))
    import gzip

    good = gzip.compress(b"hello world", mtime=0)
    assert _gunzip(good) == b"hello world"
    assert _gunzip(None) is None
    assert _gunzip(b"not gzip at all....") is None
    assert _gunzip(good[:-3]) is None            # truncated trailer
    crc_bad = bytearray(good)
    crc_bad[-6] ^= 0xFF                          # flip a CRC byte
    assert _gunzip(bytes(crc_bad)) is None


def test_multi_codec_sniff_roundtrip_and_strictness(spark):
    """gzip/bz2/xz all round-trip through the magic sniffer; corrupt or
    foreign payloads emit decode_ok=false rows; unicode survives."""
    from crypto_data_service_loader_spark.sources.gzip_blobs import (
        decode_compressed_text, encode_compressed_text)

    rows = [(0, "plain ascii", "gzip"), (1, "naïve café   text", "bz2"),
            (2, "", "xz"), (3, "x" * 5000, "gzip")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, codec string")
    blobs = encode_compressed_text(docs, codec_col="codec")
    out = {r["doc_id"]: r for r in decode_compressed_text(blobs).collect()}
    for did, text, codec in rows:
        assert out[did]["decode_ok"] and out[did]["codec"] == codec
        assert out[did]["text"] == text
        assert out[did]["n_bytes"] == len(text.encode("utf-8"))
    # compression actually happened on the repetitive doc
    assert out[3]["n_compressed"] < 5000
    bad = spark.createDataFrame(
        [(9, b"BZh9 but not really bzip2"), (10, b"\x1f\x8b trunc"),
         (11, b"who knows"), (12, None)],
        "doc_id long, payload binary")
    got = {r["doc_id"]: r["decode_ok"]
           for r in decode_compressed_text(bad).collect()}
    assert got == {9: False, 10: False, 11: False, 12: False}


def test_sniff_decompress_bomb_cap_and_id_col_symmetry(spark):
    """ADVICE r13: (a) a record expanding past the 64 MiB output cap
    declines instead of materializing gigabytes (bz2/xz amplification
    bombs); (b) encode_compressed_text keeps a non-default id column
    NAME, symmetric with decode_compressed_text."""
    import bz2

    from crypto_data_service_loader_spark.sources.gzip_blobs import (
        _MAX_DECOMPRESSED_BYTES, _sniff_decompress,
        decode_compressed_text, encode_compressed_text)

    # 128 MiB of zeros compresses to ~a few KB of bz2 — a classic bomb
    bomb = bz2.compress(b"\x00" * (_MAX_DECOMPRESSED_BYTES * 2))
    assert len(bomb) < 1 << 16
    assert _sniff_decompress(bomb) == (None, None)
    # just-under-cap still decodes
    ok = bz2.compress(b"a" * 1024)
    codec, raw = _sniff_decompress(ok)
    assert codec == "bz2" and raw == b"a" * 1024

    docs = spark.createDataFrame(
        [(7, "hello", "gzip")], "media_id long, text string, codec string")
    blobs = encode_compressed_text(docs, codec_col="codec", id_col="media_id")
    assert "media_id" in blobs.columns and "doc_id" not in blobs.columns
    out = decode_compressed_text(blobs, id_col="media_id").collect()
    assert out[0]["media_id"] == 7 and out[0]["text"] == "hello"


def test_gif_and_png_decline_declared_dimension_bombs():
    """ADVICE r13: a small payload DECLARING enormous dimensions is
    declined before any decompression allocates for it."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    # take a real tiny GIF from the encoder, then forge the image
    # descriptor's width/height to 65535x65535
    gif = bytearray(M._encode_gif(b"\x00\x01\x02\x03", 2, 2,
                                  bytes(range(12))))
    pos = gif.index(0x2C, 6)  # image descriptor
    gif[pos + 5:pos + 7] = (65535).to_bytes(2, "little")
    gif[pos + 7:pos + 9] = (65535).to_bytes(2, "little")
    assert M._parse_gif(bytes(gif)) is None
    # PNG: forge IHDR dims on a real encode; the chunk CRC is refreshed
    import struct
    import zlib

    png = bytearray(M._encode_png(b"\x10\x20\x30" * 4, 2, 2))
    ih = png.index(b"IHDR")
    png[ih + 4:ih + 8] = struct.pack(">I", 65535)
    png[ih + 8:ih + 12] = struct.pack(">I", 65535)
    crc = zlib.crc32(bytes(png[ih:ih + 17])) & 0xFFFFFFFF
    png[ih + 17:ih + 21] = struct.pack(">I", crc)
    assert M._parse_png(bytes(png)) is None
