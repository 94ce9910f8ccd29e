"""Persisted exact-substring window index: lifecycle (write / append /
compact) and probe semantics — batch-vs-corpus duplication, batch-only
duplication, and equivalence with the inline operator over the union."""

from __future__ import annotations

from crypto_data_service_loader_spark.operators import dedup
from crypto_data_service_loader_spark.sources import substr_index

S = "doc_id long, text string"
SHARED = ("a shared legal banner sentence of exactly sixty characters!"
          + "x" * 60)[:60]
UNIQ1 = "".join(chr(33 + i) for i in range(70))
UNIQ2 = "".join(chr(120 - i) for i in range(70))


def test_substr_index_probe_matches_inline_union(spark, tmp_path):
    """A probe against the index equals exact_substring_spans over
    (corpus ∪ batch) restricted to batch docs: corpus-only partners are
    seen through the stored frequencies, batch-internal duplicates
    through the batch side of the (batch + index) >= 2 rule."""
    corpus = spark.createDataFrame(
        [(0, "C" * 7 + SHARED), (1, UNIQ1)], S)
    batch = spark.createDataFrame(
        [(10, "B" * 3 + SHARED),          # dups ONLY via the corpus
         (11, UNIQ2),                     # unique everywhere
         (12, "D" * 5 + UNIQ2[:55])],     # hmm: shares 50+ chars with 11
        S)
    path = str(tmp_path / "idx")
    n = substr_index.write_substr_index(corpus, path, min_len=50)
    assert n > 0
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_windows"])
        for r in substr_index.spans_against_index(
            spark, path, batch).collect()
    }
    union = corpus.unionByName(batch)
    want = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_windows"])
        for r in dedup.exact_substring_spans(union, min_len=50).collect()
        if r["doc_id"] >= 10
    }
    assert got == want
    # the corpus-partner span is found at the right offset
    assert (10, 4, 60, 11) in got


def test_substr_index_append_and_compact(spark, tmp_path):
    """Appending a segment makes its windows count toward the >= 2 rule
    (a batch doc unique within its batch dups against the APPENDED
    epoch), and compaction folds segments without changing probes."""
    corpus = spark.createDataFrame([(0, UNIQ1)], S)
    path = str(tmp_path / "idx")
    substr_index.write_substr_index(corpus, path, min_len=50)
    batch = spark.createDataFrame([(10, "Q" * 9 + SHARED)], S)
    assert substr_index.spans_against_index(
        spark, path, batch).count() == 0
    substr_index.append_to_substr_index(
        spark.createDataFrame([(1, "Z" * 4 + SHARED)], S), path)
    before = {
        tuple(r) for r in substr_index.spans_against_index(
            spark, path, batch).collect()
    }
    assert before == {(10, 10, 60, 11)}
    n = substr_index.compact_substr_index(spark, path)
    assert n > 0
    after = {
        tuple(r) for r in substr_index.spans_against_index(
            spark, path, batch).collect()
    }
    assert after == before


# ---------------------------------------------------------------------------
# Streaming twin #19: the foreachBatch index lifecycle (VERDICT r12 #4)

DOC_S = "doc_id long, text string, lang string, source string, n_chars long"


def _sdocs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOC_S)


def _span_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_windows"])
        for r in df.collect()
    }


def _epoch_want(spark, prefix_rows, epoch_rows):
    """The batch-operator pin: epoch spans == exact_substring_spans over
    the union of all batches so far, restricted to this epoch's docs."""
    union = _sdocs(spark, prefix_rows + epoch_rows)
    ids = {i for i, _ in epoch_rows}
    spans = dedup.exact_substring_spans(
        union.select("doc_id", "text"), min_len=50)
    return {t for t in _span_set(spans) if t[0] in ids}


def test_substr_stream_pinned_to_batch_on_any_prefix(spark, tmp_path):
    """Three epochs with within-batch, cross-batch, and no duplication:
    each epoch's streamed spans equal the batch operator over the prefix
    union restricted to that epoch — the twin-family pinning rule."""
    from crypto_data_service_loader_spark.streaming.substr_ingest import (
        SubstrIndexIngest,
    )

    ing = SubstrIndexIngest(
        input_dir=str(tmp_path / "in"),
        index_dir=str(tmp_path / "idx"),
        spans_dir=str(tmp_path / "spans"),
        checkpoint_dir=str(tmp_path / "cp"),
    )
    waves = [
        # epoch 0: within-batch duplicate pair + a unique doc
        [(0, "A" * 4 + SHARED), (1, "B" * 9 + SHARED), (2, UNIQ1)],
        # epoch 1: duplicates ONLY against epoch 0 (SHARED and UNIQ1)
        [(10, "C" * 2 + SHARED), (11, UNIQ1 + "zz")],
        # epoch 2: nothing duplicated anywhere
        [(20, UNIQ2)],
    ]
    seen: list = []
    for k, wave in enumerate(waves):
        _sdocs(spark, wave).write.parquet(
            str(tmp_path / "in"), mode="append")
        q = ing.start(available_now=True)
        q.awaitTermination(120)
        got = _span_set(
            ing.spans(spark).filter(f"batch_id = {k}").drop("batch_id"))
        assert got == _epoch_want(spark, seen, wave), f"epoch {k}"
        seen += wave
    # epoch 2 really emitted nothing
    assert ing.spans(spark).filter("batch_id = 2").count() == 0
    # and the streaming-built index IS a valid batch index: probing a new
    # batch through the batch-side reader matches the inline union
    probe = [(30, "D" * 6 + SHARED), (31, "fresh " + UNIQ2[:54] + "!!")]
    got = _span_set(substr_index.spans_against_index(
        spark, str(tmp_path / "idx"),
        _sdocs(spark, probe).select("doc_id", "text")))
    assert got == _epoch_want(spark, seen, probe)


def test_substr_stream_compact_mid_stream(spark, tmp_path):
    """Stop -> compact -> resume: folding settled epoch segments into the
    base partition changes neither the summed frequencies nor any later
    epoch's spans (counts are summed at read time; identity (wh, src)
    makes the fold pure dedup)."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.sources.substr_index import (
        _windows_dir,
    )
    from crypto_data_service_loader_spark.streaming.substr_ingest import (
        SubstrIndexIngest,
    )

    ing = SubstrIndexIngest(
        input_dir=str(tmp_path / "in"),
        index_dir=str(tmp_path / "idx"),
        spans_dir=str(tmp_path / "spans"),
        checkpoint_dir=str(tmp_path / "cp"),
    )
    waves = [
        [(0, "A" * 4 + SHARED), (1, UNIQ1)],
        [(10, "B" * 7 + SHARED), (11, UNIQ2)],
        [(20, "C" * 2 + SHARED), (21, UNIQ1 + "!!")],
    ]
    seen: list = []
    for k, wave in enumerate(waves[:2]):
        _sdocs(spark, wave).write.parquet(
            str(tmp_path / "in"), mode="append")
        ing.start(available_now=True).awaitTermination(120)
        seen += wave

    def freqs():
        return {
            (r["wh"], r["n"])
            for r in spark.read.parquet(_windows_dir(str(tmp_path / "idx")))
            .groupBy("wh").agg(F.sum("n_occ").alias("n")).collect()
        }

    before = freqs()
    folded = ing.compact(spark)
    assert folded >= 1  # epoch 0 settled into the base partition
    assert freqs() == before
    # resume: epoch 2 still sees every prior occurrence
    _sdocs(spark, waves[2]).write.parquet(
        str(tmp_path / "in"), mode="append")
    ing.start(available_now=True).awaitTermination(120)
    got = _span_set(
        ing.spans(spark).filter("batch_id = 2").drop("batch_id"))
    assert got == _epoch_want(spark, seen, waves[2])


def test_substr_stream_replayed_epoch_is_idempotent(spark, tmp_path):
    """The crash-replay path (sink committed, checkpoint didn't): calling
    process_batch twice with the same epoch id leaves spans AND summed
    index frequencies exactly as after the first call — in particular
    the replay must not probe the batch against its own first attempt
    (which would flag every window as duplicated)."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.sources.substr_index import (
        _windows_dir,
    )
    from crypto_data_service_loader_spark.streaming.substr_ingest import (
        SubstrIndexIngest,
    )

    ing = SubstrIndexIngest(
        input_dir=str(tmp_path / "in"),
        index_dir=str(tmp_path / "idx"),
        spans_dir=str(tmp_path / "spans"),
        checkpoint_dir=str(tmp_path / "cp"),
    )
    batch = _sdocs(spark, [(0, "A" * 4 + SHARED), (1, UNIQ1)])
    ing.process_batch(batch, 0)
    spans1 = _span_set(ing.spans(spark))
    assert spans1 == set()  # nothing duplicated within the lone batch

    ing.process_batch(batch, 0)  # replay
    assert _span_set(ing.spans(spark)) == spans1
    freq = {
        (r["wh"], r["n"])
        for r in spark.read.parquet(_windows_dir(str(tmp_path / "idx")))
        .groupBy("wh").agg(F.sum("n_occ").alias("n")).collect()
    }
    assert all(n == 1 for _, n in freq)  # no double-counted segment

    # a LATER epoch still sees epoch 0's occurrences exactly once
    ing.process_batch(_sdocs(spark, [(10, "B" * 9 + SHARED)]), 1)
    got = _span_set(ing.spans(spark).filter("batch_id = 1").drop("batch_id"))
    assert got == _epoch_want(
        spark, [(0, "A" * 4 + SHARED), (1, UNIQ1)],
        [(10, "B" * 9 + SHARED)])
