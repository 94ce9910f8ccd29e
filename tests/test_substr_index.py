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
