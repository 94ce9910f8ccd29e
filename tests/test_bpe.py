"""BPE trainer/segmenter vs an independent pure-Python reference
implementation (the correctness pin for a genuinely iterative operator
no SQL oracle can express)."""

from __future__ import annotations

from collections import Counter

from crypto_data_service_loader_spark.operators import bpe


# --- reference implementation (textbook Sennrich-style BPE) -----------


def _ref_train(texts: list[str], n_merges: int):
    freqs = Counter(
        w for t in texts for w in t.lower().strip().split() if w
    )
    vocab = {w: [*w, bpe.EOW] for w in freqs}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freqs[w]
        if not pairs:
            break
        # max count, lexicographic (left, right) tie-break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < 2:
            break
        merges.append((rank + 1, left, right, n))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


TEXTS = [
    "low low low low low lower lower newest newest",
    "newest newest newest newest widest widest widest",
    "the the the a a low widest newest",
]


def test_trainer_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = bpe.bpe_train_merges(docs, n_merges=12)
    ref, _ = _ref_train(TEXTS, 12)
    assert got == ref


def test_segmenter_matches_reference_vocab_and_reverses(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    merges = bpe.bpe_train_merges(docs, n_merges=8)
    _, ref_vocab = _ref_train(TEXTS, 8)
    seg = {r["doc_id"]: r["bpe_tokens"] for r in
           bpe.bpe_segment(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        expect = [s for w in t.lower().strip().split() for s in ref_vocab[w]]
        assert seg[i] == expect
        # reversibility: stripping EOW and concatenating reproduces text
        joined = "".join(seg[i]).replace(bpe.EOW, " ").strip()
        assert joined == " ".join(t.lower().split())


def test_trainer_stops_when_dry(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )
    # every pair occurs once -> nothing reaches the n>=2 floor
    assert bpe.bpe_train_merges(docs, n_merges=5) == []


def _ref_segment_word(word: str, merges) -> list[str]:
    """Pure-Python greedy left-to-right fold — the semantics
    bpe_segment's chained-replace formulation must reproduce."""
    syms = [*word, bpe.EOW]
    for _, left, right, _n in sorted(merges):
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def test_segment_replace_formulation_equals_greedy_fold(spark):
    """Adversarial overlap cases for the string-replace encoding: with a
    SINGLE-space encoding, replace(' l r ') on 'l r l r' consumes the
    shared separator and misses the second merge — the per-symbol
    double-space encoding must not."""
    words = ["abab", "aaa", "aaaa", "aabab", "ababab", "ba", "b",
             "aa", "abba", "babab", "xyx", ""]
    merges = [(1, "a", "b", 9), (2, "ab", "ab", 8), (3, "a", "a", 7),
              (4, "aa", "b", 6), (5, "x", "y", 5)]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    seg = {r["doc_id"]: r["bpe_tokens"] for r in
           bpe.bpe_segment(docs, merges).collect()}
    for i, w in enumerate(words):
        expect = _ref_segment_word(w, merges) if w else []
        assert seg[i] == expect, (w, seg[i], expect)


def test_segment_200_merge_rules(spark):
    """The chained-replace formulation stays analyzable at 200 rules
    (the nested-aggregate fold it replaced blew Catalyst up near ~100)."""
    # synthetic rules over a 2-char alphabet: growing left tokens
    merges = [(r + 1, "a" * (r + 1), "a", 2) for r in range(200)]
    docs = spark.createDataFrame(
        [(0, "a" * 64 + " b " + "a" * 3)], "doc_id long, text string"
    )
    row = bpe.bpe_segment(docs, merges).head()
    assert row["bpe_tokens"] == _ref_segment_word("a" * 64, merges) + \
        _ref_segment_word("b", merges) + _ref_segment_word("aaa", merges)


def test_trainer_on_corpus_sample_is_deterministic(spark, sf_dir):
    from crypto_data_service_loader_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    m1 = bpe.bpe_train_merges(docs, n_merges=6)
    m2 = bpe.bpe_train_merges(docs, n_merges=6)
    assert m1 == m2 and len(m1) == 6
