"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all built-in
JVM functions over the `documents` table; no Python in the scan path.

Ratios are single IEEE divisions of integer counts — bit-identical across
engines (no summation-order hazard), so every operator here is
oracle-checkable without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deterministic and public-knowledge; quality depends on corpus, the
#: operator contract is only argmax(hit counts) with fixed tie-break order.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break priority

#: BPE-ish token pattern: letter runs | digit runs | single non-space symbol.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def _stop_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: chars, tokens, distinct tokens, avg token length,
    stopword ratio — the standard quality-filter feature block."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        (
            F.length(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", "")).cast("double")
            / n_tok
        ).alias("avg_token_len"),
        (
            _stop_hits(toks, STOPWORDS["en"]).cast("double") / n_tok
        ).alias("stopword_ratio"),
    )


def quality_expr(text_col: Column) -> Column:
    """The quality score as a single scan-local Column (round 17, guide
    §2.4): callers that already hold the document row attach the score
    as one projection instead of running `quality_score` as a separate
    relation and joining it back on the id — the join carried nothing
    but this expression's output, and eliminating it removes a full
    exchange + a second pass over the text at any scale. Same tree the
    optimizer produced for quality_score after projection collapse:
    length band + lexical diversity + stopword presence, rounded to 6dp."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n_tok
    stop_ratio = _stop_hits(toks, STOPWORDS["en"]).cast("double") / n_tok
    return F.round(
        F.when(len_ok, 0.4).otherwise(0.0)
        + diversity * 0.3
        + F.least(stop_ratio * 3.0, F.lit(1.0)) * 0.3,
        6,
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score in [0,1]: length band + lexical diversity +
    stopword presence. Weights are fixed; the point is a deterministic,
    filterable scalar (the standard pre-training quality gate shape).
    The scalar lives in `quality_expr` so composed pipelines can attach
    it scan-locally without the relation + join-back shape."""
    return docs.select(
        F.col(id_col), quality_expr(F.col(text_col)).alias("quality")
    )


#: Fixed linear-model weights for the classifier-style quality gate.
#: Stand-in for a trained fastText/logreg document-quality model: the
#: operator contract is "deterministic learned-model score + threshold
#: keep flag", not these particular weights.
QUALITY_CLF_WEIGHTS = {
    "bias": -1.0,
    "sqrt_tokens": 0.12,
    "stopword_ratio": 6.0,
    "diversity": 1.5,
    "avg_token_len": -0.35,
}


def quality_classifier(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Classifier-style quality gate: linear model over the text_stats
    feature block, squashed to (0,1), keep = score at/above 0.5.

    Deliberately transcendental-free so the score is bit-identical across
    engines: sqrt is IEEE-correctly-rounded (unlike log/exp, which differ
    across libm implementations), and the squash is the softsign
    0.5*(1 + z/(1+|z|)) — same shape as a sigmoid, only +,*,/,abs.
    keep ⇔ z >= 0 exactly, so the flag can never disagree with the score.
    One scan, no shuffle; the gate composes with dedup/split downstream.
    """
    w = QUALITY_CLF_WEIGHTS
    stats = text_stats(docs, text_col, id_col)
    diversity = F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    z = (
        F.lit(w["bias"])
        + F.lit(w["sqrt_tokens"]) * F.sqrt(F.col("n_tokens").cast("double"))
        + F.lit(w["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(w["diversity"]) * diversity
        + F.lit(w["avg_token_len"]) * F.col("avg_token_len")
    )
    score = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
    return stats.select(
        F.col(id_col),
        F.round(score, 6).alias("lm_quality"),
        (z >= 0).alias("keep"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits,
    ties broken by LANG_ORDER, all-zero -> 'und'."""
    toks = _tokens(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        *[_stop_hits(toks, STOPWORDS[lang]).alias(f"s_{lang}") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):
        pred = F.when((best > 0) & (F.col(f"s_{lang}") == best), lang).otherwise(pred)
    # reversed() so earlier LANG_ORDER entries overwrite later ones on ties
    return scored.select(F.col(id_col), pred.alias("lang_pred"))


#: Fixed character-trigram profiles (public-knowledge frequent trigrams per
#: language). Coarser than a trained model but stopword-independent: works
#: on text where function words are rare (code, titles, queries).
TRIGRAM_PROFILES = {
    "en": ["the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her",
           "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver"],
    "de": ["der", "ein", "sch", "ich", "nde", "die", "che", "den", "ten",
           "und", "ine", "gen", "end", "ers", "ste", "cht", "ung", "das"],
    "fr": ["les", "ent", "que", "ion", "ant", "eur", "our", "ait", "dan",
           "pou", "est", "par", "men", "tre", "com", "ons", "ous", "ett"],
    "es": ["que", "ent", "ion", "con", "ado", "est", "par", "los", "ien",
           "nte", "ara", "cio", "dad", "las", "del", "por", "una", "era"],
}


def lang_id_trigram(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Language ID from character trigrams: count text trigrams hitting each
    language's fixed profile, argmax with LANG_ORDER tie-break, all-zero ->
    'und'. Same contract as `lang_id` but stopword-independent. Trigram
    generation is a sequence+substring transform — scan-local, JVM-side."""
    s = F.lower(F.trim(F.col(text_col)))
    grams = F.when(
        F.length(s) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - 2),
            lambda i: s.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # project the trigram array ONCE, then score the 4 profiles off the
    # column: inlining `grams` into each size(filter(...)) builds the array
    # 4x per row (no CSE inside HOF lambdas) — measured 13.3s -> 3.7s at
    # sf0.1; CollapseProject keeps the expensive transform un-inlined
    # (1 substr in the final plan).
    gdf = docs.select(F.col(id_col), grams.alias("_grams"))
    scored = gdf.select(
        F.col(id_col),
        *[
            F.size(
                F.filter(F.col("_grams"), lambda g: g.isin(*TRIGRAM_PROFILES[lang]))
            ).alias(f"t_{lang}")
            for lang in LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"t_{lang}") for lang in LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):
        pred = F.when((best > 0) & (F.col(f"t_{lang}") == best), lang).otherwise(pred)
    return scored.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        *[F.col(f"t_{lang}") for lang in LANG_ORDER],
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (letter runs /
    digit runs / single symbols) — the cheap proxy pair for LLM token
    budgeting before real tokenization."""
    norm = F.lower(F.trim(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.size(F.split(norm, r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(TOKEN_PATTERN), 0)).alias("bpe_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-embedding chunker for RAG/training pipelines.

    Chunk starts advance by (chunk_tokens - overlap); the final chunk may be
    short; docs shorter than one window yield exactly one chunk. Pure
    JVM array ops (sequence + slice), exploded scan-side: no shuffle at
    all — chunking is embarrassingly parallel.
    """
    stride = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        ),
    )
    return docs.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def chunk_count_expr(
    text_col: Column, chunk_tokens: int = 64, overlap: int = 16
) -> Column:
    """`chunk_documents`' chunk COUNT as a scan-local Column (round 17,
    guide §2.4): the chunker emits exactly greatest(ceil((n-overlap)/
    stride), 1) rows per doc — the same n_chunks expression that sizes
    its sequence() — so a per-doc count-of-chunks rollup is this closed
    form, with NO explode, NO groupBy exchange, and NO join back to the
    doc row. count() over explode(sequence(0, n_chunks-1)) == n_chunks
    for every input because n_chunks >= 1 (explode never sees an empty
    array). Long-typed like the count it replaces."""
    stride = chunk_tokens - overlap
    n = F.size(_tokens(text_col))
    return F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1))


#: public-pattern PII regexes (emails, international-ish phone numbers)
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def redact_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails/phones with typed placeholders; flags count fields so
    downstream filters can drop PII-heavy docs. regexp_replace is JVM-side
    and scan-local (no shuffle)."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_PATTERNS["email"], "<EMAIL>"),
        PII_PATTERNS["phone"],
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted_text"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS["email"]), 0))
        .cast("int")
        .alias("n_emails"),
    )


def corpus_term_frequencies(
    docs: DataFrame, top_n: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level term statistics: term -> total occurrences + doc
    frequency, top-N by count. explode -> two-level agg: the per-(term,doc)
    combine happens map-side, the final shuffle carries distinct terms only
    — the vocabulary, not the corpus."""
    terms = docs.select(
        F.col(id_col).alias("doc"), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    per_doc = terms.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("tf").alias("total_count"),
            F.count(F.lit(1)).alias("doc_freq"),
        )
        .orderBy(F.col("total_count").desc(), F.col("term").asc())
        .limit(top_n)
    )


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array when the doc is
    shorter than one gram (sequence() would count down otherwise)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def gopher_quality_flags(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style rule flags (Rae et al. 2021, public heuristics), adapted
    to single-line docs: word-count band, mean-word-length band, alphabetic-
    word ratio, symbol-word ratio, stopword presence — each rule its own
    boolean column plus the overall gate. All array ops, scan-local (no
    shuffle); ratios are single int/int divisions, engine-exact."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / n
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    symbol_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("^[^a-z0-9]+$"))).cast("double") / n
    )
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    flags = {
        "ok_word_count": (n >= 10) & (n <= 100000),
        "ok_mean_word_len": (mean_len >= 2.0) & (mean_len <= 12.0),
        "ok_alpha_ratio": alpha_ratio >= 0.7,
        "ok_symbol_ratio": symbol_ratio <= 0.1,
        "ok_stopwords": stop_hits >= 1,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    return docs.select(
        F.col(id_col),
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        stop_hits.alias("stop_hits"),
        *[c.alias(name) for name, c in flags.items()],
        passes.alias("passes_gopher"),
    )


def repetition_stats(
    docs: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc n-gram repetition: top-gram fraction (occurrences of the most
    frequent n-gram / total n-grams) and duplicate-gram fraction (grams
    beyond their first occurrence / total) — the Gopher/C4 repetition
    filters. explode -> (doc, gram) count (map-side combine) -> per-doc
    rollup; the shuffle carries distinct (doc, gram) pairs only. Docs
    shorter than one gram are omitted (no grams to measure)."""
    grams = docs.select(
        F.col(id_col), F.explode(_ngrams(_tokens(F.col(text_col)), n)).alias("g")
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").alias("total"),
            F.max("c").alias("top"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            F.col(id_col),
            F.col("total").cast("bigint").alias("n_grams"),
            (F.col("top").cast("double") / F.col("total")).alias("top_gram_frac"),
            (
                (F.col("total") - F.col("n_distinct")).cast("double") / F.col("total")
            ).alias("dup_gram_frac"),
        )
    )


def doc_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Two fingerprints per doc:
    - content_fp: md5 of normalized text (order-sensitive, exact-dup key)
    - bag_fp: md5 of the sorted distinct token set (order-insensitive —
      catches shuffled/reordered copies)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", toks)).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias("bag_fp"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per training doc, the number of distinct
    word n-grams it shares with an evaluation/benchmark corpus, plus the
    drop flag. The standard pre-training hygiene step (n-gram-overlap
    decontamination as popularized by GPT-3 / The Pile, public method).

    Scale design: eval suites are MBs while the corpus is TBs, so the
    distinct benchmark gram set is broadcast — the training side never
    shuffles document bodies; the only wide exchange carries (id, count)
    pairs for the (small) matched subset. Gram explode is scan-local.
    """
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(_ngrams(_tokens(F.col(text_col)), n))
            ).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngrams(_tokens(F.col(text_col)), n))).alias(
            "gram"
        ),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("int").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def tf_idf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (tf * (ln((N+1)/(df+1)) + 1), sklearn-style smoothing, public formula).

    Plan: explode -> per-(doc,term) count (map-side combine) -> vocabulary
    df agg -> term-keyed join (vocabulary-sized, not corpus-sized) ->
    per-doc window top-k. The corpus count N joins as a single-row
    broadcast (constant size). Scores are rounded to 6dp BEFORE ranking so
    tie order (score desc, term asc) is engine-exact.
    """
    from pyspark.sql import Window

    terms = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.select(
            id_col, "term", "tfidf", F.row_number().over(w).alias("term_rank")
        )
        .filter(F.col("term_rank") <= k)
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval over the corpus: top-k documents per query by the
    Okapi BM25 score (Robertson et al.; Lucene-style idf
    ln(1 + (N - df + 0.5) / (df + 0.5)) — public formula). The retrieval
    primitive a curation pipeline uses for targeted quality mining and
    contamination triage ("which training docs answer this eval query").

    `queries` is (query_id, query_text). Scale design: the query set is
    tiny next to the corpus, so its distinct term list broadcasts and
    prunes the corpus postings FIRST — document frequencies, the
    per-(query, doc) join, and the scoring all run over query-term
    postings only; full-vocabulary statistics are never materialized.
    Corpus-wide constants (N, avgdl) are single-row broadcasts. Per-term
    partial scores are rounded to 6dp and DECIMAL-summed so the
    per-(query, doc) total is independent of partition merge order, then
    ranked (score desc, id asc) — fully engine-exact.
    """
    from .relational import dsum

    toks = _tokens(F.col(text_col))
    dl = docs.select(
        F.col(id_col), F.size(toks).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (dsum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = query_terms(queries)
    # tokenize ONCE per row (the _toks alias is referenced twice, which
    # blocks Catalyst's CollapseProject from inlining — and duplicating —
    # the split) and carry dl through the tf aggregation: bm25_rank then
    # skips its dl re-join, which previously cost a THIRD corpus
    # scan+tokenize per retrieval (round 16, guide §2.3/§2.4).
    toked = docs.select(F.col(id_col), toks.alias("_toks"))
    tf = (
        toked.select(
            F.col(id_col),
            F.size("_toks").cast("double").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        # prune to query terms BEFORE any aggregation: the broadcast join
        # keeps the postings build proportional to the matched subset
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.max("dl").alias("dl"),
        )
        # materialize the pruned postings once: bm25_rank references tf
        # twice (df aggregate + scoring join) and each reference would
        # re-run the whole corpus tokenize+explode (round 16, guide
        # §2.4). The relation is query-term postings only — tiny by the
        # broadcast-prune construction, at any corpus scale.
        .localCheckpoint()
    )
    return bm25_rank(tf, dl, stats, qterms, k1=k1, b=b, k=k, id_col=id_col)


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, query_text) -> distinct (query_id, term) rows, with the
    corpus tokenizer applied to the query text."""
    return (
        queries.select(
            "query_id",
            F.explode(
                F.array_distinct(_tokens(F.col("query_text")))
            ).alias("term"),
        )
        .distinct()
    )


def bm25_rank(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scoring core over prepared parts — shared by the inline
    `bm25_topk` (parts built from the raw corpus) and the persisted
    postings index (parts loaded from the pruned on-disk scan), so the
    two paths return EXACTLY the same ranking by construction.

    `tf` is (id, term, tf[, dl]), `dl` is (id, dl) — consulted only when
    `tf` does not already carry a dl column — `stats` a single row
    (n_docs, avgdl), `qterms` (query_id, term). Document frequencies are
    derived from `tf`, which both callers restrict to query terms first.
    """
    from pyspark.sql import Window

    from .relational import dsum

    # round 16 (guide §2.4): tf may already carry dl — both callers
    # produce it naturally (the inline build from the same tokenize pass,
    # the index scan from the persisted postings row) — in which case the
    # dl re-join (for the inline caller: a whole extra corpus
    # scan+tokenize) disappears.
    if "dl" not in tf.columns:
        tf = tf.join(dl, id_col)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b))
        + F.lit(float(b)) * F.col("dl") / F.col("avgdl")
    )
    # `tf` is referenced twice (the df aggregate below + the scoring
    # join): the inline caller materializes its pruned postings first so
    # the corpus tokenize runs once (round 16); the indexed caller's tf
    # is a cheap pruned index scan, fine to reference twice.
    # (A term-window df was tried instead and measured slower: the
    # query-term key space is tiny, so the window serialized the scoring
    # stage onto a handful of sorted partitions.)
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    part = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(stats))
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                idf * F.col("tf") * F.lit(float(k1) + 1.0) / norm, 6
            ).alias("part_score"),
        )
    )
    # ONE exchange for the score agg AND the rank window (round 17,
    # guide §2.4 — "two operations keyed the same way can share one
    # exchange"): HashPartitioning(query_id) satisfies the clustering of
    # groupBy(query_id, id) — the partition key is a subset of the
    # grouping keys — and is exactly the window's partitioning, so both
    # plan exchange-free on this repartition where they previously paid
    # one exchange each. Skew bound: a query's partition already had to
    # hold all its scored docs for the window, so this adds none.
    scored = (
        part.repartition("query_id")
        .groupBy("query_id", id_col)
        .agg(F.round(dsum("part_score"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.select(
        "query_id", id_col, "score", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage hybrid retrieval: BM25 retrieves `n_candidates` docs per
    query (lexical recall), then cosine similarity against the query
    embedding re-ranks them to the final top-k (semantic precision) —
    the standard retrieve-then-rerank shape every RAG / eval-mining
    pipeline runs. Emits both scores so consumers can audit the rerank.

    Query embeddings come from the `embeddings` table at
    `vec_id == query_id` (the caller aligns ids — the encode-the-query
    step, kept dependency-free here). Scale shape: BM25's broadcast
    query-term prune does the heavy lifting; the candidate set
    (queries x n_candidates rows) then BROADCASTS onto one embedding
    scan — the vector corpus never shuffles, and the rerank window runs
    over at most n_candidates rows per query. Cosines round to 6dp
    before ranking (engine-exact, ties break on doc id).
    """
    from pyspark.sql import Window

    from .similarity import _as_double, _dot

    cands = bm25_topk(
        docs, queries, k=n_candidates, k1=k1, b=b,
        text_col=text_col, id_col=id_col,
    ).select("query_id", id_col, F.col("score").alias("bm25_score"))
    return rerank_cosine(
        cands, embeddings, k=k, id_col=id_col,
        vec_col=vec_col, vec_id_col=vec_id_col,
        query_ids=queries.select("query_id"),
    )


def rerank_cosine(
    cands: DataFrame,
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    query_ids: DataFrame | None = None,
) -> DataFrame:
    """The cosine rerank stage, LITERALLY shared by `hybrid_topk`
    (inline BM25 candidates) and the index-backed hybrid path (postings
    index candidates) — so the two compositions agree by construction.
    `cands` is (query_id, id, bm25_score); query embeddings resolve at
    vec_id == query_id. The candidate set broadcasts onto ONE embedding
    scan; the rerank window sees at most the candidate rows per query.

    `query_ids` (optional, a (query_id) relation): where the query-id
    universe is already known — every caller has the query table in hand
    — pass it so the query-embedding probe does NOT re-derive ids from
    `cands`, which planned (and ran) the ENTIRE candidate pipeline twice
    (round 16, guide §2.4: the duplicated subtree was the whole BM25
    build). A superset of cands' ids is fine: the final inner join on
    query_id drops unmatched query vectors, so the result is unchanged.
    """
    from pyspark.sql import Window

    from .similarity import _as_double, _dot

    v = _as_double(F.col(vec_col))
    vecs = embeddings.select(
        F.col(vec_id_col).alias("_vid"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
    )
    qid_src = (
        cands.select(F.col("query_id").alias("_vid"))
        if query_ids is None
        else query_ids.select(F.col("query_id").alias("_vid"))
    )
    qv = vecs.join(
        F.broadcast(qid_src.distinct()),
        "_vid",
    ).select(
        F.col("_vid").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    joined = vecs.join(
        F.broadcast(cands), vecs["_vid"] == cands[id_col]
    ).join(F.broadcast(qv), "query_id")
    cos = F.round(
        _dot(F.col("_v"), F.col("_qv")) / (F.col("_n") * F.col("_qn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(
            "query_id", F.col(id_col), "bm25_score", cos.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def _gram_hash48(g: Column) -> Column:
    """Fold a gram string to 48 bits (12 md5 hex chars -> BIGINT).

    48 bits keeps collision mass negligible up to ~10^7-vocabulary corpora
    per Birthday bound while staying exactly representable in both a Spark
    LongType and a DuckDB BIGINT built via ('0x' || hex)::BIGINT — the
    portable hex->int recipe. Collision folding merges counts, which is the
    hashed-n-gram-LM design (same trade DSIR makes, Xie et al. 2023)."""
    return F.conv(F.substring(F.md5(g), 1, 12), 16, 10).cast("long")


def ngram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_prob: float = 0.05,
) -> DataFrame:
    """Bigram-LM fluency scoring — the CCNet-style perplexity filter
    (Wenzek et al. 2020, public method) expressed transcendental-free: the
    corpus itself trains token-bigram MLE counts, and each document scores
    its mean conditional bigram probability avg(c(w1 w2) / c(w1)). Low
    scores mark disfluent / gibberish text exactly where high perplexity
    would, without ln()/exp() (cross-engine bit agreement is not
    guaranteed for transcendentals; TVD-over-PSI precedent).

    Output: id, n_bigrams, lm_score (null when the doc has no bigram),
    ok_fluency (score >= min_prob; false for bigram-less docs).

    Scale shape: grams fold to 48-bit hashes (_gram_hash48) scan-side, so
    BOTH count aggregations partial-combine map-side and every shuffle
    carries (long, count) — never gram text. The two count joins are
    vocabulary-sized builds against the doc-gram relation; the per-doc
    re-aggregation is a combinable decimal sum. The doc scan is _spread
    to full parallelism (parquet byte-splitting under-partitions
    compute-heavy text) and the hashed gram relation localCheckpoints
    ONCE — it feeds the bigram-count aggregation AND the scoring join,
    and rebuilding the explode+md5 per reference dominated the runtime
    (measured 7.2 s -> ~3 s warm at sf0.1; same discipline as
    duplicated_ngram_spans).
    """
    from .dedup import _spread
    from .relational import davg

    base = _spread(docs.select(F.col(id_col), F.col(text_col)))
    toks = _tokens(F.col(text_col))
    grams = (
        base.select(F.col(id_col), F.explode(_ngrams(toks, 2)).alias("bg"))
        .select(
            F.col(id_col),
            _gram_hash48(F.col("bg")).alias("bg_h"),
            _gram_hash48(F.split(F.col("bg"), " ")[0]).alias("pre_h"),
        )
        .localCheckpoint()
    )
    uni = (
        base.select(F.explode(_tokens(F.col(text_col))).alias("t"))
        .select(_gram_hash48(F.col("t")).alias("pre_h"))
        .groupBy("pre_h")
        .agg(F.count(F.lit(1)).alias("c_pre"))
    )
    big = grams.groupBy("bg_h").agg(F.count(F.lit(1)).alias("c_bg"))

    # floor(x*1e6 + 0.5)/1e6 instead of round(x, 6): the two ratios here
    # (c/k and decimal-sum/n) can land EXACTLY on the 7th-decimal half,
    # where Spark's BigDecimal-exact round and DuckDB's multiply-based
    # round split by 1 ulp (the round-11 fuzzer caught a live case:
    # mean 0.4261905 -> 0.426190 vs 0.426191). The floor form is the
    # same IEEE op sequence on both engines, so it cannot diverge
    # (floor(x+0.5) precedent: vector_quantize_int8).
    def _r6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    scored = (
        grams.join(big, "bg_h")
        .join(uni, "pre_h")
        .select(
            F.col(id_col),
            _r6(F.col("c_bg").cast("double") / F.col("c_pre")).alias("p"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            _r6(davg("p")).alias("lm_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.col("lm_score"),
            F.coalesce(
                F.col("lm_score") >= F.lit(float(min_prob)), F.lit(False)
            ).alias("ok_fluency"),
        )
    )


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    k0: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009, public method): each
    retriever's top-n list contributes 1 / (k0 + rank); ranked by the
    sum. The UNION-shaped hybrid — a doc only one retriever surfaces
    still scores, unlike `hybrid_topk`'s retrieve-then-rerank where
    lexical recall gates everything. Emits both member ranks (null when
    a list missed the doc) so consumers can audit the fusion.

    Scale shape: the lexical list is `bm25_topk` (broadcast query-term
    prune); the semantic list broadcasts the constant-size query-vector
    set onto ONE embedding scan (the corpus never shuffles) and
    per-partition top-n heaps feed a (queries x n) window. The fusion
    full-outer join and final ranking run on at most
    queries x 2 x n_candidates rows. Score arithmetic is two exact
    rational terms summed in a fixed expression order — engine-exact.
    """
    from pyspark.sql import Window

    from .similarity import _as_double, _dot

    lex = bm25_topk(
        docs, queries, k=n_candidates, k1=k1, b=b,
        text_col=text_col, id_col=id_col,
    ).select("query_id", id_col, F.col("rank").alias("r_lex"))

    v = _as_double(F.col(vec_col))
    vecs = embeddings.select(
        F.col(vec_id_col).alias("_vid"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
    )
    qv = vecs.join(
        F.broadcast(queries.select(F.col("query_id").alias("_vid"))), "_vid"
    ).select(
        F.col("_vid").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_n").alias("_qn"),
    )
    cos = F.round(
        _dot(F.col("_v"), F.col("_qv")) / (F.col("_n") * F.col("_qn")), 6
    )
    wsem = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    sem = (
        vecs.crossJoin(F.broadcast(qv))
        .select("query_id", F.col("_vid").alias(id_col), cos.alias("_cos"))
        .withColumn("r_sem", F.row_number().over(wsem))
        .filter(F.col("r_sem") <= int(n_candidates))
        .select("query_id", id_col, "r_sem")
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(int(k0)) + F.col(r)), F.lit(0.0)
    )
    fused = lex.join(sem, ["query_id", id_col], "full_outer").select(
        "query_id",
        F.col(id_col),
        "r_lex",
        "r_sem",
        F.round(contrib("r_lex") + contrib("r_sem"), 6).alias("rrf_score"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return fused.withColumn("rank", F.row_number().over(wr)).filter(
        F.col("rank") <= int(k)
    )


#: query params dropped by canonical_url — the public tracking-param
#: blocklist (UTM family + click ids), the standard web-corpus dedup prep.
#: canonical_url builds its filter predicate from this tuple, and
#: tracking_filter_sql() emits the DuckDB mirror from the SAME constant,
#: so editing the blocklist changes both engines together (ADVICE r11).
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "ref=")


def _is_tracking_param(p: Column) -> Column:
    """True when query param `p` starts with any TRACKING_PARAM_PREFIXES
    entry — the predicate is folded from the constant so the blocklist
    has exactly one source of truth."""
    cond = F.lit(False)
    for prefix in TRACKING_PARAM_PREFIXES:
        cond = cond | p.startswith(prefix)
    return cond


def tracking_filter_sql(var: str = "p") -> str:
    """DuckDB list_filter lambda body mirroring _is_tracking_param —
    generated from TRACKING_PARAM_PREFIXES so the SQL oracle can never
    drift from the Spark predicate."""
    clauses = " OR ".join(
        f"starts_with({var}, '{prefix}')" for prefix in TRACKING_PARAM_PREFIXES
    )
    return f"NOT ({clauses})"


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for web-corpus dedup (the public recipe every
    CommonCrawl-style pipeline applies before URL-level dedup): strip the
    fragment, lowercase scheme+host (path case is preserved — it is
    significant), drop tracking query params (TRACKING_PARAM_PREFIXES),
    and sort the surviving params so param order can't split a dup group.

    Built entirely from split/array/lambda expressions — NO regex — so a
    SQL oracle mirrors it token-for-token (string_split / list_filter /
    list_sort behave identically for ASCII input; Spark's array_sort and
    DuckDB's list_sort both compare binary). The '?' split uses limit 2:
    everything after the FIRST '?' is the query string, so a second '?'
    stays inside its param token — the SQL mirror must rejoin
    string_split parts 2..end with '?' (array_to_string(qparts[2:],'?'))
    to match (ADVICE r11; multi-'?' case covered by the URL fuzzer).

    Scale: pure scan-local codegen — canonicalization at 100 TB is a map
    over the scan, and the dedup that follows shuffles only the
    canonical key."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.split(c, "#", 2)[0]
    qparts = F.split(no_frag, "\\?", 2)
    base = qparts[0]
    # scheme://host[/path...] — lowercase scheme+host (parts 1 and 3 of
    # the '/'-split; part 2 is the empty string between the slashes)
    parts = F.split(base, "/")
    host = F.lower(F.concat(parts[0], F.lit("//"), parts[2]))
    path = F.when(
        F.size(parts) > 3,
        F.concat(F.lit("/"), F.array_join(F.slice(parts, 4, 100000), "/")),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(F.get(qparts, 1), "&"),  # F.get: NULL (not ANSI error) when no query
        lambda p: ~_is_tracking_param(p),
    )
    query = F.when(
        (F.size(qparts) > 1) & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
    ).otherwise(F.lit(""))
    return F.concat(host, path, query)


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """URL-level dedup groups: canonicalize, group, keep-lowest-id policy.
    Returns (canonical_url, n_urls, canonical_id). One shuffle on the
    canonical key with map-side partials."""
    return (
        df.select(canonical_url(url_col).alias("canonical_url"), id_col)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def blocklist_audit(
    docs: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """Blocklist audit — per-doc banned-token hits against a blocklist
    that is a DATAFRAME, not an expression: production blocklists run to
    millions of terms and change independently of the code, so membership
    is an equi-join on exploded distinct tokens (Spark broadcasts a small
    list and shuffle-joins a huge one — the same plan text either way),
    never an `isin(N literals)` that recompiles per update and collapses
    past a few thousand terms.

    Returns one row per input doc: (id, n_hits, hit_terms — the matched
    tokens ',' joined in sorted order, kept — true when clean). The
    explode is per DISTINCT token, so the join input is bounded by
    vocabulary, not token count."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok"),
    )
    terms = blocklist.select(F.col(term_col).alias("tok")).distinct()
    hits = (
        toks.join(terms, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_hits"),
            F.array_join(F.array_sort(F.collect_list("tok")), ",")
            .alias("hit_terms"),
        )
    )
    return docs.join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.coalesce("hit_terms", F.lit("")).alias("hit_terms"),
        F.col("n_hits").isNull().alias("kept"),
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_col: str = "term",
) -> DataFrame:
    """Kept-docs-only form of `blocklist_audit`: anti-join the flagged
    id set — docs containing ANY blocked token drop, schema unchanged.
    One explode + one equi-join + one anti-join; no regex scan of N
    patterns per row."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok"),
    )
    terms = blocklist.select(F.col(term_col).alias("tok")).distinct()
    flagged = toks.join(terms, "tok").select(id_col).distinct()
    return docs.join(flagged, id_col, "left_anti")
