"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — all expressed as
compositions of built-in JVM-side functions (no Python UDFs in any hot
path), so Catalyst/Tungsten keep the whole plan in codegen.

Determinism contract: every hash is md5 over an explicit string — identical
in Spark and DuckDB, stable across runs/engines/partitionings. MinHash "min"
is the lexicographic min of hex digests, a uniform order on the hash space.

Scale design:
- exact dedup: one hash-shuffle on a 32-hex-char fingerprint, never on the
  document body;
- MinHash+LSH: signatures are computed scan-side per row (no shuffle), the
  only shuffle is the band-bucket explode + self-join on (band, band_hash)
  — the classic O(candidates) near-dup join instead of O(n²);
- candidate verification joins back to bodies only for the (tiny) candidate
  set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def normalized_fingerprint(text_col: Column) -> Column:
    """md5 of whitespace-normalized lowercase text."""
    return F.md5(F.concat_ws(" ", _tokens(text_col)))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: fingerprint -> canonical (min) id + dup count.

    Shuffles 32-byte fingerprints + ids only; document bodies never move.
    """
    return (
        _spread(docs).select(
            F.col(id_col),
            normalized_fingerprint(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus fingerprint index — the
    production shape of exact dedup (each crawl dedups against everything
    already ingested; the corpus is never re-fingerprinted).

    Two stages, both fingerprint-only shuffles (bodies never move):
    within-batch collapse (min-id per fingerprint) then a left-anti join
    against the index's distinct fingerprints. At 100 TB the index side is
    a bucketed fingerprint table, making the anti-join co-partitioned and
    exchange-free on the index side.

    Returns the surviving new docs: (fingerprint, keep_id, n_docs) — n_docs
    counts the within-batch collapse, so `sum(n_docs)` + dropped-by-index
    reconciles to the batch size.
    """
    idx = index_docs.select(
        normalized_fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()
    fresh = exact_dedup(new_docs, text_col, id_col)
    return fresh.join(idx, ["fingerprint"], "left_anti")


def shingles(text_col: Column, k: int = 3) -> Column:
    """All k-word shingles of the text (empty array when < k tokens)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated n-gram detection — the n-gram-granular
    approximation of exact substring dedup (public recipe: Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; RefinedWeb
    applies it at 13-gram granularity, hence the default).

    A window is "duplicated" when its n-gram occurs in more than one
    DISTINCT document (within-doc repetition alone doesn't count — that is
    repetition_stats' job). Returns per doc: total windows, duplicated
    window count, and the duplicated fraction — the signal used to drop or
    trim boilerplate-heavy documents.

    Scale shape: the token stream explodes to one md5 per window (the
    irreducible cost of substring-level dedup without a suffix array — at
    100 TB this is THE dominant shuffle, ~32 bytes x total tokens; the
    character-EXACT upgrade is `exact_substring_spans`), then
    two fingerprint-keyed aggregations with map-side partials. Bodies
    never shuffle. For corpora where even that is too much, run on a
    Bernoulli sample of windows and extrapolate the ratio.
    """
    sh = shingles(F.col(text_col), k=n)
    # Materialize the exploded window hashes ONCE: the plan references them
    # three times (cross-doc counts, the dup join probe, per-doc totals) and
    # building 13-word window strings is the dominant scan cost — without
    # this the whole explode+md5 pipeline runs per reference (measured 29s
    # -> ~7s at sf0.1). Same localCheckpoint discipline as the MinHash
    # candidate pipeline.
    grams = (
        _spread(docs)
        .select(F.col(id_col), F.explode(sh).alias("gram"))
        .select(F.col(id_col), F.md5(F.col("gram")).alias("gh"))
        .localCheckpoint()
    )
    # ONE gram-keyed shuffle for the whole cross-doc stage (round 16,
    # guide §2.3/§2.4): repartition the occurrence stream by gram hash
    # once; the (gh, doc) occurrence counts then aggregate
    # PARTITION-LOCALLY (gh partitioning satisfies the (gh, doc)
    # clustering), the distinct-doc test is a window count over the
    # same partitioning (a sort, no exchange), and only the tiny per-doc
    # rollup shuffles again. The old shape shuffled the gram stream for
    # countDistinct AND re-shuffled (or broadcast) it a second time to
    # join the cross-doc gram set back — at 100 TB, where the cross-doc
    # set can never broadcast, that was two full gram-stream exchanges.
    pair_counts = (
        grams.repartition("gh")
        .groupBy("gh", id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc_dup = (
        pair_counts
        .withColumn("_nd", F.count(F.lit(1)).over(Window.partitionBy("gh")))
        .filter(F.col("_nd") > 1)
        .groupBy(id_col)
        .agg(F.sum("_c").alias("n_dup_windows"))
    )
    # totals from the materialized grams (explode drops 0-window docs, so
    # left-join back onto the id set rather than re-running the shingler)
    totals = (
        docs.select(F.col(id_col))
        .join(
            grams.groupBy(id_col).agg(
                F.count(F.lit(1)).cast("int").alias("n_windows")
            ),
            [id_col],
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("int").alias("n_windows"),
        )
    )
    dupw = F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("int")
    return totals.join(per_doc_dup, [id_col], "left").select(
        id_col,
        "n_windows",
        dupw.alias("n_dup_windows"),
        F.when(F.col("n_windows") > 0, dupw.cast("double") / F.col("n_windows"))
        .otherwise(F.lit(0.0))
        .alias("dup_window_ratio"),
    )


def exact_substring_spans(
    docs: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    reliable: bool = False,
) -> DataFrame:
    """EXACT substring dedup — the Lee et al. 2022 ExactSubstr recipe
    ("Deduplicating Training Data Makes Language Models Better": remove
    every substring of >= 50 chars that occurs more than once in the
    corpus), upgrading `duplicated_ngram_spans`' 13-gram-granular
    approximation to character-exact spans (VERDICT r11 #4; the gap was
    acknowledged in this module's span docstring since round 11).

    Windowed-exact formulation, equivalent to the paper's suffix array:
    a character lies inside a duplicated span of length >= L iff some
    L-char window covering it occurs more than once in the corpus (count
    includes same-document repeats, per the paper). So: enumerate every
    L-char window at stride 1, hash it, keep corpus-frequency > 1
    hashes, and merge each document's duplicated window positions into
    maximal DISJOINT spans with threshold gaps-and-islands (a new island
    starts when the position gap is >= L, since closer windows cover
    overlapping characters — see `merge_window_spans`). Emits one row
    per maximal span: (doc_id, span_start 1-based, span_len, n_windows).
    All-integer output — engine-exact against a SQL oracle.

    Scale shape: the stride-1 window explode is ~32 bytes per corpus
    CHARACTER — the irreducible shuffle of exact substring dedup without
    a monolithic suffix array (which is itself O(corpus) single-node
    RAM; the paper builds one in memory). The explode is materialized
    once (two consumers: the frequency count and the probe), both
    aggregations get map-side partials, and bodies never shuffle. At
    100 TB, run `duplicated_ngram_spans_sampled` first and feed only
    the flagged documents through this exact pass — the standard
    two-stage recipe."""
    L = int(min_len)
    # reliable=True swaps localCheckpoint for a lineage-keeping policy
    # that survives executor loss at cluster scale (functions.materialize)
    from ..functions.materialize import materialize_once

    wins = materialize_once(
        substring_windows(docs, L, text_col, id_col), reliable=reliable
    )
    dup = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("nocc"))
        .filter(F.col("nocc") > 1)
        .select("wh")
    )
    return merge_window_spans(wins.join(dup, "wh"), L, id_col)


def substring_windows(
    docs: DataFrame, min_len: int, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every min_len-char window at stride 1 as (id, i, wh=md5(window))
    — the shared enumeration of the ExactSubstr family (inline spans,
    the staged recipe, and the persisted window index)."""
    L = int(min_len)
    t = F.col(text_col)
    return (
        _spread(docs)
        .filter(F.length(t) >= L)  # also keeps F.sequence ascending
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(1), F.length(t) - (L - 1))
            ).alias("i"),
            t.alias("_t"),
        )
        .select(
            F.col(id_col),
            F.col("i"),
            F.md5(F.substring(F.col("_t"), F.col("i"), F.lit(L))).alias("wh"),
        )
    )


def merge_window_spans(
    dup_pos: DataFrame, min_len: int, id_col: str = "doc_id"
) -> DataFrame:
    """Merge duplicated window positions (id, i, ...) into maximal
    DISJOINT spans: two duplicated windows at positions p < q cover
    overlapping character ranges iff q - p < min_len, so a new island
    starts exactly when the gap to the previous duplicated position is
    >= min_len (threshold gaps-and-islands: cumulative sum of the
    new-island flag). The old stride-1 islands (i - row_number) split
    runs at ANY gap > 1, which could emit OVERLAPPING spans when
    1 < gap < min_len — double-counting excised characters in
    n_removed_chars (ADVICE r12). Emits (id, span_start, span_len,
    n_windows); span character ranges are now guaranteed maximal and
    pairwise disjoint, so SUM(span_len) == characters removed."""
    L = int(min_len)
    w = Window.partitionBy(id_col).orderBy("i")
    pos = (
        dup_pos.select(F.col(id_col), F.col("i"))
        .withColumn("_prev", F.lag("i").over(w))
        .withColumn(
            "g",
            F.sum(
                F.when(
                    F.col("_prev").isNull()
                    | (F.col("i") - F.col("_prev") >= L),
                    1,
                ).otherwise(0)
            ).over(w),
        )
    )
    return (
        pos.groupBy(id_col, "g")
        .agg(
            F.min("i").cast("int").alias("span_start"),
            (F.max("i") - F.min("i") + L).cast("int").alias("span_len"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("g")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    reliable: bool = False,
) -> DataFrame:
    """The ACTION step of the ExactSubstr recipe (Lee et al. 2022 cut
    every duplicated substring out of the training text — finding spans
    is only half the operator): compute the maximal duplicated spans
    (`exact_substring_spans`), then rebuild each document with those
    character ranges excised. Returns one row per input doc:
    (id, n_spans, n_removed_chars, clean_len, clean_md5) — the md5 of
    the rebuilt text makes the reconstruction value-checkable without
    shipping bodies through the gate.

    The rebuild is a single JVM-side fold: spans arrive per doc as a
    sorted non-overlapping array (guaranteed by the threshold islands
    merge — spans are maximal and pairwise disjoint, ADVICE r12), and
    F.aggregate walks it carrying (cursor, acc), appending the kept gap
    before each span — no Python, no explode of the text. One extra
    shuffle vs the span finder (spans groupBy id + the join back), both
    on the id key."""
    L = int(min_len)
    t = F.col(text_col)
    spans = exact_substring_spans(docs, L, text_col, id_col, reliable)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_len"))
        ).alias("_spans"),
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum("span_len").cast("int").alias("n_removed_chars"),
    )
    joined = docs.join(per_doc, [id_col], "left")
    spans_arr = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_len:int>>"),
    )
    clean = F.aggregate(
        spans_arr,
        F.struct(F.lit(1).alias("pos"), F.lit("").alias("acc")),
        lambda a, s: F.struct(
            (s["span_start"] + s["span_len"]).alias("pos"),
            F.concat(
                a["acc"],
                F.substring(t, a["pos"], s["span_start"] - a["pos"]),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], F.substring(t, a["pos"], F.length(t) - a["pos"] + 1)
        ),
    )
    return joined.select(
        F.col(id_col),
        F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
        F.coalesce(F.col("n_removed_chars"), F.lit(0)).alias(
            "n_removed_chars"
        ),
        F.length(clean).cast("int").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def duplicated_ngram_spans_sampled(
    docs: DataFrame,
    n: int = 13,
    rate: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The 100-TB fallback for `duplicated_ngram_spans`: estimate the
    per-doc duplicated-window ratio from a deterministic sample of the
    GRAM space instead of every window.

    The sample gates on the gram's own hash (keep a window iff the first 8
    hex digits of md5(gram) mod 1000 < rate*1000), so every occurrence of
    a kept gram — across all documents — survives together: the
    cross-document test is EXACT within the sampled gram stratum, and the
    per-doc ratio is the plain sample estimate (unbiased over the gram
    strata; `rate=1.0` reproduces the exact operator's numbers). This cuts
    the dominant md5-per-window shuffle to `rate` of the corpus' token
    volume. Deterministic (no RNG), hence oracle-exact.

    Returns per doc: sampled window count, sampled duplicated count, and
    the estimated duplicated fraction.
    """
    keep = int(max(0.0, min(1.0, float(rate))) * 1000)
    sh = shingles(F.col(text_col), k=n)
    grams = (
        _spread(docs)
        .select(F.col(id_col), F.explode(sh).alias("gram"))
        .select(F.col(id_col), F.md5(F.col("gram")).alias("gh"))
        # the gate runs scan-side, BEFORE the localCheckpoint and the
        # fingerprint shuffles — dropped windows never move
        .filter(
            F.conv(F.substring("gh", 1, 8), 16, 10).cast("long") % 1000 < keep
        )
        .localCheckpoint()
    )
    # same single-gram-shuffle shape as the exact operator (round 16):
    # repartition by gram hash once; counts, the distinct-doc window,
    # and the filter all run partition-local — no second stream shuffle
    pair_counts = (
        grams.repartition("gh")
        .groupBy("gh", id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc_dup = (
        pair_counts
        .withColumn("_nd", F.count(F.lit(1)).over(Window.partitionBy("gh")))
        .filter(F.col("_nd") > 1)
        .groupBy(id_col)
        .agg(F.sum("_c").alias("ndw"))
    )
    totals = (
        docs.select(F.col(id_col))
        .join(
            grams.groupBy(id_col).agg(
                F.count(F.lit(1)).cast("int").alias("n_windows_sampled")
            ),
            [id_col],
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_windows_sampled"), F.lit(0))
            .cast("int")
            .alias("n_windows_sampled"),
        )
    )
    dupw = F.coalesce(F.col("ndw"), F.lit(0)).cast("int")
    return totals.join(per_doc_dup, [id_col], "left").select(
        id_col,
        "n_windows_sampled",
        dupw.alias("n_dup_windows_sampled"),
        F.when(
            F.col("n_windows_sampled") > 0,
            dupw.cast("double") / F.col("n_windows_sampled"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_window_ratio_est"),
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    max_doc_freq: int = 2,
    delimiter: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level boilerplate removal (public recipe: CCNet / RefinedWeb
    line dedup): a line occurring in more than `max_doc_freq` DISTINCT
    documents is boilerplate (nav bars, cookie banners, legal footers) and
    is dropped from EVERY document, which is then rebuilt in original line
    order. Returns (id, text_clean, n_lines, n_removed) — documents whose
    every line was boilerplate come back with empty text (downstream
    min-length gates drop them).

    Scale shape: lines shrink to md5 before the only wide shuffle (the
    distinct-doc frequency agg, map-side partials); the anti-join against
    the boilerplate set broadcasts at any realistic threshold (boilerplate
    lines are by definition few and heavy); the rebuild is one per-doc
    aggregation carrying each line exactly once.
    """
    lines = (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), delimiter)).alias(
                "pos", "line"
            ),
        )
        .withColumn("lh", F.md5(F.col("line")))
        # materialize once: the exploded lines feed three consumers (the
        # frequency agg, the anti-join probe, the per-doc totals) and the
        # document scan + explode would otherwise run per reference —
        # same localCheckpoint discipline as duplicated_ngram_spans
        .localCheckpoint()
    )
    boiler = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > max_doc_freq)
        .select("lh")
    )
    kept = lines.join(boiler, ["lh"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            delimiter,
        ).alias("text_clean"),
        F.count(F.lit(1)).cast("int").alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lines")
    )
    return (
        totals.join(rebuilt, [id_col], "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            (
                F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("int").alias("n_removed"),
        )
    )


def dedup_intra_doc_lines(
    docs: DataFrame,
    delimiter: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WITHIN-document repeated-line removal (public recipe: the
    MassiveText / Gopher "repetition removal" family dedups repeated
    lines/paragraphs inside one document; RefinedWeb applies the same
    intra-doc pass before corpus-level dedup): keep each line's FIRST
    occurrence, drop later repeats, rebuild in original order. The
    complement of `remove_boilerplate_lines` (corpus-wide frequencies —
    one wide shuffle): this one is document-LOCAL, a single JVM-side
    array fold per row, so the plan is map-only with ZERO shuffles and
    composes into any scan for free.

    Per-doc cost is O(lines²) string compares (array_contains over the
    growing accumulator) — the right trade at 100 TB, where real
    documents have tens-to-hundreds of lines and avoiding a corpus-wide
    explode+window shuffle dominates; a corpus of pathological
    million-line documents would posexplode + first-occurrence window
    instead (the `remove_boilerplate_lines` shape with a per-doc key).

    Returns (id, n_lines, n_kept, clean_md5) — the md5 of the rebuilt
    text value-checks the reconstruction without shipping bodies, the
    `dedup_substr_removal` discipline."""
    lines = F.split(F.col(text_col), delimiter)
    kept = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        F.md5(F.array_join(kept, delimiter)).alias("clean_md5"),
    )


#: Mersenne prime 2^31-1: permutation arithmetic stays inside int64
#: (a*h < 2^62) in both Spark and the DuckDB oracle — no 128-bit needed.
_MH_P = (1 << 31) - 1
#: Knuth multiplicative constant; seeds the per-function (a, b) params.
_MH_KNUTH = 2654435761


def _mh_params(i: int) -> tuple[int, int]:
    """Deterministic universal-hash params for permutation i: a in [1, p),
    b in [0, p) — fixed integers, identical across engines/runs."""
    a = (_MH_KNUTH * (2 * i + 1)) % _MH_P or 1
    b = (_MH_KNUTH * _MH_KNUTH * (i + 1)) % _MH_P
    return a, b


def _shingle_base_hash(s: Column) -> Column:
    """One md5 per shingle, folded to a 32-bit int (first 8 hex chars) and
    reduced mod p. The k permutations derive from THIS single digest with
    linear arithmetic — the textbook minhash trick: k independent md5s per
    shingle would cost k× the digest work for no statistical gain."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % _MH_P


def _seeded_min_hash(sh: Column, seed: int) -> Column:
    a, b = _mh_params(seed)
    # single-arg lambda: a two-arg lambda would make F.transform bind the
    # second parameter to the array index, not the seed
    return F.array_min(
        F.transform(sh, lambda s: (_shingle_base_hash(s) * a + b) % _MH_P)
    )


def minhash_signature(text_col: Column, num_hashes: int = 8, k: int = 3) -> Column:
    """MinHash signature: per permutation i, min of (a_i*h(shingle)+b_i) mod p
    over shingles, with h = md5 folded to 32 bits (one digest per shingle)."""
    sh = shingles(text_col, k)
    return F.array(*[_seeded_min_hash(sh, i) for i in range(num_hashes)])


#: `_spread`'s partition-count guard, memoized (round 17, guide §1.2):
#: the FIRST `.rdd.getNumPartitions()` on a fresh DataFrame costs
#: 70-180 ms of driver time (analysis + physical planning + RDD DAG
#: construction), and every bench/gate invocation builds fresh frames —
#: so each _spread call site paid that tax per trial for a count that
#: never changes within a session. Keyed by the analyzed plan's
#: semanticHash + the session's split-size conf (the two inputs the
#: count depends on); a hash collision could only mis-skip a perf-only
#: repartition, never change results.
_PARTS_MEMO: dict[tuple, int] = {}


def _num_partitions(df: DataFrame) -> int:
    key = None
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),  # noqa: SLF001
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes"),
        )
    except Exception:  # noqa: BLE001 — fall back to the direct count
        pass
    if key is not None and key in _PARTS_MEMO:
        return _PARTS_MEMO[key]
    n = df.rdd.getNumPartitions()
    if key is not None:
        _PARTS_MEMO[key] = n
    return n


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition CPU-bound hashing stages to the cluster's parallelism.

    Parquet splits by bytes (maxPartitionBytes), which under-partitions
    small-but-compute-heavy text tables (one 20 MB file = one task = one
    core doing ~all the md5 work). An explicit round-robin repartition costs
    one narrow shuffle of the doc ids+text and buys full-cluster fan-out;
    AQE coalesces back afterwards if the result is small.
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    if _num_partitions(docs) < target:
        return docs.repartition(target)
    return docs


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """`_spread`'s KEYED sibling (round 17, guide §2.5 input skew): pin a
    hash repartition on the given key(s) at the cluster's parallelism,
    so a CPU-dense aggregation keyed the same way runs fanned out
    INSTEAD of (a) its partial agg serializing into the one task a
    single-row-group parquet scan yields (byte-splits overstate the
    real decode parallelism of such files, so a split-count guard
    cannot see this case), and (b) AQE's byte-targeted coalescing
    collapsing the final agg of a small-but-compute-heavy shuffle onto
    a handful of cores (REPARTITION_BY_NUM is exempt from coalescing).

    UNGUARDED by design, unlike `_spread`: the downstream aggregation
    reuses this exchange (same keys, same partition count), so the plan
    carries exactly ONE shuffle of the stream at ANY scale — the pin
    replaces the aggregation's own exchange rather than adding one. The
    only trade is losing map-side partial aggregation, so use this only
    where partials don't compress (collect_set of near-distinct members,
    wide explodes), never in front of count/sum-style aggs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, *[F.col(c) for c in cols])


def minhash_sig_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature as columns (doc, h0..h{n-1}) — the
    shared base of the pair join, the banded bucket table, and the
    persisted index (sources/minhash_index.py). One md5 per shingle;
    the n permutations are linear arithmetic over that digest; the MIN
    aggregate combines map-side so the shuffle carries (doc, n×int64).
    Docs with < k tokens have no shingles and drop out by construction."""
    # keyed spread (round 17): the signature rollup below groups by the
    # id, so hashing the doc rows by id up front makes THAT the
    # pipeline's only exchange — the old round-robin _spread paid its
    # own shuffle AND the groupBy's (partial-min'd) exchange. Explodes
    # and projections preserve the partitioning, and per-key work is
    # bounded by one doc's shingle count.
    exploded = spread_by(docs, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(shingles(F.col(text_col), k)).alias("s"),
    )
    base = exploded.select("doc", _shingle_base_hash(F.col("s")).alias("h"))
    hashed = base.select(
        "doc",
        *[
            ((F.col("h") * _mh_params(i)[0] + _mh_params(i)[1]) % _MH_P).alias(
                f"m{i}"
            )
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc").agg(
        *[F.min(f"m{i}").alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Banded LSH bucket table (doc, band, band_hash): docs agreeing on
    ALL rows of a band share a bucket. The md5 band hash collapses
    rows_per_band int64s to one join key."""
    sig = minhash_sig_table(docs, text_col, id_col, num_hashes, k)
    return minhash_band_buckets(sig, num_hashes, bands)


def minhash_band_buckets(
    sig: DataFrame, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band a prepared signature table (doc, h0..h{n-1}) into the LSH
    bucket relation (doc, band, band_hash) — split out of
    `minhash_buckets` (round 16) so a caller that already holds the
    signatures (the persisted-index probe, the pair self-join) bands
    them WITHOUT re-running the whole shingle+minhash signing pass."""
    rows_per_band = num_hashes // bands
    banded = sig.select(
        "doc",
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias(f"band_{b}")
            for b in range(bands)
        ],
    )
    return banded.selectExpr(
        "doc",
        "stack({n}, {args}) AS (band, band_hash)".format(
            n=bands,
            args=", ".join(f"'{b}', band_{b}" for b in range(bands)),
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash LSH.

    rows/band = num_hashes/bands; docs agreeing on ALL rows of any band land
    in one bucket. The self-join is per-bucket, so cost tracks candidate
    count, not n². Skewed buckets (boilerplate-heavy corpora) are split by
    AQE skew-join handling.

    Shape: explode shingles -> ONE md5 per shingle folded to 32 bits ->
    k linear permutations (a_i*h+b_i mod 2^31-1, plain int64 codegen) ->
    groupBy(doc) MIN. The single-digest formulation is ~k× cheaper than
    per-seed md5s; hashes are computed outside array lambdas (Spark's
    subexpression elimination skips LambdaFunction trees), the MIN
    aggregate combines map-side, and the shuffle carries only
    (doc, 8×int64) rows. Docs with < k tokens have no
    shingles and are excluded from LSH by construction (explode drops them).
    """
    # materialize the bucket table once before the self-join: both join
    # sides reference it, and the planner built the ENTIRE
    # shingle+minhash signing pipeline twice (the exchange was never
    # reused across the self-join's aliases) — one signing pass, not
    # two, per round 16's executed-plan audit (guide §2.4). The
    # materialized relation is (doc, band, band_hash) — bands rows per
    # doc, index-sized, the same thing the persisted index stores.
    buckets = minhash_buckets(
        docs, text_col, id_col, num_hashes, bands, k
    ).localCheckpoint()
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
            "inner",
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for candidate pairs.

    Joins shingle sets onto the (small) candidate-pair set — the verify
    stage after LSH. array_intersect/union run JVM-side per row. Docs are
    semi-join-pruned to ids that appear in some candidate pair BEFORE
    shingling: without it the verify stage re-shingles the ENTIRE corpus
    twice (once per join side) to serve a candidate set that is
    O(collisions) — at 100 TB that dwarfs the verify itself.
    """
    # one reference to the pairs subplan (explode, not a 2-branch union):
    # candidate generation (e.g. the MinHash pipeline) is itself expensive,
    # and every extra reference re-computes it unless an identical exchange
    # gets reused
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("_cid")
    ).distinct()
    pruned = docs.join(
        cand_ids, docs[id_col] == cand_ids["_cid"], "left_semi"
    )
    sets = pruned.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("_sh"),
    )
    return (
        pairs.join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )


def ngram_containment(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Asymmetric near-dup verify: shingle containment |A∩B|/|A| and
    |A∩B|/|B| for candidate pairs — catches the quote/excerpt case
    Jaccard misses (a small doc fully contained in a large one has low
    Jaccard but containment 1.0; the standard signal for dropping the
    contained copy). Same prune-then-join shape as ngram_jaccard: docs
    are semi-join-pruned to candidate ids before shingling."""
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias("_cid")
    ).distinct()
    pruned = docs.join(
        cand_ids, docs[id_col] == cand_ids["_cid"], "left_semi"
    )
    sets = pruned.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("_sh"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(sets.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sets.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / F.size("sh_a"), 6).alias("containment_a"),
            F.round(inter / F.size("sh_b"), 6).alias("containment_b"),
        )
    )


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: sign-sum of per-token hash bits.

    Token hash = first 4 hex chars of md5 (16 bits), via conv(hex,16,10).
    Explode -> per-bit sign sums -> reassemble: two narrow shuffles on
    (id, token) and (id). Duplicate tokens count with multiplicity.
    """
    tok = _spread(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long"))
    bit_sums = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"b{i}") > 0, 2**i).otherwise(0)
    return bit_sums.select(F.col("doc").alias(id_col), sim.alias("simhash"))


def simhash_near_dups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = 16, max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance <= max_hamming —
    with GUARANTEED recall.

    Standard pigeonhole blocking: split the fingerprint into
    (max_hamming + 1) blocks; any pair within distance d differs in at
    most d blocks, so it agrees EXACTLY on at least one block. Equi-join
    per block, union, distinct, exact bit_count(xor) verify. Each join is
    per-bucket (no n²); the union multiplies candidate generation by d+1,
    not the verify set.
    """
    n_blocks = max_hamming + 1
    block_size = -(-bits // n_blocks)  # ceil
    mask = (1 << block_size) - 1
    s = simhash(docs, text_col, id_col, bits).select(
        F.col(id_col).alias("doc"), "simhash"
    )
    pairs = None
    for j in range(n_blocks):
        blocked = s.withColumn(
            "block", F.shiftright(F.col("simhash"), j * block_size).bitwiseAND(mask)
        )
        a, b = blocked.alias("a"), blocked.alias("b")
        cand = a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        pairs = cand if pairs is None else pairs.unionByName(cand)
    return (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "doc_id",
    max_iter: int = 64,
) -> DataFrame:
    """Cluster pairwise near-dup matches into duplicate groups: each node's
    cluster_id converges to the MIN node id reachable from it.

    Iterative min-label propagation: per round, every node takes the min of
    its own label and its neighbors' labels (edge join + groupBy-min),
    followed by one POINTER-JUMPING step (each node also takes its current
    label's label) — jumping halves the remaining distance every round, so
    convergence is O(log diameter) instead of O(diameter). That matters
    beyond constant factors: the sf0.1 embedding graph (threshold 0.4)
    has diameter 16, which silently exceeded the old plain-propagation
    cap of 15 — chain-shaped graphs at 100 TB would be far deeper, while
    log2 keeps any realistic component under the 64-round valve. Each
    round rebases `labels` with localCheckpoint — see the in-loop comment
    for why cache() is NOT sufficient (exponential logical-plan growth).
    Deterministic: min-label is order-independent, no RNG.
    """
    # Materialize the edge set ONCE before iterating: `edges` is referenced
    # every round, and an unmaterialized candidate pipeline (e.g. the
    # MinHash pairs feeding dedup_clusters) would re-run per round — at a
    # 30x probe that turned a ~20s job into 153s. localCheckpoint is the
    # in-session analog of the stage boundary a production pipeline would
    # put here (candidates persisted between jobs).
    pairs = pairs.localCheckpoint()  # the union below references it twice
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    ).localCheckpoint()
    # Each round MUST truncate lineage with localCheckpoint, not cache():
    # the step plan references `labels` twice (neighbor join + carry-through
    # join), so the LOGICAL plan doubles per round — a cached DataFrame
    # still pays Catalyst analysis/canonicalization over that 2^rounds
    # plan (measured: round 7 took 50s, round 8 never finished on a
    # 15-round-diameter graph). localCheckpoint rebases each round on an
    # RDD-backed scan: constant-size plan, constant per-round cost.
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == F.col("node"))
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the old label through the step so convergence is a filter on
        # the SAME materialization — one job per round, not a second join
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: also adopt the current label's own label —
        # halves remaining propagation distance each round
        lut = stepped.select(
            F.col("node").alias("_ln"), F.col("label").alias("_ll")
        )
        stepped = (
            stepped.join(lut, stepped.label == lut._ln, "left")
            .select(
                "node",
                "old",
                F.least(
                    F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("label") != F.col("old")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("cluster_id")
    )


def jaccard_prefix_join(
    docs: DataFrame,
    threshold_num: int = 7,
    threshold_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity self-join (token Jaccard >= num/den) via
    prefix filtering (PPJoin family, Xiao et al. 2008) — the
    100%-recall complement to MinHash-LSH: every qualifying pair is
    returned, none missed, no probabilistic dials.

    The filter theorem: order the corpus vocabulary by any global total
    order; if two token sets have Jaccard >= t, they MUST share at
    least one token among each side's first |s| - ceil(t*|s|) + 1
    ordered tokens (else the overlap is too small). So candidates are
    an equi-join on PREFIX tokens only, then exact verification. The
    order used is document frequency ascending (rarest first) — that
    puts the most selective tokens in the prefixes, which is what makes
    the candidate volume small; correctness holds for any order, so
    engine-specific tie-breaks cannot change the RESULT, only the
    candidate count (verification is exact).

    Everything threshold-shaped is integer arithmetic: the prefix
    length uses ceil(num*s/den) = (num*s + den - 1) DIV den, and the
    verify predicate den*|a&b| >= num*|a|b| — no float ever decides
    membership, so Spark and any SQL oracle agree bit-for-bit
    (jaccard is emitted as a rounded double for humans, computed from
    the same two ints on both engines).

    Scale shape: token explode -> df counts (partial-combined) ->
    rank window per doc (one shuffle on id) -> prefix equi-join on
    token (shuffle bounded by prefix postings; frequency-ascending
    order keeps hot tokens OUT of prefixes) -> distinct pairs ->
    verify via array_intersect on the two stored token sets. A pair of
    docs meets in at most min(p_a, p_b) prefix tokens before the
    distinct. No all-pairs anywhere; the classic skew risk (a stopword
    joining everything) is exactly what the df-ascending prefix order
    suppresses.

    Degenerate regime, measured: on a TINY vocabulary the OUTPUT is
    itself quadratic and no exact algorithm can beat output size — the
    synthetic sf0.1 corpus (5,000 docs over 31 distinct tokens) has
    5.1M qualifying pairs at t=0.7, so the ~100 s wall there is pair
    emission, not planning (SCALE_NOTES round 8). Real corpora have
    long-tail vocabularies where prefixes are rare tokens and the
    candidate set collapses; for tiny-vocab data use MinHash-LSH with
    a containment verify, or raise the threshold.
    """
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(f"threshold must be in (0, 1]: got {num}/{den}")
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("_tok"),
    ).where(F.col("_tok") != "")
    sizes = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("_s"))
    dfreq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        toks.join(dfreq, "_tok")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(
                    F.col("_df").asc(), F.col("_tok").asc()
                )
            ),
        )
        .join(sizes, "_id")
    )
    # p = s - ceil(num*s/den) + 1, all integer
    p = F.col("_s") - ((num * F.col("_s") + den - 1) / den).cast("long") + 1
    prefix = ranked.where(F.col("_rk") <= p).select("_id", "_tok", "_s")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id"))
            # length filter: J >= t forces den*min(sa,sb) >= num*max(sa,sb)
            & (
                den * F.least(F.col("a._s"), F.col("b._s"))
                >= num * F.greatest(F.col("a._s"), F.col("b._s"))
            ),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .distinct()
    )
    sets = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(
            F.filter(_tokens(F.col(text_col)), lambda x: x != "")
        ).alias("_tk"),
    )
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb"))).cast("long")
    sa = F.size(F.col("_ta")).cast("long")
    sb = F.size(F.col("_tb")).cast("long")
    union = sa + sb - inter
    return (
        cand.join(sets.select(F.col("_id").alias("id_a"), F.col("_tk").alias("_ta")), "id_a")
        .join(sets.select(F.col("_id").alias("id_b"), F.col("_tk").alias("_tb")), "id_b")
        .where(den * inter >= num * union)
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
        )
    )
