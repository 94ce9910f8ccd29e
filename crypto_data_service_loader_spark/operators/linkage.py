"""Record linkage / entity resolution: blocked fuzzy joins and
field-agreement scoring.

The 100-TB shape: fuzzy matching is only tractable when the candidate
pair space is BLOCKED — each blocking pass maps every record to a
bucket key, candidates are the equi-join within a bucket, and the
expensive string metric runs only on candidates. This module never
generates an all-pairs product: pair volume is sum over buckets of
|left bucket| x |right bucket|, bounded by the blocking choice, and the
equi-joins are ordinary shuffle joins Catalyst plans like any other.

Recall is governed by the blocking design, not the verifier: for
substitution-only edits (equal-length strings) at distance <= 1, two
passes over complementary halves of the string are a pigeonhole
guarantee — the edit lands in one half, so every true pair agrees
exactly on the other half and is caught by that pass. For general
edits add passes (length bands, more fragments). The classic trap is a
low-selectivity key (a constant entity prefix, zero-padded ids): block
on the high-entropy END of the key, never the shared front.

Reference parity: the reference has no linkage; charter EXT (an
LLM-scale corpus pipeline needs source-record reconciliation before
dedup). Verification metric is Levenshtein — built into both Spark
(F.levenshtein, JVM codegen) and DuckDB, so suite keys stay
oracle-exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

#: reserved internal names a caller's frame must not carry
_RESERVED = ("_blk", "_pass")


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block_passes: list[tuple[Column, Column]],
    max_dist: int = 1,
    dist_col: str = "lev_dist",
) -> DataFrame:
    """Candidate pairs from the union of blocking passes, verified by
    Levenshtein distance <= ``max_dist``.

    Each blocking pass is a (left_key_expr, right_key_expr) Column
    pair; a pass contributes the equi-join of the two sides on that
    key. Passes are unioned and pairs deduped BEFORE verification, so
    a pair caught by several passes is verified once. Output: all left
    columns + all right columns + ``dist_col``.

    Column names must be disjoint between the two sides (raises
    otherwise) — alias the right side first, which real linkage always
    does anyway.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"left/right column names must be disjoint, both have: {sorted(overlap)}"
        )
    for df in (left, right):
        clash = [c for c in df.columns if c in _RESERVED]
        if clash:
            raise ValueError(f"columns {clash} collide with internal names {_RESERVED}")
    if not block_passes:
        raise ValueError("at least one blocking pass is required (no all-pairs path)")

    candidates = None
    for i, (lk, rk) in enumerate(block_passes):
        l_i = left.select("*", lk.cast("string").alias("_blk"))
        r_i = right.select("*", rk.cast("string").alias("_blk"))
        pairs_i = l_i.join(r_i, "_blk").drop("_blk")
        candidates = pairs_i if candidates is None else candidates.unionByName(pairs_i)
    # dedupe pairs caught by multiple passes before the verify metric
    candidates = candidates.distinct()
    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        candidates.withColumn(dist_col, dist.cast("int"))
        .where(F.col(dist_col) <= int(max_dist))
    )


def agreement_score(
    pairs: DataFrame,
    rules: list[dict],
    score_col: str = "match_score",
) -> DataFrame:
    """Fellegi-Sunter-lite weighted field agreement over candidate
    pairs. Each rule scores one field pair and contributes
    weight * agreement, where agreement is:

    - kind "exact": 1.0 if equal (null-safe: two nulls agree), else 0
    - kind "fuzzy": 1 - levenshtein/greatest(len, len, 1) — string
      similarity in [0, 1]; null-safe like exact (both null agree 1.0,
      one null agrees 0.0 — levenshtein(NULL, x) is NULL and would
      silently poison the whole score otherwise)

    Rule dicts: {"left": col, "right": col, "weight": w,
    "kind": "exact"|"fuzzy"}. The score is round(sum, 6); no shuffle —
    a pure projection over the candidate pairs, so it rides whatever
    partitioning the blocking join produced.
    """
    terms = []
    for r in rules:
        lc, rc = F.col(r["left"]), F.col(r["right"])
        w = float(r["weight"])
        kind = r.get("kind", "exact")
        if kind == "exact":
            agree = lc.eqNullSafe(rc).cast("double")
        elif kind == "fuzzy":
            denom = F.greatest(F.length(lc), F.length(rc), F.lit(1)).cast("double")
            sim = F.lit(1.0) - F.levenshtein(lc, rc).cast("double") / denom
            agree = (
                F.when(lc.isNull() & rc.isNull(), F.lit(1.0))
                .when(lc.isNull() | rc.isNull(), F.lit(0.0))
                .otherwise(sim)
            )
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        terms.append(F.lit(w) * agree)
    total = reduce(lambda a, b: a + b, terms)
    # + 0.0 normalizes IEEE -0.0 (cross-engine hash trap)
    return pairs.withColumn(score_col, F.round(total, 6) + F.lit(0.0))
