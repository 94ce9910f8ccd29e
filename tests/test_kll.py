"""KLL-style quantile sketch: canonical-state determinism, exactness
below k, deterministic rank-error bound under arbitrary merge
groupings (hypothesis), weight invariance, bounded state, and the
Spark build/merge/query path."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crypto_data_service_loader_spark.operators import kll

_VALS = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    min_size=0,
    max_size=2500,
)


def _rank_err(vals, items, q):
    """Distance from the target rank to the estimate's rank INTERVAL —
    duplicated values occupy a rank range, and hitting anywhere inside
    it is a correct answer."""
    est = kll.kll_quantile_py(items, q)
    lo = sum(1 for v in vals if v < est) + 1
    hi = sum(1 for v in vals if v <= est)
    target = max(1, math.ceil(q * len(vals)))
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target))


def _bound(items, n, k):
    """Deterministic worst case: each compaction at level l costs <= 2^l
    rank error and there are <= n/(k * 2^l) of them -> n * H / k with
    H = number of levels; +k slack for the sub-k regime."""
    levels = {lv for lv, _ in items}
    h = (max(levels) + 1) if levels else 1
    return n * h / k + 2


def test_exact_below_k_and_validation():
    vals = [float(v) for v in range(120)]
    items = kll.kll_canonicalize_py([(0, v) for v in vals], k=200)
    assert items == [(0, v) for v in vals]  # no compaction: lossless
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        est = kll.kll_quantile_py(items, q)
        target = max(1, math.ceil(q * 120))
        assert est == float(target - 1)  # exact rank semantics
    assert kll.kll_quantile_py([], 0.5) is None
    with pytest.raises(ValueError, match="q must be"):
        kll.kll_quantile_py(items, 1.5)
    with pytest.raises(ValueError, match="k must be"):
        kll.kll_canonicalize_py([(0, 1.0)], k=1)


@settings(max_examples=25, deadline=None)
@given(vals=_VALS, seed=st.integers(0, 2**31))
def test_canonical_state_is_order_independent(vals, seed):
    import random

    a = kll.kll_canonicalize_py([(0, v) for v in vals], k=64)
    shuffled = vals[:]
    random.Random(seed).shuffle(shuffled)
    b = kll.kll_canonicalize_py([(0, v) for v in shuffled], k=64)
    assert a == b
    # idempotent: canonical state re-canonicalizes to itself
    assert kll.kll_canonicalize_py(a, k=64) == a
    # total weight is invariant == n (every rank unit accounted for)
    assert sum(1 << lv for lv, _ in a) == len(vals)
    # bounded state: at most k+1 items per level
    per_level: dict[int, int] = {}
    for lv, _ in a:
        per_level[lv] = per_level.get(lv, 0) + 1
    assert all(c <= 65 for c in per_level.values())


@settings(max_examples=25, deadline=None)
@given(
    vals=_VALS,
    cut=st.floats(0.0, 1.0),
    q=st.sampled_from([0.1, 0.5, 0.9, 0.99]),
)
def test_rank_error_bounded_under_any_merge_grouping(vals, cut, q):
    """Splitting the input anywhere, sketching each part, and merging
    (canonicalize-the-union) stays within the deterministic rank-error
    bound — the mergeability contract."""
    if not vals:
        return
    k = 64
    i = int(cut * len(vals))
    pa = kll.kll_canonicalize_py([(0, v) for v in vals[:i]], k)
    pb = kll.kll_canonicalize_py([(0, v) for v in vals[i:]], k)
    merged = kll.kll_canonicalize_py(pa + pb, k)
    assert sum(1 << lv for lv, _ in merged) == len(vals)
    assert _rank_err(vals, merged, q) <= _bound(merged, len(vals), k)
    # one-shot build obeys the same bound
    whole = kll.kll_canonicalize_py([(0, v) for v in vals], k)
    assert _rank_err(vals, whole, q) <= _bound(whole, len(vals), k)


def test_spark_build_merge_query(spark):
    """Distributed build: partial sketches per partition, one sketch-item
    shuffle, per-group canonical merge; n exact per group; quantile
    estimates within the deterministic bound; kll_merge of split frames
    obeys the same contract."""
    from pyspark.sql import functions as F

    n = 6000
    df = spark.range(n).select(
        "id",
        (F.col("id") % 3).alias("g"),
        # deterministic pseudo-random values, same md5 trick as the suite
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
         .cast("double") / 1000.0).alias("value"),
    ).repartition(8).localCheckpoint()
    k = 128
    sk = kll.kll_build(df, ["g"], "value", k=k).localCheckpoint()
    per_level = sk.groupBy("g", "level").count().collect()
    assert all(r["count"] <= k + 1 for r in per_level)

    truth = {
        g: sorted(r["value"] for r in rows)
        for g, rows in (
            (g, df.where(F.col("g") == g).select("value").collect())
            for g in (0, 1, 2)
        )
    }
    qs = kll.kll_quantiles(sk, ["g"], [0.5, 0.9]).collect()
    assert len(qs) == 6
    for r in qs:
        vals = truth[r["g"]]
        assert r["n"] == len(vals)
        rank = sum(1 for v in vals if v <= r["q_est"])
        items = [(x["level"], x["value"])
                 for x in sk.where(F.col("g") == r["g"]).collect()]
        assert abs(rank - r["q"] * len(vals)) <= _bound(items, len(vals), k)

    # merge of two half-frames: n still exact, bound still holds
    halves = [
        kll.kll_build(df.where(F.col("id") % 2 == i), ["g"], "value", k=k)
        for i in (0, 1)
    ]
    merged = kll.kll_merge(halves, ["g"], k=k)
    mq = {(r["g"], r["q"]): r for r in
          kll.kll_quantiles(merged, ["g"], [0.5]).collect()}
    for g in (0, 1, 2):
        r = mq[(g, 0.5)]
        assert r["n"] == len(truth[g])
        rank = sum(1 for v in truth[g] if v <= r["q_est"])
        assert abs(rank - 0.5 * len(truth[g])) <= 0.1 * len(truth[g])


def test_kll_store_lifecycle(spark, tmp_path):
    """Persisted KLL store: write -> append (history never rescanned)
    -> query (merge-on-read, n exact immediately) -> compact
    (idempotent, bounded) -> query again (same n, bound still holds)."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.sources import kll_store

    def mkdf(lo, n):
        return spark.range(lo, lo + n).select(
            "id",
            (F.col("id") % 2).alias("g"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6),
                    16, 10).cast("double") / 100.0).alias("value"),
        )

    path = str(tmp_path / "kll")
    base, batch = mkdf(0, 3000), mkdf(3000, 1200)
    k = 128
    kll_store.write_kll_store(base, path, ["g"], "value", k=k)
    kll_store.append_to_kll_store(batch, path)

    both = base.unionByName(batch)
    truth = {
        g: sorted(r["value"] for r in
                  both.where(F.col("g") == g).select("value").collect())
        for g in (0, 1)
    }
    before = {
        (r["g"], r["q"]): r
        for r in kll_store.store_quantiles(spark, path, [0.5, 0.9]).collect()
    }
    for (g, q), r in before.items():
        vals = truth[g]
        assert r["n"] == len(vals)  # exact n right after append
        rank = sum(1 for v in vals if v <= r["q_est"])
        assert abs(rank - q * len(vals)) <= 0.1 * len(vals)

    n1 = kll_store.compact_kll_store(spark, path)
    n2 = kll_store.compact_kll_store(spark, path)
    assert n1 == n2  # canonicalization is a fixed point
    import glob

    per_group = (
        spark.read.parquet(str(tmp_path / "kll" / "items"))
        .groupBy("g", "level").count().collect()
    )
    assert all(r["count"] <= k + 1 for r in per_group)  # bounded forever

    after = {
        (r["g"], r["q"]): r
        for r in kll_store.store_quantiles(spark, path, [0.5, 0.9]).collect()
    }
    for key, r in after.items():
        assert r["n"] == before[key]["n"]
        g, q = key
        rank = sum(1 for v in truth[g] if v <= r["q_est"])
        assert abs(rank - q * len(truth[g])) <= 0.1 * len(truth[g])


def test_weighted_build_matches_repeated_rows(spark):
    """Weighted quantiles in the sketch's own currency: a weight-w row
    decomposes into the set bits of w, so total weight == sum(weights)
    EXACTLY and estimates land within the same rank-error bound as
    physically repeating each row w times."""
    from pyspark.sql import functions as F

    rows = [(i % 2, float((i * 37) % 211), 1 + (i * 7) % 13)
            for i in range(800)]
    df = spark.createDataFrame(rows, "g int, value double, w int")
    k = 128
    wsk = kll.kll_build(df, ["g"], "value", k=k, weight_col="w")

    rep_rows = [(g, v) for g, v, w in rows for _ in range(w)]
    truth = {}
    for g in (0, 1):
        truth[g] = sorted(v for gg, v in rep_rows if gg == g)
    got = kll.kll_quantiles(wsk, ["g"], [0.25, 0.5, 0.9]).collect()
    assert len(got) == 6
    for r in got:
        vals = truth[r["g"]]
        assert r["n"] == len(vals)  # exact total weight
        rank = sum(1 for v in vals if v <= r["q_est"])
        # duplicated values: rank interval membership like _rank_err
        lo = sum(1 for v in vals if v < r["q_est"]) + 1
        target = max(1, math.ceil(r["q"] * len(vals)))
        err = 0 if lo <= target <= rank else min(
            abs(lo - target), abs(rank - target))
        assert err <= 0.05 * len(vals) + 2, (r, err)

    # NULL / non-positive weights drop; zero-weight-only input is empty
    bad = spark.createDataFrame(
        [(0, 1.0, 0), (0, 2.0, -3), (0, 3.0, None)],
        "g int, value double, w int",
    )
    assert kll.kll_build(bad, ["g"], "value", k=k, weight_col="w").count() == 0
