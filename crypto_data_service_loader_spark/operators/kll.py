"""KLL-style mergeable quantile sketch (Karnin, Lang, Liberty 2016) —
the rank-error-bounded member of the sketch family.

The moments sketch beside it (operators/sketch.py) answers quantiles in
closed form but its own docstring concedes degradation on heavy tails; a
KLL compactor hierarchy bounds RANK error regardless of the value
distribution: items live at levels with weight 2^level, and an
over-full level sorts its buffer and promotes every other item one
level up (halving count, doubling weight — total weight is invariant,
so the sketch always represents exactly n rank units).

DETERMINISM CONTRACT (this repo has no RNG in the data plane): the
classic algorithm flips a coin for the keep-even/keep-odd offset; here
the offset alternates via a per-level compaction counter, and
compaction always processes the fully-sorted buffer — so the
canonical state is a pure function of the input MULTISET of
(level, value) items. That makes merges order-independent at the
state level (union the multisets, canonicalize once) and the streaming
twin reproducible run-to-run. The trade: the deterministic worst-case
rank error is the MRL-style n*H/k (H = number of levels) rather than
KLL's probabilistic O(n/k); the property tests pin the deterministic
bound.

Scale shape: build is mapInPandas partial sketches per partition
(bounded memory: <= (k+1) * levels items per group) followed by ONE
shuffle of sketch items — never raw rows — into a per-group canonical
merge; sketches persist as plain (group, level, value) tables and merge
across days/partitions with `kll_merge`, same lifecycle as the
HLL/count-min/Bloom/moments tables beside it.
"""

from __future__ import annotations

import math
from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "kll_build",
    "kll_merge",
    "kll_quantiles",
    "kll_canonicalize_py",
    "kll_quantile_py",
]


def kll_canonicalize_py(
    items: list[tuple[int, float]], k: int
) -> list[tuple[int, float]]:
    """Canonical KLL state from a multiset of (level, value) items —
    deterministic and ORDER-INDEPENDENT: buffers are fully sorted before
    each compaction and the keep-offset alternates from a per-level
    counter that starts at 0, so the result depends only on the multiset.
    Raw values enter at level 0. Returns sorted (level, value) items."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    levels: dict[int, list[float]] = defaultdict(list)
    for lv, v in items:
        levels[int(lv)].append(float(v))
    ccount: dict[int, int] = defaultdict(int)
    lv = 0
    while lv <= (max(levels) if levels else 0):
        buf = levels[lv]
        while len(buf) > k:
            buf.sort()
            m = len(buf) - (len(buf) % 2)  # even prefix compacts
            off = ccount[lv] % 2
            levels[lv + 1].extend(buf[off:m:2])
            ccount[lv] += 1
            buf = buf[m:]  # odd leftover stays at this level
        levels[lv] = sorted(buf)
        lv += 1
    return sorted(
        (lv, v) for lv, vs in levels.items() for v in vs if vs
    )


def kll_quantile_py(items: list[tuple[int, float]], q: float) -> float | None:
    """Quantile estimate from sketch items: weight(level) = 2^level, so
    total weight == the exact input count n; the estimate is the
    smallest value whose cumulative weight reaches ceil(q * n)
    (q=0 -> the minimum). Deterministic integer rank arithmetic."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if not items:
        return None
    weighted = sorted((v, 1 << lv) for lv, v in items)
    total = sum(w for _, w in weighted)
    target = max(1, math.ceil(q * total))
    cum = 0
    for v, w in weighted:
        cum += w
        if cum >= target:
            return v
    return weighted[-1][0]


_SKETCH_COLS = "level int, value double"


def _group_schema(df: DataFrame, group_cols: list[str], extra: str) -> str:
    parts = [
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    ]
    return ", ".join(parts + [extra])


def kll_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 200,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group KLL sketch as rows (group..., level, value).

    Two stages: (1) mapInPandas builds a partial sketch per group per
    PARTITION — raw values never leave their task, memory stays
    <= (k+1) * levels per group; (2) the partial items (sketch-sized,
    not data-sized) shuffle once into a per-group canonical merge.
    NULL values are dropped (no rank).

    ``weight_col`` (positive integers) gives WEIGHTED quantiles exactly
    in the sketch's own currency: a weight-w row decomposes into one
    item per set bit of w (level b carries weight 2^b), so total item
    weight == sum(weights) EXACTLY and `kll_quantiles`' n reports it —
    e.g. token-count-weighted document-length percentiles, where each
    doc should count once per token. Rows with NULL/non-positive
    weights are dropped."""
    sk_schema = _group_schema(df, group_cols, _SKETCH_COLS)
    cols = list(group_cols)
    vcol = value_col
    wcol = weight_col
    kk = int(k)

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list[tuple[int, float]]] = {}
        for pdf in it:
            picked = cols + [vcol] + ([wcol] if wcol else [])
            sub = pdf[picked].dropna(subset=[vcol])
            for key, grp in sub.groupby(cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                items = acc.setdefault(key, [])
                if wcol is None:
                    items.extend((0, float(v)) for v in grp[vcol])
                else:
                    for v, w in zip(grp[vcol], grp[wcol]):
                        if pd.isna(w) or int(w) <= 0:
                            continue
                        w, b = int(w), 0
                        while w:
                            if w & 1:
                                items.append((b, float(v)))
                            w >>= 1
                            b += 1
                # amortized compaction keeps the task's footprint bounded
                if len(items) > 8 * kk:
                    acc[key] = kll_canonicalize_py(items, kk)
        for key, items in acc.items():
            items = kll_canonicalize_py(items, kk)
            yield pd.DataFrame(
                {
                    **{c: [key[i]] * len(items) for i, c in enumerate(cols)},
                    "level": [lv for lv, _ in items],
                    "value": [v for _, v in items],
                }
            )

    partials = df.mapInPandas(partial, schema=sk_schema)
    return _merge_items(partials, cols, kk, sk_schema)


def _merge_items(
    items_df: DataFrame, group_cols: list[str], k: int, sk_schema: str
) -> DataFrame:
    cols = list(group_cols)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        items = kll_canonicalize_py(
            list(zip(pdf["level"], pdf["value"])), k
        )
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                **{c: [head[c]] * len(items) for c in cols},
                "level": [lv for lv, _ in items],
                "value": [v for _, v in items],
            }
        )

    return items_df.groupBy(*cols).applyInPandas(merge, schema=sk_schema)


def kll_merge(
    sketches: list[DataFrame],
    group_cols: list[str],
    k: int = 200,
) -> DataFrame:
    """Merge sketch tables built with the same k: union the item
    multisets per group and canonicalize once — order-independent by
    construction (see kll_canonicalize_py), so daily/partition sketches
    roll up in any grouping."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), sketches)
    sk_schema = _group_schema(u, group_cols, _SKETCH_COLS)
    return _merge_items(u, group_cols, int(k), sk_schema)


def kll_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
) -> DataFrame:
    """Quantile estimates per group: rows (group..., q, q_est, n) where
    n is the EXACT input row count (total item weight — invariant under
    compaction). One pass over the bounded sketch table."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
    cols = list(group_cols)
    qlist = [float(q) for q in qs]
    out_schema = _group_schema(
        sketch, cols, "q double, q_est double, n long"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        items = list(zip(pdf["level"], pdf["value"]))
        n = sum(1 << int(lv) for lv, _ in items)
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                **{c: [head[c]] * len(qlist) for c in cols},
                "q": qlist,
                "q_est": [kll_quantile_py(items, q) for q in qlist],
                "n": [n] * len(qlist),
            }
        )

    return sketch.groupBy(*cols).applyInPandas(per_group, schema=out_schema)
