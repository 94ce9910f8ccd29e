"""Portable, mergeable data sketches: HyperLogLog cardinality,
count-min frequency, Bloom membership.

Why another sketch layer when Spark ships approx_count_distinct /
approx_percentile: the builtin sketches are engine-specific (their
register layout and hash are implementation details), so results can
only ever be rows-only checked against another engine, and a sketch
persisted by one system is opaque to every other. These three are
built from md5-derived hashes and exact integer arithmetic only, so
every cell is deterministic and reproducible bit-for-bit across
engines — the sketch TABLE itself is a portable interchange format.

Scale shape (the point at 100 TB): each sketch is a constant-size
relation — m HLL registers, d*w count-min cells, n_words Bloom words —
regardless of input cardinality. Construction is one partial-combined
aggregation over the scan (map-side combine shrinks every partition's
output to sketch size before the shuffle), and each sketch is
MERGEABLE with plain SQL aggregates:

- HLL registers merge by MAX(rank),
- count-min cells merge by SUM(count),
- Bloom words merge by BIT_OR(bits),

so per-day / per-source / per-partition sketches roll up without ever
touching raw data again — the pre-aggregate-once pattern.

Reference parity: the reference has no sketch surface (charter EXT,
training-data pipeline ops). Hash derivation follows the repo's
portable idiom (operators/dedup.py:332): md5 hex -> conv(hex, 16, 10),
mirrored in DuckDB as ('0x' || hex)::BIGINT.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), deterministic flavor
# ---------------------------------------------------------------------------

#: hex chars of md5 consumed by the register index (2 -> 256 raw slots,
#: reduced mod m) and by the rank material (12 -> 48 bits).
_REG_HEX = 2
_RANK_HEX = 12
_RANK_BITS = 4 * _RANK_HEX  # 48
_MAX_RANK = _RANK_BITS + 1  # 49: all rank bits zero

#: standard HLL bias constants (Flajolet et al. 2007, fig. 3)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_numerator(m: int) -> float:
    """The estimate numerator alpha_m * m^2 * 2^RANK_BITS+1-scale as ONE
    Python float literal, inlined verbatim on both engines so the final
    division has bit-identical operands everywhere."""
    return _alpha(m) * m * m * float(2 ** _MAX_RANK)


def rank_case_sql(v: str) -> str:
    """ANSI-SQL CASE computing the HLL rank (leading-zero count + 1) of
    a 48-bit integer expression ``v`` — the exact SQL twin of
    :func:`_rank_expr`, kept adjacent so the two can never drift."""
    whens = " ".join(
        f"WHEN {v} >= {2 ** (_RANK_BITS - r)} THEN {r}" for r in range(1, _RANK_BITS + 1)
    )
    return f"CASE {whens} ELSE {_MAX_RANK} END"


def _rank_expr(v: Column) -> Column:
    """HLL rank of a 48-bit non-negative long: position of the highest
    set bit from the top, i.e. leading zeros + 1; 49 when v == 0. A
    49-branch comparison chain stays inside whole-stage codegen (no
    loops, no UDF) and is trivially portable — see rank_case_sql."""
    out = F.when(v >= 2 ** (_RANK_BITS - 1), 1)
    for r in range(2, _RANK_BITS + 1):
        out = out.when(v >= 2 ** (_RANK_BITS - r), r)
    return out.otherwise(_MAX_RANK)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., reg, rank).

    This IS the sketch — at most ``m`` rows per group no matter how
    many input rows, produced by one partial-combined max aggregation
    (each task emits <= groups*m rows before the shuffle). Registers a
    value never hit are simply absent (rank 0 by convention); merge
    with :func:`hll_merge`, estimate with :func:`hll_estimate`.

    ``m`` must be a power of two <= 256 (register index = first 2 md5
    hex chars reduced mod m — uniform only when m divides 256).
    """
    if m & (m - 1) or not 2 <= m <= 256:
        raise ValueError(f"m must be a power of two in [2, 256], got {m}")
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, _REG_HEX), 16, 10).cast("long") % m
    v = F.conv(F.substring(h, _REG_HEX + 1, _RANK_HEX), 16, 10).cast("long")
    base = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        reg.cast("int").alias("reg"),
        _rank_expr(v).cast("int").alias("rank"),
    )
    return base.groupBy(*group_cols, "reg").agg(F.max("rank").alias("rank"))


def hll_merge(reg_dfs: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge register tables built over disjoint (or overlapping — max
    is idempotent) slices of the data: per-register MAX(rank)."""
    u = reduce(lambda a, b: a.unionByName(b), reg_dfs)
    return u.groupBy(*group_cols, "reg").agg(F.max("rank").alias("rank"))


def hll_estimate(
    regs: DataFrame,
    group_cols: list[str],
    m: int = 64,
    est_col: str = "est_distinct",
    small_range_correction: bool = False,
) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    All arithmetic before the final division is exact int64: each
    register contributes 2^(49 - rank) (a register never hit
    contributes 2^49), so the harmonic-mean denominator is an exact
    integer (max m * 2^49 = 1.44e17 for m=256, inside int64). The
    estimate is then ONE double division numerator/denominator with
    bit-identical operands on every engine — deliberately emitted
    UNROUNDED (rounding is the only step whose half-way behavior
    differs across engines; the raw quotient is already bit-exact).
    ``small_range_correction=True`` applies the standard linear-counting
    branch (m * ln(m / empty_registers) when the raw estimate is below
    2.5m and some register is empty) — MUCH more accurate when the true
    cardinality is well under m, but ln() is a libm transcendental whose
    last ulp differs across engines, so the corrected column is for
    consumption, not for cross-engine exactness gates (the registered
    `hll_distinct` key pins the raw form).
    """
    numerator = hll_numerator(m)
    two49 = F.lit(2 ** _MAX_RANK).cast("long")
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("int").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - rank)")).alias("_hit"),
    )
    reg_sum = F.col("_hit") + (F.lit(m) - F.col("n_registers")).cast("long") * two49
    raw = F.lit(numerator) / reg_sum.cast("double")
    est = raw
    if small_range_correction:
        zeros = (F.lit(m) - F.col("n_registers")).cast("double")
        linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
        est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers",
        reg_sum.alias("reg_sum"),
        est.alias(est_col),
    )


def hll_cardinality(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
    small_range_correction: bool = False,
) -> DataFrame:
    """groupBy(group_cols).approx_distinct(value_col), the portable way:
    build registers, estimate. Two aggregations, both keyed on
    (group, reg) / (group) — never on the raw value, so the shuffle
    carries at most groups*m rows."""
    return hll_estimate(
        hll_registers(df, group_cols, value_col, m),
        group_cols,
        m,
        small_range_correction=small_range_correction,
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005), deterministic flavor
# ---------------------------------------------------------------------------


def _cm_bucket(key: Column, row: Column, w: int) -> Column:
    """Row-salted md5 bucket: hash_i(x) = md5(i || '|' || x) mod w —
    independent-enough rows, identical on both engines."""
    h = F.md5(F.concat(row.cast("string"), F.lit("|"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w).cast("int")


def countmin_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a d x w count-min sketch over ``key_col``: rows
    (row, bucket, cnt). One scan; the explode emits d rows per input
    row but the partial-combined sum shrinks every task's output to at
    most d*w cells before the shuffle — the sketch never exceeds d*w
    rows no matter the key cardinality. Merge sketches with
    :func:`countmin_merge` (cell-wise sum)."""
    wcol = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("_k"),
        wcol.alias("_w"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row"),
    )
    return (
        rows.select("row", _cm_bucket(F.col("_k"), F.col("row"), w).alias("bucket"), "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_merge(sketches: list[DataFrame]) -> DataFrame:
    """Cell-wise sum of sketches built with the same (d, w)."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def _check_reserved(probes: DataFrame, reserved: tuple, op: str) -> None:
    clash = [c for c in probes.columns if c in reserved]
    if clash:
        raise ValueError(
            f"{op}: probe columns {clash} collide with internal names "
            f"{reserved} — rename them before probing"
        )


def countmin_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    est_col: str = "est_count",
) -> DataFrame:
    """Point estimates for a probe key set: min over the d row cells.
    Guarantee: est >= true count, always (cells only ever over-count).
    The sketch is d*w rows -> broadcast; probes fan out d rows each and
    take a min — no shuffle of anything data-sized. Duplicate probe
    rows each come back (the fold-back groups on a per-row id, not the
    probe values); probe columns may not be named row/bucket/cnt/_pid
    (checked, ValueError)."""
    _check_reserved(probes, ("row", "bucket", "cnt", "_pid"), "countmin_lookup")
    others = [c for c in probes.columns]
    fan = (
        probes.withColumn("_pid", F.monotonically_increasing_id())
        .select(
            "*", F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row")
        )
        .withColumn("bucket", _cm_bucket(F.col(key_col), F.col("row"), w))
    )
    joined = fan.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy("_pid")
        .agg(
            *[F.first(c).alias(c) for c in others],
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col),
        )
        .drop("_pid")
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970), deterministic flavor
# ---------------------------------------------------------------------------

#: bits per int64 word — 63 keeps every mask positive (no sign games to
#: port across engines).
_WORD_BITS = 63


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_words: int = 64,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as (word, bits) rows:
    n_words int64 words of 63 bits each, k set positions per key
    (row-salted md5, same family as count-min). One scan; BIT_OR is
    partial-combined so each task ships at most n_words rows. Merge
    filters over data slices with a plain groupBy(word).bit_or(bits).

    The use-case at 100 TB: build over a large-but-hashable join side,
    broadcast the n_words-row table, and pre-filter the probe side
    scan-locally before the real join — a hand-rolled, persistable twin
    of Spark's runtime bloom pushdown (tests/test_plans.py pins the
    builtin one; this one the user controls and can store)."""
    nbits = n_words * _WORD_BITS
    pos = _cm_bucket(F.col(key_col), F.col("_j"), nbits).cast("long")
    rows = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(key_col),
            F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("_j"),
        )
        .select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / _WORD_BITS).cast("int").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {_WORD_BITS} AS INT))").alias("_m"),
        )
    )
    return rows.groupBy("word").agg(F.expr("bit_or(_m)").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_words: int = 64,
    k: int = 3,
    flag_col: str = "in_bloom",
) -> DataFrame:
    """Membership test for every probe row: true iff all k bit
    positions are set. No false negatives ever; false-positive rate is
    governed by n_words/k vs the build cardinality. The filter is
    n_words rows -> broadcast; the probe side never shuffles. Duplicate
    probe rows each come back (per-row-id fold-back); probe columns may
    not be named word/bits/_j/_pos/_bit/_pid (checked, ValueError)."""
    _check_reserved(
        probes, ("word", "bits", "_j", "_pos", "_bit", "_pid"), "bloom_probe"
    )
    nbits = n_words * _WORD_BITS
    pos = _cm_bucket(F.col(key_col), F.col("_j"), nbits).cast("long")
    others = [c for c in probes.columns]
    fan = (
        probes.withColumn("_pid", F.monotonically_increasing_id())
        .select(
            "*", F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("_j")
        )
        .withColumn("_pos", pos)
        .withColumn("word", (F.col("_pos") / _WORD_BITS).cast("int"))
        .withColumn("_bit", (F.col("_pos") % _WORD_BITS).cast("int"))
        .drop("_j", "_pos")
    )
    joined = fan.join(F.broadcast(bloom), ["word"], "left")
    hit = (
        F.col("bits").isNotNull()
        & (F.expr("shiftright(bits, _bit)") % 2 == 1)
    )
    return (
        joined.groupBy("_pid")
        .agg(
            *[F.first(c).alias(c) for c in others],
            F.min(hit.cast("int")).alias("_all"),
        )
        .select(*others, (F.col("_all") == 1).alias(flag_col))
    )


# ---------------------------------------------------------------------------
# Join-size estimation via count-min inner product (AGMS / CM estimate)
# ---------------------------------------------------------------------------


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Estimate |left JOIN right| on an equality key WITHOUT running the
    join: build a d x w count-min sketch over each side's key, take the
    per-row inner product sum_b cmL[r,b] * cmR[r,b], and report the min
    across the d rows (Cormode & Muthukrishnan 2005 §4.2). Guarantee:
    estimate >= true join size, always — hash collisions only ever add.

    The planner's use at 100 TB: the two scans each reduce to a d*w-cell
    sketch via partial-combined aggregation (nothing key-sized ever
    shuffles), the inner product is a broadcast join of two sketch
    tables, and the answer costs no join at all — pre-sizing a shuffle,
    choosing broadcast vs sort-merge, or gating a runaway cross-ish join
    before it runs. Sketches built once (per partition / per day) merge
    with countmin_merge, so the estimate also works incrementally.

    Exact integer arithmetic end-to-end: engine-portable, oracle-exact.
    Returns one row: (est_pairs long). Caution: w should be >> distinct
    keys / tolerable relative error; the estimate's expected overshoot
    is |L|*|R| / w per row pair.
    """
    cml = countmin_build(left.select(F.col(left_col).alias("_k")), "_k", d=d, w=w)
    cmr = countmin_build(right.select(F.col(right_col).alias("_k")), "_k", d=d, w=w)
    prod = (
        cml.alias("a")
        .join(F.broadcast(cmr.alias("b")), ["row", "bucket"])
        .select("row", (F.col("a.cnt") * F.col("b.cnt")).alias("_p"))
        .groupBy("row")
        .agg(F.sum("_p").alias("_ip"))
    )
    # empty input → the inner-product frame has zero rows → MIN over
    # nothing is NULL; the true join size of an empty side is 0, and
    # callers do arithmetic on est_pairs, so coalesce
    return prod.agg(
        F.coalesce(F.min("_ip"), F.lit(0)).cast("long").alias("est_pairs")
    )


# ---------------------------------------------------------------------------
# Moments sketch (Gan et al. 2018): mergeable quantiles from power sums
# ---------------------------------------------------------------------------

#: fixed-point scale for the per-row power terms — floor(x + 0.5)-style
#: half-up rounding at 6 dp is deterministic on every engine (native
#: round() half-even/half-away splits them; vector_quantize precedent)
_MOM_SCALE = 1_000_000


def moments_build(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_moments: int = 4,
) -> DataFrame:
    """Per-group moments sketch: (group..., n, s1..s{k}) where s_i is
    the EXACT integer sum of floor(x^i * 1e6 + 0.5) — fixed-point power
    sums accumulated as DECIMAL(38,0). The sketch is one row per group
    (bounded state, like HLL/count-min/Bloom beside it), merges with
    plain SUM (`moments_merge`), and every cell is engine-exact: the
    power is IEEE multiplication, the half-up fixed-point fold is
    deterministic, integer addition is associative.

    This is the quantile member of the sketch family (Gan et al. 2018,
    "Moment-based quantile sketches"): where HLL answers distinct and
    count-min answers frequency with constant state, power sums answer
    distributional questions — mean/variance/skew/kurtosis exactly, and
    quantiles via `moments_quantile` (Cornish-Fisher expansion, also
    closed-form and portable). The trade: accuracy depends on the
    distribution being moment-describable; for exact quantiles use
    profile.exact_quantiles and pay its sort.
    """
    x = F.col(value_col).cast("double")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for i in range(1, n_moments + 1):
        p = x
        for _ in range(i - 1):
            p = p * x
        term = F.floor(p * _MOM_SCALE + F.lit(0.5)).cast("decimal(38,0)")
        aggs.append(F.sum(term).alias(f"s{i}"))
    return df.where(x.isNotNull()).groupBy(*group_cols).agg(*aggs)


def moments_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge sketches built with the same dials: counts and power sums
    just add (the pre-aggregate-once roll-up, same as the other three
    sketch kinds)."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c != "n" and not c.startswith("s")]
    sums = [F.sum(c).cast("decimal(38,0)").alias(c)
            for c in u.columns if c.startswith("s")]
    return u.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"), *sums)


#: standard normal quantiles used by moments_quantile — literals so both
#: engines plug in the same doubles
_Z = {0.5: 0.0, 0.9: 1.2815515655446004, 0.95: 1.6448536269514722,
      0.99: 2.3263478740408408}


def moments_quantile(
    sketch: DataFrame,
    q: float,
    est_col: str = "q_est",
) -> DataFrame:
    """Closed-form quantile estimate from a 4-moment sketch via the
    Cornish-Fisher expansion: with mean mu, std sigma, skew g1, excess
    kurtosis g2 and z the standard-normal quantile,

        w = z + (z^2-1)g1/6 + (z^3-3z)g2/24 - (2z^3-5z)g1^2/36
        q_hat = mu + sigma * w

    All of it is +,*,/,sqrt on doubles — IEEE-identical everywhere, so
    the ESTIMATE (not just the sketch) is oracle-exact. Rounded to 6 dp
    (+0.0 for the negative-zero trap). Accuracy is the moment method's:
    good for unimodal near-Gaussian-ish groups, degrades on heavy
    multimodality — that caveat is the price of one-row state."""
    if q not in _Z:
        raise ValueError(f"q must be one of {sorted(_Z)}: got {q}")
    z = _Z[q]
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / _MOM_SCALE / n
    m2 = F.col("s2").cast("double") / _MOM_SCALE / n
    m3 = F.col("s3").cast("double") / _MOM_SCALE / n
    m4 = F.col("s4").cast("double") / _MOM_SCALE / n
    var = m2 - m1 * m1
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    mu3 = m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1
    mu4 = (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
           - 3 * m1 * m1 * m1 * m1)
    safe = (F.col("n") >= 2) & (var > 0)
    g1 = F.when(safe, mu3 / (sigma * sigma * sigma)).otherwise(F.lit(0.0))
    g2 = F.when(safe, mu4 / (var * var) - F.lit(3.0)).otherwise(F.lit(0.0))
    w = (
        F.lit(z)
        + (F.lit(z * z - 1.0)) * g1 / 6
        + (F.lit(z * z * z - 3.0 * z)) * g2 / 24
        - (F.lit(2.0 * z * z * z - 5.0 * z)) * g1 * g1 / 36
    )
    est = F.when(safe, m1 + sigma * w).otherwise(m1)
    return sketch.withColumn(est_col, F.round(est, 6) + F.lit(0.0))


def hll_set_ops(
    regs: DataFrame,
    group_col: str,
    m: int = 64,
    max_groups: int = 1024,
) -> DataFrame:
    """Pairwise set-operation cardinalities between groups, from their
    HLL register tables alone — the question a corpus overlap audit
    asks ("how many users/documents do sources A and B share?") without
    ever joining raw values.

    Union registers are the pairwise MAX (HLL's native merge, exact in
    sketch space: max commutes with the per-register max construction,
    so the union sketch IS the sketch of the unioned data). Intersection
    comes from inclusion-exclusion: |A&B| = |A| + |B| - |A|B| using the
    raw register estimates. Output per unordered pair (a < b):
    est_a, est_b, est_union, est_intersect (floored at 0 — I-E can go
    slightly negative at sketch error scale).

    Scale shape: the register tables are at most m rows per group; the
    pairwise stage joins registers on reg within group pairs — cost
    O(pairs * m), data-size-free. All arithmetic up to the final
    divisions is exact int64, so the key is oracle-exact like
    hll_distinct; estimates carry HLL error (~1.04/sqrt(m)), which an
    audit must treat as approximate — that is the sketch contract. The
    known I-E weakness: intersection error scales with the UNION's
    cardinality, so small true overlaps between large sets drown in
    noise — raise m, or fall back to an exact semi-join count when the
    audit needs a precise small number.

    Guard: the pair table is |groups|²/2 keys — fine for source-count
    group columns (the intended use), catastrophic for a high-cardinality
    one (1M groups → 5×10¹¹ pair keys). The distinct-group count is
    checked up front (one bounded single-row aggregate, same pattern as
    `sample_pps`'s overflow guard) and anything above ``max_groups``
    raises; raise the cap explicitly if you really mean a big pair table.
    """
    n_groups = regs.agg(
        F.countDistinct(F.col(group_col)).alias("n")
    ).collect()[0][0]
    if n_groups > max_groups:
        raise ValueError(
            f"hll_set_ops would build a {n_groups}x{n_groups}/2 pair table "
            f"({n_groups * (n_groups - 1) // 2} group pairs) — group column "
            f"{group_col!r} has {n_groups} distinct values, above the "
            f"max_groups={max_groups} cap. Pass a source-count group column, "
            "or raise max_groups explicitly if the pair scale is intended."
        )
    numerator = hll_numerator(m)
    a = regs.select(
        F.col(group_col).alias("ga"), "reg", F.col("rank").alias("rank_a")
    )
    b = regs.select(
        F.col(group_col).alias("gb"), "reg", F.col("rank").alias("rank_b")
    )
    # full outer per pair: a register hit by only one side still counts
    # in the union. Both sides are fanned out to the pair keys FIRST and
    # then full-outer-joined on (ga, gb, reg), so a one-sided register
    # keeps its pair identity (the key-list join coalesces the keys).
    # The pair table is |groups|^2/2 rows of KEYS, never data.
    pairs = (
        regs.select(F.col(group_col).alias("ga")).distinct()
        .join(regs.select(F.col(group_col).alias("gb")).distinct(),
              F.col("ga") < F.col("gb"))
    )
    pa = pairs.join(a, "ga")
    pb = pairs.join(b, "gb").select("ga", "gb", "reg", "rank_b")
    joined = pa.join(pb, ["ga", "gb", "reg"], "full_outer")
    two49 = 2 ** _MAX_RANK

    def reg_sum(rank_col):
        hit = F.sum(
            F.when(
                F.col(rank_col).isNotNull(),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - {rank_col})"),
            ).otherwise(F.lit(0).cast("long"))
        )
        n_hit = F.sum(F.col(rank_col).isNotNull().cast("long"))
        return hit + (F.lit(m) - n_hit) * F.lit(two49)

    u_rank = F.greatest(
        F.coalesce(F.col("rank_a"), F.lit(0)), F.coalesce(F.col("rank_b"), F.lit(0))
    )
    u_hit = F.sum(
        F.when(u_rank > 0,
               F.expr(f"shiftleft(CAST(1 AS BIGINT), {_MAX_RANK} - "
                      f"greatest(coalesce(rank_a, 0), coalesce(rank_b, 0)))"))
        .otherwise(F.lit(0).cast("long"))
    )
    u_nhit = F.sum((u_rank > 0).cast("long"))
    agg = joined.groupBy("ga", "gb").agg(
        reg_sum("rank_a").alias("_ra"),
        reg_sum("rank_b").alias("_rb"),
        (u_hit + (F.lit(m) - u_nhit) * F.lit(two49)).alias("_ru"),
    )
    ea = F.lit(numerator) / F.col("_ra").cast("double")
    eb = F.lit(numerator) / F.col("_rb").cast("double")
    eu = F.lit(numerator) / F.col("_ru").cast("double")
    inter = F.greatest(F.round(ea + eb - eu, 6), F.lit(0.0))
    return agg.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.round(ea, 6).alias("est_a"),
        F.round(eb, 6).alias("est_b"),
        F.round(eu, 6).alias("est_union"),
        inter.alias("est_intersect"),
    )


def hll_rolling(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    m: int = 64,
) -> DataFrame:
    """Sliding-window COUNT DISTINCT from daily HLL sketches — the
    register-algebra answer to "7-day distinct users per key, every
    day" at 100 TB: computing it exactly needs the full (key, day,
    value) set live for every window, but HLL registers are mergeable
    by MAX, so each day reduces once to its <= m-row register table and
    every window estimate is a max-merge of <= window_days tiny tables.

    Plan shape: one partial-combined pass builds the daily registers
    (the only data-sized stage); the day domain is time-bounded and the
    window join fans each daily register row out to <= window_days
    window anchors — cost O(days * m * window) per group, data-size
    free. All register arithmetic is the md5-derived exact-int64 kind
    (hll_registers/hll_estimate), so the whole rolling series is
    oracle-exact; estimates carry the usual ~1.04/sqrt(m) HLL error.

    Returns (group..., win_day date, n_registers, reg_sum,
    est_distinct) — one row per group per active day, the estimate
    covering [win_day - window_days + 1, win_day].
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = hll_registers(
        df.withColumn("_day", day), [*group_cols, "_day"], value_col, m
    )
    days = (
        daily.select(*group_cols, "_day").distinct()
        .select(*group_cols, F.col("_day").alias("win_day"))
    )
    in_window = (F.col("_day") <= F.col("win_day")) & (
        F.col("_day") >= F.date_sub(F.col("win_day"), window_days - 1)
    )
    rolled = (
        days.join(daily, group_cols)
        .where(in_window)
        .groupBy(*group_cols, "win_day", "reg")
        .agg(F.max("rank").alias("rank"))
    )
    return hll_estimate(rolled, [*group_cols, "win_day"], m)
