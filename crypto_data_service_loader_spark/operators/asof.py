"""As-of join — a composite operator Spark lacks natively (SURVEY.md §2B,
§4: "no planner rule, just a composite operator function").

Semantics: for every left row, attach the latest right row with
``right.time <= left.time`` within the same key (ticks⋈quotes by nearest
past time — the natural crypto-domain join).

Implementation — the union trick, chosen for scale:
  1. tag both sides and union them (no join, no N×M blowup),
  2. one shuffle: window partitioned by key, ordered by (time, side) with
     the right side first at equal timestamps (<= semantics),
  3. ``last(value, ignorenulls=True)`` carries the most recent right-side
     values forward onto left rows,
  4. keep only left rows.

Cost at 100 TB: exactly one hash-shuffle + per-partition sort over
|left|+|right| rows — the same cost as a single sort-merge join, with no
range-explosion risk. The alternative (`applyInPandas` + `pd.merge_asof`
per key) moves all data through Arrow into Python; kept only as a
reference implementation in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: right values at-or-before each left time
    (`direction="backward"`, the default), at-or-after (`"forward"`), or
    whichever side is closer (`"nearest"`, ties -> backward) — pandas
    merge_asof direction parity.

    Left rows with no matching right row get nulls (left-outer semantics).
    With `tolerance_seconds`, matches farther than the tolerance are nulled
    (pandas merge_asof `tolerance=` parity) — the matched right timestamp
    is carried through the same window, so the bound costs nothing extra.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by)
    out_vals = [f"{c}{suffix}" for c in value_cols]

    # The matched right ROW travels as one non-null struct: last(...,
    # ignorenulls) then skips left-side rows but never a genuine null
    # inside a matched row (a per-column carry would resurrect stale
    # values whenever the matched row holds a null — merge_asof/ASOF JOIN
    # attach the row, nulls included).
    row_struct = F.struct(
        F.col(right_time).cast("double").alias("_rt"),
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
    )
    struct_type = right.select(row_struct.alias("_m")).schema["_m"].dataType

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_m"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        row_struct.alias("_m"),
    ).select(*l_tagged.columns)

    # backward: right rows sort before left at equal times (at-or-before
    # includes equality), carry the last right row seen so far.
    # forward: right rows sort after left at equal times, take the first
    # right row at-or-after. nearest: compute both over the SAME union
    # (one shuffle, two sorts) and pick the closer side.
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    union = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        filled = union.withColumn("_m", F.last("_m", ignorenulls=True).over(wb))
    elif direction == "forward":
        filled = union.withColumn("_m", F.first("_m", ignorenulls=True).over(wf))
    else:
        mb = F.last("_m", ignorenulls=True).over(wb)
        mf = F.first("_m", ignorenulls=True).over(wf)
        t = F.col("_t").cast("double")
        pick = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(t - mb.getField("_rt") <= mf.getField("_rt") - t, mb)
            .otherwise(mf)
        )
        filled = union.withColumn("_m", pick)
    out = filled.filter(F.col("_side") == 1)
    matched = F.col("_m").isNotNull()
    if tolerance_seconds is not None:
        t = F.col("_t").cast("double")
        gap = {
            "backward": t - F.col("_m._rt"),
            "forward": F.col("_m._rt") - t,
            "nearest": F.abs(t - F.col("_m._rt")),
        }[direction]
        matched = matched & (gap <= F.lit(float(tolerance_seconds)))
    for v in out_vals:
        out = out.withColumn(v, F.when(matched, F.col(f"_m.{v}")))
    return out.drop("_t", "_side", "_m")


def forward_fill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Carry the last non-null observation forward within each key's
    timeline (the time-series gap-fill / LOCF primitive; same window
    mechanic as the as-of join's carry-forward side).

    One shuffle on the key; `last(..., ignorenulls=True)` over an
    unbounded-preceding frame runs in a single pass per partition. Rows
    before a key's first observation stay null by design.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.last(value_col, ignorenulls=True).over(w),
    )


def interpolate_fill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation between the neighboring observations in each
    key's timeline — the numeric complement of `forward_fill` (LOCF):
    missing points get prev + (next - prev) * (t - t_prev) / (t_next -
    t_prev); before the first observation the first value back-fills,
    after the last the last value carries forward. `time_col` must be
    numeric (an epoch/bar index — cast timestamps upstream).

    Same single shuffle on the key as forward_fill; the two extra window
    passes (preceding carry + following carry) run on the already-sorted
    partition, no re-exchange. Interpolated values are rounded to 6dp so
    ranking/threshold consumers are engine-exact; observed values pass
    through untouched.
    """
    wp = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    t = F.col(time_col).cast("double")
    pv = F.last(v, ignorenulls=True).over(wp)
    pt = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    nt = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    interp = pv + (nv - pv) * (t - pt) / (nt - pt)
    return df.withColumn(
        out_col or f"{value_col}_interp",
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        # duplicate timestamps: a null-value row co-timestamped with an
        # observation has pt == nt — the interpolation divisor is zero
        # (Spark NULL, not an error), so return the co-timestamped
        # observed value instead
        .when(nt == pt, pv)
        .otherwise(F.round(interp, 6)),
    )
