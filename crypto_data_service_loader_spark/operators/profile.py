"""Data profiling / observability operators — the dataset-card and
data-quality-monitoring layer of a large-scale pipeline (no reference
analogue; charter EXT: the reference ships only COUNT(*) diagnostics,
ClickHouseDAO.java's count helpers — a 100-TB corpus needs per-column
health metrics and distribution rollups as first-class, single-pass ops).

Scale design notes:

- `profile_columns` is ONE aggregation job over ONE scan: every
  per-column statistic (non-null count, exact distinct, min/max) is an
  expression in the same agg, and the per-column rows are produced by
  unpivoting the single 1-row result driver-side (constant size). Exact
  multi-column COUNT(DISTINCT) plans an Expand (one input row per
  distinct-agg), which is the standard exact-profiling cost; pass
  ``exact_distinct=False`` to swap in HLL sketches
  (`approx_count_distinct`) and keep the scan expand-free at 100 TB.
- `numeric_histogram` is a scan-local bin assignment + one partial
  aggregated groupBy on a bounded key space (n_bins + 2) — the shuffle
  carries at most n_bins+2 rows per task regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.windows import bounded_partition_key


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: row count, null count, distinct count, and
    min/max (rendered as strings so heterogeneous columns share one
    schema). Output: one row per column, alphabetical —
    (column, n_rows, n_nulls, n_distinct, min_value, max_value).

    All statistics ride a single aggregation (one scan). NULLs: distinct
    counts EXCLUDE null (count(distinct) semantics on both engines);
    min/max of an all-null column render as null. String rendering of
    floating-point values is engine-formatted — keep profiled columns to
    integer/string/date types when cross-engine exactness matters.
    """
    cols = sorted(columns if columns is not None else df.columns)
    n_distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(n_distinct(c).alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    # unpivot the 1-row aggregate into per-column rows: constant-size
    # driver-side plan surgery, no second scan, no collect
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_rows").alias("n_rows"),
            (F.col("_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return one.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def numeric_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Fixed-width histogram over [lo, hi): bin_id in [0, n_bins) plus
    underflow (-1) and overflow (n_bins) buckets; NULL values are dropped.
    Output: (bin_id, bin_lo, bin_hi, n_rows) for non-empty bins, bin_lo /
    bin_hi rendered for the edge buckets too (-inf / +inf stay finite as
    the clamp boundaries).

    The distribution rollup a dataset card publishes (doc lengths, score
    distributions, event values). Bin assignment is pure scan-side
    arithmetic — floor((x - lo) / width) with an identical expression on
    the oracle side, so IEEE double semantics agree term-for-term; the
    groupBy key space is bounded by n_bins + 2, so the exchange is
    constant-width no matter the input size.
    """
    x = F.col(value_col).cast("double")
    bin_id = histogram_bin_expr(x, lo, hi, n_bins)
    return (
        df.filter(x.isNotNull())
        .select(bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin_id",
            *histogram_edge_exprs(lo, hi, n_bins),
            "n_rows",
        )
    )


def histogram_bin_expr(x, lo: float, hi: float, n_bins: int):
    """The bin-assignment expression shared by the batch histogram and
    its streaming twin (same arithmetic => same buckets by construction).
    `x` must already be a double column."""
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (float(hi) - float(lo)) / int(n_bins)
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("long")
    return (
        F.when(x < F.lit(float(lo)), F.lit(-1))
        .when(x >= F.lit(float(hi)), F.lit(int(n_bins)))
        # boundary safety: floating division can land exactly on n_bins
        # for x just under hi — clamp keeps the contract
        .otherwise(F.least(raw, F.lit(int(n_bins) - 1)))
        .cast("int")
    )


def histogram_edge_exprs(lo: float, hi: float, n_bins: int):
    """bin_lo / bin_hi columns derived from a `bin_id` column."""
    width = (float(hi) - float(lo)) / int(n_bins)
    return [
        F.round(
            F.lit(float(lo)) + F.col("bin_id") * F.lit(width), 6
        ).alias("bin_lo"),
        F.round(
            F.lit(float(lo)) + (F.col("bin_id") + 1) * F.lit(width), 6
        ).alias("bin_hi"),
    ]


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Exact interpolated quantiles (percentile_cont semantics: pos =
    q * (n - 1), linear interpolation) per group, computed scale-out.

    Spark's built-in exact `percentile` buffers EVERY group value inside
    one aggregation task — with few groups that is a single-threaded sort
    of the whole group (measured 7x at a 10x scale-up) and an OOM at
    100 TB. This version distributes: (1) a per-(group, value) frequency
    count — an ordinary partial-combined shuffle that spreads over the
    cluster, (2) a cumulative-count window over DISTINCT values only, so
    the per-group serial portion is bounded by value cardinality, not row
    count, (3) the two order statistics each quantile needs are picked by
    cumulative-range containment and interpolated. Exact for any value
    distribution; cheap whenever the value domain is bounded (metrics,
    prices, scores). For unbounded-cardinality doubles at extreme scale
    use `approx_percentile` instead — exactness there costs a sort by
    construction.

    `qs` maps output column name -> quantile in [0, 1]. Results are
    rounded to 6dp (engine-exact).
    """
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must name at least one quantile")
    bad = {n: q for n, q in qs.items() if not 0.0 <= float(q) <= 1.0}
    if bad:
        raise ValueError(f"quantiles must be in [0, 1]: {bad}")

    freq = (
        df.filter(F.col(value_col).isNotNull())  # percentile_cont semantics
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    wv = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(group_col)
    cum = F.sum("_cnt").over(wv)
    ranked = freq.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        cum.alias("_cum"),
        (cum - F.col("_cnt")).alias("_cumb"),
        F.sum("_cnt").over(wall).alias("_n"),
    )
    aggs = []
    for name, q in qs.items():
        pos = F.lit(float(q)) * (F.col("_n") - F.lit(1)).cast("double")
        i0 = F.floor(pos)
        i1 = -F.floor(-pos)  # ceil
        lo = F.min(
            F.when((F.col("_cumb") <= i0) & (i0 < F.col("_cum")), F.col("_v"))
        )
        hi = F.min(
            F.when((F.col("_cumb") <= i1) & (i1 < F.col("_cum")), F.col("_v"))
        )
        frac = pos - i0.cast("double")
        # lo/hi/frac are all aggregates over the group (frac is constant
        # per group — min() just collapses it); interpolation mirrors
        # percentile_cont: lo + (hi - lo) * frac
        aggs.append(F.round(lo + (hi - lo) * F.min(frac), 6).alias(name))
    return ranked.groupBy(group_col).agg(*aggs)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the top-k heaviest keys with
    their row counts and share of the table — run this BEFORE a big join
    or aggregation to know whether the key needs salting / AQE skew
    handling (the 100-TB failure mode is one power-law key pinning one
    reducer; this report is how you see it for the cost of one count
    aggregation).

    One partial-combined groupBy, then the global top-k as
    orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    k-heaps + driver merge), NOT a global sort or single-partition
    window; the rank window runs over the already-bounded k rows only.
    Output: (key rendered as string, n_rows, share rounded 6dp,
    skew_rank). NULL keys count as a key (they hash to one reducer too —
    the classic surprise).
    """
    from pyspark.sql import Window

    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    top = counts.orderBy(
        F.col("n_rows").desc(), F.col("key").asc_nulls_last()
    ).limit(int(top_k))
    # rank window input = the top_k survivors of TakeOrderedAndProject
    # — bounded by construction; pinned single partition (r13 #8)
    w = Window.partitionBy(bounded_partition_key("n_rows")).orderBy(
        F.col("n_rows").desc(), F.col("key").asc_nulls_last()
    )
    return (
        top.withColumn("skew_rank", F.row_number().over(w))
        .join(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double") / F.col("_total"), 6
            ).alias("share"),
            F.col("skew_rank").cast("int").alias("skew_rank"),
        )
    )


def windowed_histogram_batch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    ts_col: str = "ts",
    window: str = "day",
) -> DataFrame:
    """Per-time-window fixed-width histogram — the BATCH twin of
    `streaming/histogram.windowed_histogram` (same `histogram_bin_expr`
    arithmetic, so a backfill over stored data produces exactly what the
    live stream produced). `window` is a `date_trunc` unit. Output:
    (win_start, bin_id, bin_lo, bin_hi, n_rows); the groupBy key space
    is (windows x (n_bins + 2)) — bounded by the monitoring horizon."""
    x = F.col(value_col).cast("double")
    return (
        df.filter(x.isNotNull())
        .select(
            F.date_trunc(window, F.col(ts_col)).alias("win_start"),
            histogram_bin_expr(x, lo, hi, n_bins).alias("bin_id"),
        )
        .groupBy("win_start", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "win_start", "bin_id", *histogram_edge_exprs(lo, hi, n_bins),
            "n_rows",
        )
    )


def histogram_drift(
    hists: DataFrame,
    window_col: str = "win_start",
    bin_col: str = "bin_id",
    count_col: str = "n_rows",
) -> DataFrame:
    """Distribution drift between CONSECUTIVE windows of a windowed
    histogram — the alert a monitoring pipeline actually pages on (bin
    mass moving between windows flags value drift long before any
    downstream metric breaks). Per window (except the first):

    - ``tvd``  — total-variation distance, 0.5 * sum |p_cur - p_prev|
      over the union of both windows' bins (a bin absent from one window
      counts as share 0). In [0, 1]: 0 = identical distributions,
      1 = disjoint support.
    - ``linf`` / ``linf_bin_id`` — the single worst bin's absolute share
      delta and which bin it is (ties -> lowest bin id), the "where did
      the mass go" pointer.

    Deliberately transcendental-free (no PSI/KL): ln() bit-agreement
    across engines is not guaranteed, while shares (one integer
    division), deltas, and a DECIMAL-accumulated |delta| sum are exact
    on both — the same reasoning that picked softsign for
    `quality_classifier`. TVD and PSI order drifts near-identically for
    alerting purposes.

    Scale shape: bin counts partial-aggregate per (window, bin) — the
    only input-sized pass; everything after runs on the bounded
    (windows x bins) grid. The window-sequence row_number is a
    single-partition window over DISTINCT window starts only (bounded by
    the monitoring horizon, never by data volume).
    """
    from pyspark.sql import Window

    h = (
        hists.select(
            F.col(window_col).alias("_win"),
            F.col(bin_col).alias("_bin"),
            F.col(count_col).alias("_cnt"),
        )
        .groupBy("_win", "_bin")
        .agg(F.sum("_cnt").cast("long").alias("_n"))
    )
    # window sequencing + per-window totals as window functions over the
    # (windows x bins) grid — no self-joins, no extra shuffles beyond
    # the bounded-key grid exchange; dense_rank over the window starts
    # IS the window sequence (single-partition over the bounded grid,
    # never over raw data)
    shares = (
        h.withColumn("_seq", F.dense_rank().over(
            # (windows x bins) grid — bounded by construction (r13 #8)
            Window.partitionBy(bounded_partition_key("_win"))
            .orderBy("_win")
        ))
        .withColumn("_maxseq", F.max("_seq").over(
            Window.partitionBy(bounded_partition_key("_win"))
        ))
        .withColumn("_tot", F.sum("_n").over(Window.partitionBy("_seq")))
        .select(
            "_seq", "_maxseq", "_win", "_bin",
            (F.col("_n").cast("double") / F.col("_tot").cast("double"))
            .alias("_p"),
        )
    )
    # the ONE real self-join: current window vs predecessor, full outer
    # per bin so mass appearing in (or vanishing from) a bin still
    # counts; explicit aliases keep the lineage unambiguous even over
    # view/memory-sink inputs
    c, v = shares.alias("_c"), shares.alias("_v")
    seq_out = F.coalesce(F.col("_c._seq"), F.col("_v._seq") + 1)
    aligned = (
        c.join(
            v,
            (F.col("_c._seq") == F.col("_v._seq") + 1)
            & (F.col("_c._bin") == F.col("_v._bin")),
            "full_outer",
        )
        # seq 1 has no predecessor; the prev side also fabricates
        # max_seq + 1 (prev-only rows past the last real window)
        .filter(
            (seq_out >= 2)
            & (seq_out <= F.coalesce(F.col("_c._maxseq"),
                                     F.col("_v._maxseq")))
        )
        .select(
            seq_out.alias("_seq"),
            F.coalesce(F.col("_c._bin"), F.col("_v._bin")).alias("_bin"),
            F.col("_c._win").alias("_cwin"),
            F.col("_v._win").alias("_pwin"),
            # deltas round to 8 dp ON PURPOSE: the tvd below multiplies
            # their exact decimal sum by 0.5, so a 9-dp delta could put
            # the true tvd exactly on a 10th-decimal half — where
            # Spark's HALF_UP on the shortest repr and DuckDB's rounding
            # of the raw binary disagree (observed at sf0.001). At 8 dp
            # the halved sum has at most 9 decimals, making the 9-dp
            # output rounding the identity — never a coin flip.
            F.round(
                F.coalesce(F.col("_c._p"), F.lit(0.0))
                - F.coalesce(F.col("_v._p"), F.lit(0.0)),
                8,
            ).alias("_d"),
        )
    )
    rankw = Window.partitionBy("_seq").orderBy(
        F.abs(F.col("_d")).desc(), F.col("_bin").asc()
    )
    ranked = aligned.withColumn("_r", F.row_number().over(rankw))
    return (
        ranked.groupBy("_seq")
        .agg(
            # a nonempty window always contributes at least one
            # present-side row, so the maxes recover both window starts
            F.max("_cwin").alias("win_start"),
            F.max("_pwin").alias("prev_win_start"),
            F.round(
                F.sum(F.abs(F.col("_d")).cast("decimal(38,18)"))
                .cast("double") * F.lit(0.5),
                9,
            ).alias("tvd"),
            F.max(F.when(F.col("_r") == 1, F.abs(F.col("_d"))))
            .alias("linf"),
            F.max(F.when(F.col("_r") == 1, F.col("_bin")))
            .alias("linf_bin_id"),
        )
        .select("win_start", "prev_win_start", "tvd", "linf", "linf_bin_id")
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation:
    |x - median| > k * MAD. The distribution-free complement of the
    z-score gate (`relational.zscore_outliers`): one wild value inflates
    a stddev and HIDES other outliers (masking); the median/MAD pair is
    insensitive to the outliers it is hunting — the standard robust
    data-validation gate.

    Both medians run through `exact_quantiles` (the distributed
    frequency-table quantile — never buffers a group in one task); the
    group-level (median, MAD) tables are tiny and broadcast back onto
    the rows. Degenerate groups (MAD = 0: at least half the values sit
    exactly on the median) flag any nonzero deviation — mirrored in the
    oracle. Deviations round to 6dp before comparison so the flag is
    engine-exact.
    """
    med = exact_quantiles(df, group_col, value_col, {"med": 0.5})
    dev = df.join(F.broadcast(med), group_col).select(
        F.col(group_col),
        F.col(id_col),
        F.col(value_col),
        F.col("med"),
        F.round(F.abs(F.col(value_col) - F.col("med")), 6).alias("dev"),
    )
    mad = exact_quantiles(dev, group_col, "dev", {"mad": 0.5})
    return dev.join(F.broadcast(mad), group_col).select(
        id_col,
        group_col,
        value_col,
        "med",
        "mad",
        F.when(F.col("mad") > 0, F.col("dev") > F.lit(float(k)) * F.col("mad"))
        .otherwise(F.col("dev") > 0)
        .alias("is_outlier"),
    )


def cusum_alerts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
) -> DataFrame:
    """Tabular CUSUM change-point detection per key (Page 1954, public
    method): the sequential complement of the batch drift ops —
    `histogram_drift` compares whole windows, MAD/z-score flag single
    points; CUSUM accumulates SMALL sustained shifts until they cross a
    decision threshold, catching slow drifts both miss.

    One-sided statistics via the running-extremum identity (no recursive
    state, pure windows): with d_i = value_i - target,
    C+_i = cumsum(d - slack) - min(0, running_min(cumsum(d - slack)))
    and C-_i = max(0, running_max(cumsum(d + slack))) - cumsum(d + slack);
    alert when either exceeds `threshold`. The zero clamp on the running
    extremum is the S0 = 0 baseline: the recursion starts from an
    implicit empty prefix sum of 0, so a series whose cumsum never dips
    below its FIRST value (e.g. a level shift present from row one) must
    measure from 0, not from that first value — without the clamp such a
    shift is understated by the running min and alerts are delayed or
    suppressed. With it, this equals the textbook recursive
    max(0, C + d)-form exactly (the clamped running extremum IS the last
    reset point), matching the streaming twin `start_cusum_stream`, but
    plans as ONE shuffle on the key + window passes sharing a single
    sort — no iterative state, arbitrarily many keys in parallel.

    Engine-exact: the cumulative sums fold in the total order
    `order_cols` fixes, so both engines add the same doubles in the same
    order (identical IEEE results); outputs round to 6dp and the alert
    compares the rounded statistic. `order_cols` must totally order each
    key's timeline (same contract as scd2_history).
    """
    from pyspark.sql import Window

    if not order_cols:
        raise ValueError("order_cols must totally order each key's timeline")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(value_col).cast("double")
    up = F.sum(x - F.lit(float(target) + float(slack))).over(w)
    dn = F.sum(x - F.lit(float(target) - float(slack))).over(w)
    c_pos = F.round(up - F.least(F.lit(0.0), F.min(up).over(w)), 6)
    c_neg = F.round(F.greatest(F.lit(0.0), F.max(dn).over(w)) - dn, 6)
    return df.select(
        F.col(key_col),
        *[F.col(c) for c in order_cols],
        F.col(value_col),
        c_pos.alias("cusum_pos"),
        c_neg.alias("cusum_neg"),
        (
            (c_pos > F.lit(float(threshold)))
            | (c_neg > F.lit(float(threshold)))
        ).alias("is_alert"),
    )


def ols_trend(
    df: DataFrame,
    key_col: str,
    x_col,
    y_col,
) -> DataFrame:
    """Per-key least-squares trend line (slope, intercept, r2) from exact
    decimal moments — the regression complement of `cusum_alerts`: CUSUM
    says THAT a level shifted, the trend says how fast it is moving and
    how linear the drift is. Built-in regr_slope/corr accumulate doubles
    in partition order; this reuses the agg_corr decimal-moment pattern
    so the result is engine-exact.

    Degenerate keys (zero x-variance for slope/intercept, zero variance
    on either axis for r2) return NULL explicitly — Spark's div-by-zero
    yields NULL while DuckDB's double division yields inf, so the guard
    is correctness, not style.

    Scale shape: ONE partial-combined aggregation over the scan; serial
    work per key is constant (five moments). Callers should map x to
    small integers (epoch seconds minus a fixed anchor, day numbers) so
    x*x stays inside double's exact-integer range.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x.cast("decimal(38,6)")).cast("double")
    sy = F.sum(y.cast("decimal(38,6)")).cast("double")
    sxy = F.sum((x * y).cast("decimal(38,10)")).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,10)")).cast("double")
    syy = F.sum((y * y).cast("decimal(38,10)")).cast("double")
    dxx = n * sxx - sx * sx
    dyy = n * syy - sy * sy
    dxy = n * sxy - sx * sy
    slope = dxy / dxx
    # + 0.0 normalizes IEEE negative zero: a rounded -1e-9 is -0.0,
    # which the cross-engine comparator distinguishes from 0.0 (fuzzer
    # finding); adding +0.0 maps both signs of zero to +0.0
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.when(dxx > 0, slope), 6) + F.lit(0.0)).alias("slope"),
        (
            F.round(F.when(dxx > 0, (sy - slope * sx) / n), 6)
            + F.lit(0.0)
        ).alias("intercept"),
        (
            F.round(
                F.when((dxx > 0) & (dyy > 0), (dxy * dxy) / (dxx * dyy)), 6
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


def equi_depth_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 4,
) -> DataFrame:
    """Equi-depth histogram per group: n_bins buckets whose edges are the
    i/n_bins exact quantiles — equal mass, variable width, the shape
    query optimizers keep as column statistics (and the right summary
    for skewed distributions where `numeric_histogram`'s fixed-width
    bins pile into one bucket). Ties at an edge land in the lower bin
    (value <= edge), so masses are equal up to tie multiplicity — counts
    stay exact, never approximated.

    Scale shape: edges come from `exact_quantiles` (distributed; serial
    work bounded by value cardinality, not rows); rows then bin via a
    BROADCAST of the one-row-per-group edge table and a scan-local CASE
    — the only exchange after the quantile pass is the final
    partial-combined count over (groups x bins) bounded keys.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    qs = {f"_e{i}": i / n_bins for i in range(n_bins + 1)}
    edges = exact_quantiles(df, group_col, value_col, qs)
    v = F.col(value_col)
    joined = df.filter(v.isNotNull()).join(F.broadcast(edges), group_col)
    bin_c = lo_c = hi_c = None
    for i in range(1, n_bins):
        cond = v <= F.col(f"_e{i}")
        if bin_c is None:
            bin_c = F.when(cond, i)
            lo_c = F.when(cond, F.col(f"_e{i - 1}"))
            hi_c = F.when(cond, F.col(f"_e{i}"))
        else:
            bin_c = bin_c.when(cond, i)
            lo_c = lo_c.when(cond, F.col(f"_e{i - 1}"))
            hi_c = hi_c.when(cond, F.col(f"_e{i}"))
    bin_c = (
        bin_c.otherwise(n_bins) if bin_c is not None else F.lit(1)
    ).cast("int")
    lo_c = (
        lo_c.otherwise(F.col(f"_e{n_bins - 1}"))
        if lo_c is not None
        else F.col("_e0")
    )
    hi_c = (
        hi_c.otherwise(F.col(f"_e{n_bins}"))
        if hi_c is not None
        else F.col(f"_e{n_bins}")
    )
    return (
        joined.select(
            F.col(group_col),
            bin_c.alias("bin"),
            lo_c.alias("lo"),
            hi_c.alias("hi"),
        )
        .groupBy(group_col, "bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group winsorization: values outside the [lo_q, hi_q] exact
    quantiles clamp to the boundary — the standard robust-preprocessing
    transform (downstream means/variances resist heavy tails without
    dropping rows, the complement of mad_outliers' flag-and-drop gate).
    Appends `<value>_winsorized` plus the q_lo/q_hi bounds used; null
    values pass through null; a group whose values are all null keeps
    its rows unclamped.

    Scale shape: bounds ride the distributed `exact_quantiles` rewrite;
    the clamp itself is a BROADCAST of the one-row-per-group bound table
    plus scan-local CASE arithmetic — no wide exchange of the data rows
    at all.
    """
    if not 0.0 <= float(lo_q) <= float(hi_q) <= 1.0:
        raise ValueError("need 0 <= lo_q <= hi_q <= 1")
    edges = exact_quantiles(
        df, group_col, value_col, {"_wlo": lo_q, "_whi": hi_q}
    )
    v = F.col(value_col)
    clamped = (
        F.when(v < F.col("_wlo"), F.col("_wlo"))
        .when(v > F.col("_whi"), F.col("_whi"))
        .otherwise(v)
    )
    return (
        df.join(F.broadcast(edges), group_col, "left")
        .select(
            *df.columns,
            clamped.alias(f"{value_col}_winsorized"),
            F.col("_wlo").alias("q_lo"),
            F.col("_whi").alias("q_hi"),
        )
    )


def category_drift(
    df: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "day",
) -> DataFrame:
    """Categorical mix drift between consecutive time windows — the
    categorical twin of `histogram_drift` (which is generic over its bin
    column, so this is one windowed count plus the SAME comparator):
    bins are the category values themselves, and the linf pointer names
    WHICH category's share moved most. The alert for "did today's
    event/source/language mix shift?" — the pipeline-input drift that
    value histograms cannot see.

    Scale shape inherits the drift comparator's: one partial-aggregated
    count to the (windows x categories) grid, everything after bounded
    by the horizon x category cardinality.
    """
    counts = (
        df.filter(F.col(cat_col).isNotNull())
        .select(
            F.date_trunc(window, F.col(ts_col)).alias("win_start"),
            F.col(cat_col),
        )
        .groupBy("win_start", cat_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return histogram_drift(
        counts, window_col="win_start", bin_col=cat_col,
        count_col="n_rows",
    )


def acf(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key autocorrelation function at lags 1..max_lag: the Pearson
    correlation of (x_t, x_{t-lag}) pairs in (order_cols) order — the
    "is this series self-similar / mean-reverting / trending?" monitor
    that complements rolling_corr (cross-series) and ols_trend (drift).

    Plan shape: ONE sorted window pass per key materializes all
    max_lag lag columns (they share the shuffle + sort), the lag pairs
    unpivot scan-locally, and ONE partial-combined aggregation on the
    bounded (key, lag) space computes the five decimal moments. Per-key
    serial work is O(max_lag); nothing data-sized crosses a second
    shuffle. Degenerate series (fewer than 2 pairs, zero variance on
    either margin) yield NULL via explicit guards (Spark div-by-zero
    NULL vs DuckDB inf would otherwise diverge).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*[F.col(c).asc() for c in order_cols])
    x = F.col(value_col).cast("double")
    lagged = df.select(
        F.col(key_col),
        x.alias("_x"),
        *[F.lag(x, i).over(w).alias(f"_p{i}") for i in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("lag"),
                        F.col("_x").alias("x"),
                        F.col(f"_p{i}").alias("p"),
                    )
                    for i in range(1, max_lag + 1)
                ]
            )
        ).alias("e"),
    ).select(key_col, "e.lag", "e.x", "e.p").where(F.col("p").isNotNull())
    xx = F.col("x")
    pp = F.col("p")
    m = pairs.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xx.cast("decimal(38,6)")).cast("double").alias("_sx"),
        F.sum(pp.cast("decimal(38,6)")).cast("double").alias("_sp"),
        F.sum((xx * pp).cast("decimal(38,10)")).cast("double").alias("_sxp"),
        F.sum((xx * xx).cast("decimal(38,10)")).cast("double").alias("_sxx"),
        F.sum((pp * pp).cast("decimal(38,10)")).cast("double").alias("_spp"),
    )
    n = F.col("n_pairs").cast("double")
    dxx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dpp = n * F.col("_spp") - F.col("_sp") * F.col("_sp")
    dxp = n * F.col("_sxp") - F.col("_sx") * F.col("_sp")
    corr = F.when(
        (F.col("n_pairs") >= 2) & (dxx > 0) & (dpp > 0),
        dxp / (F.sqrt(dxx) * F.sqrt(dpp)),
    )
    return m.select(
        key_col,
        "lag",
        "n_pairs",
        (corr + F.lit(0.0)).alias("acf"),
    )


def ewma_control_chart(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    window: int = 50,
    n_sigma: float = 3.0,
    min_periods: int = 8,
) -> DataFrame:
    """EWMA control chart: flag points that sit more than n_sigma
    per-key standard deviations away from the exponentially-weighted
    prediction built from the PRIOR rows only — the classic
    fast-reacting point gate between per-point z-scores (no memory) and
    CUSUM (slow-drift memory).

    Exactness: the prediction is the repo's alpha=1/2 halving fold
    (win_ewma's form — value fold / weight fold, no pow(), identical
    index order on both engines) over a trailing ROWS frame ending at
    -1; sigma comes from exact decimal moments + one IEEE sqrt; the
    alert compares unrounded doubles that are bit-identical across
    engines. Rows with fewer than min_periods prior rows are warm-up:
    NULL prediction, is_alert false. Zero-variance keys alert never.

    One shuffle on the key (window), one bounded groupBy for the key
    stats (broadcast back) — the fact scan never moves twice.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-int(window), -1)
    )
    x = F.col(value_col).cast("double")
    vals = F.collect_list(x).over(w)
    fold = lambda arr: F.aggregate(  # noqa: E731 — acc/2 + x halving fold
        arr, F.lit(0.0), lambda acc, v: acc / F.lit(2.0) + v
    )
    base = df.select(
        key_col,
        *order_cols,
        x.alias("_x"),
        vals.alias("_vals"),
    ).withColumn(
        "_pred",
        F.when(
            F.size("_vals") >= int(min_periods),
            fold(F.col("_vals"))
            / fold(F.transform(F.col("_vals"), lambda _: F.lit(1.0))),
        ),
    )
    stats = df.groupBy(key_col).agg(
        F.count(x).alias("_n"),
        F.sum(x.cast("decimal(38,6)")).cast("double").alias("_s"),
        F.sum((x * x).cast("decimal(38,10)")).cast("double").alias("_ss"),
    )
    nn = F.col("_n").cast("double")
    var = (nn * F.col("_ss") - F.col("_s") * F.col("_s")) / (nn * (nn - 1))
    stats = stats.select(
        key_col,
        F.when((F.col("_n") >= 2) & (var > 0), F.sqrt(var)).alias("_sigma"),
    )
    out = base.join(F.broadcast(stats), key_col, "left")
    resid = F.col("_x") - F.col("_pred")
    alert = F.coalesce(
        F.abs(resid) > F.lit(float(n_sigma)) * F.col("_sigma"), F.lit(False)
    )
    return out.select(
        key_col,
        *order_cols,
        F.col("_x").alias(value_col),
        (F.col("_pred") + F.lit(0.0)).alias("ewma_pred"),
        (resid + F.lit(0.0)).alias("residual"),
        alert.alias("is_alert"),
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal decomposition on a day-of-period grid:
    value = key_mean + seasonal(key, day mod period) + residual.
    The "is Monday always like this?" monitor — drift gates downstream
    (MAD / CUSUM / control chart) should run on the RESIDUAL, or weekly
    shape trips them forever.

    The season bucket is pure integer arithmetic — floor(epoch/86400)
    mod period — deliberately avoiding engine dayofweek() conventions
    (bucket 0 = the Unix epoch's day, a Thursday, when period=7).
    Means are exact decimal sums / counts; the key mean is re-derived
    from the (key, bucket) partial sums, so there is ONE aggregation
    over ONE fact scan, a bounded regroup, and a broadcast join back.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long")
    bucket = (day % period).cast("int")
    x = F.col(value_col).cast("double")
    enriched = df.select(key_col, ts_col, x.alias("_x"), bucket.alias("season_bucket"))
    g = enriched.groupBy(key_col, "season_bucket").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast("decimal(38,6)")).alias("_s"),
    )
    tot = g.groupBy(key_col).agg(
        F.sum("_n").alias("_nk"),
        F.sum("_s").alias("_sk"),
    )
    key_mean = F.col("_sk").cast("double") / F.col("_nk").cast("double")
    season_mean = F.col("_s").cast("double") / F.col("_n").cast("double")
    stats = (
        g.join(tot, key_col)
        .select(
            key_col,
            "season_bucket",
            key_mean.alias("_km"),
            (season_mean - key_mean).alias("_seas"),
        )
    )
    out = enriched.join(F.broadcast(stats), [key_col, "season_bucket"], "left")
    return out.select(
        key_col,
        ts_col,
        "season_bucket",
        F.col("_x").alias(value_col),
        (F.col("_km") + F.lit(0.0)).alias("key_mean"),
        (F.col("_seas") + F.lit(0.0)).alias("seasonal"),
        ((F.col("_x") - F.col("_km") - F.col("_seas")) + F.lit(0.0)).alias(
            "residual"
        ),
    )
