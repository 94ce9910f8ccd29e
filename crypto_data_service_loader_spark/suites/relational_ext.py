"""Relational EXT queries (SURVEY.md §2B: joins incl. as-of family, window suites, aggregations, set ops, scalars, streaming-shaped batch twins) and their DuckDB oracles."""

from __future__ import annotations

from .shared import *  # noqa: F401,F403


# --------------------------------------------------------------------------
# relational EXT (SURVEY.md §2B)
# --------------------------------------------------------------------------

def q_join_broadcast_dim(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        rel.broadcast_join(li, part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_join_sortmerge(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "okey")
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "okey")
    return (
        rel.sortmerge_join(li, orders, ["okey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


def q_join_semi(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    return rel.semi_join(cust, orders, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_asof_last_tick(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof.asof_join(
        clicks, views, by=["user_id"], left_time="ts", right_time="ts",
        value_cols=["value"],
    ).select("event_id", "user_id", "ts", F.col("value_asof"))


def q_asof_nearest_tolerance(spark, sf_dir):
    """Nearest-direction as-of with a 10-minute tolerance: each click gets
    the closest view either side (ties prefer backward, merge_asof
    parity), nulled when the nearest is farther than the bound — the
    market-data join for sparse series where a stale match is worse than
    none. Same single-shuffle union-window plan; the tolerance test rides
    the carried right timestamp for free."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof.asof_join(
        clicks, views, by=["user_id"], left_time="ts", right_time="ts",
        value_cols=["value"], direction="nearest", tolerance_seconds=600,
    ).select("event_id", "user_id", "ts", F.col("value_asof"))


def q_asof_next_tick(spark, sf_dir):
    """Forward as-of: the NEXT view at-or-after each click (merge_asof
    direction='forward' parity; DuckDB oracle flips the ASOF inequality)."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof.asof_join(
        clicks, views, by=["user_id"], left_time="ts", right_time="ts",
        value_cols=["value"], direction="forward",
    ).select("event_id", "user_id", "ts", F.col("value_asof"))


def q_agg_multikey(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sum_value"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    # HLL sketch — engine-specific estimate; rows-only check (no oracle).
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.approx_count_distinct("event_id").alias("approx_events"),
    )


def q_agg_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


def q_win_row_number(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


def q_win_lag_delta(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


def q_win_moving_avg(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mov_avg"),
    )


def q_win_rank_suite(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


def q_agg_approx_quantile(spark, sf_dir):
    # sketch-based quantiles: engine-specific estimates -> rows-only check
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99_approx"),
    )


def q_win_first_last(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("user_id").orderBy("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_value"),
        F.last("value").over(w).alias("last_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
        F.lead("value").over(wo).alias("next_value"),
    )


def q_agg_corr(spark, sf_dir):
    """Correlation/covariance from exact decimal sums — engine-independent
    (built-in corr() accumulates doubles in partition order)."""
    ev = load(spark, sf_dir, "events")
    x = F.col("value")
    y = F.col("user_id").cast("double")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x.cast("decimal(38,6)")).cast("double")
    sy = F.sum(y.cast("decimal(38,6)")).cast("double")
    sxy = F.sum((x * y).cast("decimal(38,10)")).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,10)")).cast("double")
    syy = F.sum((y * y).cast("decimal(38,10)")).cast("double")
    cov = F.when(n >= 2, (sxy - sx * sy / n) / (n - 1))
    # explicit degenerate guards + negative-zero normalization (+0.0):
    # Spark's div-by-zero yields NULL where DuckDB yields inf, and a
    # rounded -1e-9 is -0.0 on one engine and 0.0 on the other — both
    # classes surfaced under the oracle fuzzer, invisible at gate SFs
    corr = F.when(
        (n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0),
        (n * sxy - sx * sy)
        / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
    )
    return ev.groupBy("event_type").agg(
        (F.round(cov, 6) + F.lit(0.0)).alias("cov_xy"),
        (F.round(corr, 6) + F.lit(0.0)).alias("corr_xy"),
    )


def q_scalar_date_parts(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        F.hour(d).alias("h"),
        F.last_day(d).alias("month_end"),
        F.trunc(d.cast("date"), "mm").alias("month_start"),
    )


def q_topk_by_price(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(10).select("o_orderkey", "o_totalprice")


def q_setop_union(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return rel.union_all(cust, supp)


def q_setop_except(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.subtract(supp)


def q_setop_except_all(spark, sf_dir):
    """Bag-semantics EXCEPT ALL (multiplicity-aware: a nation appearing 5x
    among customers and 2x among suppliers survives 3x)."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp)


def q_join_full_outer(spark, sf_dir):
    """Full outer join of two per-user aggregates: users with only clicks,
    only views, or both — null-preserving on BOTH sides (the reconciliation
    shape: left/semi/anti cannot express it)."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_views"))
    )
    return clicks.join(views, ["user_id"], "full_outer").select(
        "user_id", "n_clicks", "n_views"
    )


def q_events_funnel(spark, sf_dir):
    """Ordered view -> click -> purchase funnel per user (stage k+1 must
    follow the FIRST stage-k event). One shuffle: chained window minimums
    over the user partition, not the k-way self-join formulation."""
    return rel.funnel(load(spark, sf_dir, "events"))


def q_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: first-activity date x day offset ->
    distinct active users. Two partial-combined aggs + one user-keyed
    join over the (user, day)-deduplicated activity set."""
    return rel.retention_cohorts(load(spark, sf_dir, "events"))


def q_win_ewma(spark, sf_dir):
    """Trailing exponentially-weighted moving average (half-life weights,
    truncated to the last 50 rows — 2^-50 of tail mass, the standard
    practical EWMA form; the exact prefix-sum formulation overflows
    (1-a)^-k at production series lengths).

    Engineered for cross-engine exactness: alpha = 1/2 makes the whole
    computation a left fold `acc/2 + x` over the frame-ordered array —
    halving is an exponent shift (no rounding anywhere), both engines
    fold in identical index order, and the weights never materialize (no
    pow(), whose last-ulp behavior differs across libm). One shuffle on
    the series key, JVM-side higher-order functions — no Python, no
    recursion."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-49, 0)
    )
    vals = F.collect_list("value").over(w)
    base = ev.select("event_id", "user_id", "ts", vals.alias("_vals"))
    fold = lambda arr: F.aggregate(  # noqa: E731 — acc/2 + x recurrence
        arr, F.lit(0.0), lambda acc, x: acc / F.lit(2.0) + x
    )
    num = fold(F.col("_vals"))
    den = fold(F.transform(F.col("_vals"), lambda x: F.lit(1.0)))
    return base.select(
        "event_id", "user_id", F.round(num / den, 6).alias("ewma")
    )


def q_pagerank_knn(spark, sf_dir):
    """PageRank centrality over the LSH kNN graph (3 power iterations,
    damping 0.85) — "which documents sit at the center of their semantic
    neighborhood", the graph-side importance signal for corpus curation.
    Each iteration is one edge⋈rank join + one destination-keyed agg with
    DECIMAL-accumulated contributions (merge-order independent); the edge
    set and degrees materialize once."""
    from ..operators import graph

    emb = load(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=3, n_planes=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.pagerank(edges, emb.select("vec_id"), iters=3, id_col="vec_id")


def q_community_lpa(spark, sf_dir):
    """Label-propagation communities (round 13) over the co-supplier
    graph: suppliers are adjacent when they ship lines of the SAME order
    — the co-occurrence graph a marketplace/curation pipeline builds
    from transactions. Two synchronous majority-vote iterations (pinned
    for the oracle, tie-break lowest label); the edge derivation is one
    self-equi-join on the order key with distinct pairs, bounded by
    lines-per-order² — never corpus². The DuckDB twin unrolls both
    iterations as CTEs with the identical (count DESC, label) rank."""
    from ..operators import graph

    li = load(spark, sf_dir, "lineitem")
    # co-occurrence pairs WITHOUT the self-join (round 16, guide §2.3):
    # one groupBy(ok) collect_set (single 600k-row exchange with map-side
    # partials) and the a<b pairs explode out of each order's supplier
    # array — the old shape shuffled lineitem TWICE for the order-key
    # self-join and pushed every (u,v)+(v,u) ordered pair through the
    # downstream distinct. Arrays are bounded by lines-per-order (TPC-H:
    # <=7), so the explode is never a blow-up; pair set is identical
    # (same unordered co-supplier pairs, already canonical a<b).
    # spread_by (round 17, guide §2.5): the single-row-group gate scan
    # put the whole partial collect_set in ONE task and AQE's byte
    # targets coalesced the final agg + pair explode onto <=4 of 32
    # cores (measured: 0.53 s serial scan-agg task + 4x0.5 s explode
    # tasks; keyed spread x0.70 on the full key, rows identical). The
    # agg reuses the pinned exchange — still one shuffle of the stream.
    per_order = dedup.spread_by(
        li.select("l_orderkey", "l_suppkey"), "l_orderkey"
    ).groupBy(F.col("l_orderkey")).agg(
        F.collect_set("l_suppkey").alias("_ss")
    )
    edges = per_order.select(
        F.explode("_ss").alias("src"), F.col("_ss").alias("_ss")
    ).select(
        "src",
        F.explode(F.filter("_ss", lambda x: x > F.col("src"))).alias("dst"),
    )
    out = graph.label_propagation(edges, iters=2)
    return out.select(F.col("node").alias("supp_key"), "community")


def q_vwap_bars(spark, sf_dir):
    """Volume-weighted average price per (returnflag, ship month) — the
    weighted-mean bar the tick consumers pair with OHLC. Both the weighted
    sum and the weight accumulate in DECIMAL(38,6) (order-independent),
    the division is a single double op — oracle-exact. One shuffle with
    map-side partials."""
    # factored into rel.vwap_bars (round 11) so the streaming twin pins
    # against the same batch operator
    return rel.vwap_bars(load(spark, sf_dir, "lineitem"))


def q_setop_intersect(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return rel.intersect_distinct(cust, supp)


def q_scalar_dates(spark, sf_dir):
    reg = registry(spark, sf_dir)
    return reg.select(
        "filename",
        F.date_format("create_date", "yyyy-MM-dd").alias("d_str"),
        F.date_add("create_date", 7).alias("d_plus7"),
        F.datediff(F.to_date(F.lit(TODAY)), F.col("create_date")).alias("age_days"),
        (F.col("create_date") < F.to_date(F.lit(TODAY))).alias("is_past"),
    )


def q_scalar_strings(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.length("p_name").cast("int").alias("name_len"),
        F.element_at(F.split(F.col("p_type"), " "), 1).alias("type_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name5"),
    )


def q_log_event_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type").alias("severity"),
                F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("thread"),
                F.col("props").alias("message"),
            )
        ).alias("log_json"),
    )


def q_udf_mid_price(spark, sf_dir):
    from ..functions.scalars import mid_price

    ev = load(spark, sf_dir, "events")
    bid = F.col("value")
    ask = F.col("value") * 1.01
    return ev.select("event_id", mid_price(bid, ask).alias("mid"))


def q_stream_tumbling_daily_count(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("day"), "event_type", "n", "sum_value")
    )


def q_agg_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price")
    )


def q_agg_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(1) AS n
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_pivot_status(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


def q_sessionize_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return rel.sessionize(ev, "user_id", "ts", gap_minutes=30).select(
        "event_id", "user_id", "session_id"
    )


def q_session_window_agg(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def q_win_range_frame(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, 0)  # events within the trailing 5 min
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_trailing_5m")
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dups(emb, threshold=0.4)


def q_udf_grouped_range(spark, sf_dir):
    @F.pandas_udf("double")
    def value_range(v: pd.Series) -> float:  # grouped-agg pandas UDF surface
        return float(v.max() - v.min())

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(value_range("value").alias("value_range"))


def q_stateful_running_total(spark, sf_dir):
    from ..streaming.stateful import running_totals_batch

    # rounded: DuckDB windowed SUM uses segment-tree add order, pandas
    # cumsum is sequential — identical values only after 6dp rounding
    return running_totals_batch(load(spark, sf_dir, "events")).withColumn(
        "total", F.round("total", 6)
    )


def q_scalar_math(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice") - 1000.0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(x).alias("abs_x"),
        F.ceil(x).alias("ceil_x"),
        F.floor(x).alias("floor_x"),
        F.sqrt(F.abs(x)).alias("sqrt_x"),
        F.signum(x).cast("int").alias("sign_x"),
        (F.col("l_orderkey") % 97).alias("mod_x"),
        F.greatest("l_quantity", "l_discount").alias("greatest_x"),
        F.least("l_quantity", "l_discount").alias("least_x"),
    )


def q_scalar_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


def q_scalar_conditional(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("hidden")).alias("masked"),
        F.when(F.col("value") > 10, "high").otherwise("low").alias("band"),
        F.isnull(F.nullif("event_type", F.lit("click"))).alias("is_click"),
    )


def q_scalar_array_funcs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return docs.select(
        "doc_id",
        F.array_contains(toks, "data").alias("has_data"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.concat_ws("-", F.slice(toks, 1, 3)).alias("head3"),
        F.concat_ws(" ", F.reverse(toks)).alias("reversed_text"),
        F.size(F.array_remove(toks, "the")).cast("int").alias("n_non_the"),
    )


def q_agg_stats(spark, sf_dir):
    """Variance/stddev from exact decimal sums (sum-order independent):
    var = (ssq - s^2/n) / (n-1), computed in DOUBLE from exact inputs."""
    ev = load(spark, sf_dir, "events")
    s = F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    ssq = F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)")).cast("double")
    n = F.count("value")
    var = (ssq - s * s / n) / (n - 1)
    return ev.groupBy("event_type").agg(
        F.round(var, 6).alias("var_value"),
        F.round(F.sqrt(var), 6).alias("std_value"),
    )


def q_agg_minmax_by(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # order key made unique (value then event_id) — max_by/arg_max tie
    # behavior is undefined in both engines, so ties must be impossible
    key = F.col("value") * 1000000 + F.col("event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("top_event"),
        F.min_by("event_id", key).alias("bottom_event"),
        F.max("value").alias("max_value"),
    )


def q_agg_conditional(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").alias("n_clicks"),
        F.bool_or(F.col("value") > 90).alias("any_big"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
    )


def q_subquery_exists(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 1000)
        """
    )


def q_subquery_scalar(spark, sf_dir):
    register_views(spark, sf_dir)
    # decimal-exact avg: sum(decimal)/count, same formula in the oracle
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) * 2 FROM orders)
        """
    )


def q_subquery_in(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 1)
        """
    )


def q_agg_approx_topk(spark, sf_dir):
    """Frequent-items sketch (approx_top_k): one-pass mergeable heavy-hitter
    summary — the scalable replacement for exact GROUP BY + ORDER BY + LIMIT
    when the key space is huge. Exact (and thus oracle-checkable) here
    because distinct keys << maxItemsTracked; at real scale the same call
    degrades gracefully to approximate counts."""
    ev = load(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "item")
    )


def q_range_join_events(spark, sf_dir):
    """Interval join events⋈windows with NO equi key — `relational.
    range_join` rewrites the theta join into a bin equi-join (see operator
    docstring). Windows: 20 overlapping 40 h intervals at 33 h stride."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    w = spark.range(20).select(
        F.col("id").cast("int").alias("w_id"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,33*id,0,0)").alias("w_start"),
        F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,33*id+40,0,0)").alias("w_end"),
    )
    return rel.range_join(ev, w, "ts", "w_start", "w_end").select(
        "event_id", "w_id"
    )


def q_join_salted_skew(spark, sf_dir):
    """Salted join, semantically identical to the plain equi-join — the
    oracle IS the plain join (salting must never change results)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    users = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_events"))
    )
    return rel.salted_join(ev, users, "user_id", salt=4).select(
        "event_id", "user_id", "value", "user_events"
    )


def q_ohlc_bars(spark, sf_dir):
    """OHLC downsampling — THE canonical tick-data aggregation the
    reference's ClickHouse/Grafana consumers run: per (series, hour) bar
    with open/close = first/last value by (ts, event_id) (composite key
    makes ties impossible), high/low/volume. One shuffle, map-side
    partials; at 100 TB the hour column is also the partition key, so
    bars land partition-local."""
    # factored into rel.ohlc_bars (round 11) so the streaming twin pins
    # against the same batch operator
    return rel.ohlc_bars(load(spark, sf_dir, "events"))


def q_gap_fill_bars(spark, sf_dir):
    """Gap-filled hourly close series: an exploded calendar scaffold
    (series x 720 hours, no join — explode is scan-local), left join the
    real OHLC bars, then `asof.forward_fill` carries the last close across
    empty hours. The standard densify step before time-series modeling."""
    bars = q_ohlc_bars(spark, sf_dir).select("series", "bar_start", "close")
    scaffold = (
        bars.select("series")
        .distinct()
        .select("series", F.explode(F.sequence(F.lit(0), F.lit(719))).alias("h"))
        .select(
            "series",
            F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)"
            ).alias("bar_start"),
        )
    )
    joined = scaffold.join(bars, ["series", "bar_start"], "left")
    return asof.forward_fill(joined, "series", "bar_start", "close").select(
        "series",
        "bar_start",
        "close_filled",
        F.col("close").isNotNull().alias("observed"),
    )


def q_stream_sliding_window(spark, sf_dir):
    """Sliding window (1 day, 12 h slide): every event belongs to exactly
    two windows — batch-checkable twin of the streaming sliding agg."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


def q_unpivot_metrics(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount"],
        "metric",
        "metric_value",
    )


def q_agg_percentile(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
    )


def q_distinct_pairs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_RELATIONAL_ORACLES = {
    "join_broadcast_dim": f"""
        SELECT p_brand,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""",
    "join_sortmerge": f"""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""",
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
    "asof_last_tick": """
        SELECT c.event_id, c.user_id, c.ts, v.value AS value_asof
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND v.ts <= c.ts""",
    "asof_next_tick": """
        SELECT c.event_id, c.user_id, c.ts, v.value AS value_asof
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
          ON c.user_id = v.user_id AND v.ts >= c.ts""",
    "agg_multikey": f"""
        SELECT user_id, event_type, COUNT(*) AS n,
               {_DSUM.format(x='value')} AS sum_value
        FROM events GROUP BY user_id, event_type""",
    "agg_rollup": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {_DSUM.format(x='l_quantity')} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "win_row_number": """
        SELECT user_id, event_id, ts FROM (
            SELECT user_id, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
            FROM events) WHERE rn = 1""",
    "win_lag_delta": """
        SELECT event_id, user_id,
               value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS delta
        FROM events""",
    "win_moving_avg": """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS mov_avg
        FROM events""",
    "topk_by_price": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "win_first_last": """
        SELECT event_id, user_id,
               FIRST_VALUE(value) OVER wfull AS first_value,
               LAST_VALUE(value) OVER wfull AS last_value,
               NTH_VALUE(value, 2) OVER wfull AS second_value,
               LEAD(value) OVER word AS next_value
        FROM events
        WINDOW wfull AS (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
               word AS (PARTITION BY user_id ORDER BY ts)""",
    "agg_corr": """
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(CAST(user_id AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(value * CAST(user_id AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS syy
            FROM events GROUP BY event_type)
        SELECT event_type,
               round(CASE WHEN n >= 2
                          THEN (sxy - sx * sy / n) / (n - 1) END, 6)
                   + 0 AS cov_xy,
               round(CASE WHEN n * sxx - sx * sx > 0
                           AND n * syy - sy * sy > 0
                          THEN (n * sxy - sx * sy)
                               / (sqrt(n * sxx - sx * sx)
                                  * sqrt(n * syy - sy * sy)) END, 6)
                   + 0 AS corr_xy
        FROM s""",
    "scalar_date_parts": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(day(o_orderdate) AS INTEGER) AS dom,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(hour(o_orderdate) AS INTEGER) AS h,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start
        FROM orders""",
    "win_rank_suite": """
        SELECT event_id, user_id,
               CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
               round(PERCENT_RANK() OVER w, 6) AS prank,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               round(CUME_DIST() OVER w, 6) AS cdist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)""",
    "setop_union": """
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier""",
    "setop_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier""",
    "setop_except_all": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier""",
    "join_full_outer": """
        WITH clicks AS (
            SELECT user_id, COUNT(*) AS n_clicks FROM events
            WHERE event_type = 'click' GROUP BY user_id),
        views AS (
            SELECT user_id, COUNT(*) AS n_views FROM events
            WHERE event_type = 'view' GROUP BY user_id)
        SELECT coalesce(c.user_id, v.user_id) AS user_id,
               c.n_clicks, v.n_views
        FROM clicks c FULL OUTER JOIN views v ON c.user_id = v.user_id""",
    # Mirrors q_win_ewma exactly: same frame-ordered array, same acc/2+x
    # left fold (list_reduce's first-element init equals folding from 0).
    "win_ewma": """
        WITH b AS (
            SELECT event_id, user_id,
                   list(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
                       AS vals
            FROM events)
        SELECT event_id, user_id,
               round(
                 list_reduce(list_transform(vals, x -> CAST(x AS DOUBLE)),
                             (a, x) -> a / 2.0 + x)
                 / list_reduce(list_transform(vals, x -> CAST(1.0 AS DOUBLE)),
                               (a, x) -> a / 2.0 + x),
                 6) AS ewma
        FROM b""",
    "vwap_bars": f"""
        SELECT l_returnflag,
               CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS bar_start,
               CASE WHEN {_DSUM.format(x='l_quantity')} > 0
                    THEN round({_DSUM.format(x='l_extendedprice * l_quantity')}
                               / {_DSUM.format(x='l_quantity')}, 6)
               END AS vwap,
               {_DSUM.format(x='l_quantity')} AS volume,
               COUNT(*) AS n_trades
        FROM lineitem GROUP BY l_returnflag, bar_start""",
    # Mirrors rel.funnel: chained full-frame window minimums (stage k+1
    # strictly after the first stage-k time), rolled up per user.
    "events_funnel": """
        WITH s1 AS (
            SELECT user_id, ts, event_type,
                   MIN(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS t0
            FROM events),
        s2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t1
            FROM s1),
        s3 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
                               THEN ts END)
                          OVER (PARTITION BY user_id) AS t2
            FROM s2)
        SELECT user_id,
               MAX(t0) IS NOT NULL AS reached_view,
               MAX(t1) IS NOT NULL AS reached_click,
               MAX(t2) IS NOT NULL AS reached_purchase,
               CAST(CASE WHEN MAX(t2) IS NOT NULL THEN 3
                         WHEN MAX(t1) IS NOT NULL THEN 2
                         WHEN MAX(t0) IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS funnel_stage
        FROM s3 GROUP BY user_id""",
    "retention_cohorts": """
        WITH first AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
            FROM events GROUP BY user_id),
        active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        SELECT cohort_date,
               CAST(d - cohort_date AS INTEGER) AS day_offset,
               COUNT(DISTINCT user_id) AS n_users
        FROM active JOIN first USING (user_id)
        GROUP BY cohort_date, day_offset""",
    "setop_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier""",
    "scalar_dates": f"""{_REG}
        SELECT filename,
               strftime(create_date, '%Y-%m-%d') AS d_str,
               CAST(create_date + INTERVAL 7 DAY AS DATE) AS d_plus7,
               CAST(date_diff('day', create_date, DATE '{TODAY}') AS INTEGER) AS age_days,
               create_date < DATE '{TODAY}' AS is_past
        FROM registry""",
    "scalar_strings": """
        SELECT p_partkey,
               upper(p_brand) AS brand_up,
               CAST(length(p_name) AS INTEGER) AS name_len,
               string_split(p_type, ' ')[1] AS type_head,
               concat_ws('|', p_brand, p_type) AS brand_type,
               substr(p_name, 1, 5) AS name5
        FROM part""",
    "log_event_json": """
        SELECT event_id,
               concat('{"severity":', to_json(event_type),
                      ',"thread":', to_json('user_' || CAST(user_id AS VARCHAR)),
                      ',"message":', to_json(props), '}') AS log_json
        FROM events""",
    "udf_mid_price": """
        SELECT event_id, (value + value * 1.01) / 2 AS mid FROM events""",
    "agg_cube": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {_DSUM.format(x='l_extendedprice')} AS sum_price
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(1) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "pivot_status": """
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                    FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                    FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
        FROM lineitem GROUP BY l_returnflag""",
    "sessionize_events": """
        SELECT event_id, user_id,
               CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 30*60*1000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events)""",
    "session_window_agg": """
        WITH tagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 30*60*1000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events),
        sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM tagged)
        SELECT MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               user_id, COUNT(*) AS n
        FROM sess GROUP BY user_id, sid""",
    "win_range_frame": """
        SELECT event_id, user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
               AS n_trailing_5m
        FROM events""",
    # zero-norm convention: a zero vector scores 0.0 against everything
    # (the Spark _cosine guard's twin; unguarded DuckDB yields NaN)
    "dedup_embedding_cosine": """
        WITH normed AS (
            SELECT vec_id,
                   embedding AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings),
        scored AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_sum(list_transform(range(1, len(a.v) + 1),
                       i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                       AS dt,
                   a.n * b.n AS dn
            FROM normed a JOIN normed b ON a.vec_id < b.vec_id)
        SELECT id_a, id_b,
               CASE WHEN dn > 0 THEN round(dt / dn, 6) ELSE 0.0 END AS score
        FROM scored
        WHERE CASE WHEN dn > 0 THEN round(dt / dn, 6) ELSE 0.0 END >= 0.4""",
    # Faithful oracle of the LSH semantics: replicates the deterministic
    # md5-derived ±1 hyperplanes (similarity._hyperplane — parity of the
    # first 8 md5 hex chars == parity of the 8th char) and the sign-bucket
    # id, then scores only same-bucket pairs. Value-exact including the
    # sub-1.0 recall behavior, so the driver's hash check covers the
    # bucketed path itself, not just its brute-force superset.
    "dedup_embedding_lsh": """
        WITH planes AS (
            SELECT p.p, i.i,
                   CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' ||
                                        CAST(i.i AS VARCHAR)), 8, 1)
                             IN ('0','2','4','6','8','a','c','e')
                        THEN 1.0 ELSE -1.0 END AS w
            FROM (SELECT unnest(range(4)) AS p) p,
                 (SELECT unnest(range((SELECT max(len(embedding))
                                       FROM embeddings))) AS i) i),
        normed AS (
            SELECT vec_id, embedding AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings),
        dots AS (
            SELECT nv.vec_id, pl.p,
                   sum(CAST(nv.v[pl.i + 1] AS DOUBLE) * pl.w) AS d
            FROM normed nv JOIN planes pl ON TRUE
            GROUP BY nv.vec_id, pl.p),
        buckets AS (
            SELECT vec_id,
                   CAST(sum(CASE WHEN d >= 0
                            THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id),
        bv AS (
            SELECT nv.vec_id, nv.v, nv.n, bk.bucket
            FROM normed nv JOIN buckets bk USING (vec_id))
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(CASE WHEN a.n * b.n > 0
                     THEN list_sum(list_transform(range(1, len(a.v) + 1),
                          i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                          / (a.n * b.n)
                     ELSE 0.0 END, 6) AS score
        FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(CASE WHEN a.n * b.n > 0
                    THEN list_sum(list_transform(range(1, len(a.v) + 1),
                         i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                         / (a.n * b.n)
                    ELSE 0.0 END, 6) >= 0.4""",
    # Mirrors similarity.semantic_dedup exactly: seed centroids = the 8
    # lowest-id vectors (cid = id rank), argmin L2 assignment with (dist,
    # cid) tie-break, intra-cluster cosine pairs at >= 0.35, higher id of
    # each pair flagged. list_sum folds in index order like Spark's
    # aggregate(), so distances/scores agree to the last ulp.
    "semantic_dedup": """
        WITH seeds AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
            FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
        vecs AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        dists AS (
            SELECT vecs.vec_id, vecs.v, seeds.cid,
                   list_sum(list_transform(range(1, len(v) + 1),
                        i -> (v[i] - cvec[i]) * (v[i] - cvec[i]))) AS d
            FROM vecs, seeds),
        assigned AS (
            SELECT vec_id, v, cid AS centroid_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY d, cid) AS rn
                  FROM dists) WHERE rn = 1),
        normed AS (
            SELECT vec_id, v, centroid_id,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS n
            FROM assigned),
        dups AS (
            SELECT DISTINCT b.vec_id
            FROM normed a JOIN normed b
              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
            WHERE round(CASE WHEN a.n * b.n > 0
                        THEN list_sum(list_transform(range(1, len(a.v) + 1),
                             i -> a.v[i] * b.v[i])) / (a.n * b.n)
                        ELSE 0.0 END, 6) >= 0.35)
        SELECT asg.vec_id, asg.centroid_id, (d.vec_id IS NOT NULL) AS is_dup
        FROM assigned asg LEFT JOIN dups d ON asg.vec_id = d.vec_id""",
    # Same deterministic 4-plane sign-LSH twin as dedup_embedding_lsh, then
    # top-3 neighbors per vector by (score desc, id) within the bucket.
    "knn_graph_lsh": _KNN_SQL,
    "pagerank_knn": _pagerank_sql(3),
    # Triangle closure over the same kNN edge CTE: ordered wedges
    # (a < b < c by canonicalization) closed by an (a, c) edge EXISTS.
    "knn_triangles": f"""
        WITH knn AS ({{knn}}),
        edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),
        und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM edges WHERE src <> dst),
        wedge AS (SELECT e1.a, e1.b, e2.b AS c
                  FROM und e1 JOIN und e2 ON e1.b = e2.a),
        tri AS (SELECT w.a, w.b, w.c FROM wedge w
                WHERE EXISTS (SELECT 1 FROM und e3
                              WHERE e3.a = w.a AND e3.b = w.c)),
        pn AS (SELECT node, count(*) AS n_triangles
               FROM (SELECT a AS node FROM tri
                     UNION ALL SELECT b FROM tri
                     UNION ALL SELECT c FROM tri)
               GROUP BY node),
        deg AS (SELECT node, count(*) AS degree
                FROM (SELECT a AS node FROM und
                      UNION ALL SELECT b FROM und)
                GROUP BY node)
        SELECT e.vec_id,
               coalesce(n_triangles, 0) AS n_triangles,
               coalesce(degree, 0) AS degree,
               CASE WHEN coalesce(degree, 0) >= 2
                    THEN round(CAST(2.0 AS DOUBLE) * coalesce(n_triangles, 0)
                               / (degree * (degree - 1)), 6)
                    ELSE CAST(0.0 AS DOUBLE)
               END AS clustering_coeff
        FROM embeddings e
        LEFT JOIN pn ON e.vec_id = pn.node
        LEFT JOIN deg ON e.vec_id = deg.node""".replace("{knn}", _KNN_SQL),
    
    "udf_grouped_range": """
        SELECT user_id, MAX(value) - MIN(value) AS value_range
        FROM events GROUP BY user_id""",
    "scalar_math": """
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 1000.0) AS abs_x,
               CAST(ceil(l_extendedprice - 1000.0) AS BIGINT) AS ceil_x,
               CAST(floor(l_extendedprice - 1000.0) AS BIGINT) AS floor_x,
               sqrt(abs(l_extendedprice - 1000.0)) AS sqrt_x,
               CAST(sign(l_extendedprice - 1000.0) AS INTEGER) AS sign_x,
               l_orderkey % 97 AS mod_x,
               greatest(l_quantity, l_discount) AS greatest_x,
               least(l_quantity, l_discount) AS least_x
        FROM lineitem""",
    "scalar_json": """
        SELECT event_id,
               props->>'$.k' AS k_str,
               CAST(props->>'$.k' AS INTEGER) AS k_int
        FROM events""",
    "scalar_conditional": """
        SELECT event_id,
               coalesce(nullif(event_type, 'view'), 'hidden') AS masked,
               CASE WHEN value > 10 THEN 'high' ELSE 'low' END AS band,
               nullif(event_type, 'click') IS NULL AS is_click
        FROM events""",
    "scalar_array_funcs": f"""
        SELECT doc_id,
               list_contains({_TOKS}, 'data') AS has_data,
               {_TOKS}[1] AS first_tok,
               {_TOKS}[-1] AS last_tok,
               array_to_string(list_slice({_TOKS}, 1, 3), '-') AS head3,
               array_to_string(list_reverse({_TOKS}), ' ') AS reversed_text,
               CAST(len(list_filter({_TOKS}, t -> t != 'the')) AS INTEGER) AS n_non_the
        FROM documents""",
    "agg_stats": """
        WITH s AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS ssq,
                   COUNT(value) AS n
            FROM events GROUP BY event_type)
        SELECT event_type,
               round((ssq - sv * sv / n) / (n - 1), 6) AS var_value,
               round(sqrt((ssq - sv * sv / n) / (n - 1)), 6) AS std_value
        FROM s""",
    "agg_minmax_by": """
        SELECT user_id,
               arg_max(event_id, value * 1000000 + event_id) AS top_event,
               arg_min(event_id, value * 1000000 + event_id) AS bottom_event,
               MAX(value) AS max_value
        FROM events GROUP BY user_id""",
    "agg_conditional": """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
               bool_or(value > 90) AS any_big,
               bool_and(value >= 0) AS all_nonneg
        FROM events GROUP BY user_id""",
    "subquery_exists": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 1000)""",
    "subquery_scalar": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*) * 2 FROM orders)""",
    "subquery_in": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 1)""",
    "stream_sliding_window": f"""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '12 hours', ts) AS win_start, event_type, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '12 hours', ts) - INTERVAL '12 hours'
                   AS win_start, event_type, value
            FROM events)
        SELECT win_start, event_type, COUNT(*) AS n,
               {_DSUM.format(x='value')} AS sum_value
        FROM assigned GROUP BY win_start, event_type""",
    "unpivot_metrics": """
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS metric_value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount' AS metric,
               l_discount AS metric_value FROM lineitem""",
    "agg_percentile": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem GROUP BY l_returnflag""",
    "distinct_pairs": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""",
    "tpch_q6": f"""
        SELECT {_DSUM.format(x='l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24""",
    "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "tpch_q5": f"""
        SELECT n_name,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM region JOIN nation ON r_regionkey = n_regionkey
                    JOIN customer ON n_nationkey = c_nationkey
                    JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON o_orderkey = l_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                                 AND s_nationkey = n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name""",
    "tpch_q10": f"""
        SELECT c_custkey, c_name, n_name,
               {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "agg_approx_topk": """
        SELECT event_type AS item, COUNT(*) AS cnt
        FROM events GROUP BY event_type
        ORDER BY cnt DESC, item LIMIT 5""",
    "range_join_events": """
        WITH w AS (
            SELECT CAST(i AS INTEGER) AS w_id,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 33 HOUR) AS w_start,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 33 HOUR)
                       + INTERVAL 40 HOUR AS w_end
            FROM range(20) t(i))
        SELECT event_id, w_id
        FROM events JOIN w ON ts >= w_start AND ts < w_end""",
    "join_salted_skew": """
        SELECT e.event_id, e.user_id, e.value, u.user_events
        FROM events e
        JOIN (SELECT user_id, COUNT(*) AS user_events
              FROM events GROUP BY user_id) u
          ON e.user_id = u.user_id""",
    "stateful_running_total": """
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS n,
               round(SUM(value) OVER w, 6) AS total
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "ohlc_bars": f"""
        WITH base AS (
            SELECT event_type AS series,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_start,
                   value, ts, event_id
            FROM events),
        ranked AS (
            SELECT series, bar_start, value,
                   ROW_NUMBER() OVER (PARTITION BY series, bar_start
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY series, bar_start
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM base),
        oc AS (
            SELECT series, bar_start,
                   MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
                   MAX(CASE WHEN rn_d = 1 THEN value END) AS close
            FROM ranked GROUP BY series, bar_start),
        agg AS (
            SELECT series, bar_start,
                   MAX(value) AS high, MIN(value) AS low,
                   {_DSUM.format(x='value')} AS volume,
                   COUNT(*) AS n_ticks
            FROM base GROUP BY series, bar_start)
        SELECT agg.series, agg.bar_start, oc.open, agg.high, agg.low,
               oc.close, agg.volume, agg.n_ticks
        FROM agg JOIN oc USING (series, bar_start)""",
    "gap_fill_bars": """
        WITH base AS (
            SELECT event_type AS series,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_start,
                   value, ts, event_id
            FROM events),
        ranked AS (
            SELECT series, bar_start, value,
                   ROW_NUMBER() OVER (PARTITION BY series, bar_start
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM base),
        bars AS (
            SELECT series, bar_start, value AS close
            FROM ranked WHERE rn_d = 1),
        scaffold AS (
            SELECT series,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 1 HOUR)
                       AS bar_start
            FROM (SELECT DISTINCT event_type AS series FROM events)
                 CROSS JOIN range(720) t(i)),
        joined AS (
            SELECT s.series, s.bar_start, b.close
            FROM scaffold s LEFT JOIN bars b USING (series, bar_start))
        SELECT series, bar_start,
               last_value(close IGNORE NULLS) OVER (
                   PARTITION BY series ORDER BY bar_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS close_filled,
               close IS NOT NULL AS observed
        FROM joined""",
    "stream_tumbling_daily_count": f"""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
               COUNT(*) AS n,
               {_DSUM.format(x='value')} AS sum_value
        FROM events GROUP BY 1, 2""",
}


def q_interval_islands(spark, sf_dir):
    """Gaps-and-islands over event validity intervals (round 9,
    rel.merge_intervals): each event opens a deterministic-duration
    interval (60s + (event_id % 7) * 600s); overlapping/touching
    intervals per event type collapse into maximal islands. Timestamp
    arithmetic and the running-max window are mirrored exactly in SQL."""
    ev = load(spark, sf_dir, "events")
    secs = (F.lit(60) + (F.col("event_id") % 7) * 600).cast("int")
    iv = ev.select(
        "event_type",
        "event_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr(
            "make_interval(0, 0, 0, 0, 0, 0, 60 + (event_id % 7) * 600)"
        )).alias("iv_end"),
    )
    return rel.merge_intervals(
        iv, ["event_type"], "iv_start", "iv_end", tiebreak_cols=["event_id"]
    )


def q_interval_gaps(spark, sf_dir):
    """Coverage holes between the merged event validity islands (round
    9, rel.interval_gaps) — the downtime report over the exact interval
    set interval_islands merges; gap lengths in whole seconds
    (floor-of-epoch difference, identical on both engines)."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        "event_id",
        F.col("ts").alias("iv_start"),
        (F.col("ts") + F.expr(
            "make_interval(0, 0, 0, 0, 0, 0, 60 + (event_id % 7) * 600)"
        )).alias("iv_end"),
    )
    return rel.interval_gaps(
        iv, ["event_type"], "iv_start", "iv_end", tiebreak_cols=["event_id"]
    )


def q_twap_bars(spark, sf_dir):
    """Time-weighted average value per (event_type, hour) — TWAP, the
    duration-weighted twin of vwap_bars (a tick consumer's other
    standard bar): each observation's value holds from its timestamp to
    the next observation in the bar (the last holds to bar end).
    Weights are EXACT microsecond integers (unix_micros == DuckDB
    epoch_us, probed bit-equal), the weighted sum accumulates in
    DECIMAL(38,6), the division is one double op — oracle-exact. One
    window pass + one grouped aggregation on the same (type, bar)
    partitioning: two shuffles end to end. Round 11: factored into
    rel.twap_bars so the streaming twin pins against the same operator."""
    return rel.twap_bars(load(spark, sf_dir, "events"))


def q_point_in_time_join(spark, sf_dir):
    """Temporal (point-in-time) join: enrich each event with the
    dimension version valid AT ITS TIMESTAMP — the lakehouse-standard
    time-travel join against an SCD2 history (here the history derived
    from the stream itself by scd2_history, so every event lands in
    exactly one validity window; verified by the n_obs == events
    invariant in the oracle comparison). Plan: plain hash/SMJ equi-join
    on the dimension key, the validity containment is a post-join
    filter — fan-out bounded by versions per key, no range machinery
    needed when a natural equi key exists."""
    ev = load(spark, sf_dir, "events")
    hist = rel.scd2_history(
        ev, key_col="user_id", order_cols=["ts", "event_id"],
        attr_cols=["event_type"],
    ).select(
        "user_id",
        F.col("event_type").alias("version_type"),
        "valid_from", "valid_to", "version",
    )
    j = ev.select("event_id", "user_id", "ts").join(hist, "user_id")
    return (
        j.where(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "version_type", "version")
    )
