"""The verification suite: every implemented operator as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB-oracle SQL twin.

Cross-engine determinism rules (each violated rule = a hash mismatch):
- money/metric SUMs accumulate in DECIMAL(38,6) then cast to DOUBLE
  (`relational.dsum`) — double summation order differs between engines;
- every computed column is aliased identically on both sides;
- output types are aligned exactly (Spark size() is INT -> oracle casts
  len() to INTEGER; DuckDB SUM(int) is HUGEINT -> cast to BIGINT);
- no current_date()/now()/rand() — fixed literals only;
- collect_set is canonicalized via array_sort / sorted string_agg.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import (
    asof,
    contract,
    dedup,
    profile,
    registry as R,
    relational as rel,
    similarity,
    sketch,
    text,
    training,
)
from .operators.relational import davg, dsum
from .sources.csv_ingest import line_is_valid
from .tables import (
    DISCOVERED_SQL,
    FS_FILES_SQL,
    REGISTRY_SQL,
    TODAY,
    discovered_candidates,
    fs_files,
    load,
    register_views,
    registry,
)

# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------

_REG = f"WITH registry AS ({REGISTRY_SQL})"
_REG_FS = f"WITH registry AS ({REGISTRY_SQL}), fs AS ({FS_FILES_SQL})"

#: registry event log fixture: initial statuses (seq 0) + one update wave
#: (seq 1) flipping IN_PROGRESS -> FINISHED.
_EVENTS_SQL = f"""
WITH registry AS ({REGISTRY_SQL}),
events AS (
    SELECT filename, create_date, status, 0 AS seq FROM registry
    UNION ALL
    SELECT filename, create_date, 'FINISHED' AS status, 1 AS seq
    FROM registry WHERE status = 'IN_PROGRESS'
)
"""


def _events_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = registry(spark, sf_dir)
    base = reg.withColumn("seq", F.lit(0).cast("int"))
    update = (
        reg.filter(F.col("status") == "IN_PROGRESS")
        .withColumn("status", F.lit("FINISHED"))
        .withColumn("seq", F.lit(1).cast("int"))
    )
    return base.unionByName(update)


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the reference's fact-table volume
    aggregate shape (filter + multi-agg groupBy), exercising O7/O12/O22."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_FLAGSHIP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity)  AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount)  AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# registry / control-plane operators (SURVEY.md §2A)
# --------------------------------------------------------------------------

def q_file_registry_scan(spark, sf_dir):
    return registry(spark, sf_dir)


def q_agg_max_date(spark, sf_dir):
    return R.max_create_date(registry(spark, sf_dir))


def q_dedup_anti_join(spark, sf_dir):
    return R.dedup_new_files(
        discovered_candidates(spark, sf_dir), registry(spark, sf_dir)
    )


def q_filter_status_in(spark, sf_dir):
    return R.filter_status_in(registry(spark, sf_dir), ["DISCOVERED", "DOWNLOADING"])


def q_status_transition_case(spark, sf_dir):
    return R.transition_statuses(registry(spark, sf_dir), TODAY)


def q_status_update_merge(spark, sf_dir):
    return R.current_state(_events_fixture(spark, sf_dir)).select(
        "filename", "create_date", "status"
    )


def q_point_lookup(spark, sf_dir):
    return R.point_lookup(registry(spark, sf_dir), "file_42")


def q_filter_date_eq(spark, sf_dir):
    return R.filter_date_eq(registry(spark, sf_dir), "1997-06-15")


def q_groupby_collect_set(spark, sf_dir):
    return R.files_by_date(registry(spark, sf_dir)).select(
        "create_date", F.concat_ws(",", "filenames").alias("filenames")
    )


def q_registry_fs_inner_join(spark, sf_dir):
    return R.registry_fs_join(fs_files(spark, sf_dir), registry(spark, sf_dir))


def q_sort_by_filename(spark, sf_dir):
    return R.sort_by_filename(registry(spark, sf_dir))


def q_agg_min_max_filtered(spark, sf_dir):
    return R.min_max_finished_dates(registry(spark, sf_dir))


def q_retention_guard(spark, sf_dir):
    return R.retention_guard(registry(spark, sf_dir), TODAY)


def q_agg_count_star(spark, sf_dir):
    return R.count_rows(registry(spark, sf_dir))


def q_csv_validate_filter(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        ",",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.lit("f7"), F.lit("f8"), F.lit("f9"),
    )
    line = F.when(F.col("l_orderkey") % 10 == 0, F.concat(line, F.lit(",zz"))).otherwise(line)
    lines = li.select(line.alias("line"))
    valid = line_is_valid(F.col("line"))
    return lines.agg(
        F.sum(F.when(valid, 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).cast("bigint").alias("n_invalid"),
    )


def q_cleanup_candidates(spark, sf_dir):
    return R.cleanup_candidates(
        fs_files(spark, sf_dir), registry(spark, sf_dir), "1999-01-01"
    )


def q_upload_status_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    parts = li.select(
        F.concat(F.lit("file_"), F.col("l_orderkey").cast("string")).alias("filename"),
        (~((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 11 == 0))).alias("ok"),
    )
    return R.upload_status_rollup(parts)


_REGISTRY_ORACLES = {
    "file_registry_scan": f"{_REG} SELECT filename, create_date, status FROM registry",
    "agg_max_date": f"{_REG} SELECT MAX(create_date) AS max_create_date FROM registry",
    "dedup_anti_join": f"""{_REG}, discovered AS ({DISCOVERED_SQL})
        SELECT d.filename, d.create_date FROM discovered d
        WHERE NOT EXISTS (SELECT 1 FROM registry r WHERE r.filename = d.filename)""",
    "filter_status_in": f"""{_REG} SELECT filename, create_date, status FROM registry
        WHERE status IN ('DISCOVERED','DOWNLOADING')""",
    "status_transition_case": f"""{_REG}
        SELECT filename, create_date,
               CASE WHEN create_date = DATE '{TODAY}' AND status = 'DISCOVERED'
                         THEN 'DOWNLOADING'
                    WHEN create_date < DATE '{TODAY}'
                         AND status IN ('DISCOVERED','DOWNLOADING')
                         THEN 'READY_FOR_PROCESSING'
                    ELSE status END AS status
        FROM registry""",
    "status_update_merge": f"""{_EVENTS_SQL}
        SELECT filename, create_date, status FROM (
            SELECT filename, create_date, status,
                   ROW_NUMBER() OVER (PARTITION BY filename ORDER BY seq DESC) AS rn
            FROM events) WHERE rn = 1""",
    "point_lookup": f"""{_REG} SELECT filename, status FROM registry
        WHERE filename = 'file_42'""",
    "filter_date_eq": f"""{_REG} SELECT filename, create_date, status FROM registry
        WHERE create_date = DATE '1997-06-15'""",
    "groupby_collect_set": f"""{_REG}
        SELECT create_date,
               string_agg(DISTINCT filename, ',' ORDER BY filename) AS filenames
        FROM registry GROUP BY create_date""",
    "registry_fs_inner_join": f"""{_REG_FS}
        SELECT f.create_date, f.filename, r.status
        FROM fs f JOIN registry r
          ON f.filename = r.filename AND f.create_date = r.create_date""",
    "sort_by_filename": f"""{_REG} SELECT filename, create_date, status
        FROM registry ORDER BY filename""",
    "agg_min_max_filtered": f"""{_REG}
        SELECT MIN(create_date) AS min_date, MAX(create_date) AS max_date
        FROM registry WHERE status = 'FINISHED'""",
    "retention_guard": f"""{_REG}
        SELECT MIN(create_date) AS min_date, MAX(create_date) AS max_date,
               (MIN(create_date) = MAX(create_date)
                OR MIN(create_date) = DATE '{TODAY}'
                OR MIN(create_date) + 1 = DATE '{TODAY}')
               AS skip_cleanup
        FROM registry WHERE status = 'FINISHED'""",
    "agg_count_star": f"{_REG} SELECT COUNT(*) AS n FROM registry",
    "csv_validate_filter": """
        WITH lines AS (
            SELECT CASE WHEN l_orderkey % 10 = 0 THEN base || ',zz' ELSE base END AS line
            FROM (SELECT concat_ws(',', CAST(l_orderkey AS VARCHAR),
                         CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
                         CAST(l_linenumber AS VARCHAR), l_returnflag, l_linestatus,
                         'f7', 'f8', 'f9') AS base, l_orderkey
                  FROM lineitem))
        SELECT CAST(SUM(CASE WHEN len(string_split(line, ',')) = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN len(string_split(line, ',')) = 9 THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        FROM lines""",
    "cleanup_candidates": f"""{_REG_FS}
        SELECT f.create_date, f.filename
        FROM fs f JOIN registry r
          ON f.filename = r.filename AND f.create_date = r.create_date
        WHERE r.status = 'FINISHED'
          AND r.create_date < DATE '1999-01-01' - INTERVAL 1 DAY""",
    "upload_status_rollup": """
        SELECT filename,
               CASE WHEN bool_and(ok) THEN 'FINISHED' ELSE 'ERROR' END AS status
        FROM (SELECT 'file_' || CAST(l_orderkey AS VARCHAR) AS filename,
                     NOT (l_linenumber = 1 AND l_orderkey % 11 = 0) AS ok
              FROM lineitem)
        GROUP BY filename""",
}

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
    from .operators import graph

    emb = load(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=3, n_planes=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.pagerank(edges, emb.select("vec_id"), iters=3, id_col="vec_id")


def q_vwap_bars(spark, sf_dir):
    """Volume-weighted average price per (returnflag, ship month) — the
    weighted-mean bar the tick consumers pair with OHLC. Both the weighted
    sum and the weight accumulate in DECIMAL(38,6) (order-independent),
    the division is a single double op — oracle-exact. One shuffle with
    map-side partials."""
    li = load(spark, sf_dir, "lineitem")
    num = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(38,6)")
    ).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
    return li.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("bar_start")
    ).agg(
        F.round(num / den, 6).alias("vwap"),
        rel.dsum("l_quantity").alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


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
    from .functions.scalars import mid_price

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
    from .streaming.stateful import running_totals_batch

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


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape: selective scan-agg (predicate-pushdown showcase)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-10 (join-order showcase)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join through region->nation->cust/supp."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: returned-items revenue by customer, top 20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H adapted suite (reduced schema: no partsupp, no commit/receipt dates,
# no shipmode/container/phone — each query keeps the original's plan shape
# and swaps absent columns for present ones; see docstrings)
# --------------------------------------------------------------------------

def _vol() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _partsupp(spark, sf_dir) -> DataFrame:
    """Deterministic partsupp derivation (the testdata schema omits it):
    4 suppliers per part via modular arithmetic, integer-derived costs and
    quantities — the SAME closed-form formula lives in the q2/q11 oracles,
    so the fixture is cross-engine exact (like range_join's windows)."""
    nsupp = load(spark, sf_dir, "supplier").count()
    return (
        load(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .withColumn("i", F.explode(F.array(*[F.lit(k) for k in range(4)])))
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") + F.col("i") * 7) % nsupp).alias("ps_suppkey"),
            (
                ((F.col("ps_partkey") * 31 + F.col("i") * 17) % 10000)
                / F.lit(100.0)
                + 1.0
            ).alias("ps_supplycost"),
            ((F.col("ps_partkey") * 7 + F.col("i") * 13) % 9999 + 1).alias(
                "ps_availqty"
            ),
        )
    )


_PARTSUPP_SQL = """
    SELECT p_partkey AS ps_partkey,
           (p_partkey + i * 7) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
           ((p_partkey * 31 + i * 17) % 10000) / 100.0 + 1.0 AS ps_supplycost,
           (p_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty
    FROM part CROSS JOIN range(4) t(i)
"""


def q_tpch_q2(spark, sf_dir):
    """Q2 shape: min-cost supplier per part — correlated MIN subquery
    decorrelated into a per-part aggregate + equality join; region gates
    the supplier side."""
    ps = _partsupp(spark, sf_dir)
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = load(spark, sf_dir, "nation")
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    costs = ps.join(eu_supp, ps.ps_suppkey == F.col("s_suppkey")).join(
        part, ps.ps_partkey == part.p_partkey
    )
    min_cost = costs.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        costs.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q11(spark, sf_dir):
    """Q11 shape: stock value per part in one nation with a HAVING scalar
    subquery (global total × fraction) — the threshold becomes a one-row
    broadcast join."""
    ps = _partsupp(spark, sf_dir)
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi"
    ).select("s_suppkey")
    held = ps.join(supp, ps.ps_suppkey == F.col("s_suppkey"))
    value = dsum(F.col("ps_supplycost") * F.col("ps_availqty"))
    per_part = held.groupBy("ps_partkey").agg(value.alias("value"))
    threshold = held.agg((value * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold), F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


def q_tpch_q4(spark, sf_dir):
    """Q4 shape: EXISTS decorrelated to a conditioned left-semi join
    (late-shipping proxy: l_shipdate > o_orderdate replaces the absent
    l_commitdate < l_receiptdate)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q7(spark, sf_dir):
    """Q7 shape: two-nation bilateral volume, nation dims broadcast twice
    under different roles; disjunctive pair predicate after the join."""
    nat = load(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_vol()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q8(spark, sf_dir):
    """Q8 shape: market share — conditional-sum / total-sum ratio per year
    over a 7-table star (region gates the customer side)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = load(spark, sf_dir, "nation")
    cust_nat = nat.join(
        F.broadcast(region), nat.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    supp_nat = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    vol_if = F.when(F.col("supp_nation") == "NATION_5", _vol()).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nat), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg((dsum(vol_if) / dsum(_vol())).alias("mkt_share"))
        .orderBy("o_year")
    )


def q_tpch_q9(spark, sf_dir):
    """Q9 shape: product-line profit by supplier nation x year (profit =
    discounted revenue; ps_supplycost absent from the reduced schema)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(dsum(_vol()).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


def q_tpch_q12(spark, sf_dir):
    """Q12 shape: join + dual conditional counts (priority classes replace
    the absent l_shipmode)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_tpch_q13(spark, sf_dir):
    """Q13 shape: customer order-count distribution — left outer join with
    an extra join-side predicate, then a second aggregation over counts."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q14(spark, sf_dir):
    """Q14 shape: promo revenue percentage — conditional/total decimal-sum
    ratio over one month."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _vol()).otherwise(F.lit(0.0))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        ((F.lit(100.0) * dsum(promo)) / dsum(_vol())).alias("promo_revenue")
    )


def q_tpch_q15(spark, sf_dir):
    """Q15 shape: top supplier — revenue CTE reused for both the join input
    and the scalar MAX (broadcast single-row join replaces the subquery)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(dsum(_vol()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("max_rev"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q16(spark, sf_dir):
    """Q16 shape: supplier-count per part attribute with a NOT-IN exclusion
    (negative-balance suppliers stand in for the complaints filter)."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 27, 33, 40)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q_tpch_q17(spark, sf_dir):
    """Q17 shape: correlated per-part AVG decorrelated into a groupBy +
    self-join (0.5x threshold fits the reduced data's quantity spread)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    parts = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_b = li.join(parts, li.l_partkey == parts.p_partkey).drop("p_partkey")
    thresh = li_b.groupBy("l_partkey").agg(
        (F.lit(0.5) * davg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_b.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


def q_tpch_q18(spark, sf_dir):
    """Q18 shape: large-volume orders — HAVING on a decimal sum, then join
    back to orders/customer, top-100."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 170)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q_tpch_q19(spark, sf_dir):
    """Q19 shape: disjunctive multi-attribute join predicate (brand/size/
    quantity bands replace the absent container/shipmode dims)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 40)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bands)
        .agg(dsum(_vol()).alias("revenue"))
    )


def q_tpch_q20(spark, sf_dir):
    """Q20 shape: nested IN subqueries decorrelated into two semi-joins
    (shipped-quantity threshold replaces the absent partsupp availqty)."""
    red_parts = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualified = (
        li.join(red_parts, li.l_partkey == red_parts.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
    )
    target_nations = load(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 2
    ).select("n_nationkey")
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(target_nations),
              supp.s_nationkey == target_nations.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_tpch_q21(spark, sf_dir):
    """Q21 shape: EXISTS + NOT-EXISTS with inequality correlation — the
    sole-blamed-supplier pattern (l_returnflag='R' is the lateness proxy),
    rewritten scale-safe. The naive form is a pair of inequality-correlated
    self semi/anti joins = three fact-scale shuffles; instead ONE pass
    builds per-(order, supplier) rows, a per-order rollup counts suppliers
    (total + R-flagged), and the EXISTS/NOT-EXISTS pair collapses to the
    filter n_supp >= 2 AND n_rsupp == 1 (the order has other suppliers,
    but every R line belongs to one — the blamed — supplier). The R-line
    candidates then semi-join the qualifying orders on the single key."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_rsupp"),
    )
    f_orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    blamed_orders = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
        .join(f_orders, F.col("l_orderkey") == f_orders.o_orderkey, "left_semi")
        .select("l_orderkey")
    )
    waiting = li.filter(F.col("l_returnflag") == "R").join(
        blamed_orders, "l_orderkey", "left_semi"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


def q_tpch_q22(spark, sf_dir):
    """Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join —
    above-average-balance customers with no recent orders, by nation
    (nation replaces the absent phone country code)."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
        .orderBy("n_name")
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
    ev = load(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            F.col("event_type").alias("series"),
            F.date_trunc("hour", "ts").alias("bar_start"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            dsum("value").alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


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


_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"

_TOKS = "regexp_split_to_array(lower(trim(text, ' ')), '\\s+')"

#: same tokenizer over the boilerplate-cleaned text column (the curation
#: pipeline's downstream stages all run on text_clean)
_TOKS_CLEAN = _TOKS.replace("trim(text, ' ')", "trim(text_clean, ' ')")

_SHINGLES = (
    "CASE WHEN len({t}) < 3 THEN [] "
    "ELSE list_transform(range(1, len({t}) - 1), "
    "i -> array_to_string(list_slice({t}, i, i + 2), ' ')) END"
).format(t=_TOKS)


#: 13-word windows for the substring-dedup approximation (same shape as
#: _SHINGLES at k=13: len-12 windows, empty below 13 tokens)
_SHINGLES13 = (
    "CASE WHEN len({t}) < 13 THEN [] "
    "ELSE list_transform(range(1, len({t}) - 11), "
    "i -> array_to_string(list_slice({t}, i, i + 12), ' ')) END"
).format(t=_TOKS)


#: LSH kNN graph oracle — shared by knn_graph_lsh and pagerank_knn
_KNN_SQL = """
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
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings),
        dots AS (
            SELECT nv.vec_id, pl.p,
                   sum(nv.v[pl.i + 1] * pl.w) AS d
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
            FROM normed nv JOIN buckets bk USING (vec_id)),
        pairs AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                   round(list_sum(list_transform(range(1, len(a.v) + 1),
                         i -> a.v[i] * b.v[i])) / (a.n * b.n), 6) AS score
            FROM bv a JOIN bv b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        SELECT vec_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, neighbor_id) AS rn FROM pairs)
        WHERE rn <= 3"""


def _pagerank_sql(iters: int = 3) -> str:
    """Chained-CTE mirror of graph.pagerank over the LSH kNN edge set:
    same teleport/damping literals, same DECIMAL(38,18) contribution
    accumulation, one CTE per power iteration."""
    step = """it{i} AS (
        SELECT ids.id,
               CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0.0 AS DOUBLE))
                   AS pr
        FROM ids LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(38,18))) AS DOUBLE)
                       AS s
            FROM edges e JOIN {prev} p ON e.src = p.id
                         JOIN deg d ON e.src = d.src
            GROUP BY e.dst) s ON ids.id = s.id)"""
    its, prev = [], "pr0"
    for i in range(1, iters + 1):
        its.append(step.format(i=i, prev=prev))
        prev = f"it{i}"
    return f"""
        WITH knn AS ({_KNN_SQL}),
        edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        ids AS (SELECT vec_id AS id FROM embeddings),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
        pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr
                FROM ids),
        {', '.join(its)}
        SELECT id AS vec_id, round(pr, 9) AS pagerank FROM {prev}"""


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
               round({_DSUM.format(x='l_extendedprice * l_quantity')}
                     / {_DSUM.format(x='l_quantity')}, 6) AS vwap,
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
    "dedup_embedding_cosine": """
        WITH normed AS (
            SELECT vec_id,
                   embedding AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(range(1, len(a.v) + 1),
                     i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                     / (a.n * b.n), 6) AS score
        FROM normed a JOIN normed b ON a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(range(1, len(a.v) + 1),
                    i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                    / (a.n * b.n), 6) >= 0.4""",
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
               round(list_sum(list_transform(range(1, len(a.v) + 1),
                     i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                     / (a.n * b.n), 6) AS score
        FROM bv a JOIN bv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_sum(list_transform(range(1, len(a.v) + 1),
                    i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                    / (a.n * b.n), 6) >= 0.4""",
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
            WHERE round(list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * b.v[i])) / (a.n * b.n), 6) >= 0.35)
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

_DAVG = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"

_TPCH_ORACLES = {
    "tpch_q2": f"""
        WITH partsupp AS ({_PARTSUPP_SQL}),
        eu_supp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                  WHERE r_name = 'EUROPE')),
        costs AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                   ps_partkey, ps_supplycost
            FROM partsupp JOIN eu_supp ON ps_suppkey = s_suppkey
                 JOIN part ON ps_partkey = p_partkey
            WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        FROM costs c
        WHERE ps_supplycost = (SELECT MIN(ps_supplycost) FROM costs c2
                               WHERE c2.ps_partkey = c.ps_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "tpch_q11": f"""
        WITH partsupp AS ({_PARTSUPP_SQL}),
        held AS (
            SELECT ps_partkey, ps_supplycost, ps_availqty
            FROM partsupp
            WHERE ps_suppkey IN (
                SELECT s_suppkey FROM supplier JOIN nation
                    ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'))
        SELECT ps_partkey,
               {_DSUM.format(x='ps_supplycost * ps_availqty')} AS value
        FROM held GROUP BY ps_partkey
        HAVING {_DSUM.format(x='ps_supplycost * ps_availqty')} >
               (SELECT {_DSUM.format(x='ps_supplycost * ps_availqty')} * 0.001
                FROM held)
        ORDER BY value DESC, ps_partkey""",
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q7": f"""
        SELECT supp_nation, cust_nation, l_year,
               {_DSUM.format(x='volume')} AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS INTEGER) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                            JOIN orders ON o_orderkey = l_orderkey
                            JOIN customer ON c_custkey = o_custkey
                            JOIN nation n1 ON s_nationkey = n1.n_nationkey
                            JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                  OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01') shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""",
    "tpch_q8": f"""
        SELECT o_year,
               {_DSUM.format(x="CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END")}
               / {_DSUM.format(x='volume')} AS mkt_share
        FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS supp_nation
              FROM part JOIN lineitem ON p_partkey = l_partkey
                        JOIN supplier ON s_suppkey = l_suppkey
                        JOIN orders ON o_orderkey = l_orderkey
                        JOIN customer ON c_custkey = o_custkey
                        JOIN nation n1 ON c_nationkey = n1.n_nationkey
                        JOIN region ON n1.n_regionkey = r_regionkey
                        JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'ASIA' AND p_type = 'PROMO'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
        GROUP BY o_year ORDER BY o_year""",
    "tpch_q9": f"""
        SELECT nation, o_year, {_DSUM.format(x='volume')} AS sum_profit
        FROM (SELECT n_name AS nation,
                     CAST(year(o_orderdate) AS INTEGER) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM part JOIN lineitem ON p_partkey = l_partkey
                        JOIN supplier ON s_suppkey = l_suppkey
                        JOIN orders ON o_orderkey = l_orderkey
                        JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%gear%') profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC""",
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag""",
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "tpch_q14": f"""
        SELECT 100.0 * {_DSUM.format(
            x="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
               / {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'""",
    "tpch_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey""",
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 9, 14, 20, 27, 33, 40)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q17": f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.5 * ({_DAVG.format(x='l2.l_quantity')})
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "tpch_q18": f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM (SELECT l_orderkey, {_DSUM.format(x='l_quantity')} AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING {_DSUM.format(x='l_quantity')} > 170) big
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "tpch_q19": f"""
        SELECT {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
               AND l_quantity BETWEEN 20 AND 40)""",
    "tpch_q20": f"""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING {_DSUM.format(x='l_quantity')} > 400)
          AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        ORDER BY s_suppkey""",
    "tpch_q21": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
    "tpch_q22": f"""
        SELECT n_name, COUNT(*) AS numcust,
               {_DSUM.format(x='c_acctbal')} AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT {_DAVG.format(x='c2.c_acctbal')}
                           FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY n_name ORDER BY n_name""",
}

# --------------------------------------------------------------------------
# LLM-pipeline EXT: dedup / similarity / text
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(load(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(load(spark, sf_dir, "documents"))


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS, not pairs: connected components over the
    MinHash-LSH candidate graph (min-label propagation; oracle = recursive
    CTE over the identical pair SQL). Every doc gets a cluster_id = min
    doc_id reachable; singletons are their own cluster."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    return dedup.connected_components(pairs, docs.select("doc_id"))


def q_dedup_canonical_docs(spark, sf_dir):
    """The deduplicated corpus: one representative per near-dup cluster
    (the min-id member IS the canonical doc, so the filter is a plan-local
    predicate on the clusters output — no extra join)."""
    clusters = q_dedup_clusters(spark, sf_dir)
    return clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact shingle-Jaccard verify over the MinHash-LSH candidate set —
    the classic two-stage near-dup pipeline (candidates O(collisions), not
    O(n²): no crossJoin anywhere in the plan). The candidate set is
    materialized once (localCheckpoint): the verify stage references it
    twice (id pruning + the pair join), and without materialization each
    reference re-runs the whole MinHash pipeline — at 100 TB the two
    phases would be separate jobs with the candidates persisted between
    them, which this mirrors in-session."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).localCheckpoint()
    return dedup.ngram_jaccard(docs, pairs).filter(F.col("jaccard") > 0.2)


def q_dedup_containment(spark, sf_dir):
    """Asymmetric containment verify over the MinHash-LSH candidate set:
    |A∩B|/|A| and |A∩B|/|B| — flags excerpt/quote containment that
    symmetric Jaccard misses. Same two-stage shape as the Jaccard verify
    (candidates O(collisions), docs pruned before shingling)."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).localCheckpoint()
    return dedup.ngram_containment(docs, pairs)


def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: distinct contents shared by each
    source pair — the dataset-card number that tells you two crawl
    sources overlap before you mix them. Uses the order-insensitive
    bag-of-words fingerprint (doc_fingerprints' bag_fp): re-ordered copies
    across crawls are exactly the near-dup class this report exists to
    catch (exact-fingerprint overlap is the stricter subset).
    Fingerprints-only shuffle (32-byte digests), self equi-join."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    docs = load(spark, sf_dir, "documents")
    fps = docs.select(
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
        ).alias("fingerprint"),
        "source",
    ).distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.countDistinct("a.fingerprint").alias("n_shared"))
    )


def q_dedup_simhash(spark, sf_dir):
    return dedup.simhash(load(spark, sf_dir, "documents"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """Pigeonhole-blocked simhash near-dup pairs. Oracle-exact: the result
    (all pairs at hamming <= 3) is blocking-independent, so the SQL twin
    verifies it with a plain all-pairs filter over the same simhash
    values."""
    return dedup.simhash_near_dups(load(spark, sf_dir, "documents"), max_hamming=3)


def _query_vector(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


def q_sim_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _query_vector(spark, sf_dir), k=10)


def q_sim_cosine_topk_lsh(spark, sf_dir):
    """Oracle-verified ANN: the DuckDB twin replicates the md5-derived
    hyperplanes and the query's sign bucket, so the hash check covers the
    bucket-restricted top-k semantics exactly (recall < 1 included)."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk_lsh(emb, _query_vector(spark, sf_dir), k=10)


def q_dedup_embedding_lsh(spark, sf_dir):
    """Oracle-verified: the DuckDB twin replicates the deterministic
    md5-derived hyperplanes and sign buckets, so the hash check covers the
    bucketed candidate semantics themselves (including sub-1.0 recall),
    not just a superset."""
    emb = load(spark, sf_dir, "embeddings")
    # n_planes pinned so the DuckDB twin's replicated hyperplanes match;
    # production callers omit it and get the auto_planes corpus-size dial
    return similarity.embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4)


def q_dedup_embedding_clusters(spark, sf_dir):
    """Embedding-level duplicate CLUSTERS: connected components over the
    block-partitioned exact near-dup pair graph (cosine >= 0.4). Same
    min-label propagation operator as the MinHash document clusters —
    every vector gets cluster_id = min vec_id reachable; oracle is a
    recursive CTE over the identical pair SQL."""
    emb = load(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_near_dups(emb, threshold=0.4)
    return dedup.connected_components(
        pairs, emb.select("vec_id"), node_col="vec_id"
    )


def q_sim_cosine_topk_ivf(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(emb, _query_vector(spark, sf_dir), k=10, nprobe=4)


def q_text_decontaminate(spark, sf_dir):
    """Pre-training decontamination against a held-out benchmark split
    (every 50th doc is the deterministic eval set): per training doc, the
    count of distinct shared 5-grams + the drop flag. Broadcast of the tiny
    benchmark gram set — the corpus side never shuffles bodies."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return text.decontaminate(train, bench, n=5)


def q_text_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-3 TF-IDF terms (smoothed idf, rounded-before-rank so
    tie order is engine-exact)."""
    return text.tf_idf_top_terms(load(spark, sf_dir, "documents"), k=3)


def q_text_stats(spark, sf_dir):
    return text.text_stats(load(spark, sf_dir, "documents"))


def q_text_quality(spark, sf_dir):
    return text.quality_score(load(spark, sf_dir, "documents"))


def q_lang_id(spark, sf_dir):
    return text.lang_id(load(spark, sf_dir, "documents"))


def q_token_count(spark, sf_dir):
    return text.token_counts(load(spark, sf_dir, "documents"))


def q_doc_fingerprint(spark, sf_dir):
    return text.doc_fingerprints(load(spark, sf_dir, "documents"))


def q_text_chunking(spark, sf_dir):
    return text.chunk_documents(load(spark, sf_dir, "documents"))


def q_text_redact_pii(spark, sf_dir):
    return text.redact_pii(load(spark, sf_dir, "documents"))


def q_text_top_terms(spark, sf_dir):
    return text.corpus_term_frequencies(load(spark, sf_dir, "documents"))


def q_lang_id_trigram(spark, sf_dir):
    return text.lang_id_trigram(load(spark, sf_dir, "documents"))


def q_text_gopher_quality(spark, sf_dir):
    return text.gopher_quality_flags(load(spark, sf_dir, "documents"))


def q_text_repetition(spark, sf_dir):
    return text.repetition_stats(load(spark, sf_dir, "documents"), n=2)


def q_train_val_split(spark, sf_dir):
    """Stable train/val/test assignment: membership is a pure function of
    doc_id (multiplicative hash), so growing the corpus never moves an
    existing doc between splits. Scan-local — no shuffle, no state."""
    return training.train_val_test_split(
        load(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", "split")


def q_pack_sequences(spark, sf_dir):
    """Segment packing of docs into fixed 8192-char budget bins per source
    (n_chars as the token proxy; token_counts feeds the real pipeline).
    One window cumsum per source partition — fully data-parallel."""
    return training.pack_sequences(
        load(spark, sf_dir, "documents"),
        budget=8192,
        tokens_col="n_chars",
        id_col="doc_id",
        group_col="source",
    )


def q_corpus_mix(spark, sf_dir):
    """Deterministic per-source corpus rebalance: the oracle-exact twin of
    `sample_stratified` (hash-gated membership instead of Bernoulli draws —
    same rates, reproducible across engines and runs)."""
    return training.mix_corpora(
        load(spark, sf_dir, "documents"),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
    ).select("doc_id", "source")


def q_corpus_mix_upsampled(spark, sf_dir):
    """Mixing with upsampling: src0 at 2.5x (2 copies + hash-gated 50%),
    src1 kept, src2 quarter-sampled — expected copies == weight,
    deterministic, scan-local explode."""
    return training.mix_corpora_upsampled(
        load(spark, sf_dir, "documents"),
        {"src0": 2.5, "src1": 1.0, "src2": 0.25},
    ).select("doc_id", "source", "copy_id")


def q_sample_stratified(spark, sf_dir):
    """Per-source corpus rebalance via the SEEDED id-hash gate —
    oracle-exact (the gate is plain integer arithmetic, reproduced
    term-for-term in the DuckDB twin), deterministic across runs, and a
    different seed draws a different sample."""
    docs = load(spark, sf_dir, "documents")
    fractions = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    return rel.sample_stratified(docs, "source", fractions, seed=42).select(
        "doc_id", "source"
    )


def q_corpus_curation_pipeline(spark, sf_dir):
    """The curation-side flagship, composing this round's operators as ONE
    declarative plan: line-level boilerplate removal (in-order rebuild) ->
    drop emptied docs -> per-source top-50% quality gate (exact
    percent_rank over the CLEANED text) -> exact dedup on cleaned content
    (keep lowest doc_id) -> per-source token-budget fill. Every stage is
    an independently-oracled operator; this verifies the composition.
    Scale shape: one line-hash agg + broadcast anti-join, two per-source
    window exchanges (rank + cumsum), one fingerprint groupBy, two
    semi-joins on doc_id — no collect, no crossJoin, no Python."""
    docs = load(spark, sf_dir, "documents")
    cleaned = dedup.remove_boilerplate_lines(docs, max_doc_freq=2)
    # materialize the cleaned corpus once: quality features, the rank
    # join, and the dedup fingerprints all re-read it, and each reference
    # would otherwise re-run the whole line-explode + string_agg rebuild
    alive = (
        cleaned.filter(F.col("text_clean") != "")
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "text_clean",
            F.length("text_clean").alias("n_chars_clean"),
        )
        .localCheckpoint()
    )
    scored = text.quality_score(
        alive.select("doc_id", F.col("text_clean").alias("text"))
    )
    gated = training.select_top_quality_percent(
        scored.join(alive, "doc_id"), frac=0.5
    )
    keep = (
        dedup.exact_dedup(
            gated.select("doc_id", F.col("text_clean").alias("text"))
        )
        .select(F.col("keep_id").alias("doc_id"))
    )
    survivors = gated.join(keep, "doc_id", "left_semi")
    return training.token_budget_fill(
        survivors.select("doc_id", "source", "n_chars_clean"),
        budget=5_000,
        tokens_col="n_chars_clean",
    ).select("doc_id", "source", "n_chars_clean", "cum_before")


def q_training_set_pipeline(spark, sf_dir):
    """The LLM-side flagship: full training-set assembly as ONE declarative
    plan — Gopher quality gate -> exact dedup (keep lowest doc_id) ->
    whitespace token counts -> stable train/val/test split (hash of
    doc_id) -> per-split sequence packing (window cumsum, budget 8192).
    Every stage is an independently-oracled operator; this verifies the
    composition end-to-end. Scale shape: two semi-joins on doc_id + one
    fingerprint groupBy + windows partitioned by (split, id-range shard)
    — `shard_docs` bounds every window partition to 200 docs, so packing
    parallelism scales with the corpus instead of collapsing to the 3
    split values; no collect, no crossJoin, no Python."""
    docs = load(spark, sf_dir, "documents")
    passed = docs.join(
        text.gopher_quality_flags(docs)
        .filter(F.col("passes_gopher"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    keep = (
        text.doc_fingerprints(passed)
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = passed.join(keep, "doc_id", "left_semi")
    toks = text.token_counts(kept).select("doc_id", "ws_tokens")
    split = training.train_val_test_split(toks, "doc_id").select(
        "doc_id", "ws_tokens", "split"
    )
    return training.pack_sequences(
        split,
        budget=8192,
        tokens_col="ws_tokens",
        id_col="doc_id",
        group_col="split",
        shard_docs=200,
    ).select("doc_id", "split", "ws_tokens", "bin_id", "bin_offset")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (cluster-then-compare): deterministic k-means quantizer ->
    intra-cluster cosine pairs -> flag the higher id of every pair >= 0.35.
    The O(n²) pair stage is confined to per-cluster equi-join partitions —
    the published recipe for semantic dedup at corpus scale."""
    return similarity.semantic_dedup(
        load(spark, sf_dir, "embeddings"), threshold=0.35, k_centroids=8
    )


def q_knn_graph_lsh(spark, sf_dir):
    """Approximate k-NN graph (top-3 cosine neighbors per vector) with
    candidates restricted to sign-LSH buckets — the input artifact for
    graph-based clustering/label-propagation over a corpus. The oracle
    replicates the deterministic hyperplanes, so recall behavior itself is
    value-verified, not just the exact-scoring stage."""
    return similarity.knn_graph(
        load(spark, sf_dir, "embeddings"), k=3, n_planes=4
    )


def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup: a 'new crawl' batch (doc_id % 10 < 2) collapsed
    within-batch then anti-joined against the existing corpus fingerprint
    index — the production shape where the corpus is never re-read."""
    docs = load(spark, sf_dir, "documents")
    return dedup.incremental_dedup(
        docs.filter(F.col("doc_id") % 10 < 2),
        docs.filter(F.col("doc_id") % 10 >= 2),
    )


def q_quality_classifier(spark, sf_dir):
    """Classifier-style quality gate: fixed linear model over the
    text_stats feature block, softsign squash (transcendental-free, so
    bit-identical across engines), keep = score >= 0.5."""
    return text.quality_classifier(load(spark, sf_dir, "documents"))


def q_corpus_report(spark, sf_dir):
    """Dataset-card rollup per (source, lang): docs/tokens/chars, distinct
    contents, exact-duplicate rate. Integer sums + one division only."""
    return training.corpus_report(load(spark, sf_dir, "documents"))


def q_events_zscore(spark, sf_dir):
    """Per-type z-score outlier flags from exact decimal moments — the
    distributional validation gate over the events stream."""
    return rel.zscore_outliers(load(spark, sf_dir, "events"))


def q_win_cume_ntile(spark, sf_dir):
    """Distribution-rank window suite: ntile/cume_dist/percent_rank over a
    tie-free (value, event_id) order within each event type."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def q_dedup_ngram_spans(spark, sf_dir):
    """Cross-document repeated 13-gram detection — the n-gram-granular
    approximation of exact substring dedup (Lee et al. 2022 / RefinedWeb).
    Exploded window hashes + two fingerprint-keyed aggregations; the
    irreducible shuffle is md5-per-window, never document bodies."""
    return dedup.duplicated_ngram_spans(load(spark, sf_dir, "documents"), n=13)


def q_dedup_ngram_spans_sampled(spark, sf_dir):
    """The 100-TB fallback for dedup_ngram_spans as code, not a docstring:
    gram-hash-gated 25% sample of the window space. Gating on the gram's
    own hash keeps all occurrences of a kept gram together, so the
    cross-document test stays exact within the sample and the md5-window
    shuffle shrinks to `rate` of the token volume. Deterministic ->
    oracle-exact."""
    return dedup.duplicated_ngram_spans_sampled(
        load(spark, sf_dir, "documents"), n=13, rate=0.25
    )


def q_dedup_boilerplate_lines(spark, sf_dir):
    """Line-level boilerplate removal (CCNet/RefinedWeb recipe): lines in
    more than 2 distinct documents are dropped everywhere and documents
    are rebuilt in line order — on the single-line fixture corpus this
    empties exact-duplicate cliques of size > 2, leaving unique and
    lightly-duplicated docs intact."""
    return dedup.remove_boilerplate_lines(
        load(spark, sf_dir, "documents"), max_doc_freq=2
    )


def q_udtf_charge_legs(spark, sf_dir):
    """Python UDTF in a LATERAL join (the §2B UDF/UDAF/UDTF surface's
    table-function leg): each lineitem expands to its three charge
    components. Rounding happens in engine SQL (HALF_UP both sides);
    the UDTF emits raw IEEE doubles mirroring the oracle's op order."""
    from .functions.scalars import ChargeLegsUDTF

    spark.udtf.register("charge_legs", ChargeLegsUDTF)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_udtf")
    return spark.sql("""
        SELECT l.l_orderkey, l.l_linenumber, legs.component,
               round(legs.amount, 6) AS amount
        FROM _li_udtf AS l,
        LATERAL charge_legs(l.l_extendedprice, l.l_discount, l.l_tax) AS legs
    """)


def q_quality_percentile_gate(spark, sf_dir):
    """Per-source top-50% quality selection via exact percent_rank — the
    drift-free version of an absolute score threshold. Composes the
    quality scorer with the training-side gate."""
    docs = load(spark, sf_dir, "documents")
    scored = text.quality_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return training.select_top_quality_percent(scored, frac=0.5).select(
        "doc_id", "source", "quality", "pct_rank"
    )


def q_corpus_token_budget(spark, sf_dir):
    """Per-source 'fill until full' token-budget selection: window cumsum
    in deterministic id order, keep while the running total before the doc
    is under budget."""
    return training.token_budget_fill(
        load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars"),
        budget=5_000,
    )


def q_docs_prep_pipeline(spark, sf_dir):
    """End-to-end pretraining data prep as ONE composed plan: Gopher
    quality gate -> exact dedup on content fingerprint (keep lowest doc_id)
    -> chunk -> per-doc rollup (chunk + token counts). Each stage is an
    independently-oracled operator; this query verifies they compose."""
    docs = load(spark, sf_dir, "documents")
    passed = docs.join(
        text.gopher_quality_flags(docs)
        .filter(F.col("passes_gopher"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    keep = (
        text.doc_fingerprints(passed)
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = passed.join(keep, "doc_id", "left_semi")
    n_chunks = (
        text.chunk_documents(kept, chunk_tokens=64, overlap=16)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    return (
        n_chunks.join(text.token_counts(kept), "doc_id")
        .select("doc_id", "n_chunks", "ws_tokens", "bpe_tokens")
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing end-to-end: binary payloads derived
    deterministically from documents, decoded via the mapInPandas stub,
    features fed to the similarity operators' schema. Codecs are fakes
    (none installed); the Spark path — schema, Arrow batches, partitioning
    — is the real thing. ORACLE-EXACT: the payload is the UTF-8 bytes of
    md5(text), so the fake's md5(payload)-derived features are
    md5(md5(text)) — expressible in DuckDB byte-for-byte (its md5() takes
    VARCHAR only, which is why the payload is hex TEXT bytes, not raw
    digest bytes)."""
    from .operators.multimodal import decode_and_featurize

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.md5("text"), "UTF-8").alias("payload"),
        F.lit("image/png").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return decode_and_featurize(media, fake=True).select(
        "media_id",
        "kind",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias(
            "feature_sum"
        ),
        "decode_ok",
    )




def _minhash_sql(num_hashes: int = 8, bands: int = 4) -> tuple[str, str, str]:
    """Returns (full pair query, CTE body, final select) so the clusters
    oracle can splice the pair pipeline into a recursive-closure query."""
    rows = num_hashes // bands
    # mirror of dedup._shingle_base_hash/_mh_params: one md5 per shingle
    # folded to 32 bits mod p, then k linear permutations — the '0x'||hex
    # cast is DuckDB's portable hex->int
    p = dedup._MH_P
    base = f"(('0x'||substr(md5(s),1,8))::BIGINT % {p})"
    sig_exprs = ", ".join(
        "list_min(list_transform(sh, s -> ({a} * {base} + {b}) % {p})) AS h{i}".format(
            a=dedup._mh_params(i)[0], b=dedup._mh_params(i)[1],
            base=base, p=p, i=i,
        )
        for i in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(concat_ws('|', '{b}', {hs})) AS band_{b}".format(
            b=b, hs=", ".join(f"h{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc, '{b}' AS band, band_{b} AS band_hash FROM banded"
        for b in range(bands)
    )
    ctes = f"""sh AS (SELECT doc_id AS doc, {_SHINGLES} AS sh FROM documents
                    WHERE len({_SHINGLES}) > 0),
        sig AS (SELECT doc, {sig_exprs} FROM sh),
        banded AS (SELECT doc, {band_exprs} FROM sig),
        buckets AS ({band_union})"""
    select = """
        SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc < b.doc"""
    return f"WITH {ctes} {select}", ctes, select


_LLM_ORACLES = {
    "dedup_exact": f"""
        SELECT md5(array_to_string({_TOKS}, ' ')) AS fingerprint,
               MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        FROM documents GROUP BY 1""",
    "dedup_ngram_spans": f"""
        WITH t AS (SELECT doc_id, {_SHINGLES13} AS sh FROM documents),
        g0 AS (SELECT doc_id, unnest(sh) AS gram FROM t),
        g AS (SELECT doc_id, md5(gram) AS gh FROM g0),
        crossdoc AS (
            SELECT gh FROM g GROUP BY gh
            HAVING count(DISTINCT doc_id) > 1),
        perdoc AS (
            SELECT doc_id, count(*) AS ndw
            FROM g JOIN crossdoc USING (gh) GROUP BY doc_id),
        tot AS (SELECT doc_id, CAST(len(sh) AS INTEGER) AS n_windows FROM t)
        SELECT tot.doc_id, n_windows,
               CAST(coalesce(ndw, 0) AS INTEGER) AS n_dup_windows,
               CASE WHEN n_windows > 0
                    THEN CAST(coalesce(ndw, 0) AS DOUBLE) / n_windows
                    ELSE 0.0 END AS dup_window_ratio
        FROM tot LEFT JOIN perdoc USING (doc_id)""",
    # The curation flagship: every stage's CTE is lifted verbatim from its
    # standalone oracle (boilerplate lines -> quality formula over
    # text_clean -> percent_rank gate -> min-id dedup -> budget cumsum).
    "corpus_curation_pipeline": f"""
        WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        l AS (
            SELECT doc_id, i AS pos, ls[i] AS ln
            FROM t, unnest(range(1, len(ls) + 1)) AS u(i)),
        boiler AS (
            SELECT md5(ln) AS lh FROM l GROUP BY 1
            HAVING count(DISTINCT doc_id) > 2),
        kept_l AS (
            SELECT doc_id, pos, ln FROM l
            WHERE md5(ln) NOT IN (SELECT lh FROM boiler)),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(ln, chr(10) ORDER BY pos) AS text_clean
            FROM kept_l GROUP BY doc_id),
        alive AS (
            SELECT r.doc_id, d.source, r.text_clean,
                   CAST(length(r.text_clean) AS INTEGER) AS n_chars_clean
            FROM rebuilt r JOIN documents d USING (doc_id)
            WHERE r.text_clean <> ''),
        s AS (
            SELECT doc_id,
                   len({_TOKS_CLEAN}) AS n_tokens,
                   len(list_distinct({_TOKS_CLEAN})) AS n_distinct_tokens,
                   CAST(len(list_filter({_TOKS_CLEAN},
                        t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
                       / len({_TOKS_CLEAN}) AS stopword_ratio
            FROM alive),
        q AS (
            SELECT doc_id,
                   round(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END
                         + (CAST(n_distinct_tokens AS DOUBLE) / n_tokens) * 0.3
                         + least(stopword_ratio * 3.0, 1.0) * 0.3, 6) AS quality
            FROM s),
        r AS (
            SELECT a.doc_id, a.source, a.text_clean, a.n_chars_clean,
                   round(percent_rank() OVER (
                       PARTITION BY a.source
                       ORDER BY q.quality DESC, q.doc_id ASC), 6) AS pr
            FROM q JOIN alive a USING (doc_id)),
        g AS (SELECT * FROM r WHERE pr <= 0.5),
        grp AS (
            SELECT MIN(doc_id) AS keep_id
            FROM (SELECT doc_id,
                         md5(array_to_string({_TOKS_CLEAN}, ' ')) AS fp
                  FROM g)
            GROUP BY fp),
        surv AS (
            SELECT doc_id, source, n_chars_clean FROM g
            WHERE doc_id IN (SELECT keep_id FROM grp))
        SELECT doc_id, source, n_chars_clean, cum_before
        FROM (
            SELECT doc_id, source, n_chars_clean,
                   CAST(coalesce(SUM(n_chars_clean) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM surv)
        WHERE cum_before < 5000""",
    # Line-level boilerplate removal; chr(10) split mirrors Spark's
    # split(text, '\\n'), string_agg(... ORDER BY pos) mirrors the
    # array_sort(collect_list(struct(pos, line))) rebuild.
    "dedup_boilerplate_lines": """
        WITH t AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
        l AS (
            SELECT doc_id, i AS pos, ls[i] AS ln
            FROM t, unnest(range(1, len(ls) + 1)) AS u(i)),
        boiler AS (
            SELECT md5(ln) AS lh FROM l GROUP BY 1
            HAVING count(DISTINCT doc_id) > 2),
        kept AS (
            SELECT doc_id, pos, ln FROM l
            WHERE md5(ln) NOT IN (SELECT lh FROM boiler)),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(ln, chr(10) ORDER BY pos) AS text_clean,
                   CAST(count(*) AS INTEGER) AS n_kept
            FROM kept GROUP BY doc_id),
        tot AS (
            SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lines
            FROM l GROUP BY doc_id)
        SELECT tot.doc_id,
               coalesce(text_clean, '') AS text_clean,
               n_lines,
               CAST(n_lines - coalesce(n_kept, 0) AS INTEGER) AS n_removed
        FROM tot LEFT JOIN rebuilt USING (doc_id)""",
    "dedup_ngram_spans_sampled": f"""
        WITH t AS (SELECT doc_id, {_SHINGLES13} AS sh FROM documents),
        g0 AS (SELECT doc_id, unnest(sh) AS gram FROM t),
        g1 AS (SELECT doc_id, md5(gram) AS gh FROM g0),
        g AS (SELECT doc_id, gh FROM g1
              WHERE CAST(('0x' || substr(gh, 1, 8)) AS BIGINT) % 1000 < 250),
        crossdoc AS (
            SELECT gh FROM g GROUP BY gh
            HAVING count(DISTINCT doc_id) > 1),
        perdoc AS (
            SELECT doc_id, count(*) AS ndw
            FROM g JOIN crossdoc USING (gh) GROUP BY doc_id),
        tot AS (
            SELECT d.doc_id,
                   CAST(coalesce(s.nw, 0) AS INTEGER) AS n_windows_sampled
            FROM documents d
            LEFT JOIN (SELECT doc_id, count(*) AS nw FROM g GROUP BY doc_id)
                s USING (doc_id))
        SELECT tot.doc_id, n_windows_sampled,
               CAST(coalesce(ndw, 0) AS INTEGER) AS n_dup_windows_sampled,
               CASE WHEN n_windows_sampled > 0
                    THEN CAST(coalesce(ndw, 0) AS DOUBLE) / n_windows_sampled
                    ELSE 0.0 END AS dup_window_ratio_est
        FROM tot LEFT JOIN perdoc USING (doc_id)""",
    "dedup_incremental": f"""
        WITH fresh AS (
            SELECT md5(array_to_string({_TOKS}, ' ')) AS fingerprint,
                   MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
            FROM documents WHERE doc_id % 10 < 2 GROUP BY 1),
        idx AS (
            SELECT DISTINCT md5(array_to_string({_TOKS}, ' ')) AS fingerprint
            FROM documents WHERE doc_id % 10 >= 2)
        SELECT f.fingerprint, f.keep_id, f.n_docs
        FROM fresh f ANTI JOIN idx i ON f.fingerprint = i.fingerprint""",
    # Mirrors text.quality_classifier: same feature block as text_stats,
    # same term order in z (float addition is order-sensitive), softsign
    # squash — only +,*,/,abs,sqrt, all IEEE-identical across engines.
    "quality_classifier": f"""
        WITH s AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   len(list_distinct({_TOKS})) AS n_distinct_tokens,
                   CAST(length(regexp_replace(lower(trim(text, ' ')), '\\s+', '', 'g')) AS DOUBLE)
                       / len({_TOKS}) AS avg_token_len,
                   CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
                       / len({_TOKS}) AS stopword_ratio
            FROM documents),
        z AS (
            SELECT doc_id,
                   -1.0 + 0.12 * sqrt(CAST(n_tokens AS DOUBLE))
                        + 6.0 * stopword_ratio
                        + 1.5 * (CAST(n_distinct_tokens AS DOUBLE) / n_tokens)
                        + -0.35 * avg_token_len AS z
            FROM s)
        SELECT doc_id,
               round(0.5 * (1.0 + z / (1.0 + abs(z))), 6) AS lm_quality,
               z >= 0 AS keep
        FROM z""",
    "corpus_report": f"""
        WITH base AS (
            SELECT source, lang,
                   len({_TOKS}) AS n_tok,
                   length(text) AS n_chars,
                   md5(array_to_string({_TOKS}, ' ')) AS fingerprint
            FROM documents)
        SELECT source, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               COUNT(DISTINCT fingerprint) AS n_unique_docs,
               round(1.0 - CAST(COUNT(DISTINCT fingerprint) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
        FROM base GROUP BY source, lang""",
    # Exact-decimal group moments (the agg_stats trick) broadcast back onto
    # the scan; z/flag formulas identical term-for-term to rel.zscore_outliers.
    "events_zscore": """
        WITH st AS (
            SELECT event_type,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv,
                   CAST(SUM(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS ssq,
                   COUNT(value) AS n
            FROM events GROUP BY event_type),
        m AS (
            SELECT event_type, sv / n AS mean,
                   CASE WHEN n > 1
                        THEN sqrt((ssq - sv * sv / n) / (n - 1)) END AS std
            FROM st)
        SELECT e.event_id, e.event_type, e.value,
               CASE WHEN std > 0
                    THEN round((e.value - mean) / std, 6) END AS z,
               coalesce(CASE WHEN std > 0
                             THEN abs(round((e.value - mean) / std, 6)) >= 2.5
                        END, false) AS is_outlier
        FROM events e JOIN m USING (event_type)""",
    "win_cume_ntile": """
        SELECT event_id, event_type,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               round(cume_dist() OVER w, 6) AS cume,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""",
    "dedup_minhash_lsh": _minhash_sql()[0],
    "dedup_clusters": f"""
        WITH RECURSIVE {_minhash_sql()[1]},
        pairs AS ({_minhash_sql()[2]}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT reach.node, edges.dst FROM reach JOIN edges
              ON reach.r = edges.src)
        SELECT node AS doc_id, MIN(r) AS cluster_id
        FROM reach GROUP BY node""",
    "dedup_canonical_docs": f"""
        WITH RECURSIVE {_minhash_sql()[1]},
        pairs AS ({_minhash_sql()[2]}),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT reach.node, edges.dst FROM reach JOIN edges
              ON reach.r = edges.src)
        SELECT node AS doc_id
        FROM reach GROUP BY node HAVING node = MIN(r)""",
    "dedup_ngram_jaccard": f"""
        WITH {_minhash_sql()[1]},
        pairs AS ({_minhash_sql()[2]}),
        sets AS (
            SELECT doc_id, list_distinct({_SHINGLES}) AS sh
            FROM documents)
        SELECT p.id_a, p.id_b,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM pairs p
        JOIN sets a ON p.id_a = a.doc_id
        JOIN sets b ON p.id_b = b.doc_id
        WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh))), 6) > 0.2""",
    "dedup_embedding_clusters": """
        WITH RECURSIVE normed AS (
            SELECT vec_id,
                   embedding AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM normed a JOIN normed b ON a.vec_id < b.vec_id
            WHERE round(list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                        / (a.n * b.n), 6) >= 0.4),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT reach.node, edges.dst FROM reach JOIN edges
              ON reach.r = edges.src)
        SELECT node AS vec_id, MIN(r) AS cluster_id
        FROM reach GROUP BY node""",
    "text_decontaminate": f"""
        WITH g AS (
            SELECT doc_id,
                   list_distinct(
                       CASE WHEN len({_TOKS}) < 5 THEN []
                            ELSE list_transform(range(1, len({_TOKS}) - 3),
                                 i -> array_to_string(
                                     list_slice({_TOKS}, i, i + 4), ' '))
                       END) AS gs
            FROM documents),
        bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g
                  WHERE doc_id % 50 = 0),
        train_g AS (SELECT doc_id, unnest(gs) AS gram FROM g
                    WHERE doc_id % 50 <> 0),
        hits AS (SELECT doc_id, count(*) AS n
                 FROM train_g JOIN bench USING (gram) GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(h.n, 0) AS INTEGER) AS n_overlap,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 50 <> 0""",
    "text_tfidf_top_terms": f"""
        WITH t AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf * (ln((nd + 1.0) / (df + 1.0)) + 1), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, term ASC) AS term_rank
            FROM scored)
        SELECT doc_id, term, tfidf, CAST(term_rank AS INTEGER) AS term_rank
        FROM ranked WHERE term_rank <= 3""",
    "text_stats": f"""
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(len(list_distinct({_TOKS})) AS INTEGER) AS n_distinct_tokens,
               CAST(length(regexp_replace(lower(trim(text, ' ')), '\\s+', '', 'g')) AS DOUBLE)
                   / len({_TOKS}) AS avg_token_len,
               CAST(len(list_filter({_TOKS},
                    t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
                   / len({_TOKS}) AS stopword_ratio
        FROM documents""",
    "token_count": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(lower(trim(text, ' ')), '\\s+')) AS INTEGER) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(trim(text, ' ')), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_tokens
        FROM documents""",
    "doc_fingerprint": f"""
        SELECT doc_id,
               md5(array_to_string({_TOKS}, ' ')) AS content_fp,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS bag_fp
        FROM documents""",
    "text_chunking": f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        meta AS (SELECT doc_id, toks,
                        greatest(CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT), 1)
                        AS n_chunks
                 FROM t)
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' ')
                   AS chunk_text
        FROM meta, unnest(range(0, n_chunks)) AS u(i)""",
    "text_redact_pii": """
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                       '<EMAIL>', 'g'),
                   '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g')
               AS redacted_text,
               CAST(len(regexp_extract_all(text,
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INTEGER)
               AS n_emails
        FROM documents""",
    "text_top_terms": f"""
        WITH terms AS (
            SELECT doc_id AS doc, unnest({_TOKS}) AS term FROM documents),
        per_doc AS (
            SELECT term, doc, COUNT(*) AS tf FROM terms GROUP BY term, doc)
        SELECT term,
               CAST(SUM(tf) AS BIGINT) AS total_count,
               COUNT(*) AS doc_freq
        FROM per_doc GROUP BY term
        ORDER BY total_count DESC, term ASC LIMIT 50""",
    # cosine: DuckDB list_sum folds in list order, exactly like Spark's
    # F.aggregate — verified bit-identical at 12 dp (tools/diffcheck.py)
    "sim_cosine_topk": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        qn AS (SELECT sqrt(list_sum(list_transform(qe,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm FROM q)
        SELECT e.vec_id,
               round(list_sum(list_transform(range(1, len(e.embedding) + 1),
                         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(e.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * qn.qnorm),
                     6) AS score
        FROM embeddings e, q, qn
        ORDER BY score DESC, e.vec_id ASC LIMIT 10""",
    # LSH top-k twin, oracle-exact: the SQL reproduces the deterministic
    # md5-derived hyperplanes (8 planes) and restricts the scan to the
    # query vector's sign bucket — same recall semantics as the Spark path
    "sim_cosine_topk_lsh": """
        WITH planes AS (
            SELECT p.p, i.i,
                   CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' ||
                                        CAST(i.i AS VARCHAR)), 8, 1)
                             IN ('0','2','4','6','8','a','c','e')
                        THEN 1.0 ELSE -1.0 END AS w
            FROM (SELECT unnest(range(8)) AS p) p,
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
        q AS (
            SELECT nv.v AS qv, nv.n AS qn, bk.bucket AS qb
            FROM normed nv JOIN buckets bk USING (vec_id)
            WHERE nv.vec_id = 0)
        SELECT nv.vec_id,
               round(list_sum(list_transform(range(1, len(nv.v) + 1),
                     i -> CAST(nv.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                     / (nv.n * q.qn), 6) AS score
        FROM normed nv JOIN buckets bk USING (vec_id) CROSS JOIN q
        WHERE bk.bucket = q.qb
        ORDER BY score DESC, nv.vec_id ASC LIMIT 10""",
    "dedup_containment": f"""
        WITH {_minhash_sql()[1]},
        pairs AS ({_minhash_sql()[2]}),
        sets AS (
            SELECT doc_id, list_distinct({_SHINGLES}) AS sh
            FROM documents)
        SELECT p.id_a, p.id_b,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(a.sh), 6) AS containment_a,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(b.sh), 6) AS containment_b
        FROM pairs p
        JOIN sets a ON p.id_a = a.doc_id
        JOIN sets b ON p.id_b = b.doc_id""",
    "asof_nearest_tolerance": """
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
        v AS (SELECT user_id, ts, value FROM events
              WHERE event_type = 'view'),
        ranked AS (
            SELECT c.event_id, c.user_id, c.ts, v.value,
                   abs(epoch_us(c.ts) - epoch_us(v.ts)) AS adiff,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.event_id
                       ORDER BY abs(epoch_us(c.ts) - epoch_us(v.ts)),
                                (v.ts > c.ts), v.ts) AS rn
            FROM c LEFT JOIN v ON c.user_id = v.user_id)
        SELECT event_id, user_id, ts,
               CASE WHEN adiff <= 600 * 1000000 THEN value END AS value_asof
        FROM ranked WHERE rn = 1""",
    "source_overlap": f"""
        WITH fps AS (
            SELECT DISTINCT
                   md5(array_to_string(list_sort(list_distinct({_TOKS})), ' '))
                       AS fingerprint,
                   source
            FROM documents)
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(DISTINCT a.fingerprint) AS n_shared
        FROM fps a JOIN fps b
          ON a.fingerprint = b.fingerprint AND a.source < b.source
        GROUP BY 1, 2""",
    "dedup_simhash": f"""
        WITH tok AS (
            SELECT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents),
        h AS (
            SELECT doc, CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) AS h
            FROM tok),
        bits AS (
            SELECT doc,
                   {', '.join(f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(16))}
            FROM h GROUP BY doc)
        SELECT doc AS doc_id,
               CAST({' + '.join(f"CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END" for i in range(16))} AS BIGINT) AS simhash
        FROM bits""",
    # pair output is blocking-independent (the pigeonhole blocks are pure
    # candidate generation; the exact bit_count verify defines the result),
    # so the oracle is simply all pairs with hamming <= 3 over the same
    # simhash values — n² is fine for DuckDB at oracle scale
    "dedup_simhash_pairs": f"""
        WITH tok AS (
            SELECT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents),
        h AS (
            SELECT doc, CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) AS h
            FROM tok),
        bits AS (
            SELECT doc,
                   {', '.join(f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(16))}
            FROM h GROUP BY doc),
        sh AS (
            SELECT doc AS doc_id,
                   CAST({' + '.join(f"CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END" for i in range(16))} AS BIGINT) AS simhash
            FROM bits)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "text_quality": f"""
        WITH s AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   len(list_distinct({_TOKS})) AS n_distinct_tokens,
                   CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
                       / len({_TOKS}) AS stopword_ratio
            FROM documents)
        SELECT doc_id,
               round(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END
                     + (CAST(n_distinct_tokens AS DOUBLE) / n_tokens) * 0.3
                     + least(stopword_ratio * 3.0, 1.0) * 0.3, 6) AS quality
        FROM s""",
    # Same quality formula as text_quality, gated by exact per-source
    # percent_rank (score desc, doc_id asc) <= 0.5.
    "quality_percentile_gate": f"""
        WITH s AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   len(list_distinct({_TOKS})) AS n_distinct_tokens,
                   CAST(len(list_filter({_TOKS},
                        t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)
                       / len({_TOKS}) AS stopword_ratio
            FROM documents),
        q AS (
            SELECT doc_id,
                   round(CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END
                         + (CAST(n_distinct_tokens AS DOUBLE) / n_tokens) * 0.3
                         + least(stopword_ratio * 3.0, 1.0) * 0.3, 6) AS quality
            FROM s),
        r AS (
            SELECT q.doc_id, d.source, q.quality,
                   round(percent_rank() OVER (
                       PARTITION BY d.source
                       ORDER BY q.quality DESC, q.doc_id ASC), 6) AS pct_rank
            FROM q JOIN documents d USING (doc_id))
        SELECT doc_id, source, quality, pct_rank
        FROM r WHERE pct_rank <= 0.5""",
    # Declarative twin of the Python UDTF: UNION ALL with identical
    # IEEE-double op order; round applied engine-side on both paths.
    "udtf_charge_legs": """
        SELECT l_orderkey, l_linenumber, 'base' AS component,
               round(l_extendedprice, 6) AS amount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               round(l_extendedprice * l_discount, 6) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax',
               round((l_extendedprice * (1.0 - l_discount)) * l_tax, 6)
        FROM lineitem""",
    "corpus_token_budget": """
        SELECT doc_id, source, n_chars, cum_before
        FROM (
            SELECT doc_id, source, n_chars,
                   CAST(coalesce(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM documents)
        WHERE cum_before < 5000""",
    "text_gopher_quality": f"""
        WITH m AS (
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INTEGER) AS n_words,
                   CAST(list_sum(list_transform({_TOKS}, x -> len(x))) AS DOUBLE)
                       / len({_TOKS}) AS mean_word_len,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len({_TOKS}) AS alpha_word_ratio,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '^[^a-z0-9]+$'))) AS DOUBLE)
                       / len({_TOKS}) AS symbol_word_ratio,
                   CAST(len(list_filter({_TOKS},
                        x -> list_contains(['the','a','of','and','to','in'], x)))
                        AS INTEGER) AS stop_hits
            FROM documents)
        SELECT doc_id, n_words,
               round(mean_word_len, 6) AS mean_word_len,
               round(alpha_word_ratio, 6) AS alpha_word_ratio,
               round(symbol_word_ratio, 6) AS symbol_word_ratio,
               stop_hits,
               (n_words >= 10 AND n_words <= 100000) AS ok_word_count,
               (mean_word_len >= 2.0 AND mean_word_len <= 12.0) AS ok_mean_word_len,
               (alpha_word_ratio >= 0.7) AS ok_alpha_ratio,
               (symbol_word_ratio <= 0.1) AS ok_symbol_ratio,
               (stop_hits >= 1) AS ok_stopwords,
               ((n_words >= 10 AND n_words <= 100000)
                AND (mean_word_len >= 2.0 AND mean_word_len <= 12.0)
                AND alpha_word_ratio >= 0.7
                AND symbol_word_ratio <= 0.1
                AND stop_hits >= 1) AS passes_gopher
        FROM m""",
    "text_repetition": f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        grams AS (
            SELECT doc_id, unnest(list_transform(range(1, len(t)),
                   i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
            FROM toks),
        per_gram AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_gram_frac,
               CAST(CAST(SUM(c) AS BIGINT) - COUNT(*) AS DOUBLE)
                   / CAST(SUM(c) AS BIGINT) AS dup_gram_frac
        FROM per_gram GROUP BY doc_id""",
    "docs_prep_pipeline": f"""
        WITH m AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_words,
                   CAST(list_sum(list_transform({_TOKS}, x -> len(x))) AS DOUBLE)
                       / len({_TOKS}) AS mean_word_len,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len({_TOKS}) AS alpha_word_ratio,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '^[^a-z0-9]+$'))) AS DOUBLE)
                       / len({_TOKS}) AS symbol_word_ratio,
                   len(list_filter({_TOKS},
                        x -> list_contains(['the','a','of','and','to','in'], x)))
                       AS stop_hits
            FROM documents),
        passed AS (
            SELECT d.* FROM documents d JOIN m USING (doc_id)
            WHERE n_words >= 10 AND n_words <= 100000
              AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
              AND alpha_word_ratio >= 0.7 AND symbol_word_ratio <= 0.1
              AND stop_hits >= 1),
        keep AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fp
                  FROM passed)
            GROUP BY fp)
        SELECT doc_id,
               CAST(GREATEST(CEIL((len({_TOKS}) - 16) / 48.0), 1) AS BIGINT)
                   AS n_chunks,
               CAST(len({_TOKS}) AS INTEGER) AS ws_tokens,
               CAST(len(regexp_extract_all(lower(trim(text, ' ')),
                    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS bpe_tokens
        FROM passed WHERE doc_id IN (SELECT doc_id FROM keep)""",
    "training_set_pipeline": f"""
        WITH m AS (
            SELECT doc_id,
                   len({_TOKS}) AS n_words,
                   CAST(list_sum(list_transform({_TOKS}, x -> len(x))) AS DOUBLE)
                       / len({_TOKS}) AS mean_word_len,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len({_TOKS}) AS alpha_word_ratio,
                   CAST(len(list_filter({_TOKS},
                        x -> regexp_matches(x, '^[^a-z0-9]+$'))) AS DOUBLE)
                       / len({_TOKS}) AS symbol_word_ratio,
                   len(list_filter({_TOKS},
                        x -> list_contains(['the','a','of','and','to','in'], x)))
                       AS stop_hits
            FROM documents),
        passed AS (
            SELECT d.* FROM documents d JOIN m USING (doc_id)
            WHERE n_words >= 10 AND n_words <= 100000
              AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
              AND alpha_word_ratio >= 0.7 AND symbol_word_ratio <= 0.1
              AND stop_hits >= 1),
        keep AS (
            SELECT MIN(doc_id) AS doc_id
            FROM (SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fp
                  FROM passed)
            GROUP BY fp),
        t AS (
            SELECT doc_id, CAST(len({_TOKS}) AS INTEGER) AS ws_tokens
            FROM passed WHERE doc_id IN (SELECT doc_id FROM keep)),
        s AS (
            SELECT doc_id, ws_tokens,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 900
                            THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 950
                            THEN 'val'
                        ELSE 'test' END AS split
            FROM t),
        c AS (
            SELECT doc_id, split, ws_tokens,
                   CAST(FLOOR(doc_id / 200) AS BIGINT) AS shard,
                   CAST(COALESCE(SUM(ws_tokens) OVER (
                       PARTITION BY split, CAST(FLOOR(doc_id / 200) AS BIGINT)
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum
            FROM s)
        SELECT doc_id, split, ws_tokens,
               shard * 4294967296
                   + CAST(FLOOR(CAST(cum AS DOUBLE) / 8192) AS BIGINT)
                   AS bin_id,
               cum % 8192 AS bin_offset
        FROM c""",
    "lang_id": f"""
        WITH s AS (
            SELECT doc_id,
                   len(list_filter({_TOKS}, t -> list_contains(['the','a','of','and','to','in'], t))) AS s_en,
                   len(list_filter({_TOKS}, t -> list_contains(['der','die','das','und','ist','nicht'], t))) AS s_de,
                   len(list_filter({_TOKS}, t -> list_contains(['le','la','les','et','est','une'], t))) AS s_fr,
                   len(list_filter({_TOKS}, t -> list_contains(['el','la','los','y','es','una'], t))) AS s_es
            FROM documents)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                    WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                    ELSE 'es' END AS lang_pred
        FROM s""",
    "lang_id_trigram": """
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN len(lower(trim(text, ' '))) >= 3 THEN
                       list_transform(range(1, len(lower(trim(text, ' '))) - 1),
                           i -> substr(lower(trim(text, ' ')), CAST(i AS INTEGER), 3))
                   ELSE [] END AS grams
            FROM documents),
        s AS (
            SELECT doc_id,
                   CAST(len(list_filter(grams, x -> list_contains(
                       ['the','and','ing','ion','tio','ent','ati','for','her',
                        'ter','hat','tha','ere','ate','his','con','res','ver'],
                       x))) AS INTEGER) AS t_en,
                   CAST(len(list_filter(grams, x -> list_contains(
                       ['der','ein','sch','ich','nde','die','che','den','ten',
                        'und','ine','gen','end','ers','ste','cht','ung','das'],
                       x))) AS INTEGER) AS t_de,
                   CAST(len(list_filter(grams, x -> list_contains(
                       ['les','ent','que','ion','ant','eur','our','ait','dan',
                        'pou','est','par','men','tre','com','ons','ous','ett'],
                       x))) AS INTEGER) AS t_fr,
                   CAST(len(list_filter(grams, x -> list_contains(
                       ['que','ent','ion','con','ado','est','par','los','ien',
                        'nte','ara','cio','dad','las','del','por','una','era'],
                       x))) AS INTEGER) AS t_es
            FROM g)
        SELECT doc_id,
               CASE WHEN greatest(t_en, t_de, t_fr, t_es) = 0 THEN 'und'
                    WHEN t_en = greatest(t_en, t_de, t_fr, t_es) THEN 'en'
                    WHEN t_de = greatest(t_en, t_de, t_fr, t_es) THEN 'de'
                    WHEN t_fr = greatest(t_en, t_de, t_fr, t_es) THEN 'fr'
                    ELSE 'es' END AS lang_pred,
               t_en, t_de, t_fr, t_es
        FROM s""",
}

# --------------------------------------------------------------------------
# assembled suite
# --------------------------------------------------------------------------

# Key order matters: the driver's correctness snapshot covers the FIRST 50
# dict keys. Rounds 1-2 verified the control-plane/relational block, round 3
# the TPC-H/dedup/text/similarity block; the 21 keys the driver has never
# snapshotted lead in round 4, followed by the highest-value re-checks
# (TPC-H + the scale-sensitive dedup/similarity paths).
#: deterministic retrieval workload for the BM25 key — terms drawn from
#: the synthetic corpus vocabulary so every query has real matches
_BM25_QUERIES = [
    (1, "fast table scan"),
    (2, "stream window agg"),
    (3, "customer join query"),
    (4, "vector hash merge batch"),
]


def q_profile_columns(spark, sf_dir):
    """Single-pass per-column profile (rows / nulls / exact distincts /
    min-max) of the documents table — one agg job over one scan, rows
    produced by unpivoting the 1-row aggregate. Long/string columns only
    so the min/max string rendering is engine-exact."""
    return profile.profile_columns(
        load(spark, sf_dir, "documents"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )


def q_numeric_histogram(spark, sf_dir):
    """Fixed-width value histogram over events (10 bins on [0, 500) plus
    under/overflow) — scan-local bin assignment, bounded-key groupBy."""
    return profile.numeric_histogram(
        load(spark, sf_dir, "events"), "value", lo=0.0, hi=500.0, n_bins=10
    )


def q_gap_fill_interpolate(spark, sf_dir):
    """Linearly interpolated hourly close series over the same scaffold
    as `gap_fill_bars` — missing hours get the line between neighboring
    observed closes (LOCF's numeric complement); the hour index is the
    numeric time axis."""
    bars = q_ohlc_bars(spark, sf_dir).select("series", "bar_start", "close")
    scaffold = (
        bars.select("series")
        .distinct()
        .select(
            "series", F.explode(F.sequence(F.lit(0), F.lit(719))).alias("h")
        )
        .select(
            "series",
            "h",
            F.expr(
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)"
            ).alias("bar_start"),
        )
    )
    joined = scaffold.join(bars, ["series", "bar_start"], "left")
    return asof.interpolate_fill(joined, "series", "h", "close").select(
        "series",
        F.col("h").cast("int").alias("h"),
        "close_interp",
        F.col("close").isNotNull().alias("observed"),
    )


def q_sample_reservoir(spark, sf_dir):
    """Exactly-5-docs-per-source deterministic sample (seeded hash rank —
    the fixed-size complement of the fixed-rate `sample_stratified`)."""
    return rel.sample_reservoir(
        load(spark, sf_dir, "documents"), "source", k=5, seed=42
    ).select("doc_id", "source", "sample_rank")


def q_agg_median_groups(spark, sf_dir):
    """Exact interpolated quartiles (p25/median/p75) of event value per
    type — percentile_cont semantics, computed scale-out via the
    frequency-table quantile (Spark's built-in exact percentile buffers
    whole groups in single tasks: measured 7x at a 10x probe)."""
    return profile.exact_quantiles(
        load(spark, sf_dir, "events"),
        "event_type",
        "value",
        {"p25": 0.25, "median": 0.5, "p75": 0.75},
    )


def q_dataset_diff(spark, sf_dir):
    """Release-to-release dataset diff: v1 = documents minus every 7th
    doc; v2 = documents with every 5th doc's n_chars bumped — classify
    added/removed/changed keys with old/new value pairs (deterministic
    derivation shared with the oracle)."""
    docs = load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 7 != 0)
    v2 = docs.withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 5 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    return rel.dataset_diff(v1, v2, ["doc_id"], ["n_chars", "source"])


def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outlier flags via median absolute deviation —
    the masking-proof complement of events_zscore (both quantile passes
    run through the distributed frequency-table quantile)."""
    return profile.mad_outliers(
        load(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


def q_key_skew_report(spark, sf_dir):
    """Top-10 heaviest join keys with row share — the pre-join skew
    diagnostic (one partial-agg groupBy + TakeOrderedAndProject top-k,
    never a global sort)."""
    return profile.key_skew_report(
        load(spark, sf_dir, "events"), "user_id", top_k=10
    )


def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) interleave key for two-dimensional file
    clustering — pure bit arithmetic in one codegen expression (the
    layout `interchange.zorder_write` sorts by)."""
    from .sources.interchange import morton_key

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        morton_key(F.col("user_id") % 256, F.col("event_id") % 256, 8)
            .alias("zkey"),
    )


def q_scd2_history(spark, sf_dir):
    """SCD-type-2 version history from the event stream: per user,
    consecutive same-event_type runs collapse into versions with
    [valid_from, valid_to) validity — change-log -> point-in-time
    dimension, the history-keeping generalization of the registry's
    latest-wins compaction."""
    return rel.scd2_history(
        load(spark, sf_dir, "events"),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        attr_cols=["event_type"],
    )


def q_knn_triangles(spark, sf_dir):
    """Per-node triangle count / degree / clustering coefficient over the
    LSH kNN graph — the cohesion complement of pagerank_knn (dense
    semantic clusters vs topic-bridging hubs), same edge set."""
    from .operators import graph

    emb = load(spark, sf_dir, "embeddings")
    edges = similarity.knn_graph(emb, k=3, n_planes=4).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.triangle_counts(
        edges, emb.select("vec_id"), id_col="vec_id"
    )


#: root for build-if-missing persisted indexes used by *_indexed keys —
#: outside the repo and testdata (both are off-limits for writes at
#: driver time); the embeddings mtime is baked into the directory name
#: so a regenerated testdata epoch can never hit a stale index.
_IDX_ROOT = "/tmp/spark_graft_indexes"


def _index_path(sf_dir: str, tag: str, source_table: str) -> str:
    """Deterministic per-(sf_dir, source-epoch) index location: the
    source parquet's mtime is baked into the directory name so a
    regenerated testdata epoch can never hit a stale index."""
    import os

    src = os.path.join(os.path.abspath(sf_dir), f"{source_table}.parquet")
    epoch = int(os.path.getmtime(src))
    base = os.path.basename(os.path.abspath(sf_dir)) or "sf"
    return os.path.join(_IDX_ROOT, f"{tag}_{base}_{epoch}")


def _knn_index(spark, sf_dir: str) -> str:
    """Path of the persisted kNN-graph index for `sf_dir`, building it
    on first use (the ONE expensive ANN construction every graph
    analytic afterwards reads instead of re-running)."""
    from .sources import graph_index

    path = _index_path(sf_dir, "knn_k3_p4", "embeddings")
    if not graph_index.is_built(path):
        graph_index.write_knn_graph(
            load(spark, sf_dir, "embeddings"), path, k=3, n_planes=4
        )
    return path


def _ann_lsh_index(spark, sf_dir: str) -> str:
    """Persisted sign-LSH ANN index (8 planes — the inline
    `cosine_topk_lsh` default, so index-vs-inline equality holds)."""
    import os

    from .sources import ann_index

    path = _index_path(sf_dir, "annlsh2_p8", "embeddings")
    if not os.path.exists(os.path.join(path, ann_index._META)):
        ann_index.write_lsh_index(
            load(spark, sf_dir, "embeddings"), path, n_planes=8
        )
    return path


def _ann_ivf_index(spark, sf_dir: str) -> str:
    """Persisted IVF index with the frozen deterministic quantizer
    (k=16, no Lloyd iterations — the inline `ivf_topk` defaults)."""
    import os

    from .sources import ann_index

    path = _index_path(sf_dir, "annivf2_k16", "embeddings")
    if not os.path.exists(os.path.join(path, ann_index._META)):
        ann_index.write_ivf_index(
            load(spark, sf_dir, "embeddings"), path,
            k_centroids=16, train_iters=0,
        )
    return path


def _bm25_index(spark, sf_dir: str) -> str:
    """Persisted BM25 postings index over the documents corpus."""
    import os

    from .sources import text_index

    path = _index_path(sf_dir, "postings_b64", "documents")
    if not os.path.exists(os.path.join(path, text_index._META)):
        text_index.write_postings_index(
            load(spark, sf_dir, "documents"), path, n_buckets=64
        )
    return path


def q_sim_topk_lsh_indexed(spark, sf_dir):
    """ANN top-k against the PERSISTED LSH index: the query's bucket is
    computed driver-side from the saved planes and the scan prunes to
    that one partition directory — per-bucket cost, not per-corpus.
    Equals the inline `sim_cosine_topk_lsh` (same frozen planes), so its
    oracle is the inline oracle."""
    from .sources import ann_index

    path = _ann_lsh_index(spark, sf_dir)
    return ann_index.lsh_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10
    )


def q_sim_topk_ivf_indexed(spark, sf_dir):
    """ANN top-k against the PERSISTED IVF index: probe centroids rank
    driver-side from the sidecar (k x dim floats) and `centroid_id IN
    probes` prunes to nprobe directories. Equals the inline
    `sim_cosine_topk_ivf` (same frozen quantizer)."""
    from .sources import ann_index

    path = _ann_ivf_index(spark, sf_dir)
    return ann_index.ivf_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10, nprobe=4
    )


def q_events_cusum(spark, sf_dir):
    """CUSUM change-point gate per event type (target 50, slack 2,
    decision threshold 200): accumulates small sustained value shifts
    that per-point gates (MAD/z-score) and whole-window gates
    (histogram_drift) both miss. One shuffle on the key; the running
    sums and extrema share a single sorted window pass."""
    return profile.cusum_alerts(
        load(spark, sf_dir, "events"),
        key_col="event_type",
        order_cols=["ts", "event_id"],
        value_col="value",
        target=50.0,
        slack=2.0,
        threshold=200.0,
    )


def q_split_leakage_check(spark, sf_dir):
    """Train/val/test contamination audit at 13-gram granularity (the
    GPT-3/Pile overlap definition): distinct word 13-grams shared
    across split pairs — nonzero rows mean dedup/decontamination must
    run before splitting. Shuffles 32-hex gram digests, never bodies;
    the pair join sees DISTINCT (split, gram) rows only."""
    return training.split_leakage_check(
        load(spark, sf_dir, "documents"), gram_n=13
    )


def q_events_winsorized(spark, sf_dir):
    """Per-event-type 5/95 winsorization of the value column: tails
    clamp to the exact quantile bounds, rows are never dropped — the
    robust-stats preprocessing complement of events_mad_outliers.
    Bounds broadcast; the clamp is scan-local."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return profile.winsorize(ev, "event_type", "value", 0.05, 0.95)


def q_equi_depth_histogram(spark, sf_dir):
    """Quantile-bucketed value distribution per event type: 4 equal-mass
    bins with exact interpolated edges — the optimizer-statistics shape,
    and the skew-proof complement of numeric_histogram's fixed-width
    bins. Edge pass is the distributed exact-quantile rewrite; binning
    is a broadcast + scan-local CASE."""
    return profile.equi_depth_histogram(
        load(spark, sf_dir, "events"), "event_type", "value", n_bins=4
    )


def q_events_ols_trend(spark, sf_dir):
    """Per-event-type least-squares drift line, x in days since the
    2024-01-01 anchor (small magnitudes keep every product inside
    double's exact range): slope/day, intercept at the anchor, r2.
    The regression complement of events_cusum. One partial-combined
    aggregation; per-key serial work is five moments."""
    ev = load(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts") - F.lit(1704067200)) / F.lit(86400.0)
    return profile.ols_trend(ev, "event_type", x, "value")


def q_mixture_rebalance(spark, sf_dir):
    """Domain-mixture reweighting table: concentrate the training mix on
    four sources (0.3/0.3/0.2/0.2), dropping the rest — per-source token
    shares and the sampling weights that realize the target. One
    partial-aggregated scan; everything downstream runs on the
    domain-count-sized relation."""
    return training.mixture_rebalance(
        load(spark, sf_dir, "documents"),
        {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2},
    )


def q_ngram_lm_score(spark, sf_dir):
    """Bigram-LM fluency gate (CCNet-style perplexity filtering without
    the transcendentals): corpus-trained conditional bigram MLE counts,
    per-doc mean probability, threshold at 0.034 (the synthetic corpus's
    median — gate live in both directions). Grams fold to 48-bit hashes
    scan-side so every shuffle carries longs, never gram text."""
    return text.ngram_lm_score(
        load(spark, sf_dir, "documents"), min_prob=0.034
    )


def q_hybrid_search(spark, sf_dir):
    """Retrieve-then-rerank: BM25 pulls 20 lexical candidates per query,
    cosine against the query embedding (vec_id == query_id) re-ranks to
    the final top-5 — the standard RAG/eval-mining retrieval shape. The
    candidate set broadcasts onto one embedding scan; the vector corpus
    never shuffles."""
    qdf = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.hybrid_topk(
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "embeddings"),
        qdf, k=5, n_candidates=20,
    )


def q_category_drift(spark, sf_dir):
    """Day-over-day event-type MIX drift (TVD + worst-category pointer)
    — the categorical twin of histogram_drift, same transcendental-free
    comparator over the bounded (windows x categories) grid."""
    return profile.category_drift(
        load(spark, sf_dir, "events"), "event_type"
    )


def q_split_by_content(spark, sf_dir):
    """Leakage-free split: the split key is the duplicate cluster's
    canonical id, so exact-duplicate docs can never straddle splits —
    the constructive fix for what split_leakage_check counts. One
    fingerprint agg + one digest join; the label is scan-local."""
    return training.split_by_content(load(spark, sf_dir, "documents"))


def q_dedup_pair_recall(spark, sf_dir):
    """Pair recall of LSH-bucketed near-dup detection vs the exact
    block-partitioned all-pairs at the same threshold — the banding-dial
    audit for the dedup family (how many true near-dup pairs does the
    bucketing keep?). Both member pair oracles already replicate the
    hyperplanes, so the recall value is cross-engine-checked."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.recall_at_k(
        similarity.embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4),
        similarity.embedding_near_dups(emb, threshold=0.4),
        id_col=["id_a", "id_b"],
    )


def q_ann_recall_at_k(spark, sf_dir):
    """Recall@10 of the sign-LSH ANN against the exact brute-force
    top-10 — the dial-tuning measurement an ANN deployment tracks,
    registered so recall itself is oracle-checked (both member top-k
    oracles already replicate the hyperplanes)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return similarity.recall_at_k(
        similarity.cosine_topk_lsh(emb, qv, k=10),
        similarity.cosine_topk(emb, qv, k=10),
    )


def q_mixture_temperature(spark, sf_dir):
    """Temperature-smoothed self-derived mixture at alpha = 0.5
    (sqrt-computable, hence IEEE-exact cross-engine): low-token sources
    upweight toward parity without flattening the mix — the
    multilingual temperature-sampling recipe as a reweighting table."""
    return training.mixture_temperature(
        load(spark, sf_dir, "documents"), alpha=0.5
    )


def q_rolling_corr(spark, sf_dir):
    """Trailing-20-row price/quantity correlation per supplier over the
    ship-date tick order — the co-movement monitor beside EWMA/VWAP.
    One shuffle on the key; five decimal moments share one sorted
    window pass; explicit degenerate-window NULL guards."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity",
    )
    return rel.rolling_corr(
        li, "l_suppkey",
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "l_extendedprice", "l_quantity", window=20,
    )


def q_vector_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding corpus —
    the 4x storage compression a 100-TB vector store persists. Pure
    scan-local array math; floor(x + 0.5) keeps the rounding rule
    engine-exact. The gate row serializes the int array to CSV (the
    differential comparator hashes scalar cells; the operator itself
    returns the real array column)."""
    out = similarity.quantize_vectors_int8(load(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
    )


def q_hybrid_search_indexed(spark, sf_dir):
    """Hybrid retrieval with the PERSISTED postings index feeding the
    BM25 candidate stage (probe buckets pruned at the scan) and the
    LITERALLY shared `rerank_cosine` stage on top — completes the
    precompute-once story for the composed retrieval path. Equals the
    inline `hybrid_search` by construction (shared rerank + index ==
    inline BM25, both already equality-tested)."""
    from .sources import text_index

    path = _bm25_index(spark, sf_dir)
    cands = text_index.postings_index_bm25(
        spark, path, _BM25_QUERIES, k=20
    ).select("query_id", "doc_id", F.col("score").alias("bm25_score"))
    return text.rerank_cosine(
        cands, load(spark, sf_dir, "embeddings"), k=5
    )


def q_hybrid_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of the BM25 top-20 and the corpus-wide
    cosine top-20 (k0 = 60, the published constant): the union-shaped
    hybrid where a semantic-only hit still surfaces. Both member lists
    broadcast-prune; fusion runs on <= queries x 40 rows."""
    qdf = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.hybrid_rrf(
        load(spark, sf_dir, "documents"),
        load(spark, sf_dir, "embeddings"),
        qdf, k=5, n_candidates=20,
    )


def q_sim_topk_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (Lv et al. 2007) against the persisted index:
    besides the query's own bucket, probe the 3 buckets reached by
    flipping the planes with the smallest |query . plane| margin — the
    planes most likely to have separated a true neighbor. The recall
    dial that costs no index rebuild; still partition-pruned (4 probe
    directories). Probe order is engine-exact (floor(|dot| * 1e6) with
    plane-index tie-break), so the oracle reproduces the probe set."""
    from .sources import ann_index

    path = _ann_lsh_index(spark, sf_dir)
    return ann_index.lsh_index_topk(
        spark, path, _query_vector(spark, sf_dir), k=10, nprobe=4
    )


def q_bm25_topk_indexed(spark, sf_dir):
    """BM25 against the PERSISTED postings index: probe buckets computed
    driver-side from the query terms, the scan prunes to those term
    buckets, and the shared scoring core uses the sidecar's exact corpus
    stats — equals the inline `bm25_topk` by construction."""
    from .sources import text_index

    path = _bm25_index(spark, sf_dir)
    return text_index.postings_index_bm25(spark, path, _BM25_QUERIES, k=5)


def q_histogram_drift(spark, sf_dir):
    """Day-over-day distribution drift of the events value histogram —
    TVD + worst-bin share delta between consecutive daily windows, the
    monitoring alert a pipeline pages on. Bin math shared with
    numeric_histogram AND the streaming histogram (one backfill produces
    exactly what the live stream produced); transcendental-free so the
    drift scores are engine-exact."""
    hists = profile.windowed_histogram_batch(
        load(spark, sf_dir, "events"), "value",
        lo=0.0, hi=500.0, n_bins=10, ts_col="ts", window="day",
    )
    return profile.histogram_drift(hists)


def q_scd2_apply(spark, sf_dir):
    """Incremental SCD2 merge: the dimension is built from the first
    half of the event log, then the second half applies as a change
    batch — only affected keys re-derive (semi-join prune), untouched
    rows pass through without a window. Equals the full rebuild on the
    whole log (the oracle IS the full-rebuild SQL), the
    incremental-vs-full pattern `dedup_incremental` established."""
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    dim = rel.scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        attr_cols=["event_type"],
    )
    return rel.scd2_apply(
        dim,
        ev.filter(F.col("ts") >= cutoff)
        .select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        attr_cols=["event_type"],
        ts_col="ts",
        change_order_cols=["event_id"],
    )


def q_knn_triangles_indexed(spark, sf_dir):
    """Triangle counts / clustering coefficient over the PERSISTED kNN
    edge set — the precompute-once path: the LSH kNN construction runs
    once per corpus epoch (`sources/graph_index.py`) and every graph
    analytic reads the narrow edge parquet instead of rebuilding the ANN
    join (the dominant repeated cost at scale). Equality with the inline
    `knn_triangles` is by construction (same frozen k/planes; tested)."""
    from .operators import graph
    from .sources import graph_index

    path = _knn_index(spark, sf_dir)
    edges = graph_index.read_knn_graph(spark, path).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.triangle_counts(
        edges, graph_index.read_knn_nodes(spark, path), id_col="vec_id"
    )


def q_pagerank_knn_indexed(spark, sf_dir):
    """PageRank over the PERSISTED kNN edge set — same index read as
    `knn_triangles_indexed`: one edge-parquet scan feeds the 3 power
    iterations, zero ANN recompute."""
    from .operators import graph
    from .sources import graph_index

    path = _knn_index(spark, sf_dir)
    edges = graph_index.read_knn_graph(spark, path).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return graph.pagerank(
        edges, graph_index.read_knn_nodes(spark, path), iters=3,
        id_col="vec_id",
    )


def q_bpe_tokenize(spark, sf_dir):
    """BPE tokenizer training + segmentation (rows-only by nature: each
    merge depends on the previous one — no SQL unrolling; correctness is
    pinned by the pure-Python reference equivalence tests). Trains 6
    merges on a bounded doc sample, then segments scan-side (zero
    shuffles in the apply path)."""
    from .operators import bpe

    docs = load(spark, sf_dir, "documents")
    merges = bpe.bpe_train_merges(docs.filter(F.col("doc_id") < 100), 6)
    return bpe.bpe_segment(
        docs.filter(F.col("doc_id") < 200), merges
    ).select("doc_id", "n_bpe_tokens")


#: Pinned BPE merge table — trained ONCE (10 merges on the sf0.001
#: corpus, deterministic by the trainer's tie-break) and frozen here.
#: Training is genuinely iterative (rows-only), but APPLYING a fixed
#: table is a pure deterministic string fold, so this key is
#: oracle-exact: the DuckDB twin mirrors the per-symbol space-padded
#: chained-replace formulation replace-for-replace. Counts are
#: provenance only; the apply path ignores them.
_BPE_PINNED_MERGES = [
    (1, "e", "r", 4650), (2, "e", "</w>", 4644), (3, "n", "</w>", 2898),
    (4, "o", "r", 2880), (5, "t", "</w>", 2850), (6, "er", "</w>", 2781),
    (7, "o", "w", 2763), (8, "ow", "</w>", 2763), (9, "l", "u", 1928),
    (10, "i", "n", 1922),
]


def q_bpe_segment_pinned(spark, sf_dir):
    """BPE segmentation with the pinned merge table over the full
    documents corpus — scan-side chained string replaces, zero shuffles.
    Tokens render as a single-space-joined string so the value hash
    covers the full token sequence, not just the count."""
    from .operators import bpe

    seg = bpe.bpe_segment(load(spark, sf_dir, "documents"), _BPE_PINNED_MERGES)
    return seg.select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe_text"),
        "n_bpe_tokens",
    )


def _bpe_pinned_sql() -> str:
    """DuckDB twin of q_bpe_segment_pinned: the same encoding (every
    symbol owns a leading AND trailing space, double spaces between
    symbols) and the same non-overlapping left-to-right replace per merge
    rule — both engines' `replace` resumes after the replacement, which
    is exactly the greedy single-pass BPE merge."""
    expr = ("' ' || array_to_string(list_append(string_split(w, ''), "
            "'</w>'), '  ') || ' '")
    for _, left, right, _n in _BPE_PINNED_MERGES:
        expr = f"replace({expr}, ' {left}  {right} ', ' {left}{right} ')"
    return f"""
        WITH seg AS (
            SELECT doc_id,
                   list_transform(
                       list_filter(string_split_regex(lower(trim(text, ' ')),
                                                      '\\s+'),
                                   x -> x <> ''),
                       w -> trim({expr}, ' ')) AS words
            FROM documents)
        SELECT doc_id,
               CASE WHEN len(words) = 0 THEN ''
                    ELSE replace(array_to_string(words, '  '), '  ', ' ')
               END AS bpe_text,
               CAST(CASE WHEN len(words) = 0 THEN 0
                         ELSE len(string_split(
                                  array_to_string(words, '  '), '  '))
                    END AS INTEGER) AS n_bpe_tokens
        FROM seg"""


def q_bm25_topk(spark, sf_dir):
    """BM25 top-5 docs for a fixed 4-query workload — query-term
    broadcast prunes the postings before any aggregation; partial scores
    round-then-DECIMAL-sum so ranking is engine-exact."""
    qdf = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, query_text string"
    )
    return text.bm25_topk(load(spark, sf_dir, "documents"), qdf, k=5)


def q_data_contract_check(spark, sf_dir):
    """Declarative load-gate contract over orders: not-null, key
    uniqueness, value range, accepted set, FK integrity vs customer,
    priority format regex, and a free-form expression — the whole
    report from ONE aggregation over ONE fact scan (FK refs broadcast
    in as flag columns first). Rules 2/3/6 are deliberately strict so
    the violation counts are non-zero in the gate data."""
    rules = [
        {"rule": "not_null", "col": "o_orderdate"},
        {"rule": "unique", "cols": ["o_orderkey"]},
        {"rule": "range", "col": "o_totalprice", "lo": 0.0, "hi": 250000.0},
        {"rule": "in_set", "col": "o_orderstatus", "values": ["F", "O"]},
        {
            "rule": "fk",
            "col": "o_custkey",
            "ref": load(spark, sf_dir, "customer"),
            "ref_col": "c_custkey",
        },
        {"rule": "regex", "col": "o_orderpriority", "pattern": "^[1-5]-"},
        {"rule": "expr", "expr": "o_totalprice > 2000", "col": "o_totalprice"},
    ]
    return contract.contract_report(load(spark, sf_dir, "orders"), rules)


def q_events_acf(spark, sf_dir):
    """Per-type autocorrelation at lags 1-3 over the (ts, event_id)
    tick order — the self-similarity monitor beside rolling_corr
    (cross-series) and ols_trend (drift). One sorted window pass
    materializes all lags; one bounded (key, lag) agg computes the
    decimal moments."""
    return profile.acf(
        load(spark, sf_dir, "events"), "event_type", ["ts", "event_id"],
        "value", max_lag=3,
    )


def q_events_control_chart(spark, sf_dir):
    """EWMA control chart per event type: flag points > 3 per-key sigma
    away from the halving-fold prediction built from the prior <= 50
    rows (8-row warm-up emits no prediction). The fast point gate
    between events_zscore (memoryless) and events_cusum (slow drift)."""
    return profile.ewma_control_chart(
        load(spark, sf_dir, "events"), "event_type", ["ts", "event_id"],
        "value", window=50, n_sigma=3.0, min_periods=8,
    )


def q_events_seasonal(spark, sf_dir):
    """Additive weekly seasonal decomposition: value = key mean +
    seasonal(day-of-period) + residual, the pre-filter that keeps
    weekly shape from tripping every drift gate. Season bucket is pure
    integer epoch arithmetic (no engine dayofweek conventions); one
    aggregation over one fact scan, stats broadcast back."""
    return profile.seasonal_decompose(
        load(spark, sf_dir, "events"), "event_type", "ts", "value", period=7
    )


def q_sample_pps(spark, sf_dir):
    """Weighted (probability-proportional-to-size) systematic draw of
    50 documents by n_chars — the token-budget-proportional corpus
    sampler. All-int64 grid arithmetic (no pow/log RNG), md5 hash
    order, bucketed two-phase prefix sum (no global window)."""
    return rel.sample_pps(
        load(spark, sf_dir, "documents"), "doc_id", "n_chars", k=50, seed=42
    ).select("doc_id", "n_chars", "multiplicity")


def q_hll_distinct(spark, sf_dir):
    """Portable HyperLogLog: distinct users per event type as a
    64-register md5 sketch — constant-size, mergeable (MAX per
    register), and deterministic cross-engine, unlike the builtin
    rows-only approx_count_distinct. Exact int64 arithmetic up to one
    final double division with bit-identical operands, so the estimate
    ships UNROUNDED."""
    return sketch.hll_cardinality(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", m=64
    )


def q_countmin_term_counts(spark, sf_dir):
    """Count-min sketch (4 x 32 cells) over the corpus term stream,
    probed with the true top-20 terms: est_count >= true_count always,
    overcount = the collision cost at this width. The sketch is d*w
    rows regardless of vocabulary — the bounded-state alternative to an
    exact term groupBy at 100 TB, mergeable by cell-wise SUM. w = 32 is
    deliberately narrow so collisions are visible in the gate data."""
    docs = load(spark, sf_dir, "documents")
    terms = docs.select(F.explode(text._tokens(F.col("text"))).alias("term"))
    truth = terms.groupBy("term").agg(F.count("*").alias("true_count"))
    top = truth.orderBy(F.desc("true_count"), F.asc("term")).limit(20)
    est = sketch.countmin_lookup(
        sketch.countmin_build(terms, "term", d=4, w=32), top, "term", d=4, w=32
    )
    return est.select(
        "term",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overcount"),
    )


def q_bloom_prejoin_filter(spark, sf_dir):
    """Bloom pre-join filter: 64-word / 3-hash filter built over the
    custkeys holding 'F' orders, probed with every customer — the
    broadcastable, persistable pre-filter that prunes a probe-side scan
    before a shuffle join (the user-controlled twin of Spark's runtime
    bloom pushdown). in_bloom vs is_member exposes the false-positive
    set in the result itself; false negatives are impossible (tested)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    members = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    bloom = sketch.bloom_build(members, "k", n_words=64, k=3)
    probed = sketch.bloom_probe(bloom, cust, "c_custkey", n_words=64, k=3)
    truth = (
        members.distinct()
        .withColumnRenamed("k", "c_custkey")
        .withColumn("_m", F.lit(True))
    )
    return probed.join(F.broadcast(truth), "c_custkey", "left").select(
        "c_custkey", "in_bloom", F.coalesce(F.col("_m"), F.lit(False)).alias("is_member")
    )


QUERIES = {
    # --- new in round 7 (front-50 driver window) ---
    "hll_distinct": q_hll_distinct,
    "countmin_term_counts": q_countmin_term_counts,
    "bloom_prejoin_filter": q_bloom_prejoin_filter,
    "data_contract_check": q_data_contract_check,
    "events_acf": q_events_acf,
    "events_control_chart": q_events_control_chart,
    "events_seasonal": q_events_seasonal,
    "sample_pps": q_sample_pps,
    "knn_triangles_indexed": q_knn_triangles_indexed,
    "pagerank_knn_indexed": q_pagerank_knn_indexed,
    "bpe_segment_pinned": q_bpe_segment_pinned,
    "scd2_apply": q_scd2_apply,
    "histogram_drift": q_histogram_drift,
    "sim_topk_lsh_indexed": q_sim_topk_lsh_indexed,
    "sim_topk_ivf_indexed": q_sim_topk_ivf_indexed,
    "bm25_topk_indexed": q_bm25_topk_indexed,
    "sim_topk_lsh_multiprobe": q_sim_topk_lsh_multiprobe,
    "hybrid_search": q_hybrid_search,
    "events_cusum": q_events_cusum,
    "ngram_lm_score": q_ngram_lm_score,
    "mixture_rebalance": q_mixture_rebalance,
    "events_ols_trend": q_events_ols_trend,
    "equi_depth_histogram": q_equi_depth_histogram,
    "hybrid_rrf": q_hybrid_rrf,
    "events_winsorized": q_events_winsorized,
    "split_leakage_check": q_split_leakage_check,
    "hybrid_search_indexed": q_hybrid_search_indexed,
    "vector_quantize_int8": q_vector_quantize_int8,
    "rolling_corr": q_rolling_corr,
    "mixture_temperature": q_mixture_temperature,
    "ann_recall_at_k": q_ann_recall_at_k,
    "dedup_pair_recall": q_dedup_pair_recall,
    "split_by_content": q_split_by_content,
    "category_drift": q_category_drift,
    # --- new in round 6 (front-50 driver window) ---
    "profile_columns": q_profile_columns,
    "numeric_histogram": q_numeric_histogram,
    "bm25_topk": q_bm25_topk,
    "gap_fill_interpolate": q_gap_fill_interpolate,
    "sample_reservoir": q_sample_reservoir,
    "agg_median_groups": q_agg_median_groups,
    "bpe_tokenize": q_bpe_tokenize,
    "knn_triangles": q_knn_triangles,
    "scd2_history": q_scd2_history,
    "key_skew_report": q_key_skew_report,
    "zorder_key": q_zorder_key,
    "events_mad_outliers": q_events_mad_outliers,
    "dataset_diff": q_dataset_diff,
    # --- front: never driver-verified through round 3 ---
    "agg_approx_topk": q_agg_approx_topk,
    "ohlc_bars": q_ohlc_bars,
    "stateful_running_total": q_stateful_running_total,
    "scalar_math": q_scalar_math,
    "scalar_json": q_scalar_json,
    "scalar_conditional": q_scalar_conditional,
    "scalar_array_funcs": q_scalar_array_funcs,
    "agg_stats": q_agg_stats,
    "agg_minmax_by": q_agg_minmax_by,
    "agg_conditional": q_agg_conditional,
    "subquery_exists": q_subquery_exists,
    "subquery_scalar": q_subquery_scalar,
    "subquery_in": q_subquery_in,
    "gap_fill_bars": q_gap_fill_bars,
    "stream_sliding_window": q_stream_sliding_window,
    "unpivot_metrics": q_unpivot_metrics,
    "agg_percentile": q_agg_percentile,
    "distinct_pairs": q_distinct_pairs,
    "join_salted_skew": q_join_salted_skew,
    "sample_stratified": q_sample_stratified,
    "multimodal_features": q_multimodal_features,
    # --- new in round 4 (must sit in the front-50 driver window) ---
    "train_val_split": q_train_val_split,
    "pack_sequences": q_pack_sequences,
    "corpus_mix": q_corpus_mix,
    "corpus_mix_upsampled": q_corpus_mix_upsampled,
    "training_set_pipeline": q_training_set_pipeline,
    # --- new in round 4, third session (front window for driver verify) ---
    "semantic_dedup": q_semantic_dedup,
    "knn_graph_lsh": q_knn_graph_lsh,
    "dedup_incremental": q_dedup_incremental,
    "dedup_ngram_spans": q_dedup_ngram_spans,
    "dedup_ngram_spans_sampled": q_dedup_ngram_spans_sampled,
    "dedup_boilerplate_lines": q_dedup_boilerplate_lines,
    "quality_percentile_gate": q_quality_percentile_gate,
    "corpus_token_budget": q_corpus_token_budget,
    "corpus_curation_pipeline": q_corpus_curation_pipeline,
    "udtf_charge_legs": q_udtf_charge_legs,
    "setop_except_all": q_setop_except_all,
    "join_full_outer": q_join_full_outer,
    "events_funnel": q_events_funnel,
    "retention_cohorts": q_retention_cohorts,
    "vwap_bars": q_vwap_bars,
    "win_ewma": q_win_ewma,
    "pagerank_knn": q_pagerank_knn,
    "dedup_containment": q_dedup_containment,
    "source_overlap": q_source_overlap,
    "asof_nearest_tolerance": q_asof_nearest_tolerance,
    "quality_classifier": q_quality_classifier,
    "corpus_report": q_corpus_report,
    "events_zscore": q_events_zscore,
    "win_cume_ntile": q_win_cume_ntile,
    # --- changed this round (minhash permutation rewrite + jaccard prune):
    #     keep inside the driver's 50-key window for a hard re-check ---
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_canonical_docs": q_dedup_canonical_docs,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    # --- re-checks: TPC-H + scale-sensitive paths (verified in r03) ---
    "tpch_q1": q_flagship,
    "tpch_q2": q_tpch_q2,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    # LLM-pipeline EXT (minhash family registered in the front window above)
    "dedup_exact": q_dedup_exact,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_embedding_clusters": q_dedup_embedding_clusters,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "sim_cosine_topk": q_sim_cosine_topk,
    "sim_cosine_topk_lsh": q_sim_cosine_topk_lsh,
    "sim_cosine_topk_ivf": q_sim_cosine_topk_ivf,
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "lang_id_trigram": q_lang_id_trigram,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "text_chunking": q_text_chunking,
    "text_redact_pii": q_text_redact_pii,
    "text_top_terms": q_text_top_terms,
    "text_gopher_quality": q_text_gopher_quality,
    "text_repetition": q_text_repetition,
    "text_decontaminate": q_text_decontaminate,
    "text_tfidf_top_terms": q_text_tfidf_top_terms,
    "docs_prep_pipeline": q_docs_prep_pipeline,
    "range_join_events": q_range_join_events,
    # --- back: driver-verified green in rounds 1 AND 2 ---
    "flagship_pricing_summary": q_flagship,
    # control plane (reference §2A)
    "file_registry_scan": q_file_registry_scan,
    "agg_max_date": q_agg_max_date,
    "dedup_anti_join": q_dedup_anti_join,
    "filter_status_in": q_filter_status_in,
    "status_transition_case": q_status_transition_case,
    "status_update_merge": q_status_update_merge,
    "point_lookup": q_point_lookup,
    "filter_date_eq": q_filter_date_eq,
    "groupby_collect_set": q_groupby_collect_set,
    "registry_fs_inner_join": q_registry_fs_inner_join,
    "sort_by_filename": q_sort_by_filename,
    "agg_min_max_filtered": q_agg_min_max_filtered,
    "retention_guard": q_retention_guard,
    "agg_count_star": q_agg_count_star,
    "csv_validate_filter": q_csv_validate_filter,
    "cleanup_candidates": q_cleanup_candidates,
    "upload_status_rollup": q_upload_status_rollup,
    # relational EXT (§2B)
    "join_broadcast_dim": q_join_broadcast_dim,
    "join_sortmerge": q_join_sortmerge,
    "join_semi": q_join_semi,
    "asof_last_tick": q_asof_last_tick,
    "asof_next_tick": q_asof_next_tick,
    "agg_multikey": q_agg_multikey,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_rollup": q_agg_rollup,
    "win_row_number": q_win_row_number,
    "win_lag_delta": q_win_lag_delta,
    "win_moving_avg": q_win_moving_avg,
    "win_rank_suite": q_win_rank_suite,
    "win_first_last": q_win_first_last,
    "agg_approx_quantile": q_agg_approx_quantile,
    "agg_corr": q_agg_corr,
    "scalar_date_parts": q_scalar_date_parts,
    "topk_by_price": q_topk_by_price,
    "setop_union": q_setop_union,
    "setop_except": q_setop_except,
    "setop_intersect": q_setop_intersect,
    "scalar_dates": q_scalar_dates,
    "scalar_strings": q_scalar_strings,
    "log_event_json": q_log_event_json,
    "udf_mid_price": q_udf_mid_price,
    "udf_grouped_range": q_udf_grouped_range,
    "stream_tumbling_daily_count": q_stream_tumbling_daily_count,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "pivot_status": q_pivot_status,
    "sessionize_events": q_sessionize_events,
    "session_window_agg": q_session_window_agg,
    "win_range_frame": q_win_range_frame,
}

# --- driver-window rotation (round 8) -------------------------------
# The correctness driver verifies a ~50-key window from the FRONT of
# QUERIES each round. Front = never-driver-green fixable keys, then
# keys whose implementation CHANGED this round (hard re-check), then
# the keys verified longest ago (last-verified round computed by
# unioning the CORRECTNESS_r0*.json files). The big literal above
# keeps its grouping for readability; this reorder is the rotation
# policy, in one place. Round-8 makeup: sim_cosine_topk_ivf (fixed r5,
# never re-windowed — the only working key with no green driver row),
# the 5 keys touched by the r7-ADVICE fixes (cusum clamp, contract
# unique nulls, sketch probe fold-back), the full 34-key round-2
# cohort, and the 10 oldest round-3 keys. bpe_tokenize /
# agg_approx_distinct / agg_approx_quantile stay out: rows-only by
# design, a window slot can't upgrade them.
_R8_FRONT = [
    # never driver-green despite passing the full local replay
    "sim_cosine_topk_ivf",
    # changed in round 8 (ADVICE fixes): cusum S0 clamp (+oracle),
    # contract unique-null semantics (+oracle), per-row-id probe
    # fold-back in countmin/bloom, sample_pps guards
    "events_cusum", "data_contract_check", "countmin_term_counts",
    "bloom_prejoin_filter", "sample_pps",
    # last driver-verified in round 2 (the full cohort, 34 keys)
    "agg_corr", "agg_count_star", "agg_cube", "agg_grouping_sets",
    "agg_multikey", "agg_rollup", "asof_last_tick", "asof_next_tick",
    "cleanup_candidates", "csv_validate_filter", "join_broadcast_dim",
    "join_semi", "join_sortmerge", "log_event_json", "pivot_status",
    "scalar_date_parts", "scalar_dates", "scalar_strings",
    "session_window_agg", "sessionize_events", "setop_except",
    "setop_intersect", "setop_union", "stream_tumbling_daily_count",
    "topk_by_price", "udf_grouped_range", "udf_mid_price",
    "upload_status_rollup", "win_first_last", "win_lag_delta",
    "win_moving_avg", "win_range_frame", "win_rank_suite",
    "win_row_number",
    # oldest round-3 keys (alphabetical head of that cohort)
    "dedup_embedding_clusters", "dedup_embedding_cosine",
    "dedup_embedding_lsh", "dedup_exact", "dedup_simhash",
    "dedup_simhash_pairs", "doc_fingerprint", "docs_prep_pipeline",
    "lang_id", "lang_id_trigram",
]
QUERIES = {
    **{k: QUERIES[k] for k in _R8_FRONT},
    **{k: v for k, v in QUERIES.items() if k not in set(_R8_FRONT)},
}

ORACLES: dict[str, str] = {
    # One aggregate per column, unioned — the 1-row-agg-then-unpivot twin.
    "profile_columns": """
        SELECT 'doc_id' AS "column", count(*) AS n_rows,
               count(*) - count(doc_id) AS n_nulls,
               count(DISTINCT doc_id) AS n_distinct,
               CAST(min(doc_id) AS VARCHAR) AS min_value,
               CAST(max(doc_id) AS VARCHAR) AS max_value
        FROM documents
        UNION ALL
        SELECT 'lang', count(*), count(*) - count(lang),
               count(DISTINCT lang),
               CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', count(*), count(*) - count(n_chars),
               count(DISTINCT n_chars),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'source', count(*), count(*) - count(source),
               count(DISTINCT source),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents""",
    # Identical IEEE bin arithmetic: floor((x - lo) / width), width exact.
    "numeric_histogram": """
        WITH b AS (
            SELECT CAST(CASE WHEN value < 0.0 THEN -1
                             WHEN value >= 500.0 THEN 10
                             ELSE least(CAST(floor((value - 0.0) / 50.0)
                                             AS BIGINT), 9)
                        END AS INTEGER) AS bin_id
            FROM events WHERE value IS NOT NULL)
        SELECT bin_id,
               round(CAST(0.0 + bin_id * 50.0 AS DOUBLE), 6) AS bin_lo,
               round(CAST(0.0 + (bin_id + 1) * 50.0 AS DOUBLE), 6) AS bin_hi,
               count(*) AS n_rows
        FROM b GROUP BY bin_id""",
    # Full-outer reconciliation with null-safe per-column comparison
    # (IS DISTINCT FROM); unchanged keys drop out.
    "dataset_diff": """
        WITH v1 AS (SELECT doc_id, n_chars, source FROM documents
                    WHERE doc_id % 7 <> 0),
        v2 AS (SELECT doc_id,
                      CASE WHEN doc_id % 5 = 0 THEN n_chars + 1
                           ELSE n_chars END AS n_chars,
                      source
               FROM documents),
        j AS (
            SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
                   v1.n_chars AS old_n_chars, v2.n_chars AS new_n_chars,
                   v1.source AS old_source, v2.source AS new_source,
                   v1.doc_id IS NOT NULL AS in_old,
                   v2.doc_id IS NOT NULL AS in_new
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        SELECT doc_id,
               CASE WHEN NOT in_old THEN 'added'
                    WHEN NOT in_new THEN 'removed'
                    WHEN old_n_chars IS DISTINCT FROM new_n_chars
                         OR old_source IS DISTINCT FROM new_source
                         THEN 'changed'
               END AS change_type,
               old_n_chars, new_n_chars, old_source, new_source
        FROM j
        WHERE CASE WHEN NOT in_old THEN 'added'
                   WHEN NOT in_new THEN 'removed'
                   WHEN old_n_chars IS DISTINCT FROM new_n_chars
                        OR old_source IS DISTINCT FROM new_source
                        THEN 'changed'
              END IS NOT NULL""",
    # Median/MAD mirrored with the same 6dp rounding at each stage; the
    # MAD=0 degenerate branch (any nonzero deviation flags) is explicit.
    "events_mad_outliers": """
        WITH med AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS med
            FROM events WHERE value IS NOT NULL GROUP BY event_type),
        dev AS (
            SELECT e.event_id, e.event_type, e.value, m.med,
                   round(abs(e.value - m.med), 6) AS dev
            FROM events e JOIN med m USING (event_type)),
        mad AS (
            SELECT event_type,
                   round(quantile_cont(dev, 0.5), 6) AS mad
            FROM dev GROUP BY event_type)
        SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
               CASE WHEN m.mad > 0 THEN d.dev > 3.0 * m.mad
                    ELSE d.dev > 0 END AS is_outlier
        FROM dev d JOIN mad m USING (event_type)""",
    # String-rendered keys so tie-break order is identical ('10' < '2'
    # lexicographically on BOTH sides — the cast happens before ranking).
    "key_skew_report": """
        WITH counts AS (
            SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
            FROM events GROUP BY 1),
        total AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM counts),
        ranked AS (
            SELECT key, n_rows,
                   row_number() OVER (ORDER BY n_rows DESC,
                                      key ASC NULLS LAST) AS skew_rank
            FROM counts)
        SELECT key, n_rows,
               round(CAST(n_rows AS DOUBLE) / t, 6) AS share,
               CAST(skew_rank AS INTEGER) AS skew_rank
        FROM ranked CROSS JOIN total WHERE skew_rank <= 10""",
    # Bit-interleave mirrored term-for-term (DuckDB's >>, &, << on
    # BIGINT match Spark's long shifts for these non-negative operands).
    "zorder_key": """
        SELECT event_id, ({z}) AS zkey FROM events""".replace(
        "{z}",
        " | ".join(
            f"((((user_id % 256) >> {i}) & 1) << {2 * i})"
            f" | ((((event_id % 256) >> {i}) & 1) << {2 * i + 1})"
            for i in range(8)
        ),
    ),
    # Null-safe change detection (IS DISTINCT FROM == NOT eqNullSafe),
    # same three window passes over one (user, ts, event_id) sort.
    "scd2_history": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER w AS prev_type,
                   row_number() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        versions AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type)
        SELECT user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER wv AS valid_to,
               CAST(row_number() OVER wv AS INTEGER) AS version,
               lead(ts) OVER wv IS NULL AS is_current
        FROM versions
        WINDOW wv AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""",
    # Same scaffold as gap_fill_bars; interpolation arithmetic mirrored
    # term-for-term (pv + (nv - pv) * (t - pt) / (nt - pt), round 6).
    "gap_fill_interpolate": """
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
            SELECT series, CAST(i AS BIGINT) AS h,
                   TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 1 HOUR)
                       AS bar_start
            FROM (SELECT DISTINCT event_type AS series FROM events)
                 CROSS JOIN range(720) t(i)),
        joined AS (
            SELECT s.series, s.h, b.close
            FROM scaffold s LEFT JOIN bars b USING (series, bar_start)),
        win AS (
            SELECT series, h, close,
                   last_value(close IGNORE NULLS) OVER wp AS pv,
                   last_value(CASE WHEN close IS NOT NULL
                                   THEN CAST(h AS DOUBLE) END IGNORE NULLS)
                       OVER wp AS pt,
                   first_value(close IGNORE NULLS) OVER wn AS nv,
                   first_value(CASE WHEN close IS NOT NULL
                                    THEN CAST(h AS DOUBLE) END IGNORE NULLS)
                       OVER wn AS nt
            FROM joined
            WINDOW wp AS (PARTITION BY series ORDER BY h
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wn AS (PARTITION BY series ORDER BY h
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT series, CAST(h AS INTEGER) AS h,
               CASE WHEN close IS NOT NULL THEN close
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE round(pv + (nv - pv) * (CAST(h AS DOUBLE) - pt)
                               / (nt - pt), 6)
               END AS close_interp,
               close IS NOT NULL AS observed
        FROM win""",
    # The seeded hash rank replayed exactly (same pmod arithmetic as
    # sample_stratified, full 2^32 resolution — no % 1000).
    "sample_reservoir": """
        WITH h AS (
            SELECT doc_id, source,
                   ((((doc_id + 42) % 2147483648 + 2147483648) % 2147483648
                     * 2654435761) % 4294967296 + 4294967296) % 4294967296
                       AS hv
            FROM documents),
        r AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY hv ASC, doc_id ASC)
                       AS sample_rank
            FROM h)
        SELECT doc_id, source, CAST(sample_rank AS INTEGER) AS sample_rank
        FROM r WHERE sample_rank <= 5""",
    # percentile_cont semantics on both engines (pos = p*(n-1), linear
    # interpolation), rounded to 6dp.
    "agg_median_groups": """
        SELECT event_type,
               round(quantile_cont(value, 0.25), 6) AS p25,
               round(quantile_cont(value, 0.5), 6) AS median,
               round(quantile_cont(value, 0.75), 6) AS p75
        FROM events GROUP BY event_type""",
    # BM25 (Lucene idf), term-for-term the Spark plan: query-term-pruned
    # postings, per-term score rounded then DECIMAL-summed per (query,
    # doc), rank (score desc, id asc).
    "bm25_topk": f"""
        WITH q(query_id, query_text) AS (VALUES
            (1, 'fast table scan'), (2, 'stream window agg'),
            (3, 'customer join query'), (4, 'vector hash merge batch')),
        qt AS (SELECT DISTINCT query_id,
                      unnest(regexp_split_to_array(lower(trim(query_text, ' ')),
                                                   '\\s+')) AS term
               FROM q),
        dl AS (SELECT doc_id, CAST(len({{toks}}) AS DOUBLE) AS dl
               FROM documents),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                         CAST(SUM(CAST(dl AS DECIMAL(38,6))) AS DOUBLE)
                             / count(*) AS avgdl
                  FROM dl),
        tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
               FROM (SELECT doc_id, unnest({{toks}}) AS term FROM documents)
               WHERE term IN (SELECT term FROM qt)
               GROUP BY doc_id, term),
        df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
               FROM tf GROUP BY term),
        part AS (
            SELECT qt.query_id, tf.doc_id,
                   round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                         * tf * 2.2
                         / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                         6) AS part_score
            FROM tf JOIN df USING (term) JOIN qt USING (term)
                    JOIN dl USING (doc_id) CROSS JOIN stats),
        scored AS (
            SELECT query_id, doc_id,
                   round(CAST(SUM(CAST(part_score AS DECIMAL(38,6)))
                              AS DOUBLE), 6) AS score
            FROM part GROUP BY query_id, doc_id),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, doc_id ASC) AS r
            FROM scored)
        SELECT query_id, doc_id, score, CAST(r AS INTEGER) AS rank
        FROM ranked WHERE r <= 5""".replace("{toks}", _TOKS),
    "flagship_pricing_summary": _FLAGSHIP_SQL,
    "tpch_q1": _FLAGSHIP_SQL,
    **_REGISTRY_ORACLES,
    **_RELATIONAL_ORACLES,
    **_TPCH_ORACLES,
    **_LLM_ORACLES,
    # training-set assembly (operators/training.py): the hash is plain
    # integer arithmetic and the packing a window cumsum, so both are
    # exactly portable to the DuckDB oracle
    "train_val_split": """
        SELECT doc_id,
               CASE WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 900
                      THEN 'train'
                    WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 950
                      THEN 'val'
                    ELSE 'test' END AS split
        FROM documents""",
    "corpus_mix": """
        SELECT doc_id, source
        FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 % 1000 <
              CASE source WHEN 'src0' THEN 1000
                          WHEN 'src1' THEN 500
                          WHEN 'src2' THEN 250
                          ELSE 0 END""",
    "corpus_mix_upsampled": """
        SELECT doc_id, source,
               UNNEST(range(1, copies + 1)) AS copy_id
        FROM (
            SELECT doc_id, source,
                   t // 1000
                   + CASE WHEN (doc_id * 2654435761) % 4294967296 % 1000
                               < t % 1000
                          THEN 1 ELSE 0 END AS copies
            FROM (
                SELECT doc_id, source,
                       CASE source WHEN 'src0' THEN 2500
                                   WHEN 'src1' THEN 1000
                                   WHEN 'src2' THEN 250
                                   ELSE 0 END AS t
                FROM documents))
        WHERE copies > 0""",
    "pack_sequences": """
        SELECT doc_id, source, n_chars,
               cb // 8192 AS bin_id,
               cb % 8192 AS bin_offset
        FROM (
            SELECT doc_id, source, n_chars,
                   CAST(COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cb
            FROM documents)""",
    # Seeded id-hash gate, term-for-term the rel.sample_stratified filter
    # (pmod pre-reduction mirrored as ((x % m) + m) % m — DuckDB's % keeps
    # the dividend's sign like Spark's).
    "sample_stratified": """
        SELECT doc_id, source FROM documents
        WHERE ((((doc_id + 42) % 2147483648 + 2147483648) % 2147483648
                * 2654435761) % 4294967296 + 4294967296) % 4294967296
              % 1000 <
              CASE source WHEN 'src0' THEN 1000
                          WHEN 'src1' THEN 500
                          WHEN 'src2' THEN 250
                          ELSE 0 END""",
    # The codec fake's features are bytes of md5(payload) / 255 where the
    # payload is the UTF-8 hex of md5(text) — i.e. md5(md5(text)), which
    # DuckDB's VARCHAR-only md5() can reproduce; the chained + mirrors the
    # Spark left-fold addition order exactly.
    "multimodal_features": """
        SELECT doc_id AS media_id, 'image' AS kind,
               round(CAST(('0x' || substr(h, 1, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 3, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 5, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 7, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 9, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 11, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 13, 2)) AS INT) / 255.0
                   + CAST(('0x' || substr(h, 15, 2)) AS INT) / 255.0,
                     6) AS feature_sum,
               true AS decode_ok
        FROM (SELECT doc_id, md5(md5(text)) AS h
              FROM documents WHERE doc_id < 200)""",
    # IVF top-k with train_iters=0 is fully deterministic: seed centroids =
    # the 16 lowest-id vectors (cid = id rank), nearest-centroid assignment
    # by squared L2 (tie -> lowest cid, the min_by struct order), probe the
    # 4 centroids nearest the query (Python's stable sort -> ties by cid),
    # then exact cosine top-10 over the probed clusters.
    "sim_cosine_topk_ivf": """
        WITH emb AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        cent AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                       AS cid, v AS cv
            FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16)),
        dists AS (
            SELECT e.vec_id, e.v, c.cid,
                   list_sum(list_transform(range(1, len(e.v) + 1),
                       i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d
            FROM emb e CROSS JOIN cent c),
        assigned AS (
            SELECT vec_id, v, cid
            FROM (SELECT vec_id, v, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY d, cid) AS rn
                  FROM dists)
            WHERE rn = 1),
        q AS (SELECT v AS qv,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
              FROM emb WHERE vec_id = 0),
        probe AS (
            SELECT c.cid
            FROM cent c CROSS JOIN q
            ORDER BY list_sum(list_transform(range(1, len(c.cv) + 1),
                     i -> (c.cv[i] - q.qv[i]) * (c.cv[i] - q.qv[i]))),
                     c.cid
            LIMIT 4)
        SELECT a.vec_id,
               round(list_sum(list_transform(range(1, len(a.v) + 1),
                     i -> a.v[i] * q.qv[i]))
                     / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                        * q.qn), 6) AS score
        FROM assigned a CROSS JOIN q
        WHERE a.cid IN (SELECT cid FROM probe)
        ORDER BY score DESC, a.vec_id ASC LIMIT 10""",
    # intentionally absent (rows-only checks): agg_approx_distinct /
    # agg_approx_quantile (HLL/GK sketch estimates are engine-specific).
    # Everything else — including both LSH paths (oracles replicate the
    # deterministic hyperplane buckets), IVF (deterministic seed
    # quantizer), the hash-gated stratified sample, and the multimodal
    # codec fake (md5-derived) — is value-hash-checked against DuckDB.
}

# The *_indexed graph keys read the persisted kNN edge set built with
# the SAME frozen dials (k=3, 4 planes) the inline pipeline uses, so
# their oracles are literally the inline oracles.
ORACLES["knn_triangles_indexed"] = ORACLES["knn_triangles"]
ORACLES["pagerank_knn_indexed"] = ORACLES["pagerank_knn"]
ORACLES["sim_topk_lsh_indexed"] = ORACLES["sim_cosine_topk_lsh"]
ORACLES["sim_topk_ivf_indexed"] = ORACLES["sim_cosine_topk_ivf"]
ORACLES["bm25_topk_indexed"] = ORACLES["bm25_topk"]
# Hybrid retrieve-then-rerank: the BM25 oracle widened to the candidate
# count, then cosine against the query-id embedding re-ranks — same 6dp
# round-before-rank discipline as the ANN oracles.
ORACLES["hybrid_search"] = """
    WITH cand AS ({cand}),
    nv AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                  sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
           FROM embeddings),
    scored AS (
        SELECT c.query_id, c.doc_id, c.score AS bm25_score,
               round(list_sum(list_transform(range(1, len(d.v) + 1),
                     i -> d.v[i] * q.v[i])) / (d.n * q.n), 6) AS cosine
        FROM cand c JOIN nv d ON c.doc_id = d.vec_id
                    JOIN nv q ON c.query_id = q.vec_id)
    SELECT query_id, doc_id, bm25_score, cosine, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, doc_id ASC) AS rn FROM scored)
    WHERE rn <= 5""".replace(
    "{cand}", ORACLES["bm25_topk"].replace("WHERE r <= 5", "WHERE r <= 20")
)
# Content-keyed split: the canonical id is min(doc_id) per normalized
# fingerprint; the split CASE runs split_bucket's hash on the canonical.
ORACLES["split_by_content"] = """
    WITH fp AS (
        SELECT doc_id, md5(array_to_string({toks}, ' ')) AS f
        FROM documents),
    c AS (SELECT f, MIN(doc_id) AS canonical_id FROM fp GROUP BY f)
    SELECT fp.doc_id, c.canonical_id,
           CASE WHEN (c.canonical_id * 2654435761)
                     % 4294967296 % 1000 < 900 THEN 'train'
                WHEN (c.canonical_id * 2654435761)
                     % 4294967296 % 1000 < 950 THEN 'val'
                ELSE 'test' END AS split
    FROM fp JOIN c USING (f)""".replace("{toks}", _TOKS)
# Pair recall: the two member pair oracles (exact all-pairs + LSH
# candidates) compose; counts run on the post-banding survivor sets.
ORACLES["dedup_pair_recall"] = """
    WITH ex AS ({exact}),
    ap AS ({approx}),
    ke AS (SELECT count(*) AS k_exact
           FROM (SELECT DISTINCT id_a, id_b FROM ex)),
    h AS (SELECT count(*) AS n_hit
          FROM (SELECT DISTINCT ap.id_a, ap.id_b
                FROM ap JOIN ex ON ap.id_a = ex.id_a
                                AND ap.id_b = ex.id_b))
    SELECT k_exact, n_hit,
           round(CAST(n_hit AS DOUBLE) / k_exact, 6) AS recall
    FROM ke, h""".replace("{exact}", ORACLES["dedup_embedding_cosine"]).replace(
    "{approx}", ORACLES["dedup_embedding_lsh"]
)
# Recall@k: both member top-k oracles already replicate the planes; the
# fusion is two counts and a ratio.
ORACLES["ann_recall_at_k"] = """
    WITH ex AS ({exact}),
    ap AS ({approx}),
    ke AS (SELECT count(DISTINCT vec_id) AS k_exact FROM ex),
    h AS (SELECT count(DISTINCT ap.vec_id) AS n_hit
          FROM ap JOIN ex ON ap.vec_id = ex.vec_id)
    SELECT k_exact, n_hit,
           round(CAST(n_hit AS DOUBLE) / k_exact, 6) AS recall
    FROM ke, h""".replace("{exact}", ORACLES["sim_cosine_topk"]).replace(
    "{approx}", ORACLES["sim_cosine_topk_lsh"]
)
# Temperature mixture: alpha 0.5 as sqrt (IEEE-exact); the normalizer
# accumulates as DECIMAL so summation order cannot bite.
ORACLES["mixture_temperature"] = """
    WITH per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(SUM(len({toks})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    t AS (
        SELECT *,
               CAST(SUM(n_tokens) OVER () AS DOUBLE) AS total,
               sqrt(CAST(n_tokens AS DOUBLE)
                    / CAST(SUM(n_tokens) OVER () AS DOUBLE)) AS tshare
        FROM per_src),
    s AS (
        SELECT *,
               CAST(SUM(CAST(tshare AS DECIMAL(38,12))) OVER ()
                    AS DOUBLE) AS tsum
        FROM t)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total, 6) AS current_share,
           round(tshare / tsum, 6) AS target_share,
           CASE WHEN n_tokens > 0
                THEN round((tshare / tsum) * total / n_tokens, 6)
           END AS weight,
           CASE WHEN n_tokens > 0
                THEN CAST(ceil(round((tshare / tsum) * total / n_tokens,
                                     6)) AS INTEGER)
           END AS repeat_epochs
    FROM s""".replace("{toks}", _TOKS)
# Rolling correlation: five decimal moments over the same ROWS frame;
# explicit n>=2 / variance guards (Spark NULL vs DuckDB inf on /0).
ORACLES["rolling_corr"] = """
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
           l_extendedprice, l_quantity,
           round(CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0
                      THEN (n * sxy - sx * sy)
                           / (sqrt(n * sxx - sx * sx)
                              * sqrt(n * syy - sy * sy))
                 END, 6) + 0 AS rolling_corr
    FROM (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               l_extendedprice, l_quantity,
               CAST(count(*) OVER w AS DOUBLE) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) OVER w
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER w
                    AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice * l_quantity
                             AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(38,10))) OVER w AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_quantity * l_quantity
                             AS DECIMAL(38,10))) OVER w AS DOUBLE) AS syy
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate ASC, l_orderkey ASC,
                              l_linenumber ASC
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))"""
# int8 quantization: floor(x + 0.5) is round-half-up on both engines;
# the scale is the exact IEEE quotient max|x|/127 on BOTH engines —
# emitted unrounded so dequantization is faithful (display-rounding it
# shifted q*scale by up to 127 ulps; caught by the property test).
ORACLES["vector_quantize_int8"] = """
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
               list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings)
    SELECT vec_id,
           maxabs / CAST(127 AS DOUBLE) AS scale,
           array_to_string(
               CASE WHEN maxabs > 0 THEN
                    list_transform(ve, x -> CAST(floor(
                        x / (maxabs / CAST(127 AS DOUBLE))
                        + CAST(0.5 AS DOUBLE)) AS INTEGER))
               ELSE list_transform(ve, x -> 0) END, ',') AS qvec_csv
    FROM v"""
# Index-backed hybrid == inline hybrid by construction (shared rerank
# stage; index BM25 == inline BM25 — both equality-tested), so it
# registers with the same oracle, like bm25_topk_indexed before it.
ORACLES["hybrid_search_indexed"] = ORACLES["hybrid_search"]
# RRF: both member lists capped at 20; contributions are exact rationals
# summed in a fixed expression order (CAST(1.0 AS DOUBLE) keeps DuckDB's
# decimal literal from planning DECIMAL division).
ORACLES["hybrid_rrf"] = """
    WITH cand AS ({cand}),
    lex AS (SELECT query_id, doc_id, rank AS r_lex FROM cand),
    nv AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                  sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
           FROM embeddings),
    sem0 AS (
        SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
               round(list_sum(list_transform(range(1, len(d.v) + 1),
                     i -> d.v[i] * q.v[i])) / (d.n * q.n), 6) AS cos
        FROM nv d JOIN nv q ON q.vec_id IN (1, 2, 3, 4)),
    sem AS (
        SELECT query_id, doc_id, CAST(rn AS INTEGER) AS r_sem
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, doc_id ASC) AS rn FROM sem0)
        WHERE rn <= 20),
    fused AS (
        SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
               COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               r_lex, r_sem,
               round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_lex), 0.0)
                     + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_sem), 0.0),
                     6) AS rrf_score
        FROM lex FULL OUTER JOIN sem
             ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
    SELECT query_id, doc_id, r_lex, r_sem, rrf_score,
           CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_score DESC, doc_id ASC) AS rn FROM fused)
    WHERE rn <= 5""".replace(
    "{cand}", ORACLES["bm25_topk"].replace("WHERE r <= 5", "WHERE r <= 20")
)
# CUSUM via the running-extremum identity — cumulative sums fold in the
# (ts, event_id) order on both engines, so the doubles add identically.
# Split leakage: the split CASE replicates split_bucket's Knuth hash;
# 13-gram windows via the shared _SHINGLES13 macro; the pair join runs
# on DISTINCT (split, md5) rows.
ORACLES["split_leakage_check"] = """
    WITH s AS (
        SELECT CASE WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 900
                      THEN 'train'
                    WHEN (doc_id * 2654435761) % 4294967296 % 1000 < 950
                      THEN 'val'
                    ELSE 'test' END AS split,
               {sh} AS sh
        FROM documents),
    f AS (SELECT DISTINCT split, md5(g.gram) AS fp
          FROM s, LATERAL unnest(sh) AS g(gram)),
    p AS (SELECT a.split AS split_a, b.split AS split_b
          FROM f a JOIN f b ON a.fp = b.fp AND a.split < b.split)
    SELECT split_a, split_b, count(*) AS n_shared_contents
    FROM p GROUP BY split_a, split_b""".replace("{sh}", _SHINGLES13)
# Winsorization: clamp to the rounded exact quantiles; nulls fall
# through every comparison to ELSE value (stays null) on both engines.
ORACLES["events_winsorized"] = """
    WITH e AS (
        SELECT event_type,
               round(quantile_cont(value, 0.05), 6) AS q_lo,
               round(quantile_cont(value, 0.95), 6) AS q_hi
        FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT ev.event_id, ev.event_type, ev.value,
           CASE WHEN value < q_lo THEN q_lo
                WHEN value > q_hi THEN q_hi
                ELSE value END AS value_winsorized,
           q_lo, q_hi
    FROM events ev LEFT JOIN e USING (event_type)"""
# Equi-depth histogram: DuckDB quantile_cont == profile.exact_quantiles
# (pos = q*(n-1), linear interp — hash-exact since round 6); ties land
# in the lower bin (value <= edge) on both sides.
ORACLES["equi_depth_histogram"] = """
    WITH e AS (
        SELECT event_type,
               round(quantile_cont(value, 0.00), 6) AS e0,
               round(quantile_cont(value, 0.25), 6) AS e1,
               round(quantile_cont(value, 0.50), 6) AS e2,
               round(quantile_cont(value, 0.75), 6) AS e3,
               round(quantile_cont(value, 1.00), 6) AS e4
        FROM events WHERE value IS NOT NULL GROUP BY event_type),
    b AS (
        SELECT ev.event_type,
               CASE WHEN value <= e1 THEN 1
                    WHEN value <= e2 THEN 2
                    WHEN value <= e3 THEN 3
                    ELSE 4 END AS bin,
               CASE WHEN value <= e1 THEN e0
                    WHEN value <= e2 THEN e1
                    WHEN value <= e3 THEN e2
                    ELSE e3 END AS lo,
               CASE WHEN value <= e1 THEN e1
                    WHEN value <= e2 THEN e2
                    WHEN value <= e3 THEN e3
                    ELSE e4 END AS hi
        FROM events ev JOIN e USING (event_type)
        WHERE value IS NOT NULL)
    SELECT event_type, CAST(bin AS INTEGER) AS bin, lo, hi,
           count(*) AS n_rows
    FROM b GROUP BY event_type, bin, lo, hi"""
# OLS trend via the agg_corr decimal-moment pattern; x in days since the
# 2024-01-01 anchor. floor(epoch(ts)) mirrors Spark unix_timestamp's
# second truncation; zero-variance guards are explicit because Spark's
# double div-by-zero yields NULL while DuckDB's yields inf.
ORACLES["events_ols_trend"] = """
    WITH base AS (
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200)
                   / CAST(86400 AS DOUBLE) AS x,
               value AS y
        FROM events),
    m AS (
        SELECT event_type,
               count(*) AS n_rows,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
        FROM base GROUP BY event_type)
    SELECT event_type, n_rows AS n,
           round(CASE WHEN n * sxx - sx * sx > 0
                      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                 END, 6) + 0 AS slope,
           round(CASE WHEN n * sxx - sx * sx > 0
                      THEN (sy - ((n * sxy - sx * sy)
                                  / (n * sxx - sx * sx)) * sx) / n
                 END, 6) + 0 AS intercept,
           round(CASE WHEN n * sxx - sx * sx > 0
                       AND n * syy - sy * sy > 0
                      THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                           / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 END, 6) + 0 AS r2
    FROM m"""
# Mixture rebalance: integer token sums + one division per source; the
# CASE mirrors the Spark when-chain; DuckDB decimal literals cast DOUBLE.
ORACLES["mixture_rebalance"] = """
    WITH per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(SUM(len({toks})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    t AS (
        SELECT *,
               CAST(SUM(n_tokens) OVER () AS DOUBLE) AS total,
               CASE source
                   WHEN 'src0' THEN CAST(0.3 AS DOUBLE)
                   WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
                   WHEN 'src2' THEN CAST(0.2 AS DOUBLE)
                   WHEN 'src3' THEN CAST(0.2 AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE)
               END AS target_share
        FROM per_src)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total, 6) AS current_share,
           target_share,
           CASE WHEN n_tokens > 0
                THEN round(target_share * total / n_tokens, 6)
           END AS weight,
           CASE WHEN n_tokens > 0
                THEN CAST(ceil(round(target_share * total / n_tokens, 6))
                          AS INTEGER)
           END AS repeat_epochs
    FROM t""".replace("{toks}", _TOKS)
# Bigram-LM fluency: 48-bit gram hashes via ('0x' || md5-prefix)::BIGINT
# (the portable hex->int recipe); per-bigram probability rounded to 6 dp
# before the decimal mean, mirroring the Spark side exactly.
ORACLES["ngram_lm_score"] = """
    WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t[i.i] || ' ' || t[i.i + 1]), 1, 12))
                    AS BIGINT) AS bg_h,
               CAST(('0x' || substr(md5(t[i.i]), 1, 12)) AS BIGINT) AS pre_h
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS i(i)
        WHERE len(t) >= 2),
    uni AS (
        SELECT CAST(('0x' || substr(md5(u.tok), 1, 12)) AS BIGINT) AS pre_h,
               count(*) AS c_pre
        FROM (SELECT unnest(t) AS tok FROM toks) u GROUP BY 1),
    bgc AS (SELECT bg_h, count(*) AS c_bg FROM grams GROUP BY 1),
    p AS (SELECT doc_id,
                 round(CAST(c_bg AS DOUBLE) / c_pre, 6) AS p
          FROM grams JOIN bgc USING (bg_h) JOIN uni USING (pre_h)),
    sc AS (SELECT doc_id, count(*) AS n_bigrams,
                  round(CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE)
                        / count(*), 6) AS lm_score
           FROM p GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.lm_score,
           COALESCE(sc.lm_score >= 0.034, FALSE) AS ok_fluency
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".replace(
    "{toks}", _TOKS
)
ORACLES["events_cusum"] = """
    WITH s AS (
        SELECT event_type, ts, event_id, value,
               SUM(CAST(value AS DOUBLE) - 52.0) OVER w AS up,
               SUM(CAST(value AS DOUBLE) - 48.0) OVER w AS dn
        FROM events
        WINDOW w AS (PARTITION BY event_type
                     ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    c AS (
        SELECT event_type, ts, event_id, value,
               round(up - LEAST(0.0, MIN(up) OVER w2), 6) AS cusum_pos,
               round(GREATEST(0.0, MAX(dn) OVER w2) - dn, 6) AS cusum_neg
        FROM s
        WINDOW w2 AS (PARTITION BY event_type
                      ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_type, ts, event_id, value, cusum_pos, cusum_neg,
           (cusum_pos > 200.0 OR cusum_neg > 200.0) AS is_alert
    FROM c"""
# Multi-probe: the single-probe oracle extended with the probe-set CTEs
# (query-plane margins -> 3 smallest-|dot| flips, floor(|d|*1e6) + plane
# index tie-break — the exact arithmetic the driver-side Python uses).
ORACLES["sim_topk_lsh_multiprobe"] = """
    WITH planes AS (
        SELECT p.p, i.i,
               CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' ||
                                    CAST(i.i AS VARCHAR)), 8, 1)
                         IN ('0','2','4','6','8','a','c','e')
                    THEN 1.0 ELSE -1.0 END AS w
        FROM (SELECT unnest(range(8)) AS p) p,
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
    qd AS (SELECT p, d FROM dots WHERE vec_id = 0),
    qb AS (SELECT bucket AS b FROM buckets WHERE vec_id = 0),
    flips AS (
        SELECT p, row_number() OVER (
                   ORDER BY CAST(floor(abs(d) * 1000000) AS BIGINT) ASC,
                            p ASC) AS r
        FROM qd),
    probes AS (
        SELECT (SELECT b FROM qb) AS bucket
        UNION ALL
        SELECT xor((SELECT b FROM qb), CAST(power(2, p) AS BIGINT))
        FROM flips WHERE r <= 3),
    q AS (SELECT nv.v AS qv, nv.n AS qn FROM normed nv WHERE nv.vec_id = 0)
    SELECT nv.vec_id,
           round(list_sum(list_transform(range(1, len(nv.v) + 1),
                 i -> CAST(nv.v[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (nv.n * q.qn), 6) AS score
    FROM normed nv JOIN buckets bk USING (vec_id) CROSS JOIN q
    WHERE bk.bucket IN (SELECT bucket FROM probes)
    ORDER BY score DESC, nv.vec_id ASC LIMIT 10"""
ORACLES["bpe_segment_pinned"] = _bpe_pinned_sql()
# Incremental apply == full rebuild on the union, so its oracle is
# literally the full-rebuild SQL over the whole event log.
ORACLES["scd2_apply"] = ORACLES["scd2_history"]
# Same bin arithmetic as numeric_histogram, then share deltas over the
# union of consecutive windows' bins; TVD DECIMAL(38,18)-accumulated and
# the worst bin picked by the deterministic (|d| DESC, bin ASC) rank.
ORACLES["histogram_drift"] = """
    WITH b AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
               CAST(CASE WHEN value < 0.0 THEN -1
                         WHEN value >= 500.0 THEN 10
                         ELSE least(CAST(floor((value - 0.0) / 50.0)
                                         AS BIGINT), 9)
                    END AS INTEGER) AS bin_id
        FROM events WHERE value IS NOT NULL),
    h AS (SELECT win_start, bin_id, count(*) AS n FROM b GROUP BY 1, 2),
    wins AS (SELECT win_start, row_number() OVER (ORDER BY win_start) AS seq
             FROM (SELECT DISTINCT win_start FROM h)),
    hs AS (SELECT seq, bin_id, n FROM h JOIN wins USING (win_start)),
    tot AS (SELECT seq, SUM(n) AS tot FROM hs GROUP BY seq),
    sh AS (SELECT seq, bin_id, CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS p
           FROM hs JOIN tot USING (seq)),
    pv AS (SELECT seq + 1 AS seq, bin_id, p AS q FROM sh),
    al AS (SELECT coalesce(sh.seq, pv.seq) AS seq,
                  coalesce(sh.bin_id, pv.bin_id) AS bin_id,
                  round(coalesce(sh.p, CAST(0.0 AS DOUBLE))
                        - coalesce(pv.q, CAST(0.0 AS DOUBLE)), 8) AS d
           FROM sh FULL OUTER JOIN pv
             ON sh.seq = pv.seq AND sh.bin_id = pv.bin_id
           WHERE coalesce(sh.seq, pv.seq) >= 2
             AND coalesce(sh.seq, pv.seq) <= (SELECT max(seq) FROM wins)),
    rk AS (SELECT *, row_number() OVER (PARTITION BY seq
                     ORDER BY abs(d) DESC, bin_id ASC) AS r FROM al),
    summ AS (SELECT seq,
                    round(CAST(SUM(CAST(abs(d) AS DECIMAL(38,18)))
                               AS DOUBLE) * CAST(0.5 AS DOUBLE), 9) AS tvd,
                    max(CASE WHEN r = 1 THEN abs(d) END) AS linf,
                    max(CASE WHEN r = 1 THEN bin_id END) AS linf_bin_id
             FROM rk GROUP BY seq)
    SELECT w.win_start, p.win_start AS prev_win_start, tvd, linf,
           linf_bin_id
    FROM summ JOIN wins w USING (seq) JOIN wins p ON p.seq = summ.seq - 1"""
# Categorical drift: the histogram_drift oracle with the category value
# as the bin id (the comparator is generic over its bin column).
ORACLES["category_drift"] = ORACLES["histogram_drift"].replace(
    """    WITH b AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
               CAST(CASE WHEN value < 0.0 THEN -1
                         WHEN value >= 500.0 THEN 10
                         ELSE least(CAST(floor((value - 0.0) / 50.0)
                                         AS BIGINT), 9)
                    END AS INTEGER) AS bin_id
        FROM events WHERE value IS NOT NULL),""",
    """    WITH b AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
               event_type AS bin_id
        FROM events WHERE event_type IS NOT NULL),""",
)
# Portable HLL: rank CASE + numerator literal are generated by the SAME
# sketch-module helpers the Spark side uses, so the two definitions can
# never drift; the estimate is one double division of bit-identical
# operands on both engines, hence emitted unrounded.
_HLL_V = "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12))::BIGINT"
ORACLES["hll_distinct"] = f"""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                    % 64 AS INTEGER) AS reg,
               {sketch.rank_case_sql(_HLL_V)} AS rank
        FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, reg, CAST(max(rank) AS INTEGER) AS rank
          FROM h GROUP BY event_type, reg),
    a AS (SELECT event_type,
                 CAST(count(*) AS INTEGER) AS n_registers,
                 CAST(SUM(1::BIGINT << (49 - rank)) AS BIGINT) AS hit
          FROM r GROUP BY event_type)
    SELECT event_type, n_registers,
           hit + CAST(64 - n_registers AS BIGINT) * (1::BIGINT << 49) AS reg_sum,
           {sketch.hll_numerator(64)!r}
               / CAST(hit + CAST(64 - n_registers AS BIGINT)
                      * (1::BIGINT << 49) AS DOUBLE) AS est_distinct
    FROM a"""

# Count-min: every term OCCURRENCE fans out to d=4 row-salted cells;
# estimates are min over the probe's 4 cells — integer-exact end to end.
ORACLES["countmin_term_counts"] = f"""
    WITH terms AS (SELECT unnest({_TOKS}) AS term FROM documents),
    truth AS (SELECT term, count(*) AS true_count FROM terms GROUP BY term),
    top AS (SELECT * FROM truth ORDER BY true_count DESC, term ASC LIMIT 20),
    fan AS (SELECT term, rw FROM terms
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw)),
    cells AS (
        SELECT rw,
               CAST(('0x' || substr(md5(CAST(rw AS VARCHAR) || '|' || term),
                                    1, 8))::BIGINT % 32 AS INTEGER) AS bkt,
               CAST(count(*) AS BIGINT) AS cnt
        FROM fan GROUP BY rw, bkt),
    probe AS (
        SELECT t.term, t.true_count, p.rw,
               CAST(('0x' || substr(md5(CAST(p.rw AS VARCHAR) || '|' || t.term),
                                    1, 8))::BIGINT % 32 AS INTEGER) AS bkt
        FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rw) p),
    est AS (
        SELECT term, true_count,
               min(coalesce(c.cnt, 0)) AS est_count
        FROM probe p LEFT JOIN cells c USING (rw, bkt)
        GROUP BY term, true_count)
    SELECT term, true_count, est_count,
           est_count - true_count AS overcount
    FROM est"""

# Bloom: 64 words x 63 bits, 3 row-salted positions per key; membership
# = all three bits set. Build over raw (non-distinct) members — BIT_OR
# is idempotent, so the oracle's DISTINCT build is the same filter.
ORACLES["bloom_prejoin_filter"] = """
    WITH members AS (
        SELECT DISTINCT o_custkey AS kk FROM orders WHERE o_orderstatus = 'F'),
    pos AS (
        SELECT kk,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || '|'
                                   || CAST(kk AS VARCHAR)), 1, 8))::BIGINT
                   % 4032 AS p
        FROM members CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
    words AS (
        SELECT CAST(p // 63 AS INTEGER) AS w,
               bit_or(1::BIGINT << CAST(p % 63 AS INTEGER)) AS bits
        FROM pos GROUP BY 1),
    probe AS (
        SELECT c_custkey,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || '|'
                                   || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                   % 4032 AS p
        FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
    flags AS (
        SELECT c_custkey,
               min(CASE WHEN b.bits IS NOT NULL
                         AND (b.bits >> CAST(p % 63 AS INTEGER)) % 2 = 1
                    THEN 1 ELSE 0 END) AS a
        FROM probe LEFT JOIN words b ON CAST(p // 63 AS INTEGER) = b.w
        GROUP BY c_custkey)
    SELECT f.c_custkey, a = 1 AS in_bloom, m.kk IS NOT NULL AS is_member
    FROM flags f LEFT JOIN members m ON f.c_custkey = m.kk"""

# Contract report: one subquery per rule in the oracle (the Spark side
# computes all of them in a single aggregation; the per-rule subqueries
# here are semantically identical and easier to audit rule-by-rule).
ORACLES["data_contract_check"] = """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders),
    r AS (
        SELECT 0 AS rule_id, 'not_null' AS rule, 'o_orderdate' AS col_name,
               (SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS v
        UNION ALL
        SELECT 1, 'unique', 'o_orderkey',
               (SELECT count(o_orderkey) - count(DISTINCT o_orderkey)
                FROM orders)
        UNION ALL
        SELECT 2, 'range', 'o_totalprice',
               (SELECT count(*) FROM orders
                WHERE o_totalprice IS NOT NULL
                  AND (o_totalprice < 0.0 OR o_totalprice > 250000.0))
        UNION ALL
        SELECT 3, 'in_set', 'o_orderstatus',
               (SELECT count(*) FROM orders
                WHERE o_orderstatus IS NOT NULL
                  AND o_orderstatus NOT IN ('F', 'O'))
        UNION ALL
        SELECT 4, 'fk', 'o_custkey',
               (SELECT count(*) FROM orders o
                LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                  ON o.o_custkey = c.c_custkey
                WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
        UNION ALL
        SELECT 5, 'regex', 'o_orderpriority',
               (SELECT count(*) FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND NOT regexp_matches(o_orderpriority, '^[1-5]-'))
        UNION ALL
        SELECT 6, 'expr', 'o_totalprice',
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_totalprice > 2000, FALSE)))
    SELECT CAST(rule_id AS INTEGER) AS rule_id, rule, col_name,
           CAST(v AS BIGINT) AS n_violations, n.n_rows,
           v = 0 AS passed
    FROM r, n"""

# ACF: lag columns share one window CTE; one UNION-ALL block per lag;
# then the agg_corr decimal-moment pattern with explicit degenerate
# guards, operand order mirrored term-for-term with profile.acf.
ORACLES["events_acf"] = """
    WITH o AS (
        SELECT event_type, CAST(value AS DOUBLE) AS x,
               lag(CAST(value AS DOUBLE), 1) OVER w AS p1,
               lag(CAST(value AS DOUBLE), 2) OVER w AS p2,
               lag(CAST(value AS DOUBLE), 3) OVER w AS p3
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
    p AS (
        SELECT event_type, 1 AS lag, x, p1 AS p FROM o WHERE p1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, x, p2 FROM o WHERE p2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, x, p3 FROM o WHERE p3 IS NOT NULL),
    m AS (
        SELECT event_type, lag,
               count(*) AS n_pairs,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE) AS sp,
               CAST(SUM(CAST(x * p AS DECIMAL(38,10))) AS DOUBLE) AS sxp,
               CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(p * p AS DECIMAL(38,10))) AS DOUBLE) AS spp
        FROM p GROUP BY event_type, lag)
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
           CASE WHEN n_pairs >= 2
                 AND n * sxx - sx * sx > 0
                 AND n * spp - sp * sp > 0
                THEN (n * sxp - sx * sp)
                     / (sqrt(n * sxx - sx * sx)
                        * sqrt(n * spp - sp * sp))
           END + 0.0 AS acf
    FROM m"""

# Control chart: the win_ewma halving-fold idiom over a PRIOR-rows
# frame (list_reduce's seedless fold == Spark's 0.0-seeded acc/2 + x,
# since 0/2 + v1 is exactly v1), guarded for the warm-up window;
# per-key sigma from decimal moments + one IEEE sqrt.
ORACLES["events_control_chart"] = """
    WITH b AS (
        SELECT event_type, ts, event_id, CAST(value AS DOUBLE) AS value,
               list(CAST(value AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING) AS vals
        FROM events),
    s AS (
        SELECT event_type,
               count(value) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                             AS DECIMAL(38,10))) AS DOUBLE) AS sxx
        FROM events GROUP BY event_type),
    s2 AS (
        SELECT event_type,
               CASE WHEN n >= 2
                     AND (CAST(n AS DOUBLE) * sxx - sx * sx)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) > 0
                    THEN sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
               END AS sigma
        FROM s),
    p AS (
        SELECT event_type, ts, event_id, value,
               CASE WHEN len(vals) >= 8 THEN
                   list_reduce(vals, (a, v) -> a / 2.0 + v)
                   / list_reduce(list_transform(vals, v -> CAST(1.0 AS DOUBLE)),
                                 (a, v) -> a / 2.0 + v)
               END AS pred
        FROM b)
    SELECT p.event_type, ts, event_id, value,
           pred + 0.0 AS ewma_pred,
           (value - pred) + 0.0 AS residual,
           coalesce(abs(value - pred) > 3.0 * sigma, FALSE) AS is_alert
    FROM p LEFT JOIN s2 ON p.event_type = s2.event_type"""

# Seasonal decomposition: integer epoch-day bucket (no engine dayofweek
# conventions); key mean re-derived from the (key, bucket) partial sums
# so there is exactly one fact aggregation.
ORACLES["events_seasonal"] = """
    WITH e AS (
        SELECT event_type, ts,
               CAST(CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) % 7
                    AS INTEGER) AS season_bucket,
               CAST(value AS DOUBLE) AS x
        FROM events),
    g AS (
        SELECT event_type, season_bucket,
               count(*) AS n,
               SUM(CAST(x AS DECIMAL(38,6))) AS s
        FROM e GROUP BY event_type, season_bucket),
    t AS (
        SELECT event_type, SUM(n) AS nk, SUM(s) AS sk
        FROM g GROUP BY event_type),
    st AS (
        SELECT g.event_type, g.season_bucket,
               CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) AS km,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE) AS seas
        FROM g JOIN t ON g.event_type = t.event_type)
    SELECT e.event_type, e.ts, e.season_bucket, e.x AS value,
           km + 0.0 AS key_mean,
           seas + 0.0 AS seasonal,
           (e.x - km - seas) + 0.0 AS residual
    FROM e JOIN st ON e.event_type = st.event_type
                  AND e.season_bucket = st.season_bucket"""

# PPS systematic sampling: identical int64 grid arithmetic; the
# oracle's single global cumulative sum over (bucket, md5, id) order
# equals the Spark side's bucketed two-phase prefix sum by
# construction.
ORACLES["sample_pps"] = """
    WITH base AS (
        SELECT doc_id, n_chars, CAST(n_chars AS BIGINT) AS w,
               md5('42|' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE CAST(n_chars AS BIGINT) > 0),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM base),
    par AS (SELECT tw,
                   ('0x' || substr(md5('42'), 1, 12))::BIGINT % tw AS r
            FROM tot),
    ord AS (
        SELECT doc_id, n_chars, w,
               CAST(SUM(w) OVER (
                   ORDER BY ('0x' || substr(h, 1, 2))::BIGINT % 64, h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS c
        FROM base)
    SELECT doc_id, n_chars,
           CAST(((50 * c - r + tw) // tw)
                - ((50 * (c - w) - r + tw) // tw) AS BIGINT) AS multiplicity
    FROM ord, par
    WHERE ((50 * c - r + tw) // tw)
          - ((50 * (c - w) - r + tw) // tw) >= 1"""
