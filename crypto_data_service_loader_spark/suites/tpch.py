"""The adapted TPC-H suite q1-q22 (reduced schema: no partsupp table/commit dates — each query keeps the original plan shape; see docstrings) and its DuckDB oracles."""

from __future__ import annotations

from .shared import *  # noqa: F401,F403



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
    but every R line belongs to one — the blamed — supplier).

    Round 16 (guide §2.3/§2.4): the R-line COUNT rides the same rollup —
    per (order, supplier) we already aggregate `has_r`; carrying
    `n_rlines` beside it lets the per-order rollup emit the blamed
    supplier (the unique has_r=1 key when n_rsupp == 1) and its waiting-
    line count directly. That deletes the second lineitem scan and the
    R-line semi-join of the previous shape: numwait per supplier is the
    SUM of blamed-order line counts, identical by n_rsupp == 1 (every R
    line of a qualifying order belongs to the one blamed supplier)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    is_r = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(is_r).alias("has_r"),
        F.sum(is_r).alias("n_rlines"),
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_rsupp"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias(
            "blamed_supp"
        ),
        F.sum(F.when(F.col("has_r") == 1, F.col("n_rlines")).otherwise(0)).alias(
            "n_wait"
        ),
    )
    f_orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    blamed = (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
        .join(f_orders, F.col("l_orderkey") == f_orders.o_orderkey, "left_semi")
        .select("blamed_supp", "n_wait")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(supp, blamed.blamed_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_wait").alias("numwait"))
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
