"""Split from queries.py lines 4180-4894 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dsum, dsum_expr, register, t

# ===========================================================================
# TPC-H deep-join / subquery family (round 2): multi-nation joins,
# left-join double aggregation, argmax, correlated scalar subqueries,
# scalar-threshold anti-joins. All revenue/balance math is decimal-exact
# per the header rules; years are BIGINT on both sides.
# ===========================================================================

_REV_SQL = (
    "CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))"
)


def _rev_col():
    one = F.lit(1).cast("decimal(3,2)")
    return F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))


register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
       OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)


def _q7(spark, sf_dir):
    """TPC-H Q7 shape: fact joins two *roles* of the same dim (supplier
    nation vs customer nation) with a symmetric pair predicate. Both
    nation sides and both key dims are broadcast; the only shuffle is
    the final 3-key aggregation."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .filter(pair)
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(dsum_expr(_rev_col(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


CATALOG["q7_nation_trade_volume"].fn = _q7

register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN ns.n_name = 'NATION_5' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN region r ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY o_year ORDER BY o_year
    """,
    bench=True,
)


def _q8(spark, sf_dir):
    """TPC-H Q8 shape: market share = conditional decimal sum over total
    decimal sum per year, restricted to one region's customers. The
    region restriction prunes through broadcast joins before the
    single aggregation shuffle."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    l = t(spark, sf_dir, "lineitem", fan_out=False)
    o = t(spark, sf_dir, "orders", fan_out=False).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = t(spark, sf_dir, "customer", fan_out=False).select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier", fan_out=False).select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation", fan_out=False)
    r = t(spark, sf_dir, "region", fan_out=False).filter(F.col("r_name") == "ASIA")
    nc = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("__cnk")
    )
    ns = n.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    rev = _rev_col()
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
    )
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(rev).cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


CATALOG["q8_market_share"].fn = _q8

register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)


def _q10(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top-20 via
    TakeOrdered. The returnflag filter lands in the lineitem scan."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum_expr(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


CATALOG["q10_returned_items"].fn = _q10

register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    bench=True,
)


def _q13(spark, sf_dir):
    """TPC-H Q13 shape: left outer join + double aggregation (count per
    customer, then histogram of counts). COUNT(col) semantics — nulls
    from the outer side don't count — match exactly."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    # orders auto-broadcasts here: skip the fan-out exchange
    o = t(spark, sf_dir, "orders", fan_out=False).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CATALOG["q13_order_count_distribution"].fn = _q13

register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l.l_suppkey AS supplier_no,
             CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-07-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)


def _q15(spark, sf_dir):
    """TPC-H Q15 shape: argmax over an aggregated view. The max is a
    1-row aggregate broadcast back over the revenue frame (no window
    over a single partition, no second scan of lineitem); equality on
    doubles is exact because both sides derive from the same decimal
    sum."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum_expr(_rev_col(), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), rev.total_revenue == mx.__mx).drop("__mx")
    return (
        top.join(F.broadcast(s), top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


CATALOG["q15_top_supplier"].fn = _q15

register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size BETWEEN 1 AND 15
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)


def _q16(spark, sf_dir):
    """TPC-H Q16 shape (partsupp replaced by observed lineitem
    suppliers): distinct-supplier variety per part attribute triple.
    Part predicates prune the broadcast side before the fact join; the
    distinct count is Spark's two-phase partial-distinct aggregate."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").between(1, 15)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


CATALOG["q16_supplier_variety"].fn = _q16

register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)


def _q17(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity threshold) decorrelated into a grouped aggregate + re-join.
    The brand restriction is applied BEFORE the threshold aggregate —
    sound because the threshold only depends on rows of the same part —
    so neither pass scans more than the brand's lineitems. Threshold is
    decimal-sum/count for cross-engine determinism."""
    pb = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    lb = l.join(F.broadcast(pb), l.l_partkey == pb.p_partkey)
    thresh = lb.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*"))
        ).alias("__t")
    )
    small = lb.join(F.broadcast(thresh), lb.l_partkey == thresh.__pk).filter(
        F.col("l_quantity") < F.col("__t")
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


CATALOG["q17_small_qty_revenue"].fn = _q17

register(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#15' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)


def _q19(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs bracket predicate across both join
    sides. The part side prunes to the three brands before broadcast;
    the full mixed predicate evaluates post-join inside codegen."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#12") & qty.between(1, 11) & size.between(1, 5))
        | ((brand == "Brand#23") & qty.between(10, 20) & size.between(1, 10))
        | ((brand == "Brand#15") & qty.between(20, 30) & size.between(1, 15))
    )
    pf = p.filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#15"))
    return (
        l.join(F.broadcast(pf), l.l_partkey == pf.p_partkey)
        .filter(cond)
        .agg(dsum_expr(_rev_col(), "revenue"))
    )


CATALOG["q19_bracketed_revenue"].fn = _q19

register(
    "q22_idle_wealthy_customers",
    oracle="""
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)


def _q22(spark, sf_dir):
    """TPC-H Q22 shape: global scalar threshold (1-row aggregate
    broadcast), NOT EXISTS as a left-anti join against recent orders,
    then a grouped rollup. (Adapted: every sf0.01 customer has SOME
    order, so 'idle' = no order since 2000-01-01 — keeps both the
    anti-join and the result non-degenerate.)"""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders")
    avg_pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")).alias("__avg")
    )
    wealthy = c.crossJoin(F.broadcast(avg_pos)).filter(F.col("c_acctbal") > F.col("__avg"))
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    idle = wealthy.join(recent, wealthy.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("n_name")
    )


CATALOG["q22_idle_wealthy_customers"].fn = _q22

# ---------------------------------------------------------------------------
# TPC-H completion: q2/q9/q11/q12/q20/q21 shapes, adapted to the driver
# testdata (no partsupp table, no l_commitdate/l_receiptdate/l_shipmode
# columns). Each keeps the query's distinctive operator shape; the
# part<->supplier relationship comes from lineitem and "late" means
# shipped >90 days after the order date.
# ---------------------------------------------------------------------------

register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_name
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND p.p_size <= 5
      AND l.l_extendedprice / l.l_quantity = (
        SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey LIMIT 100
    """,
)


def _q2(spark, sf_dir):
    """TPC-H Q2 shape: correlated MIN subquery over the same join tree
    as the outer query, decorrelated into ONE pass — a min window over
    p_partkey on the already-joined rows — instead of building the
    5-table join twice. Unit cost is row-level double division
    (identical IEEE-754 on both engines). Deterministic top-100 via a
    total ORDER BY -> TakeOrdered, no global sort."""
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select("p_partkey", "p_name")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("__cost"),
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    joined = li.join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey).join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    )
    # The subquery's min scopes to EUROPE lineitems of the SAME part —
    # exactly the per-p_partkey partition of the joined rows. Joining
    # the size-filtered part dimension first is sound: it drops whole
    # parts (with all their lineitems), never individual lineitems of a
    # surviving part, so each surviving part's min is unchanged.
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("__min", F.min("__cost").over(w))
        .filter(F.col("__cost") == F.col("__min"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


CATALOG["q2_min_cost_supplier"].fn = _q2

register(
    "q9_nation_year_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    bench=True,
)


def _q9(spark, sf_dir):
    """TPC-H Q9 shape (profit by nation x year; adapted — no partsupp,
    so profit omits supplycost). Plan: the selective part predicate
    broadcasts into the lineitem scan FIRST (shrinks the fact before
    the one big shuffle), supplier/nation broadcast, and only the
    surviving rows join orders shuffle-side."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    p = (
        t(spark, sf_dir, "part", fan_out=False)
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    s = t(spark, sf_dir, "supplier", fan_out=False).select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation", fan_out=False).select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders", fan_out=False).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem", fan_out=False).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(3,2)")
    profit = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum_expr(profit, "profit"))
        .orderBy("nation", F.desc("o_year"))
    )


CATALOG["q9_nation_year_profit"].fn = _q9

register(
    "q11_revenue_concentration",
    oracle="""
    WITH pr AS (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
                FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, CAST(rev AS DOUBLE) AS part_value FROM pr
    WHERE CAST(rev AS DOUBLE) > (SELECT CAST(SUM(rev) AS DOUBLE) FROM pr) * 0.0007
    ORDER BY part_value DESC, l_partkey
    """,
)


def _q11(spark, sf_dir):
    """TPC-H Q11 shape (adapted — no partsupp, so 'important stock'
    becomes per-part revenue share): grouped aggregate, then a 1-row
    global re-aggregate of the SAME grouped result broadcast back as
    the HAVING threshold. One fact shuffle total; the threshold join is
    a broadcast of one row. Share compares in double on both engines
    (both doubles come from exact decimal sums)."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    pr = li.groupBy("l_partkey").agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("__rev"))
    total = pr.agg(F.sum("__rev").cast("double").alias("__tot"))
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("__rev").cast("double") > F.col("__tot") * 0.0007)
        .select("l_partkey", F.col("__rev").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


CATALOG["q11_revenue_concentration"].fn = _q11

register(
    "q12_late_priority_mix",
    oracle="""
    SELECT l.l_returnflag,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
          AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
          AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)


def _q12(spark, sf_dir):
    """TPC-H Q12 shape (adapted — no l_shipmode/commitdate/receiptdate:
    'late' = shipped >90 days after order date, groups by returnflag).
    The lateness predicate needs both sides, so it filters the join
    OUTPUT; the conditional counts then fold in one hash aggregate
    (map-side partials)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


CATALOG["q12_late_priority_mix"].fn = _q12

register(
    "q20_dominant_share_suppliers",
    oracle="""
    WITH pq AS (SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
                FROM lineitem GROUP BY 1, 2),
         tot AS (SELECT l_partkey, SUM(qty) AS tq FROM pq GROUP BY 1)
    SELECT s.s_name, s.s_acctbal FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT pq.l_suppkey FROM pq
      JOIN tot ON pq.l_partkey = tot.l_partkey
      JOIN part p ON p.p_partkey = pq.l_partkey
      WHERE p.p_name LIKE 'small%' AND CAST(pq.qty AS DOUBLE) > 0.18 * CAST(tot.tq AS DOUBLE))
    ORDER BY s.s_name
    """,
)


def _q20(spark, sf_dir):
    """TPC-H Q20 shape (adapted — no partsupp, so 'excess stock'
    becomes a dominant shipped-quantity share): nested aggregate
    threshold + IN, decorrelated as ONE (partkey, suppkey) aggregate
    whose per-part total comes from a sum window over the SAME rows
    (no second lineitem scan, no re-join), then a left-semi join into
    supplier. The part-name restriction broadcasts into the pair agg's
    output before the window."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_name", "s_acctbal", "s_suppkey")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("__qty")
    )
    # per-part total BEFORE the part filter (the oracle's tot CTE is
    # unfiltered too: a part's total includes all its suppliers)
    w = Window.partitionBy("l_partkey")
    dominant = (
        pq.withColumn("__tq", F.sum("__qty").over(w))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("__qty").cast("double") > F.lit(0.18) * F.col("__tq").cast("double"))
        .select("l_suppkey")
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


CATALOG["q20_dominant_share_suppliers"].fn = _q20

register(
    "q21_sole_late_supplier",
    oracle="""
    WITH li AS (SELECT l.l_orderkey, l.l_suppkey,
                       MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS is_late
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'
                GROUP BY 1, 2),
         agg AS (SELECT l_orderkey, COUNT(*) AS nsupp, SUM(is_late) AS nlate
                 FROM li GROUP BY 1)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM li JOIN agg ON li.l_orderkey = agg.l_orderkey
    JOIN supplier s ON li.l_suppkey = s.s_suppkey
    WHERE li.is_late = 1 AND agg.nsupp >= 2 AND agg.nlate = 1
    GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
    """,
)


def _q21(spark, sf_dir):
    """TPC-H Q21 shape: 'supplier who was the SOLE late shipper on a
    multi-supplier order' (adapted lateness as in q12). The classic
    EXISTS + NOT-EXISTS pair would re-join lineitem twice; instead the
    per-(order, supplier) lateness aggregates once and the order-level
    supplier/late counts come from count/sum windows over those same
    rows — the correlation collapses into two narrow shuffles."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("__late"))
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per_supp.withColumn("__nsupp", F.count("*").over(w))
        .withColumn("__nlate", F.sum("__late").over(w))
        .filter((F.col("__late") == 1) & (F.col("__nsupp") >= 2) & (F.col("__nlate") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


CATALOG["q21_sole_late_supplier"].fn = _q21

