"""Split from queries.py lines 642-730 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, dsum_expr, register, t

# ===========================================================================
# TPC-H-style multi-join headliners (bench)
# ===========================================================================

register(
    "q3_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate_s, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, orderdate_s, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    bench=True,
)


def _q3(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact joins -> agg -> top-k.
    customer side is small after the segment filter -> broadcast it."""
    # r15 opt round: every pre-exchange step here is a pushed filter or
    # trivial projection, so the local scan-balancing fan-out exchange
    # parallelized nothing (A/B: 1.46 -> 0.92 s) — fan_out=False
    c = t(spark, sf_dir, "customer", fan_out=False).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = t(spark, sf_dir, "orders", fan_out=False).filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    l = t(spark, sf_dir, "lineitem", fan_out=False)
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_orderdate", "o_orderpriority")),
            l.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_s"),
            "o_orderpriority",
        )
        .agg(dsum_expr(rev, "revenue"))
        .select("l_orderkey", "revenue", "orderdate_s", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


CATALOG["q3_top_revenue_orders"].fn = _q3

register(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    bench=True,
)


def _q5(spark, sf_dir):
    """TPC-H Q5 shape: star joins fact->dims with broadcasts."""
    l = t(spark, sf_dir, "lineitem")
    # orders auto-broadcasts here: skip the fan-out exchange
    o = t(spark, sf_dir, "orders", fan_out=False).select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(rev, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


CATALOG["q5_nation_revenue"].fn = _q5

