"""Split from queries.py lines 563-641 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, dedup, dsum, register, t

# ===========================================================================
# W1 window dedup, O1 top-k, U1 union
# ===========================================================================

register(
    "w1_dedup_keep_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate_s
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    bench=True,
)


def _w1(spark, sf_dir):
    """W1 keep-latest dedup with deterministic tie-break.
    Ref: silver_etl_script.py:641-652 (+ SURVEY §7.4.3 tie fix)."""
    # r15 opt round: nothing but the window exchange follows the scan —
    # the fan-out exchange parallelized nothing (A/B: 0.64 -> 0.31 s)
    o = t(spark, sf_dir, "orders", fan_out=False)
    d = dedup.keep_latest(o, ["o_custkey"], "o_orderdate", tiebreakers=["o_orderkey"])
    return d.select(
        "o_custkey", "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_s")
    )


CATALOG["w1_dedup_keep_latest"].fn = _w1

register(
    "o1_topk_customers",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey LIMIT 10
    """,
)


def _o1(spark, sf_dir):
    """O1 order-by + top-k. Ref: gold_ml_etl.py:62,364. Spark plans this
    as TakeOrderedAndProject (per-partition heaps, no global sort)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"))
        .orderBy(F.desc("total_spend"), "o_custkey")
        .limit(10)
    )


CATALOG["o1_topk_customers"].fn = _o1

register(
    "u1_union_by_name",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderstatus <> 'F'
    """,
)


def _u1(spark, sf_dir):
    """U1 unionByName with missing-column tolerance.
    Ref: silver_etl_script.py:504-508."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.col("o_orderstatus") != "F").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b, allowMissingColumns=True)


CATALOG["u1_union_by_name"].fn = _u1

