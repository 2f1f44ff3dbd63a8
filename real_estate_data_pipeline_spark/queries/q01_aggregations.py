"""Split from queries.py lines 179-363 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, dsum, dsum_expr, register, t

# ===========================================================================
# A* aggregations
# ===========================================================================

register(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)


def _a1(spark, sf_dir):
    """A1 grouped multi-aggregate (TPC-H Q1 shape).
    Ref operator: data_enhancement.py:47-57 grouped price stats."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum_expr(disc_price, "sum_disc_price"),
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


CATALOG["a1_pricing_summary"].fn = _a1

register(
    "a1b_grouped_median_stddev",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS median_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
           SQRT((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_price
    FROM lineitem GROUP BY l_returnflag
    """,
)


def _a1b(spark, sf_dir):
    """A1 median/stddev — exact median (Spark>=3.4) and decimal-exact
    stddev recomputation. Ref: data_enhancement.py:47-57 (median/stddev)."""
    li = t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast(DEC)
    g = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
        F.count("*").alias("n"),
    )
    return g.select(
        "l_returnflag",
        "median_qty",
        "s1",
        "s2",
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "stddev_price"
        ),
    )


CATALOG["a1b_grouped_median_stddev"].fn = _a1b

register(
    "a2_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority
    """,
)


def _a2(spark, sf_dir):
    """A2 group-count + sort. Ref: gold_ml_etl.py:62,364,522."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "o_orderpriority")
    )


CATALOG["a2_priority_counts"].fn = _a2

register(
    "a4_distinct_customers",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS unique_customers, COUNT(*) AS total_orders
    FROM orders
    """,
)


def _a4(spark, sf_dir):
    """A4 distinct count. Ref: data_quality_checks.py:60."""
    return t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.count("*").alias("total_orders"),
    )


CATALOG["a4_distinct_customers"].fn = _a4

register(
    "a5_quality_singlepass",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
           CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_price,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
           CAST(SUM(CASE WHEN NOT regexp_matches(l_returnflag, '^[ANR]$') THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag,
           CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS disc_in_range
    FROM lineitem
    """,
)


def _a5(spark, sf_dir):
    """A5/§2.14 — all data-quality counters in ONE aggregate pass (the
    reference runs one filter+count job per check,
    data_quality_checks.py:33,88-90,193-197)."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("total_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_qty"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0)).alias("neg_price"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("qty_out_of_range"),
        F.sum(F.when(~F.col("l_returnflag").rlike("^[ANR]$"), 1).otherwise(0)).alias("bad_flag"),
        F.sum(
            F.when((F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1), 1).otherwise(0)
        ).alias("disc_in_range"),
    )


CATALOG["a5_quality_singlepass"].fn = _a5

register(
    "a6_completeness",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
                     AND o_orderdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS complete_rows
    FROM orders
    """,
)


def _a6(spark, sf_dir):
    """A6 dropna completeness as a conditional sum (one pass).
    Ref: data_quality_checks.py:221."""
    o = t(spark, sf_dir, "orders")
    cond = (
        F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & F.col("o_orderdate").isNotNull()
    )
    return o.agg(
        F.count("*").alias("total_rows"),
        F.sum(F.when(cond, 1).otherwise(0)).alias("complete_rows"),
    )


CATALOG["a6_completeness"].fn = _a6

