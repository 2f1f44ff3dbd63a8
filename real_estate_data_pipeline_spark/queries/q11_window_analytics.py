"""Split from queries.py lines 3645-3993 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dsum, register, t

# ===========================================================================
# Window analytics, rollup, pivot, set ops
# ===========================================================================

register(
    "w2_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS order_seq
    FROM orders
    """,
)


def _w2(spark, sf_dir):
    """Running totals + sequence numbers (frame-spec windows — beyond the
    reference's single row_number use). Decimal running sum keeps every
    prefix exact in both engines."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(wf).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


CATALOG["w2_running_totals"].fn = _w2

register(
    "w3_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev,
           CAST(NTILE(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS spend_quartile
    FROM orders
    """,
)


def _w3(spark, sf_dir):
    """lag + ntile window analytics (gap-to-previous-order, per-customer
    spend quartile)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long").alias("days_since_prev"),
        F.ntile(4).over(wq).cast("long").alias("spend_quartile"),
    )


CATALOG["w3_order_gaps"].fn = _w3

register(
    "a9_rollup_sales",
    oracle="""
    SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
           COALESCE(CAST(quarter(o_orderdate) AS VARCHAR), 'ALL') AS qtr,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
    """,
)


def _a9(spark, sf_dir):
    """ROLLUP hierarchy totals (year -> quarter -> grand total) — one
    pass computes every level (Spark expands grouping sets map-side)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup(F.year("o_orderdate").alias("__y"), F.quarter("o_orderdate").alias("__q"))
        .agg(F.count("*").alias("orders"), dsum("o_totalprice", "sales"))
        .select(
            F.coalesce(F.col("__y").cast("string"), F.lit("ALL")).alias("yr"),
            F.coalesce(F.col("__q").cast("string"), F.lit("ALL")).alias("qtr"),
            "orders",
            "sales",
        )
    )


CATALOG["a9_rollup_sales"].fn = _a9

register(
    "a9b_cube_grouping_id",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


def _a9b(spark, sf_dir):
    """CUBE with grouping_id: all four aggregation levels in one pass,
    with the grouping bitmask distinguishing real nulls from totals."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "orders",
        )
    )


CATALOG["a9b_cube_grouping_id"].fn = _a9b

register(
    "a11_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sales
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)


def _a11(spark, sf_dir):
    """Explicit GROUPING SETS (two independent single-key rollups in one
    pass — the subset CUBE would over-compute). Spark expands the sets
    map-side; grouping_id disambiguates which set each row belongs to."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("orders"),
            dsum("o_totalprice", "sales"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "orders",
            "sales",
        )
    )


CATALOG["a11_grouping_sets"].fn = _a11

register(
    "w4_rank_family",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(DENSE_RANK() OVER w_price AS BIGINT) AS price_rank,
           PERCENT_RANK() OVER w_price AS price_pct_rank,
           CUME_DIST() OVER w_price AS price_cume_dist,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             / CAST(COUNT(*)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
               AS moving_avg_3
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)


def _w4(spark, sf_dir):
    """Rank-function breadth: dense_rank / percent_rank / cume_dist plus
    a centered 3-row moving average. percent_rank and cume_dist divide
    exact integer ranks, and the moving average divides an exact
    decimal frame sum by the frame count — deterministic doubles in
    both engines."""
    o = t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wm = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-1, 1)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(wp).cast("long").alias("price_rank"),
        F.percent_rank().over(wp).alias("price_pct_rank"),
        F.cume_dist().over(wp).alias("price_cume_dist"),
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(wm).cast("double")
            / F.count("*").over(wm).cast("double")
        ).alias("moving_avg_3"),
    )


CATALOG["w4_rank_family"].fn = _w4

register(
    "w5_value_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                               RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
                AS BIGINT) AS similar_price_orders,
           CAST(FIRST_VALUE(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
                AS BIGINT) AS cheapest_orderkey,
           CAST(LAST_VALUE(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS priciest_orderkey
    FROM orders
    """,
)


def _w5(spark, sf_dir):
    """Value-based RANGE frame (orders within ±1000 of this order's
    price) + first/last over the full partition. RANGE frames count
    peers by value, not position — a different window evaluator than
    every other query exercises."""
    o = t(spark, sf_dir, "orders")
    wr = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    wp = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(wr).cast("long").alias("similar_price_orders"),
        F.first("o_orderkey").over(wp).cast("long").alias("cheapest_orderkey"),
        F.last("o_orderkey").over(wfull).cast("long").alias("priciest_orderkey"),
    )


CATALOG["w5_value_range_frame"].fn = _w5

register(
    "n_array_sort_top3",
    oracle="""
    SELECT vec_id,
           CAST(l[1] AS DOUBLE) AS top1, CAST(l[2] AS DOUBLE) AS top2, CAST(l[3] AS DOUBLE) AS top3
    FROM (SELECT vec_id, list_reverse_sort(embedding) AS l FROM embeddings)
    """,
)


def _nsort(spark, sf_dir):
    """Array sort + element extraction: top-3 dimensions per embedding
    (sort_array desc ≙ list_reverse_sort)."""
    e = t(spark, sf_dir, "embeddings")
    s = F.sort_array(F.col("embedding"), asc=False)
    return e.select(
        "vec_id",
        F.element_at(s, 1).cast("double").alias("top1"),
        F.element_at(s, 2).cast("double").alias("top2"),
        F.element_at(s, 3).cast("double").alias("top3"),
    )


CATALOG["n_array_sort_top3"].fn = _nsort

register(
    "a10_pivot_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders
    FROM orders GROUP BY 1
    """,
)


def _a10(spark, sf_dir):
    """Pivot: status categories -> columns (explicit values list so the
    plan is a single pass, no distinct-values pre-job)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            F.coalesce(F.col("F"), F.lit(0)).alias("f_orders"),
            F.coalesce(F.col("O"), F.lit(0)).alias("o_orders"),
            F.coalesce(F.col("P"), F.lit(0)).alias("p_orders"),
        )
    )


CATALOG["a10_pivot_status"].fn = _a10

register(
    "u2_intersect_except",
    oracle="""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
    SELECT 'both' AS cohort, COUNT(*) AS customers FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
    UNION ALL
    SELECT 'only_1995', COUNT(*) FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
    UNION ALL
    SELECT 'only_1996', COUNT(*) FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
    """,
)


def _u2(spark, sf_dir):
    """INTERSECT / EXCEPT cohort analysis (set ops beyond the
    reference's unionByName)."""
    o = t(spark, sf_dir, "orders")
    c95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    c96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()

    def count_row(name, df):
        return df.agg(F.count("*").alias("customers")).select(
            F.lit(name).alias("cohort"), "customers"
        )

    return (
        count_row("both", c95.intersect(c96))
        .unionByName(count_row("only_1995", c95.exceptAll(c96)))
        .unionByName(count_row("only_1996", c96.exceptAll(c95)))
    )


CATALOG["u2_intersect_except"].fn = _u2

