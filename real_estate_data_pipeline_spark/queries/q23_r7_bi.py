"""Split from queries.py lines 14363-14788 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# ===========================================================================
# round-7 additions: customer/revenue analytics (the reference's BI tier)
# ===========================================================================

register(
    "cust_rfm_segmentation",
    # RFM segmentation — THE customer-analytics rollup: recency vs a
    # fixed anchor date, frequency, exact-decimal monetary, each cut
    # into ntile(4) quartiles with full deterministic orderings
    # (custkey tie-break), segments counted. ntile shares one
    # definition across engines; every input to it is exact.
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '1998-12-31')
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT c,
             ntile(4) OVER (ORDER BY recency_days, c) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, c) AS f_score,
             ntile(4) OVER (ORDER BY monetary_cents DESC, c) AS m_score
      FROM base
    )
    SELECT 'R' || r_score || 'F' || f_score || 'M' || m_score AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)


def _drfm(spark, sf_dir):
    """RFM quartile segmentation: one per-customer aggregate (exact
    cents monetary), three global ntile windows OVER THE CUSTOMER
    AGGREGATE (customer-cardinality rows — agg-bounded, the same
    justification as doc_temperature_mix), segment concat + count.
    Low scores = best customers on every axis (recency ascending,
    frequency/monetary descending)."""
    o = t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("c")).agg(
        F.datediff(
            F.lit("1998-12-31").cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count("*").cast("long").alias("frequency"),
        (F.sum(F.col("o_totalprice").cast(DEC)) * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    scored = base.select(
        "c",
        F.ntile(4).over(Window.orderBy("recency_days", "c")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "c")).alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary_cents"), "c"))
        .alias("m_score"),
    )
    return (
        scored.groupBy(
            F.concat(
                F.lit("R"),
                F.col("r_score"),
                F.lit("F"),
                F.col("f_score"),
                F.lit("M"),
                F.col("m_score"),
            ).alias("segment")
        )
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("segment")
    )


CATALOG["cust_rfm_segmentation"].fn = _drfm

register(
    "cust_order_gap_stats",
    # inter-purchase-interval distribution per market segment: per-
    # customer consecutive order gaps in whole days (date-level lag,
    # orderkey tie-break), exact percentiles per segment — the
    # repurchase-cycle metric behind churn models.
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(CAST(o_orderdate AS DATE))
                         OVER (PARTITION BY o_custkey
                               ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap_d
      FROM orders
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           quantile_cont(g.gap_d, 0.5) AS p50_days,
           quantile_cont(g.gap_d, 0.9) AS p90_days
    FROM g JOIN customer c ON c.c_custkey = g.o_custkey
    WHERE g.gap_d IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)


def _dordergaps(spark, sf_dir):
    """Repurchase-gap percentiles per segment: one per-customer lag
    window (shuffle by custkey), a broadcast dimension join for the
    segment, one exact-percentile aggregate. Integer day gaps make the
    interpolated percentiles engine-identical."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    g = (
        o.select(
            "o_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
        )
        .withColumn("gap_d", F.datediff(F.col("d"), F.lag("d").over(w)))
        .filter(F.col("gap_d").isNotNull())
    )
    return (
        g.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.percentile("gap_d", F.lit(0.5)).alias("p50_days"),
            F.percentile("gap_d", F.lit(0.9)).alias("p90_days"),
        )
        .orderBy("c_mktsegment")
    )


CATALOG["cust_order_gap_stats"].fn = _dordergaps

register(
    "supplier_pareto_report",
    # revenue concentration (Pareto) across suppliers: discounted
    # revenue as exact cents, suppliers ranked, running share, and the
    # counts needed to reach 50/80/90% of total — the 1-row
    # concentration report behind "how many partners matter".
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  * 100 AS BIGINT) AS cents
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, l_suppkey) AS rn,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_suppkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) / tot.t >= 0.5 THEN rn END)
                AS BIGINT) AS suppliers_to_50pct,
           CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) / tot.t >= 0.8 THEN rn END)
                AS BIGINT) AS suppliers_to_80pct,
           CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) / tot.t >= 0.9 THEN rn END)
                AS BIGINT) AS suppliers_to_90pct,
           round(CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS DOUBLE) / tot.t, 6)
             AS top1_share
    FROM ranked, tot GROUP BY tot.t
    """,
)


def _dpareto(spark, sf_dir):
    """Supplier Pareto concentration: per-supplier exact-cents revenue
    (supplier-cardinality aggregate), one ranked running sum over that
    aggregate (agg-bounded global window), thresholds folded in a
    single final aggregate — no threshold-grid join. The working-set
    after the first aggregate is suppliers, not lineitems."""
    li = t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    rev = li.groupBy("l_suppkey").agg(
        (
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (one - F.col("l_discount").cast(DEC))
            )
            * 100
        )
        .cast("long")
        .alias("cents")
    )
    tot = rev.agg(F.sum("cents").cast("long").alias("__t"))
    wr = Window.orderBy(F.desc("cents"), "l_suppkey")
    ranked = rev.select(
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.sum("cents")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
    )
    to_pct = lambda p, nm: F.min(  # noqa: E731
        F.when(F.col("cum").cast("double") / F.col("__t") >= p, F.col("rn"))
    ).cast("long").alias(nm)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("__t")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            to_pct(0.5, "suppliers_to_50pct"),
            to_pct(0.8, "suppliers_to_80pct"),
            to_pct(0.9, "suppliers_to_90pct"),
            F.round(
                F.max(F.when(F.col("rn") == 1, F.col("cents"))).cast("double")
                / F.col("__t"),
                6,
            ).alias("top1_share"),
        )
        .drop("__t")
    )


CATALOG["supplier_pareto_report"].fn = _dpareto

register(
    "orders_priority_mix_shift",
    # month-over-month composition drift of order priorities: monthly
    # share per priority (exact count ratios) and the absolute shift
    # vs the previous month (identical double subtraction, 6 dp) — the
    # mix-shift alarm for an intake pipeline.
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    mt AS (SELECT month, CAST(SUM(n) AS BIGINT) AS t FROM m GROUP BY month),
    sh AS (
      SELECT m.month, m.priority, m.n,
             round(CAST(m.n AS DOUBLE) / mt.t, 6) AS share
      FROM m JOIN mt ON mt.month = m.month
    )
    SELECT month, priority, n, share,
           round(abs(share - lag(share) OVER (PARTITION BY priority
                                              ORDER BY month)), 6) AS mom_shift
    FROM sh
    ORDER BY month, priority
    """,
)


def _dmixshift(spark, sf_dir):
    """Priority mix-shift timeline: month x priority counts, shares
    against month totals (an equi-join on month — no scalar), one lag
    window partitioned by priority. A drift monitor over categorical
    composition, complementing dq_psi_drift_report's binned-numeric
    PSI."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("long").alias("n"))
    mt = m.groupBy("month").agg(F.sum("n").cast("long").alias("__t"))
    sh = m.join(mt, "month").select(
        "month",
        "priority",
        "n",
        F.round(F.col("n").cast("double") / F.col("__t"), 6).alias("share"),
    )
    w = Window.partitionBy("priority").orderBy("month")
    return sh.select(
        "month",
        "priority",
        "n",
        "share",
        F.round(F.abs(F.col("share") - F.lag("share").over(w)), 6).alias(
            "mom_shift"
        ),
    ).orderBy("month", "priority")


CATALOG["orders_priority_mix_shift"].fn = _dmixshift

register(
    "lineitem_discount_effectiveness",
    # revenue by discount band x return flag with within-flag share:
    # the margin-analytics rollup that answers "does discounting move
    # returns". Bands from exact integer discount points
    # (floor(d*100+0.5) — no float-representation drift), revenue as
    # exact decimal cents.
    oracle="""
    WITH b AS (
      SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
             l_returnflag,
             CAST(l_quantity AS DECIMAL(18,2)) AS q,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
      FROM lineitem
    ),
    g AS (
      SELECT discount_pct, l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(rev) * 10000 AS BIGINT) AS rev_u4,
             CAST(SUM(q) AS DOUBLE) AS total_qty
      FROM b GROUP BY 1, 2
    ),
    ft AS (SELECT l_returnflag, CAST(SUM(rev_u4) AS BIGINT) AS t
           FROM g GROUP BY 1)
    SELECT g.discount_pct, g.l_returnflag, g.n_items,
           CAST(g.rev_u4 AS DOUBLE) / 10000.0 AS revenue,
           g.total_qty,
           round(CAST(g.rev_u4 AS DOUBLE) / ft.t, 6) AS flag_share
    FROM g JOIN ft ON ft.l_returnflag = g.l_returnflag
    ORDER BY g.discount_pct, g.l_returnflag
    """,
)


def _ddiscount(spark, sf_dir):
    """Discount-band effectiveness: one fact aggregate to (band, flag)
    cardinality, one tiny self-aggregate for flag totals, an equi-join
    for shares — everything after the first aggregate is
    dozens-of-rows small."""
    li = t(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    b = li.select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("discount_pct"),
        "l_returnflag",
        F.col("l_quantity").cast(DEC).alias("q"),
        (
            F.col("l_extendedprice").cast(DEC)
            * (one - F.col("l_discount").cast(DEC))
        ).alias("rev"),
    )
    g = b.groupBy("discount_pct", "l_returnflag").agg(
        F.count("*").cast("long").alias("n_items"),
        (F.sum("rev") * 10000).cast("long").alias("rev_u4"),
        F.sum("q").cast("double").alias("total_qty"),
    )
    ft = g.groupBy("l_returnflag").agg(F.sum("rev_u4").cast("long").alias("__t"))
    return (
        g.join(ft, "l_returnflag")
        .select(
            "discount_pct",
            "l_returnflag",
            "n_items",
            (F.col("rev_u4").cast("double") / 10000.0).alias("revenue"),
            "total_qty",
            F.round(F.col("rev_u4").cast("double") / F.col("__t"), 6).alias(
                "flag_share"
            ),
        )
        .orderBy("discount_pct", "l_returnflag")
    )


CATALOG["lineitem_discount_effectiveness"].fn = _ddiscount

register("mm_gif_ahash_groups", oracle=None)


def _dgif(spark, sf_dir):
    """End-to-end LZW-codec image dedup (rows-only, like its PPM/PNG/
    JPEG twins): the same deterministic gradient classes rendered at
    16x16 (<=256 unique colors — GIF's palette constraint), encoded as
    real GIF87a via ops/gif.py (variable-width LZW, spec-appendix-
    verified decoder), decoded+resized+average-hashed through the same
    mapInPandas loop. GIF is lossless for palettized images, so the
    duplicate structure must exactly match the PPM render's classes."""
    import numpy as np

    from ..ops import multimodal as MM
    from ..ops.gif import encode_gif

    d = t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("media_id"),
        (F.col("doc_id") % 16).cast("int").alias("__cls"),
    )

    def render(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for cls in pdf["__cls"]:
                w = h = 16
                y, x = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (x * 255 // (w - 1)),
                        (y * 255 // (h - 1)),
                        ((x * int(cls) + y) % 256),
                    ],
                    axis=2,
                ).astype(np.uint8)
                payloads.append(encode_gif(px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "image/gif",
                    "payload": payloads,
                    "width": None,
                    "height": None,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    media = d.mapInPandas(render, MM.MEDIA_SCHEMA)
    info = MM.decode_gif_info(MM.resize_gif(media, max_side=16))
    return (
        info.groupBy("ahash")
        .agg(
            F.count("*").cast("bigint").alias("members"),
            F.min("media_id").alias("rep_id"),
        )
        .filter(F.col("members") > 1)
        .orderBy("rep_id")
    )


CATALOG["mm_gif_ahash_groups"].fn = _dgif


