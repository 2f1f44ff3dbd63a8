"""Round-13 wave 8: robust estimators computed exactly from bounded
frames — the Hodges-Lehmann location shift between the R and N quantity
samples, the Rousseeuw-Croux Qn scale estimator, the Lorenz asymmetry
coefficient and the Theil-L mean log deviation on per-customer revenue,
and Siegel's repeated-median slope on the daily series.

Pairwise machinery runs on value-domain histograms (difference
histograms of at most 99 cells), never sample pair joins; medians are
exact integer selections on cumulative weights; ln follows the
9-decimal micro-quantization convention.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents

register(
    "ml_hodges_lehmann_shift",
    # Hodges-Lehmann shift estimator between R and N quantities: the
    # median of all n_R x n_N pairwise differences, computed exactly on
    # the 99-cell difference histogram (w_d = sum_j cr_j * cn_{j-d}).
    # The weighted median uses the standard convention: positions
    # k1 = (W+1)//2 and k2 = (W+2)//2 on the cumulative weights,
    # averaged — every decision an exact integer.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    dh AS (
      SELECT a.q - b.q AS d, CAST(SUM(CAST(a.cr AS HUGEINT) * b.cn) AS BIGINT) AS w
      FROM vc a CROSS JOIN vc b GROUP BY 1
    ),
    cw AS (
      SELECT d, SUM(w) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER () AS wtot
      FROM dh
    ),
    sel AS (
      SELECT MAX(wtot) AS wtot,
             MIN(CASE WHEN 2 * cum >= wtot + CASE WHEN wtot % 2 = 0 THEN 0 ELSE 1 END
                      THEN d END) AS d1,
             MIN(CASE WHEN 2 * cum >= wtot + 2 THEN d END) AS d2
      FROM cw
    )
    SELECT CAST(wtot AS BIGINT) AS n_pairs,
           round((CAST(d1 AS DOUBLE)
                  + CASE WHEN wtot % 2 = 0 THEN CAST(d2 AS DOUBLE)
                         ELSE CAST(d1 AS DOUBLE) END) / 2.0, 6) AS hl_shift
    FROM sel
    """,
)


def _dhodgeslehmann(spark, sf_dir):
    """HL shift: two-class histogram -> 99-cell difference histogram
    -> exact weighted-median selection; the pairwise location estimate
    without a pair join."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .localCheckpoint(eager=False)
    )
    a = vc.select(F.col("q").alias("aq"), F.col("cr").alias("acr"))
    b = vc.select(F.col("q").alias("bq"), F.col("cn").alias("bcn"))
    dh = (
        a.crossJoin(F.broadcast(b))
        .groupBy((F.col("aq") - F.col("bq")).alias("d"))
        .agg(F.sum(F.col("acr").cast("decimal(38,0)") * F.col("bcn")).cast("long").alias("w"))
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = dh.select(
        "d", F.sum("w").over(wcum).alias("cum"), F.sum("w").over(wall).alias("wtot")
    )
    odd = F.when(F.col("wtot") % 2 == 0, 0).otherwise(1)
    sel = cw.agg(
        F.max("wtot").alias("wtot"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("wtot") + odd, F.col("d"))
        ).alias("d1"),
        F.min(F.when(2 * F.col("cum") >= F.col("wtot") + 2, F.col("d"))).alias("d2"),
    )
    return sel.select(
        F.col("wtot").cast("long").alias("n_pairs"),
        F.round(
            (
                F.col("d1").cast("double")
                + F.when(F.col("wtot") % 2 == 0, F.col("d2").cast("double")).otherwise(
                    F.col("d1").cast("double")
                )
            )
            / 2.0,
            6,
        ).alias("hl_shift"),
    )


CATALOG["ml_hodges_lehmann_shift"].fn = _dhodgeslehmann


register(
    "ml_qn_scale_quantity",
    # Rousseeuw-Croux Qn scale estimator of l_quantity: the k-th order
    # statistic of all pairwise |x_i - x_j| (i<j) with k = C(h,2),
    # h = n//2 + 1 — the 50%-breakdown scale estimate that needs no
    # location.  The |difference| histogram has at most 50 cells
    # (w_0 = sum C(c_j,2), w_d = sum c_j*c_{j+d}); the selection is an
    # exact integer threshold on its cumulative weights; the normal-
    # consistency factor 2.219144465 is quantized once in Python.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
    dh AS (
      SELECT ABS(a.q - b.q) AS ad,
             CAST(SUM(CASE WHEN a.q < b.q THEN CAST(a.c AS HUGEINT) * b.c
                           WHEN a.q = b.q THEN CAST(a.c AS HUGEINT) * (a.c - 1) / 2
                           ELSE 0 END) AS BIGINT) AS w
      FROM vc a CROSS JOIN vc b
      WHERE a.q <= b.q GROUP BY 1
    ),
    cw AS (
      SELECT ad, SUM(w) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) AS cum
      FROM dh
    ),
    sel AS (
      SELECT nt.n,
             (nt.n / 2 + 1) * (nt.n / 2 + 1 - 1) / 2 AS k,
             MIN(CASE WHEN cum >= (nt.n / 2 + 1) * (nt.n / 2 + 1 - 1) / 2
                      THEN ad END) AS qn_raw
      FROM cw CROSS JOIN nt GROUP BY nt.n
    )
    SELECT n AS n_rows, CAST(k AS BIGINT) AS k_position,
           CAST(qn_raw AS BIGINT) AS qn_raw,
           round(2.219144465 * CAST(qn_raw AS DOUBLE), 6) AS qn_scaled
    FROM sel
    """,
)


def _dqnscale(spark, sf_dir):
    """Qn scale: one histogram pass, a 50-cell |difference| histogram,
    one exact order-statistic selection — pairwise robust scale at
    GROUP-BY cost."""
    li = t(spark, sf_dir, "lineitem")
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    nt = vc.agg(F.sum("c").cast("long").alias("n"))
    a = vc.select(F.col("q").alias("aq"), F.col("c").alias("ac"))
    b = vc.select(F.col("q").alias("bq"), F.col("c").alias("bc"))
    dh = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("aq") <= F.col("bq"))
        .groupBy(F.abs(F.col("aq") - F.col("bq")).alias("ad"))
        .agg(
            F.sum(
                F.when(
                    F.col("aq") < F.col("bq"),
                    F.col("ac").cast("decimal(38,0)") * F.col("bc"),
                )
                .when(
                    F.col("aq") == F.col("bq"),
                    F.col("ac").cast("decimal(38,0)") * (F.col("ac") - 1) / 2,
                )
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("w")
        )
    )
    wcum = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cw = dh.select("ad", F.sum("w").over(wcum).alias("cum"))
    h = F.floor(F.col("n") / 2) + 1
    k = (h * (h - 1) / 2).cast("long")
    sel = cw.crossJoin(F.broadcast(nt)).groupBy("n").agg(
        F.max(k).alias("k"),
        F.min(F.when(F.col("cum") >= k, F.col("ad"))).alias("qn_raw"),
    )
    return sel.select(
        F.col("n").alias("n_rows"),
        F.col("k").cast("long").alias("k_position"),
        F.col("qn_raw").cast("long").alias("qn_raw"),
        F.round(F.lit(2.219144465) * F.col("qn_raw"), 6).alias("qn_scaled"),
    )


CATALOG["ml_qn_scale_quantity"].fn = _dqnscale


register(
    "cust_lorenz_asymmetry",
    # Lorenz asymmetry coefficient of per-customer order revenue:
    # S = F(mu) + L(mu), where F and L are the population and revenue
    # shares at the mean, with the standard linear interpolation
    # delta = (mu - x_(m)) / (x_(m+1) - x_(m)).  S > 1 means the
    # inequality is driven by a few very large customers; S < 1 by
    # many very small ones — the shape statistic the Gini hides.
    # The below-mean test is the exact integer compare n*x < S1.
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS r,
             SUM(cents) OVER (ORDER BY cents, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS csum,
             COUNT(*) OVER () AS n, SUM(cents) OVER () AS s1
      FROM cr
    ),
    m AS (
      SELECT MAX(n) AS n, MAX(s1) AS s1,
             CAST(SUM(CASE WHEN n * cents < s1 THEN 1 ELSE 0 END) AS BIGINT) AS mlt
      FROM rk
    ),
    pick AS (
      SELECT m.n, m.s1, m.mlt,
             MAX(CASE WHEN rk.r = m.mlt THEN rk.cents END) AS xm,
             MAX(CASE WHEN rk.r = m.mlt THEN rk.csum END) AS lm,
             MAX(CASE WHEN rk.r = m.mlt + 1 THEN rk.cents END) AS xm1
      FROM rk CROSS JOIN m GROUP BY m.n, m.s1, m.mlt
    )
    SELECT n AS n_customers, mlt AS n_below_mean,
           round((mlt + (CAST(s1 AS DOUBLE) / n - xm) / (CAST(xm1 AS DOUBLE) - xm))
                 / n
                 + (CAST(lm AS DOUBLE)
                    + (CAST(s1 AS DOUBLE) / n - xm) / (CAST(xm1 AS DOUBLE) - xm)
                      * xm1) / s1, 6) AS lorenz_asymmetry
    FROM pick
    """,
)


def _dlorenzasym(spark, sf_dir):
    """Lorenz asymmetry: one per-customer aggregate, one ranked running
    sum over it (the cust_revenue_gini window class), an exact integer
    below-mean count, two picked order statistics, one closing
    interpolation."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    word = Window.orderBy("cents", "o_custkey")
    wall = Window.orderBy("cents", "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = cr.select(
        "cents",
        F.row_number().over(word).alias("r"),
        F.sum("cents")
        .over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("csum"),
        F.count("*").over(wall).alias("n"),
        F.sum("cents").over(wall).alias("s1"),
    ).localCheckpoint(eager=False)
    m = rk.agg(
        F.max("n").alias("n"),
        F.max("s1").alias("s1"),
        F.sum(F.when(F.col("n") * F.col("cents") < F.col("s1"), 1).otherwise(0))
        .cast("long")
        .alias("mlt"),
    )
    pick = (
        rk.crossJoin(F.broadcast(m.select(F.col("mlt").alias("m_mlt"))))
        .filter((F.col("r") == F.col("m_mlt")) | (F.col("r") == F.col("m_mlt") + 1))
        .agg(
            F.max(F.when(F.col("r") == F.col("m_mlt"), F.col("cents"))).alias("xm"),
            F.max(F.when(F.col("r") == F.col("m_mlt"), F.col("csum"))).alias("lm"),
            F.max(F.when(F.col("r") == F.col("m_mlt") + 1, F.col("cents"))).alias(
                "xm1"
            ),
        )
    )
    j = m.crossJoin(F.broadcast(pick))
    mu = F.col("s1").cast("double") / F.col("n")
    delta = (mu - F.col("xm")) / (F.col("xm1").cast("double") - F.col("xm"))
    return j.select(
        F.col("n").alias("n_customers"),
        F.col("mlt").alias("n_below_mean"),
        F.round(
            (F.col("mlt") + delta) / F.col("n")
            + (F.col("lm").cast("double") + delta * F.col("xm1")) / F.col("s1"),
            6,
        ).alias("lorenz_asymmetry"),
    )


CATALOG["cust_lorenz_asymmetry"].fn = _dlorenzasym


register(
    "cust_theil_l_mld",
    # Theil's L — the mean log deviation — of per-customer order
    # revenue: MLD = ln(mu) - mean(ln x_i), the bottom-sensitive
    # member of the generalized-entropy family beside the existing
    # top-sensitive Theil T.  Per-customer ln is rounded at 9 decimals
    # and micro-quantized at 1e6 before the cross-customer sum; ln(mu)
    # follows the same convention.
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT cents,
             CAST(round(round(ln(CAST(cents AS DOUBLE)), 9) * 1000000) AS BIGINT)
               AS l6
      FROM cr WHERE cents > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s1,
             CAST(SUM(l6) AS BIGINT) AS lsum
      FROM terms
    )
    SELECT n AS n_customers,
           round(round(ln(CAST(s1 AS DOUBLE) / n), 9)
                 - CAST(lsum AS DOUBLE) / (1000000.0 * n), 6) AS theil_l_mld
    FROM agg
    """,
)


def _dtheill(spark, sf_dir):
    """Theil L: one per-customer aggregate, one micro-nat ln sum, one
    closing expression — bottom-sensitive inequality at GROUP-BY
    cost."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    terms = cr.filter(F.col("cents") > 0).select(
        "cents",
        F.round(F.round(F.log(F.col("cents").cast("double")), 9) * 1000000)
        .cast("long")
        .alias("l6"),
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum("l6").cast("long").alias("lsum"),
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(
            F.round(F.log(F.col("s1").cast("double") / F.col("n")), 9)
            - F.col("lsum").cast("double") / (1000000.0 * F.col("n")),
            6,
        ).alias("theil_l_mld"),
    )


CATALOG["cust_theil_l_mld"].fn = _dtheill


register(
    "evt_repeated_median_slope",
    # Siegel's repeated-median slope on the daily value series — the
    # 50%-breakdown upgrade of Theil-Sen: for each day i take the
    # median over j != i of the pairwise slopes, then the median of
    # those per-day medians.  The pair space is the bounded 30x29 day
    # grid; each slope is one identical IEEE division of exact
    # integers; both median layers are exact row_number selections
    # (29 inner values -> single middle; 30 outer -> average of two).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    pr AS (
      SELECT a.k AS i, (CAST(b.cents AS DOUBLE) - a.cents) / (b.off - a.off) AS sl
      FROM d a JOIN d b ON a.k <> b.k
    ),
    inner_rk AS (
      SELECT i, sl,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY sl) AS r,
             COUNT(*) OVER (PARTITION BY i) AS m
      FROM pr
    ),
    med_i AS (
      SELECT i, AVG(sl) AS msl
      FROM inner_rk WHERE r IN ((m + 1) // 2, (m + 2) // 2)
      GROUP BY i
    ),
    outer_rk AS (
      SELECT msl,
             ROW_NUMBER() OVER (ORDER BY msl) AS r,
             COUNT(*) OVER () AS m
      FROM med_i
    )
    SELECT CAST(MAX(m) AS BIGINT) AS n_days,
           round(AVG(msl), 6) AS repeated_median_slope
    FROM outer_rk WHERE r IN ((m + 1) // 2, (m + 2) // 2)
    """,
)


def _drepeatedmedian(spark, sf_dir):
    """Repeated median: the day frame self-pairs (870 slopes a month at
    ANY data scale), one partitioned median window, one global median
    over 30 rows."""
    d = _daily_cents(spark, sf_dir).localCheckpoint(eager=False)
    a = d.select(F.col("k").alias("i"), F.col("off").alias("ao"), F.col("cents").alias("ac"))
    b = d.select(F.col("k").alias("jk"), F.col("off").alias("bo"), F.col("cents").alias("bc"))
    pr = a.join(F.broadcast(b), F.col("i") != F.col("jk")).select(
        "i",
        ((F.col("bc").cast("double") - F.col("ac")) / (F.col("bo") - F.col("ao"))).alias(
            "sl"
        ),
    )
    wi = Window.partitionBy("i").orderBy("sl")
    wim = Window.partitionBy("i")
    inner = pr.select(
        "i",
        "sl",
        F.row_number().over(wi).alias("r"),
        F.count("*").over(wim).alias("m"),
    )
    med_i = (
        inner.filter(
            (F.col("r") == F.floor((F.col("m") + 1) / 2))
            | (F.col("r") == F.floor((F.col("m") + 2) / 2))
        )
        .groupBy("i")
        .agg(F.avg("sl").alias("msl"))
    )
    wall = Window.orderBy("msl").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    outer = med_i.select(
        "msl",
        F.row_number().over(Window.orderBy("msl")).alias("r"),
        F.count("*").over(wall).alias("m"),
    )
    return outer.filter(
        (F.col("r") == F.floor((F.col("m") + 1) / 2))
        | (F.col("r") == F.floor((F.col("m") + 2) / 2))
    ).agg(
        F.max("m").cast("long").alias("n_days"),
        F.round(F.avg("msl"), 6).alias("repeated_median_slope"),
    )


CATALOG["evt_repeated_median_slope"].fn = _drepeatedmedian
