"""Round-14 wave 13 (post-rotation): distribution fitting and
leave-one-out influence — a Gamma fit of order totals (method of
moments + the one-step MLE shape approximation), a Beta
method-of-moments fit of per-customer return shares, the combined
ABC x XYZ inventory matrix (revenue class crossed with
demand-variability class, composing the two r10/pool singles), and
two leave-one-out diagnostics on the shared order-size residual
frame: top-10 |DFFITS| and the PRESS statistic with predicted R^2.

Exactness: all moments are exact decimal/HUGEINT sums; ln at 6dp with
micro-quantized per-row terms; leverage is the exact rational of the
Cook's-distance entry (same shared frame); the ABC/XYZ class cuts
reuse each source query's integer-exact boundary conventions verbatim.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q47_r11_econometrics import _ORDER_REG_CTES, _order_reg_resid

register(
    "ml_gamma_fit_order_totals",
    # Gamma(k, theta) fit of order totals: method of moments k = m^2/v,
    # theta = v/m, plus the one-step MLE shape from s = ln(mean) -
    # mean(ln): k_mle ~ (3 - s + sqrt((s-3)^2 + 24s)) / (12s).
    # Moments are exact cents sums; per-row ln at 6dp in micro units.
    oracle="""
    WITH yv AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             CAST(floor(round(ln(CAST(CAST(o_totalprice AS DECIMAL(18,2))
               AS DOUBLE)), 6) * 1000000 + 0.5) AS BIGINT) AS ln6
      FROM orders
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS sc,
             SUM(CAST(c AS HUGEINT) * c) AS sc2,
             CAST(SUM(ln6) AS HUGEINT) AS sl6
      FROM yv
    ),
    m AS (
      SELECT n,
             CAST(sc AS DOUBLE) / n / 100 AS mean_d,
             (CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n)
               / (n - 1) / 10000 AS var_d,
             round(ln(CAST(sc AS DOUBLE) / n / 100), 6)
               - CAST(sl6 AS DOUBLE) / n / 1e6 AS s_stat
      FROM s
    )
    SELECT n AS n_orders,
           round(mean_d, 6) AS mean_total,
           round(mean_d * mean_d / var_d, 6) AS k_moments,
           round(var_d / mean_d, 6) AS theta_moments,
           round(s_stat, 9) AS s_stat,
           round((3 - s_stat + sqrt((s_stat - 3) * (s_stat - 3) + 24 * s_stat))
                 / (12 * s_stat), 6) AS k_mle_approx
    FROM m
    """,
)


def _dgamma(spark, sf_dir):
    """Gamma fit from exact cents + micro-ln moments."""
    o = t(spark, sf_dir, "orders")
    c = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    ln6 = F.floor(
        F.round(F.log(F.col("o_totalprice").cast(DEC).cast("double")), 6)
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    s = o.select(c.alias("c"), ln6.alias("ln6")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("sc"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sc2"),
        F.sum("ln6").cast("decimal(38,0)").alias("sl6"),
    )
    n = F.col("n")
    mean_d = F.col("sc").cast("double") / n / 100
    var_d = (
        F.col("sc2").cast("double")
        - F.col("sc").cast("double") * F.col("sc").cast("double") / n
    ) / (n - 1) / 10000
    s_stat = F.round(
        F.log(F.col("sc").cast("double") / n / 100), 6
    ) - F.col("sl6").cast("double") / n / F.lit(1e6)
    return s.select(
        n.alias("n_orders"),
        F.round(mean_d, 6).alias("mean_total"),
        F.round(mean_d * mean_d / var_d, 6).alias("k_moments"),
        F.round(var_d / mean_d, 6).alias("theta_moments"),
        F.round(s_stat, 9).alias("s_stat"),
        F.round(
            (3 - s_stat + F.sqrt((s_stat - 3) * (s_stat - 3) + 24 * s_stat))
            / (12 * s_stat),
            6,
        ).alias("k_mle_approx"),
    )


CATALOG["ml_gamma_fit_order_totals"].fn = _dgamma


register(
    "ml_beta_fit_return_share",
    # Beta(alpha, beta) method-of-moments fit of per-customer return
    # shares (share of lineitems with l_returnflag = 'R'): per-customer
    # p = r/n is an exact rational, micro-quantized before the
    # cross-customer moment sums; alpha = m*(m(1-m)/v - 1),
    # beta = (1-m)*(m(1-m)/v - 1).
    oracle="""
    WITH cs AS (
      SELECT o.o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ret
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_custkey
    ),
    p AS (
      SELECT CAST(floor(CAST(n_ret AS DOUBLE) / n_items * 1000000 + 0.5)
               AS BIGINT) AS p6
      FROM cs
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(p6) AS HUGEINT) AS sp,
             SUM(CAST(p6 AS HUGEINT) * p6) AS sp2
      FROM p
    ),
    m AS (
      SELECT k,
             CAST(sp AS DOUBLE) / k / 1e6 AS mean_p,
             (CAST(sp2 AS DOUBLE) - CAST(sp AS DOUBLE) * sp / k)
               / (k - 1) / 1e12 AS var_p
      FROM s
    )
    SELECT k AS n_customers,
           round(mean_p, 6) AS mean_share,
           round(var_p, 9) AS var_share,
           round(mean_p * (mean_p * (1 - mean_p) / var_p - 1), 6) AS alpha_mom,
           round((1 - mean_p) * (mean_p * (1 - mean_p) / var_p - 1), 6)
             AS beta_mom
    FROM m
    """,
)


def _dbeta(spark, sf_dir):
    """Beta MoM fit of per-customer return shares."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    cs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_ret"),
        )
    )
    p = cs.select(
        F.floor(
            F.col("n_ret").cast("double") / F.col("n_items") * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("p6")
    )
    s = p.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("p6").cast("decimal(38,0)").alias("sp"),
        F.sum(F.col("p6").cast("decimal(38,0)") * F.col("p6")).alias("sp2"),
    )
    k = F.col("k")
    mean_p = F.col("sp").cast("double") / k / F.lit(1e6)
    var_p = (
        F.col("sp2").cast("double")
        - F.col("sp").cast("double") * F.col("sp").cast("double") / k
    ) / (k - 1) / F.lit(1e12)
    shape = mean_p * (1 - mean_p) / var_p - 1
    return s.select(
        k.alias("n_customers"),
        F.round(mean_p, 6).alias("mean_share"),
        F.round(var_p, 9).alias("var_share"),
        F.round(mean_p * shape, 6).alias("alpha_mom"),
        F.round((1 - mean_p) * shape, 6).alias("beta_mom"),
    )


CATALOG["ml_beta_fit_return_share"].fn = _dbeta


register(
    "lineitem_abc_xyz_matrix",
    # The combined ABC x XYZ inventory matrix: every part classified
    # by cumulative revenue share (A <= 70% / B <= 90% / C — the
    # orders_abc_classification integer-exact cut) AND by monthly
    # demand variability (X < 0.5 <= Y < 1.0 <= Z on the CV over
    # active months, 'S' for single-month parts — the
    # part_xyz_classification convention), cross-tabulated with part
    # counts and revenue mass per cell.
    oracle="""
    WITH pr AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc FROM pr),
    cw AS (
      SELECT pk, cents,
             SUM(cents) OVER (ORDER BY cents DESC, pk) AS cum
      FROM pr
    ),
    abc AS (
      SELECT pk, cents,
             CASE WHEN 10 * cum <= 7 * tot.tc THEN 'A'
                  WHEN 10 * cum <= 9 * tot.tc THEN 'B'
                  ELSE 'C' END AS abc
      FROM cw CROSS JOIN tot
    ),
    pm AS (
      SELECT l_partkey AS pk,
             (year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    pv AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS mm,
             CAST(SUM(qty) AS BIGINT) AS s,
             SUM(CAST(qty AS HUGEINT) * qty) AS q
      FROM pm GROUP BY pk
    ),
    xyz AS (
      SELECT pk,
             CASE
               WHEN mm < 2 THEN 'S'
               WHEN sqrt(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / mm)
                          / (mm - 1))) / (CAST(s AS DOUBLE) / mm) < 0.5 THEN 'X'
               WHEN sqrt(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / mm)
                          / (mm - 1))) / (CAST(s AS DOUBLE) / mm) < 1.0 THEN 'Y'
               ELSE 'Z' END AS xyz
      FROM pv
    )
    SELECT a.abc, x.xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(SUM(a.cents) AS DOUBLE) / 100, 2) AS revenue,
           round(CAST(SUM(a.cents) AS DOUBLE) / MAX(tot.tc), 6) AS revenue_share
    FROM abc a JOIN xyz x USING (pk) CROSS JOIN tot
    GROUP BY a.abc, x.xyz
    ORDER BY a.abc, x.xyz
    """,
)


def _dabcxyz(spark, sf_dir):
    """ABC x XYZ cross-tab — both classifications share one lineitem
    scan family; the matrix join is part-keyed."""
    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    tot = pr.agg(F.sum("cents").cast("long").alias("tc"))
    wcum = Window.orderBy(F.desc("cents"), "pk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cw = pr.select("pk", "cents", F.sum("cents").over(wcum).alias("cum"))
    abc = cw.crossJoin(F.broadcast(tot)).select(
        "pk",
        "cents",
        "tc",
        F.when(10 * F.col("cum") <= 7 * F.col("tc"), "A")
        .when(10 * F.col("cum") <= 9 * F.col("tc"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    pm = li.groupBy(
        F.col("l_partkey").alias("pk"),
        ((F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1).alias("m"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    pv = pm.groupBy("pk").agg(
        F.count("*").cast("long").alias("mm"),
        F.sum("qty").cast("long").alias("s"),
        F.sum(F.col("qty").cast("decimal(38,0)") * F.col("qty")).alias("q"),
    )
    cv = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("mm")
        )
        / (F.col("mm") - 1)
    ) / (F.col("s").cast("double") / F.col("mm"))
    xyz = pv.select(
        "pk",
        F.when(F.col("mm") < 2, "S")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "pk")
        .groupBy("abc", "xyz")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.sum("cents").cast("double") / 100, 2).alias("revenue"),
            F.round(F.sum("cents").cast("double") / F.max("tc"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc", "xyz")
    )


CATALOG["lineitem_abc_xyz_matrix"].fn = _dabcxyz


register(
    "ml_dffits_topk",
    # Leave-one-out influence: top-10 orders by |DFFITS| on the shared
    # order-size regression — DFFITS_i = e_i * sqrt(h_i) / (s_(i) *
    # (1 - h_i)) with the closed-form LOO sigma s_(i)^2 = (SSE -
    # e_i^2/(1-h_i)) / (n - 3).  Residuals/leverage are the exact
    # integer/rational projections of the Cook's-distance entry; the
    # ranking key is the micro-quantized |DFFITS|.
    oracle=f"""
    {_ORDER_REG_CTES},
    sse AS (
      SELECT SUM(CAST(e6 AS HUGEINT) * e6) AS sse12 FROM r
    ),
    d AS (
      SELECT r.o_orderkey, r.x, r.y, r.e6,
             (1.0 / b.n
              + CAST((b.n * r.x - b.sx) AS DOUBLE) * (b.n * r.x - b.sx)
                / b.n / CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx AS DOUBLE))
                 AS h,
             CAST(sse.sse12 AS DOUBLE) AS sse12, b.n
      FROM r CROSS JOIN b0 b CROSS JOIN sse
    ),
    scored AS (
      SELECT o_orderkey, x, y, e6, h,
             CAST(floor(abs(CAST(e6 AS DOUBLE) * sqrt(h)
               / (sqrt((sse12 - CAST(e6 AS DOUBLE) * e6 / (1 - h)) / (n - 3))
                  * (1 - h))) * 1000000 + 0.5) AS BIGINT) AS a6
      FROM d
    )
    SELECT o_orderkey, x AS n_items,
           round(y / 100.0, 6) AS totalprice,
           round(e6 / 1000000.0 / 100.0, 6) AS residual,
           round(h, 6) AS leverage,
           round(a6 / 1000000.0, 6) AS abs_dffits
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY a6 DESC, o_orderkey) AS rn
          FROM scored)
    WHERE rn <= 10 ORDER BY abs_dffits DESC, o_orderkey
    """,
)


def _ddffits(spark, sf_dir):
    """Top-10 |DFFITS| over the shared residual frame."""
    d19 = "decimal(19,0)"
    r = _order_reg_resid(spark, sf_dir)
    sse = r.agg(F.sum(F.col("e6").cast(d19) * F.col("e6").cast(d19)).alias("sse12"))
    d = r.crossJoin(F.broadcast(sse))
    h = (
        1.0 / F.col("n")
        + (F.col("n") * F.col("x") - F.col("sx")).cast("double")
        * (F.col("n") * F.col("x") - F.col("sx"))
        / F.col("n")
        / (
            F.col("n").cast("decimal(38,0)") * F.col("sxx")
            - F.col("sx").cast(d19) * F.col("sx").cast(d19)
        ).cast("double")
    )
    e6d = F.col("e6").cast("double")
    sse12 = F.col("sse12").cast("double")
    a6 = F.floor(
        F.abs(
            e6d
            * F.sqrt(h)
            / (
                F.sqrt((sse12 - e6d * F.col("e6") / (1 - h)) / (F.col("n") - 3))
                * (1 - h)
            )
        )
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    scored = d.select("o_orderkey", "x", "y", "e6", h.alias("h"), a6.alias("a6"))
    top = scored.orderBy(F.desc("a6"), "o_orderkey").limit(10)
    return top.select(
        "o_orderkey",
        F.col("x").alias("n_items"),
        F.round(F.col("y") / 100.0, 6).alias("totalprice"),
        F.round(F.col("e6") / 1000000.0 / 100.0, 6).alias("residual"),
        F.round(F.col("h"), 6).alias("leverage"),
        F.round(F.col("a6") / 1000000.0, 6).alias("abs_dffits"),
    ).orderBy(F.desc("abs_dffits"), "o_orderkey")


CATALOG["ml_dffits_topk"].fn = _ddffits


register(
    "ml_press_predicted_r2",
    # PRESS and predicted R^2: PRESS = sum (e_i / (1 - h_i))^2 over
    # the shared frame (the exact LOO prediction errors), predicted
    # R^2 = 1 - PRESS/SST.  Per-row PRESS terms rescale to dollars^2
    # and quantize with the bit-stable floor before the sum; SST comes
    # from exact cents moments.
    oracle=f"""
    {_ORDER_REG_CTES},
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM r
    ),
    pt AS (
      SELECT CAST(floor(
               (CAST(r.e6 AS DOUBLE)
                / (1 - (1.0 / b.n
                        + CAST((b.n * r.x - b.sx) AS DOUBLE) * (b.n * r.x - b.sx)
                          / b.n
                          / CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx
                                 AS DOUBLE))))
               * (CAST(r.e6 AS DOUBLE)
                / (1 - (1.0 / b.n
                        + CAST((b.n * r.x - b.sx) AS DOUBLE) * (b.n * r.x - b.sx)
                          / b.n
                          / CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx
                                 AS DOUBLE))))
               / 1e16 * 10000 + 0.5) AS HUGEINT) AS press4
      FROM r CROSS JOIN b0 b
    )
    SELECT (SELECT n FROM mom) AS n_orders,
           round(CAST(SUM(press4) AS DOUBLE) / 1e4, 2) AS press_dollars2,
           round(1 - (CAST(SUM(press4) AS DOUBLE) / 1e4)
                     / ((CAST((SELECT syy FROM mom) AS DOUBLE)
                         - CAST((SELECT sy FROM mom) AS DOUBLE)
                           * (SELECT sy FROM mom) / (SELECT n FROM mom))
                        / 10000), 6) AS predicted_r2
    FROM pt
    """,
)


def _dpress(spark, sf_dir):
    """PRESS + predicted R^2 off the shared residual frame."""
    d19 = "decimal(19,0)"
    r = _order_reg_resid(spark, sf_dir)
    mom = r.agg(
        F.count("*").cast("long").alias("nn"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("syy"),
    )
    h = (
        1.0 / F.col("n")
        + (F.col("n") * F.col("x") - F.col("sx")).cast("double")
        * (F.col("n") * F.col("x") - F.col("sx"))
        / F.col("n")
        / (
            F.col("n").cast("decimal(38,0)") * F.col("sxx")
            - F.col("sx").cast(d19) * F.col("sx").cast(d19)
        ).cast("double")
    )
    loo = F.col("e6").cast("double") / (1 - h)
    pt = r.select(
        F.floor(loo * loo / F.lit(1e16) * F.lit(10000) + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("press4")
    )
    agg = pt.agg(F.sum("press4").alias("sp4")).crossJoin(F.broadcast(mom))
    sst = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("nn")
    ) / 10000
    return agg.select(
        F.col("nn").alias("n_orders"),
        F.round(F.col("sp4").cast("double") / F.lit(1e4), 2).alias("press_dollars2"),
        F.round(1 - (F.col("sp4").cast("double") / F.lit(1e4)) / sst, 6).alias(
            "predicted_r2"
        ),
    )


CATALOG["ml_press_predicted_r2"].fn = _dpress
