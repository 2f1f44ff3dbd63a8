"""Round-15 wave 1 (pre-rotation): model selection and comparison on
the shared order-size regression — the partial F-test for adding the
quadratic term, Mallows Cp for the linear-vs-quadratic pair, Gaussian
AIC/BIC for both models, standardized betas of the quadratic model,
and the Bonferroni-style max externally-studentized-residual outlier
test (the LOO-sigma projection of the r14 DFFITS machinery).

All five are closed-form moment algebra over the q47 unit frame
(y = order total in cents, x = lineitem count): the 2-regressor
(u = x, v = x^2, w = y) normal equations solve by Cramer's rule on
cleared centered HUGEINT sums (the q79 White/RESET shape with w = y
and the w-moments kept exact — y^2 sums stay under 128 bits at the
10x probe, unlike the squared-residual products that forced q79's
double sww), SSE magnitudes leave as exact integer dollars^2
(floor(x+0.5) — round() at O(1e10) diverges cross-engine), and
AIC/BIC assemble as exact micro-unit integers from the 6dp-quantized
ln before one final double division.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t
from .q47_r11_econometrics import _ORDER_REG_CTES, _order_reg_resid

# 2-regressor cleared centered moments over the q47 unit frame:
# u = x, v = x^2, w = y (cents). Every raw moment is an exact
# HUGEINT sum; the cleared m*Sab - Sa*Sb forms convert to double as
# single deterministic operations on exact integers.
_Y2_CTES = f"""{_ORDER_REG_CTES},
    aux AS (
      SELECT x AS au, CAST(x AS HUGEINT) * x AS av, aw FROM (
        SELECT x, CAST(y AS HUGEINT) AS aw FROM u
      )
    ),
    s2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(au) AS HUGEINT) AS su, CAST(SUM(av) AS HUGEINT) AS sv,
             CAST(SUM(aw) AS HUGEINT) AS sw,
             SUM(CAST(au AS HUGEINT) * au) AS suu,
             SUM(CAST(av AS HUGEINT) * av) AS svv,
             SUM(CAST(au AS HUGEINT) * av) AS suv,
             SUM(CAST(au AS HUGEINT) * aw) AS suw,
             SUM(CAST(av AS HUGEINT) * aw) AS svw,
             SUM(aw * aw) AS sww
      FROM aux
    ),
    c2 AS (
      SELECT m,
             CAST(m * suu - su * su AS DOUBLE) AS cuu,
             CAST(m * svv - sv * sv AS DOUBLE) AS cvv,
             CAST(m * suv - su * sv AS DOUBLE) AS cuv,
             CAST(m * suw - su * sw AS DOUBLE) AS cuw,
             CAST(m * svw - sv * sw AS DOUBLE) AS cvw,
             CAST(m * sww - sw * sw AS DOUBLE) AS cww
      FROM s2
    )"""

# SSE identities off the cleared moments (factor-m consistent: every
# c-term carries m * centered-sum, so ratios cancel and Syy = cww/m):
#   R2_1  = cuw^2 / (cuu * cww)
#   R2_2  = (bu*cuw + bv*cvw) / cww  with  bu, bv  the Cramer slopes
#   SSE_k = (cww/m) * (1 - R2_k)            [cents^2]
_SQL_DET = "(cuu * cvv - cuv * cuv)"
_SQL_BU = f"((cuw * cvv - cvw * cuv) / {_SQL_DET})"
_SQL_BV = f"((cvw * cuu - cuw * cuv) / {_SQL_DET})"
_SQL_R2_2 = f"(({_SQL_BU} * cuw + {_SQL_BV} * cvw) / cww)"
_SQL_R2_1 = "(cuw * cuw / (cuu * cww))"
_SQL_SSE1 = f"(cww / m * (1 - {_SQL_R2_1}))"
_SQL_SSE2 = f"(cww / m * (1 - {_SQL_R2_2}))"


def _y2_cleared(spark, sf_dir):
    """Spark twin of _Y2_CTES: one-row frame of m + the six cleared
    centered moments (double columns cuu..cww) for the u=x, v=x^2,
    w=y regression family."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count("*").cast("long").alias("x")
    )
    u = (
        o.select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y"),
        )
        .join(cnt, "o_orderkey", "left")
        .select("y", F.coalesce(F.col("x"), F.lit(0)).alias("x"))
    )
    aux = u.select(
        F.col("x").alias("au"),
        (F.col("x").cast(d38) * F.col("x")).alias("av"),
        F.col("y").cast(d38).alias("aw"),
    )
    dec = lambda c: F.col(c).cast(d38)  # noqa: E731
    s = aux.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("au").cast(d38).alias("su"),
        F.sum("av").cast(d38).alias("sv"),
        F.sum("aw").cast(d38).alias("sw"),
        F.sum(dec("au") * F.col("au")).alias("suu"),
        F.sum(F.col("av") * F.col("av")).alias("svv"),
        F.sum(dec("au") * F.col("av")).alias("suv"),
        F.sum(dec("au") * F.col("aw")).alias("suw"),
        F.sum(F.col("av") * F.col("aw")).alias("svw"),
        F.sum(F.col("aw") * F.col("aw")).alias("sww"),
    )
    m = F.col("m")
    return s.select(
        "m",
        (m * F.col("suu") - F.col("su") * F.col("su")).cast("double").alias("cuu"),
        (m * F.col("svv") - F.col("sv") * F.col("sv")).cast("double").alias("cvv"),
        (m * F.col("suv") - F.col("su") * F.col("sv")).cast("double").alias("cuv"),
        (m * F.col("suw") - F.col("su") * F.col("sw")).cast("double").alias("cuw"),
        (m * F.col("svw") - F.col("sv") * F.col("sw")).cast("double").alias("cvw"),
        (m * F.col("sww") - F.col("sw") * F.col("sw")).cast("double").alias("cww"),
    )


def _cols():
    """The cleared-moment columns + derived model quantities (Spark
    Column twins of the _SQL_* expression strings)."""
    m = F.col("m")
    cuu, cvv, cuv = F.col("cuu"), F.col("cvv"), F.col("cuv")
    cuw, cvw, cww = F.col("cuw"), F.col("cvw"), F.col("cww")
    det = cuu * cvv - cuv * cuv
    bu = (cuw * cvv - cvw * cuv) / det
    bv = (cvw * cuu - cuw * cuv) / det
    r2_2 = (bu * cuw + bv * cvw) / cww
    r2_1 = cuw * cuw / (cuu * cww)
    sse1 = cww / m * (1 - r2_1)
    sse2 = cww / m * (1 - r2_2)
    return m, cuu, cvv, cuw, cvw, cww, bu, bv, r2_1, r2_2, sse1, sse2


register(
    "ml_partial_f_add_quadratic",
    # Partial F-test for adding x^2 to the order-size regression:
    # F = (SSE1 - SSE2) / (SSE2 / (n - 3)) with exact-moment SSEs.
    # SSEs leave as integer dollars^2 (floor(x+0.5)); the F statistic
    # floor-quantizes at 6dp (round() is cross-engine-unsafe above
    # O(1e4)).
    oracle=f"""
    {_Y2_CTES}
    SELECT m AS n_orders,
           CAST(floor({_SQL_SSE1} / 1e4 + 0.5) AS BIGINT) AS sse_linear_d2,
           CAST(floor({_SQL_SSE2} / 1e4 + 0.5) AS BIGINT) AS sse_quad_d2,
           round({_SQL_R2_1}, 9) AS r2_linear,
           round({_SQL_R2_2}, 9) AS r2_quad,
           floor(({_SQL_SSE1} - {_SQL_SSE2}) / ({_SQL_SSE2} / (m - 3))
                 * 1000000 + 0.5) / 1e6 AS partial_f
    FROM c2
    """,
)


def _dpartialf(spark, sf_dir):
    """Partial F for the quadratic term, from cleared exact moments."""
    c = _y2_cleared(spark, sf_dir)
    m, cuu, cvv, cuw, cvw, cww, bu, bv, r2_1, r2_2, sse1, sse2 = _cols()
    return c.select(
        m.alias("n_orders"),
        F.floor(sse1 / F.lit(1e4) + F.lit(0.5)).cast("long").alias("sse_linear_d2"),
        F.floor(sse2 / F.lit(1e4) + F.lit(0.5)).cast("long").alias("sse_quad_d2"),
        F.round(r2_1, 9).alias("r2_linear"),
        F.round(r2_2, 9).alias("r2_quad"),
        (
            F.floor((sse1 - sse2) / (sse2 / (m - 3)) * F.lit(1000000) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("partial_f"),
    )


CATALOG["ml_partial_f_add_quadratic"].fn = _dpartialf


register(
    "ml_mallows_cp_models",
    # Mallows Cp with s^2 from the full (quadratic) model:
    # Cp_p = SSE_p / s^2 - n + 2p.  The linear model (p = 2) carries
    # the information; the full model's Cp = 3 identically and is
    # emitted as the built-in self-check.  s^2 leaves as integer
    # dollars^2, Cp floor-quantized at 6dp.
    oracle=f"""
    {_Y2_CTES}
    SELECT m AS n_orders,
           CAST(floor({_SQL_SSE2} / (m - 3) / 1e4 + 0.5) AS BIGINT)
             AS s2_full_d2,
           floor(({_SQL_SSE1} / ({_SQL_SSE2} / (m - 3)) - m + 4)
                 * 1000000 + 0.5) / 1e6 AS cp_linear,
           floor(({_SQL_SSE2} / ({_SQL_SSE2} / (m - 3)) - m + 6)
                 * 1000000 + 0.5) / 1e6 AS cp_quad_check
    FROM c2
    """,
)


def _dmallows(spark, sf_dir):
    """Mallows Cp pair off the shared cleared moments."""
    c = _y2_cleared(spark, sf_dir)
    m, cuu, cvv, cuw, cvw, cww, bu, bv, r2_1, r2_2, sse1, sse2 = _cols()
    s2 = sse2 / (m - 3)
    q6 = lambda x: F.floor(x * F.lit(1000000) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return c.select(
        m.alias("n_orders"),
        F.floor(s2 / F.lit(1e4) + F.lit(0.5)).cast("long").alias("s2_full_d2"),
        q6(sse1 / s2 - m + 4).alias("cp_linear"),
        q6(sse2 / s2 - m + 6).alias("cp_quad_check"),
    )


CATALOG["ml_mallows_cp_models"].fn = _dmallows


register(
    "ml_aic_bic_order_models",
    # Gaussian AIC/BIC (up to the additive constant) for the linear
    # (k = 2) and quadratic (k = 3) order-size models: n*ln(SSE/n) +
    # 2k resp. + k*ln(n), with SSE in dollars^2.  Both ln terms
    # quantize to 6dp micro-integers FIRST, so every product and sum
    # is exact integer arithmetic (n * ln6 stays under 2^53) and the
    # one final /1e6 is the same double on both engines.
    oracle=f"""
    {_Y2_CTES},
    q AS (
      SELECT m,
             CAST(floor(round(ln({_SQL_SSE1} / m / 1e4), 6) * 1000000 + 0.5)
               AS BIGINT) AS l1,
             CAST(floor(round(ln({_SQL_SSE2} / m / 1e4), 6) * 1000000 + 0.5)
               AS BIGINT) AS l2,
             CAST(floor(round(ln(CAST(m AS DOUBLE)), 6) * 1000000 + 0.5)
               AS BIGINT) AS ln_n
      FROM c2
    )
    SELECT m AS n_orders,
           CAST(m * l1 + 2 * 2 * 1000000 AS DOUBLE) / 1e6 AS aic_linear,
           CAST(m * l2 + 2 * 3 * 1000000 AS DOUBLE) / 1e6 AS aic_quad,
           CAST(m * l1 + 2 * ln_n AS DOUBLE) / 1e6 AS bic_linear,
           CAST(m * l2 + 3 * ln_n AS DOUBLE) / 1e6 AS bic_quad
    FROM q
    """,
)


def _daicbic(spark, sf_dir):
    """AIC/BIC for both models via micro-integer assembly."""
    c = _y2_cleared(spark, sf_dir)
    m, cuu, cvv, cuw, cvw, cww, bu, bv, r2_1, r2_2, sse1, sse2 = _cols()
    i6 = lambda x: F.floor(F.round(x, 6) * F.lit(1000000) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    q = c.select(
        "m",
        i6(F.log(sse1 / m / F.lit(1e4))).alias("l1"),
        i6(F.log(sse2 / m / F.lit(1e4))).alias("l2"),
        i6(F.log(m.cast("double"))).alias("ln_n"),
    )
    m = F.col("m")
    return q.select(
        m.alias("n_orders"),
        ((m * F.col("l1") + 4 * 1000000).cast("double") / F.lit(1e6)).alias(
            "aic_linear"
        ),
        ((m * F.col("l2") + 6 * 1000000).cast("double") / F.lit(1e6)).alias("aic_quad"),
        ((m * F.col("l1") + 2 * F.col("ln_n")).cast("double") / F.lit(1e6)).alias(
            "bic_linear"
        ),
        ((m * F.col("l2") + 3 * F.col("ln_n")).cast("double") / F.lit(1e6)).alias(
            "bic_quad"
        ),
    )


CATALOG["ml_aic_bic_order_models"].fn = _daicbic


register(
    "ml_std_betas_quadratic",
    # Standardized coefficients of the quadratic model: beta_j* =
    # b_j * sd(x_j)/sd(y) = b_j * sqrt(c_jj / cww) (the m factors
    # cancel). Raw slopes are reported in dollars per item (resp. per
    # item^2): the cents slope / 100.
    oracle=f"""
    {_Y2_CTES}
    SELECT m AS n_orders,
           round({_SQL_BU} / 100, 6) AS b_x_dollars,
           round({_SQL_BV} / 100, 6) AS b_x2_dollars,
           round({_SQL_BU} * sqrt(cuu / cww), 9) AS std_beta_x,
           round({_SQL_BV} * sqrt(cvv / cww), 9) AS std_beta_x2,
           round({_SQL_R2_2}, 9) AS r2_quad
    FROM c2
    """,
)


def _dstdbetas(spark, sf_dir):
    """Standardized betas off the cleared moments."""
    c = _y2_cleared(spark, sf_dir)
    m, cuu, cvv, cuw, cvw, cww, bu, bv, r2_1, r2_2, sse1, sse2 = _cols()
    return c.select(
        m.alias("n_orders"),
        F.round(bu / 100, 6).alias("b_x_dollars"),
        F.round(bv / 100, 6).alias("b_x2_dollars"),
        F.round(bu * F.sqrt(cuu / cww), 9).alias("std_beta_x"),
        F.round(bv * F.sqrt(cvv / cww), 9).alias("std_beta_x2"),
        F.round(r2_2, 9).alias("r2_quad"),
    )


CATALOG["ml_std_betas_quadratic"].fn = _dstdbetas


register(
    "ml_bonferroni_outlier_max_t",
    # Bonferroni-style single-outlier test on the shared LINEAR
    # residual frame: the externally studentized residual t_i =
    # e_i / (s_(i) * sqrt(1 - h_i)) with the closed-form LOO sigma
    # (exactly the r14 DFFITS machinery with sqrt(h) -> 1), its
    # argmax order, and the count of |t_i| > 4.  |t| micro-quantizes
    # for the ranking key.
    oracle=f"""
    {_ORDER_REG_CTES},
    sse AS (
      SELECT SUM(CAST(e6 AS HUGEINT) * e6) AS sse12 FROM r
    ),
    d AS (
      SELECT r.o_orderkey, r.x, r.e6,
             (1.0 / b.n
              + CAST((b.n * r.x - b.sx) AS DOUBLE) * (b.n * r.x - b.sx)
                / b.n / CAST(b.n * b.sxx - CAST(b.sx AS HUGEINT) * b.sx AS DOUBLE))
                 AS h,
             CAST(sse.sse12 AS DOUBLE) AS sse12, b.n
      FROM r CROSS JOIN b0 b CROSS JOIN sse
    ),
    scored AS (
      SELECT o_orderkey, x, e6, n,
             CAST(floor(abs(CAST(e6 AS DOUBLE)
               / (sqrt((sse12 - CAST(e6 AS DOUBLE) * e6 / (1 - h)) / (n - 3))
                  * sqrt(1 - h))) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM d
    )
    SELECT MAX(n) AS n_orders,
           MAX_BY(o_orderkey,
                  CAST(t6 AS HUGEINT) * 100000000 - o_orderkey) AS top_orderkey,
           round(MAX(t6) / 1e6, 6) AS max_abs_t,
           CAST(SUM(CASE WHEN t6 > 4000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_4
    FROM scored
    """,
)


def _dbonferroni(spark, sf_dir):
    """Max externally studentized residual over the shared frame."""
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
    t6 = F.floor(
        F.abs(
            e6d
            / (
                F.sqrt(
                    (F.col("sse12").cast("double") - e6d * F.col("e6") / (1 - h))
                    / (F.col("n") - 3)
                )
                * F.sqrt(1 - h)
            )
        )
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    scored = d.select("o_orderkey", "n", t6.alias("t6"))
    return scored.agg(
        F.max("n").alias("n_orders"),
        F.max_by(
            F.col("o_orderkey"),
            F.col("t6").cast("decimal(38,0)") * 100000000 - F.col("o_orderkey"),
        ).alias("top_orderkey"),
        F.round(F.max("t6") / F.lit(1e6), 6).alias("max_abs_t"),
        F.sum(F.when(F.col("t6") > 4000000, 1).otherwise(0))
        .cast("long")
        .alias("n_above_4"),
    )


CATALOG["ml_bonferroni_outlier_max_t"].fn = _dbonferroni
