"""Round-14 wave 12 (post-rotation): regression diagnostics II —
White's heteroskedasticity test (the cross-term-free x, x^2 auxiliary
regression, complementing r12's Breusch-Pagan on the same shared
residual frame), the Ramsey RESET quadratic specification test, the
Sobel mediation z (a*b with delta-method SE), a Box-Cox profile
log-likelihood grid, and the Durbin-Wu-Hausman endogeneity test
comparing wave-10's IV and OLS slopes.

All five are closed-form moment algebra: the 2-regressor normal
equations solve by Cramer's rule on cleared centered sums (the wave-11
Granger machinery), every raw moment is an exact HUGEINT/decimal sum,
the w-side cleared moments that would overflow 128-bit at the 10x
probe are single deterministic double products of exact sums, and
Box-Cox per-row transforms (sqrt/reciprocal exact, ln at 6dp) quantize
to micro units before the grid sums.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t
from .q47_r11_econometrics import _ORDER_REG_CTES, _order_reg_resid
from .q77_r14_graph_iv_matryoshka import _XYZ_CTE, _xyz_frame


def _white_reset_sql(wexpr: str, label: str) -> str:
    """Shared 2-regressor (u = x, v = x^2) auxiliary-regression SQL:
    returns CTEs computing the cleared centered moments for target
    ``wexpr`` over the shared residual frame r."""
    return f"""aux AS (
      SELECT x AS u, CAST(x AS HUGEINT) * x AS v, {wexpr} AS w FROM r
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv,
             CAST(SUM(w) AS HUGEINT) AS sw,
             SUM(CAST(u AS HUGEINT) * u) AS suu,
             SUM(CAST(v AS HUGEINT) * v) AS svv,
             SUM(CAST(u AS HUGEINT) * v) AS suv,
             SUM(CAST(u AS HUGEINT) * w) AS suw,
             SUM(CAST(v AS HUGEINT) * w) AS svw,
             CAST(SUM(CAST(w AS DOUBLE) * w) AS DOUBLE) AS sww_d
      FROM aux
    ),
    c_{label} AS (
      SELECT m,
             CAST(m * suu - su * su AS DOUBLE) AS cuu,
             CAST(m * svv - sv * sv AS DOUBLE) AS cvv,
             CAST(m * suv - su * sv AS DOUBLE) AS cuv,
             CAST(m * suw - su * sw AS DOUBLE) AS cuw,
             CAST(m * svw - sv * sw AS DOUBLE) AS cvw,
             m * sww_d - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) AS cww
      FROM s
    )"""


register(
    "ml_white_test_hetero",
    # White's test on the shared order-size regression residuals:
    # auxiliary regression of squared residual CENTS on (x, x^2);
    # LM = n * R^2 with R^2 = (b*Suw + c*Svw)/Sww from the Cramer
    # solution — the specification-free complement to the r12
    # Breusch-Pagan entry on the SAME residual frame.
    oracle=f"""
    {_ORDER_REG_CTES},
    {_white_reset_sql(
        "CAST(floor(e6 / 1000000.0 + 0.5) AS HUGEINT)"
        " * CAST(floor(e6 / 1000000.0 + 0.5) AS BIGINT)", "w")}
    SELECT m AS n_orders,
           round(((cuw * cvv - cvw * cuv) * cuw
                  + (cvw * cuu - cuw * cuv) * cvw)
                 / (cuu * cvv - cuv * cuv) / cww, 9) AS r2_aux,
           round(m * ((cuw * cvv - cvw * cuv) * cuw
                      + (cvw * cuu - cuw * cuv) * cvw)
                 / (cuu * cvv - cuv * cuv) / cww, 6) AS white_lm
    FROM c_w
    """,
)


def _dwhite(spark, sf_dir):
    """White LM from the shared residual frame + Cramer moments."""
    r = _order_reg_resid(spark, sf_dir)
    ec = F.floor(F.col("e6") / F.lit(1000000.0) + F.lit(0.5)).cast("decimal(38,0)")
    aux = r.select(
        F.col("x").alias("u"),
        (F.col("x").cast("decimal(38,0)") * F.col("x")).alias("v"),
        (ec * ec.cast("long")).alias("w"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = aux.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("u").cast("decimal(38,0)").alias("su"),
        F.sum("v").cast("decimal(38,0)").alias("sv"),
        F.sum("w").cast("decimal(38,0)").alias("sw"),
        F.sum(dec("u") * F.col("u")).alias("suu"),
        F.sum(dec("v") * F.col("v")).alias("svv"),
        F.sum(dec("u") * F.col("v")).alias("suv"),
        F.sum(dec("u") * F.col("w")).alias("suw"),
        F.sum(dec("v") * F.col("w")).alias("svw"),
        F.sum(F.col("w").cast("double") * F.col("w")).alias("sww_d"),
    )
    m = F.col("m")
    cuu = (m * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    cvv = (m * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
    cuv = (m * F.col("suv") - F.col("su") * F.col("sv")).cast("double")
    cuw = (m * F.col("suw") - F.col("su") * F.col("sw")).cast("double")
    cvw = (m * F.col("svw") - F.col("sv") * F.col("sw")).cast("double")
    cww = m * F.col("sww_d") - F.col("sw").cast("double") * F.col("sw").cast("double")
    det = cuu * cvv - cuv * cuv
    r2 = ((cuw * cvv - cvw * cuv) * cuw + (cvw * cuu - cuw * cuv) * cvw) / det / cww
    return s.select(
        m.alias("n_orders"),
        F.round(r2, 9).alias("r2_aux"),
        F.round(m * r2, 6).alias("white_lm"),
    )


CATALOG["ml_white_test_hetero"].fn = _dwhite


register(
    "ml_ramsey_reset_quadratic",
    # Ramsey RESET with the quadratic term (for a single regressor,
    # adding yhat^2 is equivalent to adding x^2): F = (SSR_r - SSR_u) /
    # (SSR_u / (m - 3)) comparing y ~ x vs y ~ x + x^2 — functional-
    # form misspecification of the order-size line, same shared frame.
    oracle=f"""
    {_ORDER_REG_CTES},
    {_white_reset_sql("CAST(y AS HUGEINT)", "y")}
    SELECT m AS n_orders,
           round((((cww - cuw * cuw / cuu)
                   - (cww - ((cuw * cvv - cvw * cuv) * cuw
                             + (cvw * cuu - cuw * cuv) * cvw)
                            / (cuu * cvv - cuv * cuv)))
                  / ((cww - ((cuw * cvv - cvw * cuv) * cuw
                             + (cvw * cuu - cuw * cuv) * cvw)
                            / (cuu * cvv - cuv * cuv)) / (m - 3))), 6)
             AS reset_f
    FROM c_y
    """,
)


def _dreset(spark, sf_dir):
    """RESET F via the same Cramer machinery with w = y."""
    r = _order_reg_resid(spark, sf_dir)
    aux = r.select(
        F.col("x").alias("u"),
        (F.col("x").cast("decimal(38,0)") * F.col("x")).alias("v"),
        F.col("y").cast("decimal(38,0)").alias("w"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = aux.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("u").cast("decimal(38,0)").alias("su"),
        F.sum("v").cast("decimal(38,0)").alias("sv"),
        F.sum("w").cast("decimal(38,0)").alias("sw"),
        F.sum(dec("u") * F.col("u")).alias("suu"),
        F.sum(dec("v") * F.col("v")).alias("svv"),
        F.sum(dec("u") * F.col("v")).alias("suv"),
        F.sum(dec("u") * F.col("w")).alias("suw"),
        F.sum(dec("v") * F.col("w")).alias("svw"),
        F.sum(F.col("w").cast("double") * F.col("w")).alias("sww_d"),
    )
    m = F.col("m")
    cuu = (m * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    cvv = (m * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
    cuv = (m * F.col("suv") - F.col("su") * F.col("sv")).cast("double")
    cuw = (m * F.col("suw") - F.col("su") * F.col("sw")).cast("double")
    cvw = (m * F.col("svw") - F.col("sv") * F.col("sw")).cast("double")
    cww = m * F.col("sww_d") - F.col("sw").cast("double") * F.col("sw").cast("double")
    det = cuu * cvv - cuv * cuv
    ssr_u = cww - ((cuw * cvv - cvw * cuv) * cuw + (cvw * cuu - cuw * cuv) * cvw) / det
    ssr_r = cww - cuw * cuw / cuu
    return s.select(
        m.alias("n_orders"),
        F.round((ssr_r - ssr_u) / (ssr_u / (m - 3)), 6).alias("reset_f"),
    )


CATALOG["ml_ramsey_reset_quadratic"].fn = _dreset


register(
    "ml_sobel_mediation_dmq",
    # Sobel mediation z for discount -> quantity -> revenue cents on
    # lineitem (a mechanics fixture: the estimator algebra is the
    # point): a = slope of m ~ x, b = coefficient of m in y ~ m + x
    # (Cramer), z = a*b / sqrt(b^2*se_a^2 + a^2*se_b^2) with the
    # classical OLS coefficient variances from the same cleared
    # moments.
    oracle="""
    WITH li AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CAST(l_quantity AS BIGINT) AS mm,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(mm) AS HUGEINT) AS sm,
             CAST(SUM(y) AS HUGEINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(mm AS HUGEINT) * mm) AS smm,
             SUM(CAST(x AS HUGEINT) * mm) AS sxm,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(mm AS HUGEINT) * y) AS smy,
             CAST(SUM(CAST(y AS DOUBLE) * y) AS DOUBLE) AS syy_d
      FROM li
    ),
    c AS (
      SELECT n,
             CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
             CAST(n * smm - sm * sm AS DOUBLE) AS cmm,
             CAST(n * sxm - sx * sm AS DOUBLE) AS cxm,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
             CAST(n * smy - sm * sy AS DOUBLE) AS cmy,
             n * syy_d - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy
      FROM s
    ),
    fit AS (
      SELECT n,
             cxm / cxx AS a,
             (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b,
             -- a-path SSR (the /n cancels the n-clearing of cmm/cxm/cxx)
             (cmm - cxm * cxm / cxx) / n AS ssr_a_n,
             -- y-path SSR (same cancellation)
             (cyy - ((cmy * cxx - cxy * cxm) * cmy
                     + (cxy * cmm - cmy * cxm) * cxy)
                    / (cmm * cxx - cxm * cxm)) / n AS ssr_y_n,
             cxx, cmm, cxm
      FROM c
    ),
    se AS (
      -- the ssr_*_n columns are ALREADY the plain SSRs (the n-
      -- clearings cancel inside fit), so the variances take SSR/(df)
      -- directly: Var(a) = (SSR_a/(n-2)) / Sxx_c with Sxx_c = cxx/n;
      -- Var(b) = (SSR_y/(n-3)) * Sxx_c / (det_c/n^2)
      SELECT n, a, b,
             (ssr_a_n / (n - 2)) / (cxx / n) AS var_a,
             (ssr_y_n / (n - 3)) * (cxx / n)
               / ((cmm * cxx - cxm * cxm) / (CAST(n AS DOUBLE) * n)) AS var_b
      FROM fit
    )
    SELECT n AS n_rows,
           round(a, 9) AS a_path,
           round(b, 9) AS b_path,
           round(a * b, 9) AS indirect_effect,
           round(a * b / sqrt(b * b * var_a + a * a * var_b), 6) AS sobel_z
    FROM se
    """,
)


def _dsobel(spark, sf_dir):
    """Sobel z from cleared moments (a-path OLS, b-path 2-regressor)."""
    li = t(spark, sf_dir, "lineitem")
    x = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    mm = F.col("l_quantity").cast("long")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sx"),
        F.sum(mm).cast("decimal(38,0)").alias("sm"),
        F.sum(y).cast("decimal(38,0)").alias("sy"),
        F.sum(dec(x) * x).alias("sxx"),
        F.sum(dec(mm) * mm).alias("smm"),
        F.sum(dec(x) * mm).alias("sxm"),
        F.sum(dec(x) * y).alias("sxy"),
        F.sum(dec(mm) * y).alias("smy"),
        F.sum(y.cast("double") * y).alias("syy_d"),
    )
    n = F.col("n")
    cxx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cmm = (n * F.col("smm") - F.col("sm") * F.col("sm")).cast("double")
    cxm = (n * F.col("sxm") - F.col("sx") * F.col("sm")).cast("double")
    cxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cmy = (n * F.col("smy") - F.col("sm") * F.col("sy")).cast("double")
    cyy = n * F.col("syy_d") - F.col("sy").cast("double") * F.col("sy").cast("double")
    a = cxm / cxx
    det = cmm * cxx - cxm * cxm
    b = (cmy * cxx - cxy * cxm) / det
    ssr_a_n = (cmm - cxm * cxm / cxx) / n
    ssr_y_n = (cyy - ((cmy * cxx - cxy * cxm) * cmy + (cxy * cmm - cmy * cxm) * cxy) / det) / n
    var_a = (ssr_a_n / (n - 2)) / (cxx / n)
    var_b = (ssr_y_n / (n - 3)) * (cxx / n) / (det / (n.cast("double") * n))
    return s.select(
        n.alias("n_rows"),
        F.round(a, 9).alias("a_path"),
        F.round(b, 9).alias("b_path"),
        F.round(a * b, 9).alias("indirect_effect"),
        F.round(a * b / F.sqrt(b * b * var_a + a * a * var_b), 6).alias("sobel_z"),
    )


CATALOG["ml_sobel_mediation_dmq"].fn = _dsobel


register(
    "ml_box_cox_grid",
    # Box-Cox profile log-likelihood over lambda in {-1, -0.5, 0, 0.5,
    # 1} for order totals (dollars, strictly positive): LL(lambda) =
    # -(n/2)*ln(sigma2_z) + (lambda - 1)*sum(ln y).  Per-row
    # transforms are exact (sqrt / reciprocal) or 6dp-ln; z and z^2
    # quantize to PICO units before the grid sums (see the q CTE).
    oracle="""
    WITH yv AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS y
      FROM orders
    ),
    lam(l) AS (VALUES (-1.0), (-0.5), (0.0), (0.5), (1.0)),
    z AS (
      SELECT lam.l,
             CASE lam.l
               WHEN 1.0 THEN y - 1
               WHEN 0.5 THEN 2 * (sqrt(y) - 1)
               WHEN 0.0 THEN round(ln(y), 6)
               WHEN -0.5 THEN 2 * (1 - 1 / sqrt(y))
               ELSE 1 - 1 / y
             END AS zz,
             round(ln(y), 6) AS lny
      FROM yv CROSS JOIN lam
    ),
    q AS (
      -- per-lambda quantum: the reciprocal lambdas live in (0, 1)
      -- with variance ~1e-9 (a 1e-6 quantum annihilates it), while
      -- lambda >= 0.5 has z^2 ~ 1e11 where a 1e12 quantum would
      -- overflow BIGINT per row (Spark FLOOR returns LONG)
      SELECT l,
             CASE WHEN l >= 0.5 THEN 1000000.0 ELSE 1000000000000.0 END AS sc,
             CAST(floor(zz * (CASE WHEN l >= 0.5 THEN 1000000.0
                              ELSE 1000000000000.0 END) + 0.5) AS HUGEINT) AS zq,
             CAST(floor(zz * zz * (CASE WHEN l >= 0.5 THEN 1000000.0
                              ELSE 1000000000000.0 END) + 0.5) AS HUGEINT) AS zzq,
             CAST(floor(lny * 1000000 + 0.5) AS BIGINT) AS ln6
      FROM z
    ),
    g AS (
      SELECT l, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(zq) AS DOUBLE) / MAX(sc) AS sz,
             CAST(SUM(zzq) AS DOUBLE) / MAX(sc) AS szz,
             CAST(SUM(ln6) AS DOUBLE) / 1e6 AS slny
      FROM q GROUP BY l
    )
    SELECT l AS lambda,
           round((szz - sz * sz / n) / n, 6) AS sigma2_z,
           round(-(CAST(n AS DOUBLE) / 2) * round(ln((szz - sz * sz / n) / n), 6)
                 + (l - 1) * slny, 4) AS profile_loglik
    FROM g ORDER BY l
    """,
)


def _dboxcox(spark, sf_dir):
    """Box-Cox profile LL grid — per-row exact transforms, micro sums."""
    o = t(spark, sf_dir, "orders")
    yv = o.select(
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("y")
    )
    spark_ = o.sparkSession
    lam = spark_.createDataFrame(
        [(-1.0,), (-0.5,), (0.0,), (0.5,), (1.0,)], "l double"
    )
    z = yv.crossJoin(F.broadcast(lam)).select(
        "l",
        F.when(F.col("l") == 1.0, F.col("y") - 1)
        .when(F.col("l") == 0.5, 2 * (F.sqrt(F.col("y")) - 1))
        .when(F.col("l") == 0.0, F.round(F.log(F.col("y")), 6))
        .when(F.col("l") == -0.5, 2 * (1 - 1 / F.sqrt(F.col("y"))))
        .otherwise(1 - 1 / F.col("y"))
        .alias("zz"),
        F.round(F.log(F.col("y")), 6).alias("lny"),
    )
    sc = F.when(F.col("l") >= 0.5, F.lit(1000000.0)).otherwise(
        F.lit(1000000000000.0)
    )
    q = z.select(
        "l",
        sc.alias("sc"),
        F.floor(F.col("zz") * sc + F.lit(0.5)).cast("decimal(38,0)").alias("zq"),
        F.floor(F.col("zz") * F.col("zz") * sc + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("zzq"),
        F.floor(F.col("lny") * F.lit(1000000) + F.lit(0.5)).cast("long").alias("ln6"),
    )
    g = q.groupBy("l").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("zq").cast("double") / F.max("sc")).alias("sz"),
        (F.sum("zzq").cast("double") / F.max("sc")).alias("szz"),
        (F.sum("ln6").cast("double") / F.lit(1e6)).alias("slny"),
    )
    sig2 = (F.col("szz") - F.col("sz") * F.col("sz") / F.col("n")) / F.col("n")
    return g.select(
        F.col("l").alias("lambda"),
        F.round(sig2, 6).alias("sigma2_z"),
        F.round(
            -(F.col("n").cast("double") / 2) * F.round(F.log(sig2), 6)
            + (F.col("l") - 1) * F.col("slny"),
            4,
        ).alias("profile_loglik"),
    ).orderBy("lambda")


CATALOG["ml_box_cox_grid"].fn = _dboxcox


register(
    "ml_hausman_iv_vs_ols",
    # Durbin-Wu-Hausman endogeneity test on the wave-10 IV setup
    # (quantity ~ discount, tax as instrument): H = (b_IV - b_OLS)^2 /
    # (Var_IV - Var_OLS), each variance from the respective residual
    # sums: Var_OLS = s2_ols / Sxx, Var_IV = s2_iv * Szz / Szx^2 (all
    # centered, n-cleared exact moments; one assembly).
    oracle=f"""
    WITH {_XYZ_CTE},
    c AS (
      SELECT n,
             CAST(n * sxx - sx * sx AS DOUBLE) / n AS cxx,
             CAST(n * syy - sy * sy AS DOUBLE) / n AS cyy,
             CAST(n * szz - sz * sz AS DOUBLE) / n AS czz,
             CAST(n * sxy - sx * sy AS DOUBLE) / n AS cxy,
             CAST(n * szx - sz * sx AS DOUBLE) / n AS czx,
             CAST(n * szy - sz * sy AS DOUBLE) / n AS czy
      FROM m
    ),
    fit AS (
      SELECT n, cxx, czz, czx,
             cxy / cxx AS b_ols,
             czy / czx AS b_iv,
             (cyy - 2 * (cxy / cxx) * cxy + (cxy / cxx) * (cxy / cxx) * cxx)
               / (n - 2) AS s2_ols,
             (cyy - 2 * (czy / czx) * cxy + (czy / czx) * (czy / czx) * cxx)
               / (n - 2) AS s2_iv
      FROM c
    )
    SELECT n AS n_rows,
           round(b_ols, 9) AS beta_ols,
           round(b_iv, 9) AS beta_iv,
           round(s2_iv * czz / (czx * czx) - s2_ols / cxx, 9) AS var_diff,
           round((b_iv - b_ols) * (b_iv - b_ols)
                 / NULLIF(s2_iv * czz / (czx * czx) - s2_ols / cxx, 0), 6)
             AS hausman_h
    FROM fit
    """,
)


def _dhausman(spark, sf_dir):
    """DWH endogeneity statistic from the shared xyz moments."""
    m = _xyz_frame(spark, sf_dir)
    n = F.col("n")
    nd = n.cast("double")
    cxx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double") / n
    cyy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double") / n
    czz = (n * F.col("szz") - F.col("sz") * F.col("sz")).cast("double") / n
    cxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / n
    czx = (n * F.col("szx") - F.col("sz") * F.col("sx")).cast("double") / n
    czy = (n * F.col("szy") - F.col("sz") * F.col("sy")).cast("double") / n
    b_ols = cxy / cxx
    b_iv = czy / czx
    s2_ols = (cyy - 2 * b_ols * cxy + b_ols * b_ols * cxx) / (n - 2)
    s2_iv = (cyy - 2 * b_iv * cxy + b_iv * b_iv * cxx) / (n - 2)
    var_diff = s2_iv * czz / (czx * czx) - s2_ols / cxx
    return m.select(
        n.alias("n_rows"),
        F.round(b_ols, 9).alias("beta_ols"),
        F.round(b_iv, 9).alias("beta_iv"),
        F.round(var_diff, 9).alias("var_diff"),
        F.round(
            (b_iv - b_ols) * (b_iv - b_ols) / F.nullif(var_diff, F.lit(0.0)), 6
        ).alias("hausman_h"),
    )


CATALOG["ml_hausman_iv_vs_ols"].fn = _dhausman
