"""Round-14 wave 11 (post-rotation, funds the r15 pool): bivariate
daily-series analytics between click traffic and purchase value —
lag-1 Granger causality (restricted-vs-unrestricted SSR F), the
cross-correlation function at lags -3..+3, binary transfer entropy in
both directions, Lin's concordance correlation between the realized
series and its seasonal-naive forecast, and the Newey-West HAC
variance of the daily mean.

Both series are exact integers (clicks count; purchase cents); every
per-lag / per-cell moment is an exact HUGEINT/decimal sum, Granger's
normal-equation determinants are single deterministic double products
of exact sums, transfer-entropy cells follow the picounit ln recipe,
and the NW per-lag autocovariances quantize with the bit-stable
floor(x*scale + 0.5) before the kernel sum.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# The two aligned daily series: x = clicks count, y = purchase cents.
# Day offsets are contiguous over the event window (every day has
# events at every sf), so lag joins on off are exact.
_XY_CTES = """dd AS (
      SELECT CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END) * 100
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT dn - MIN(dn) OVER () AS off, x, COALESCE(y, 0) AS y,
             COUNT(*) OVER () AS n
      FROM dd
    )"""


def _xy_frame(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).alias("dn")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                )
            )
            * 100
        )
        .cast("long")
        .alias("y"),
    )
    wall = Window.orderBy("dn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return dd.select(
        (F.col("dn") - F.min("dn").over(wall)).alias("off"),
        "x",
        F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        F.count("*").over(wall).alias("n"),
    )


register(
    "evt_granger_clicks_to_purchases",
    # Does click traffic Granger-cause purchase value at lag 1?
    # Unrestricted y_t ~ 1 + y_{t-1} + x_{t-1} vs restricted
    # y_t ~ 1 + y_{t-1}; F = (SSR_r - SSR_u) / (SSR_u / (m - 3)).
    # The 2-regressor normal equations solve by Cramer's rule on
    # m-cleared centered sums (exact HUGEINTs; the determinant is one
    # deterministic double product).
    oracle=f"""
    WITH {_XY_CTES},
    lagged AS (
      SELECT b.y AS w, a.y AS u, a.x AS v
      FROM d a JOIN d b ON b.off = a.off + 1
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
             SUM(CAST(w AS HUGEINT) * w) AS sww
      FROM lagged
    ),
    c AS (
      SELECT m,
             CAST(m * suu - su * su AS DOUBLE) AS cuu,
             CAST(m * svv - sv * sv AS DOUBLE) AS cvv,
             CAST(m * suv - su * sv AS DOUBLE) AS cuv,
             CAST(m * suw - su * sw AS DOUBLE) AS cuw,
             CAST(m * svw - sv * sw AS DOUBLE) AS cvw,
             CAST(m * sww - sw * sw AS DOUBLE) AS cww
      FROM s
    ),
    fit AS (
      SELECT m, cww,
             (cuw * cvv - cvw * cuv) / (cuu * cvv - cuv * cuv) AS b,
             (cvw * cuu - cuw * cuv) / (cuu * cvv - cuv * cuv) AS cc,
             cuw, cvw, cuu
      FROM c
    )
    SELECT m AS n_obs,
           round(b, 9) AS beta_y_lag,
           round(cc, 9) AS beta_x_lag,
           round(((cww - cuw * cuw / cuu) - (cww - b * cuw - cc * cvw))
                 / ((cww - b * cuw - cc * cvw) / (m - 3)), 6) AS f_granger
    FROM fit
    """,
)


def _dgranger(spark, sf_dir):
    """Granger lag-1 F via Cramer's rule on cleared exact moments."""
    d = _xy_frame(spark, sf_dir)
    a = d.select(F.col("off").alias("o"), F.col("y").alias("u"), F.col("x").alias("v"))
    b_ = d.select((F.col("off") - 1).alias("o"), F.col("y").alias("w"))
    lagged = a.join(b_, "o").select("w", "u", "v")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = lagged.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("u").cast("decimal(38,0)").alias("su"),
        F.sum("v").cast("decimal(38,0)").alias("sv"),
        F.sum("w").cast("decimal(38,0)").alias("sw"),
        F.sum(dec("u") * F.col("u")).alias("suu"),
        F.sum(dec("v") * F.col("v")).alias("svv"),
        F.sum(dec("u") * F.col("v")).alias("suv"),
        F.sum(dec("u") * F.col("w")).alias("suw"),
        F.sum(dec("v") * F.col("w")).alias("svw"),
        F.sum(dec("w") * F.col("w")).alias("sww"),
    )
    m = F.col("m")
    cuu = (m * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    cvv = (m * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
    cuv = (m * F.col("suv") - F.col("su") * F.col("sv")).cast("double")
    cuw = (m * F.col("suw") - F.col("su") * F.col("sw")).cast("double")
    cvw = (m * F.col("svw") - F.col("sv") * F.col("sw")).cast("double")
    cww = (m * F.col("sww") - F.col("sw") * F.col("sw")).cast("double")
    det = cuu * cvv - cuv * cuv
    b = (cuw * cvv - cvw * cuv) / det
    cc = (cvw * cuu - cuw * cuv) / det
    ssr_u = cww - b * cuw - cc * cvw
    ssr_r = cww - cuw * cuw / cuu
    return s.select(
        m.alias("n_obs"),
        F.round(b, 9).alias("beta_y_lag"),
        F.round(cc, 9).alias("beta_x_lag"),
        F.round((ssr_r - ssr_u) / (ssr_u / (m - 3)), 6).alias("f_granger"),
    )


CATALOG["evt_granger_clicks_to_purchases"].fn = _dgranger


register(
    "evt_cross_correlation_lags",
    # Cross-correlation function between click counts and purchase
    # value at lags -3..+3 (positive lag = clicks LEAD purchases by l
    # days): per lag, Pearson r over the overlapping window from
    # m-cleared exact sums — the lead-lag fingerprint of the funnel.
    oracle=f"""
    WITH {_XY_CTES},
    lg(l) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
    pairs AS (
      SELECT lg.l, a.x AS xv, b.y AS yv
      FROM lg, d a JOIN d b ON b.off = a.off + lg.l
    ),
    s AS (
      SELECT l, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(xv) AS HUGEINT) AS sx, CAST(SUM(yv) AS HUGEINT) AS sy,
             SUM(CAST(xv AS HUGEINT) * xv) AS sxx,
             SUM(CAST(yv AS HUGEINT) * yv) AS syy,
             SUM(CAST(xv AS HUGEINT) * yv) AS sxy
      FROM pairs GROUP BY l
    )
    SELECT l AS lag_days, m AS n_pairs,
           round(CAST(m * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                        * CAST(m * syy - sy * sy AS DOUBLE)), 6) AS ccf
    FROM s ORDER BY l
    """,
)


def _dccf(spark, sf_dir):
    """CCF at 7 lags — one lag-grid equi-join over the daily frame."""
    d = _xy_frame(spark, sf_dir).localCheckpoint(eager=False)
    spark_ = d.sparkSession
    lg = spark_.createDataFrame([(l,) for l in range(-3, 4)], "l long")
    a = d.select(F.col("off").alias("oa"), F.col("x").alias("xv"))
    b = d.select(F.col("off").alias("ob"), F.col("y").alias("yv"))
    pairs = (
        a.crossJoin(F.broadcast(lg))
        .join(b, F.col("ob") == F.col("oa") + F.col("l"))
        .select("l", "xv", "yv")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pairs.groupBy("l").agg(
        F.count("*").cast("long").alias("m"),
        F.sum("xv").cast("decimal(38,0)").alias("sx"),
        F.sum("yv").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("xv") * F.col("xv")).alias("sxx"),
        F.sum(dec("yv") * F.col("yv")).alias("syy"),
        F.sum(dec("xv") * F.col("yv")).alias("sxy"),
    )
    m = F.col("m")
    return s.select(
        F.col("l").alias("lag_days"),
        m.alias("n_pairs"),
        F.round(
            (m * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt(
                (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                * (m * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
            6,
        ).alias("ccf"),
    ).orderBy("lag_days")


CATALOG["evt_cross_correlation_lags"].fn = _dccf


register(
    "evt_transfer_entropy_binary",
    # Lag-1 transfer entropy between the median-binarized series, both
    # directions: TE(x->y) = sum over (y+, y, x) cells of
    # (c/n) * ln(c * c(y) / (c(y,x) * c(y+,y))).  Exact medians via
    # the doubled trick, 8-cell counts, picounit ln terms — the
    # directional-coupling companion to the symmetric CCF.
    oracle=f"""
    WITH {_XY_CTES},
    med AS (
      SELECT CAST(2 * quantile_cont(x, 0.5) AS BIGINT) AS mx2,
             CAST(2 * quantile_cont(y, 0.5) AS BIGINT) AS my2
      FROM d
    ),
    bin AS (
      SELECT off,
             CASE WHEN 2 * x > mx2 THEN 1 ELSE 0 END AS bx,
             CASE WHEN 2 * y > my2 THEN 1 ELSE 0 END AS by2
      FROM d CROSS JOIN med
    ),
    tr AS (
      SELECT b.by2 AS ynext, a.by2 AS ycur, a.bx AS xcur,
             b.bx AS xnext
      FROM bin a JOIN bin b ON b.off = a.off + 1
    ),
    nn2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tr),
    texy AS (
      SELECT CAST(SUM(t12) AS BIGINT) AS te12 FROM (
        SELECT CAST(floor(round((CAST(c3 AS DOUBLE) / n)
          * round(ln(CAST(CAST(c3 AS HUGEINT) * cy AS DOUBLE)
                     / (CAST(cyx AS HUGEINT) * cyy)), 6), 12)
          * 1000000000000 + 0.5) AS BIGINT) AS t12
        FROM (
          SELECT ynext, ycur, xcur, CAST(COUNT(*) AS BIGINT) AS c3,
                 SUM(COUNT(*)) OVER (PARTITION BY ycur) AS cy,
                 SUM(COUNT(*)) OVER (PARTITION BY ycur, xcur) AS cyx,
                 SUM(COUNT(*)) OVER (PARTITION BY ynext, ycur) AS cyy
          FROM tr GROUP BY ynext, ycur, xcur
        ) CROSS JOIN nn2
      )
    ),
    teyx AS (
      SELECT CAST(SUM(t12) AS BIGINT) AS te12 FROM (
        SELECT CAST(floor(round((CAST(c3 AS DOUBLE) / n)
          * round(ln(CAST(CAST(c3 AS HUGEINT) * cy AS DOUBLE)
                     / (CAST(cyx AS HUGEINT) * cyy)), 6), 12)
          * 1000000000000 + 0.5) AS BIGINT) AS t12
        FROM (
          SELECT xnext, xcur, ycur, CAST(COUNT(*) AS BIGINT) AS c3,
                 SUM(COUNT(*)) OVER (PARTITION BY xcur) AS cy,
                 SUM(COUNT(*)) OVER (PARTITION BY xcur, ycur) AS cyx,
                 SUM(COUNT(*)) OVER (PARTITION BY xnext, xcur) AS cyy
          FROM tr GROUP BY xnext, xcur, ycur
        ) CROSS JOIN nn2
      )
    )
    SELECT (SELECT n FROM nn2) AS n_transitions,
           round((SELECT te12 FROM texy) / 1000000000000.0, 6)
             AS te_clicks_to_purchases,
           round((SELECT te12 FROM teyx) / 1000000000000.0, 6)
             AS te_purchases_to_clicks
    """,
)


def _dte(spark, sf_dir):
    """Binary transfer entropy both ways off the 8-cell transition
    table (windows over the <=8-row grouped frame)."""
    d = _xy_frame(spark, sf_dir)
    med = d.agg(
        (2 * F.percentile("x", 0.5)).cast("long").alias("mx2"),
        (2 * F.percentile("y", 0.5)).cast("long").alias("my2"),
    )
    binf = d.crossJoin(F.broadcast(med)).select(
        "off",
        F.when(2 * F.col("x") > F.col("mx2"), 1).otherwise(0).alias("bx"),
        F.when(2 * F.col("y") > F.col("my2"), 1).otherwise(0).alias("by2"),
    )
    a = binf.select(F.col("off").alias("o"), F.col("bx").alias("xcur"), F.col("by2").alias("ycur"))
    b = binf.select((F.col("off") - 1).alias("o"), F.col("bx").alias("xnext"), F.col("by2").alias("ynext"))
    tr = a.join(b, "o").select("ynext", "ycur", "xcur", "xnext").localCheckpoint(
        eager=False
    )
    nn2 = tr.agg(F.count("*").cast("long").alias("n"))

    def te(next_c, cur_c, other_c):
        g = tr.groupBy(next_c, cur_c, other_c).agg(
            F.count("*").cast("long").alias("c3")
        )
        wy = Window.partitionBy(cur_c)
        wyx = Window.partitionBy(cur_c, other_c)
        wyy = Window.partitionBy(next_c, cur_c)
        cells = g.select(
            "c3",
            F.sum("c3").over(wy).alias("cy"),
            F.sum("c3").over(wyx).alias("cyx"),
            F.sum("c3").over(wyy).alias("cyy"),
        ).crossJoin(F.broadcast(nn2))
        t12 = F.floor(
            F.round(
                (F.col("c3").cast("double") / F.col("n"))
                * F.round(
                    F.log(
                        (F.col("c3").cast("decimal(38,0)") * F.col("cy")).cast(
                            "double"
                        )
                        / (F.col("cyx").cast("decimal(38,0)") * F.col("cyy"))
                    ),
                    6,
                ),
                12,
            )
            * F.lit(1000000000000)
            + F.lit(0.5)
        ).cast("long")
        return cells.agg(F.sum(t12).cast("long").alias("te12"))

    texy = te("ynext", "ycur", "xcur")
    teyx = te("xnext", "xcur", "ycur").withColumnRenamed("te12", "te12b")
    return (
        nn2.crossJoin(F.broadcast(texy))
        .crossJoin(F.broadcast(teyx))
        .select(
            F.col("n").alias("n_transitions"),
            F.round(F.col("te12") / F.lit(1000000000000.0), 6).alias(
                "te_clicks_to_purchases"
            ),
            F.round(F.col("te12b") / F.lit(1000000000000.0), 6).alias(
                "te_purchases_to_clicks"
            ),
        )
    )


CATALOG["evt_transfer_entropy_binary"].fn = _dte


register(
    "ml_lin_ccc_seasonal_forecast",
    # Lin's concordance correlation between the daily purchase value
    # and its seasonal-naive forecast (the value 7 days earlier) —
    # agreement, not just correlation: CCC = 2*Sxy / (Sxx + Syy +
    # m*(xbar - ybar)^2), all from m-cleared exact cents sums.
    oracle=f"""
    WITH {_XY_CTES},
    pr AS (
      SELECT b.y AS act, a.y AS fc
      FROM d a JOIN d b ON b.off = a.off + 7
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(act) AS HUGEINT) AS sa, CAST(SUM(fc) AS HUGEINT) AS sf,
             SUM(CAST(act AS HUGEINT) * act) AS saa,
             SUM(CAST(fc AS HUGEINT) * fc) AS sff,
             SUM(CAST(act AS HUGEINT) * fc) AS saf
      FROM pr
    )
    SELECT m AS n_days,
           round(CAST(m * saf - sa * sf AS DOUBLE)
                 / sqrt(CAST(m * saa - sa * sa AS DOUBLE)
                        * CAST(m * sff - sf * sf AS DOUBLE)), 6) AS pearson_r,
           round(2 * CAST(m * saf - sa * sf AS DOUBLE)
                 / (CAST(m * saa - sa * sa AS DOUBLE)
                    + CAST(m * sff - sf * sf AS DOUBLE)
                    + CAST(sa - sf AS DOUBLE) * CAST(sa - sf AS DOUBLE)), 6)
             AS lin_ccc
    FROM s
    """,
)


def _dccc(spark, sf_dir):
    """Lin CCC actual-vs-seasonal-naive from cleared exact moments."""
    d = _xy_frame(spark, sf_dir)
    a = d.select(F.col("off").alias("o"), F.col("y").alias("fc"))
    b = d.select((F.col("off") - 7).alias("o"), F.col("y").alias("act"))
    pr = a.join(b, "o").select("act", "fc")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    s = pr.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("act").cast("decimal(38,0)").alias("sa"),
        F.sum("fc").cast("decimal(38,0)").alias("sf"),
        F.sum(dec("act") * F.col("act")).alias("saa"),
        F.sum(dec("fc") * F.col("fc")).alias("sff"),
        F.sum(dec("act") * F.col("fc")).alias("saf"),
    )
    m = F.col("m")
    caa = (m * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    cff = (m * F.col("sff") - F.col("sf") * F.col("sf")).cast("double")
    caf = (m * F.col("saf") - F.col("sa") * F.col("sf")).cast("double")
    dmean = (F.col("sa") - F.col("sf")).cast("double")
    return s.select(
        m.alias("n_days"),
        F.round(caf / F.sqrt(caa * cff), 6).alias("pearson_r"),
        F.round(2 * caf / (caa + cff + dmean * dmean), 6).alias("lin_ccc"),
    )


CATALOG["ml_lin_ccc_seasonal_forecast"].fn = _dccc


register(
    "evt_newey_west_variance",
    # Newey-West HAC long-run variance of the daily purchase value
    # (Bartlett kernel, L = 5): sigma^2 = g0 + 2*sum_{l=1..5}
    # (1 - l/6)*g_l with g_l = (1/n) sum (x_t - xbar)(x_{t+l} - xbar).
    # Per-lag autocovariances assemble from exact sums in dollars^2
    # and quantize with the bit-stable floor before the kernel sum;
    # reported next to the iid variance for the inflation ratio.
    oracle=f"""
    WITH {_XY_CTES},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS HUGEINT) AS s
      FROM d
    ),
    lg(l) AS (VALUES (0), (1), (2), (3), (4), (5)),
    lagsum AS (
      SELECT lg.l,
             CAST(SUM(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS al,
             CAST(SUM(a.y + b.y) AS HUGEINT) AS bl,
             CAST(COUNT(*) AS BIGINT) AS ml
      FROM lg, d a JOIN d b ON b.off = a.off + lg.l
      GROUP BY lg.l
    ),
    gam AS (
      SELECT l,
             CAST(floor((CAST(al AS DOUBLE)
               - (CAST(s AS DOUBLE) / n) * CAST(bl AS DOUBLE)
               + ml * ((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
               / n / 10000 * 10000 + 0.5) AS BIGINT) AS g4, n
      FROM lagsum CROSS JOIN tot
    )
    SELECT MAX(n) AS n_days,
           round(MAX(CASE WHEN l = 0 THEN g4 END) / 10000.0, 4) AS gamma0,
           round((MAX(CASE WHEN l = 0 THEN g4 END)
                  + 2 * SUM(CASE WHEN l > 0 THEN
                        CAST(floor((1 - CAST(l AS DOUBLE) / 6) * g4 + 0.5)
                          AS BIGINT) ELSE 0 END)) / 10000.0, 4) AS nw_variance,
           round((MAX(CASE WHEN l = 0 THEN g4 END)
                  + 2 * SUM(CASE WHEN l > 0 THEN
                        CAST(floor((1 - CAST(l AS DOUBLE) / 6) * g4 + 0.5)
                          AS BIGINT) ELSE 0 END))
                 / CAST(MAX(CASE WHEN l = 0 THEN g4 END) AS DOUBLE), 6)
             AS hac_inflation
    FROM gam
    """,
)


def _dnw(spark, sf_dir):
    """NW HAC variance — 6-lag equi-join, quantized autocovariances."""
    d = _xy_frame(spark, sf_dir).localCheckpoint(eager=False)
    spark_ = d.sparkSession
    tot = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("s"),
    )
    lg = spark_.createDataFrame([(l,) for l in range(0, 6)], "l long")
    a = d.select(F.col("off").alias("oa"), F.col("y").alias("ya"))
    b = d.select(F.col("off").alias("ob"), F.col("y").alias("yb"))
    lagsum = (
        a.crossJoin(F.broadcast(lg))
        .join(b, F.col("ob") == F.col("oa") + F.col("l"))
        .groupBy("l")
        .agg(
            F.sum(F.col("ya").cast("decimal(38,0)") * F.col("yb")).alias("al"),
            F.sum(F.col("ya") + F.col("yb")).cast("decimal(38,0)").alias("bl"),
            F.count("*").cast("long").alias("ml"),
        )
    )
    gam = lagsum.crossJoin(F.broadcast(tot)).select(
        "l",
        "n",
        F.floor(
            (
                F.col("al").cast("double")
                - (F.col("s").cast("double") / F.col("n")) * F.col("bl").cast("double")
                + F.col("ml")
                * (
                    (F.col("s").cast("double") / F.col("n"))
                    * (F.col("s").cast("double") / F.col("n"))
                )
            )
            / F.col("n")
            / 10000
            * F.lit(10000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("g4"),
    )
    kern = F.floor(
        (1 - F.col("l").cast("double") / 6) * F.col("g4") + F.lit(0.5)
    ).cast("long")
    g0 = F.max(F.when(F.col("l") == 0, F.col("g4")))
    nwv = g0 + 2 * F.sum(F.when(F.col("l") > 0, kern).otherwise(F.lit(0)))
    return gam.agg(
        F.max("n").alias("n_days"),
        F.round(g0 / F.lit(10000.0), 4).alias("gamma0"),
        F.round(nwv / F.lit(10000.0), 4).alias("nw_variance"),
        F.round(nwv / g0.cast("double"), 6).alias("hac_inflation"),
    )


CATALOG["evt_newey_west_variance"].fn = _dnw
