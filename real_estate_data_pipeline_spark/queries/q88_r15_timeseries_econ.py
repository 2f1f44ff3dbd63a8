"""Round-15 wave 8: time-series econometrics II — PACF via
Durbin-Levinson (lags 1-3) and the Yule-Walker AR(2) fit on daily
event counts, plus three serial-correlation/heteroskedasticity
treatments of the q49 daily-order-count trend regression:
Breusch-Godfrey LM (lag-1 auxiliary), Goldfeld-Quandt (first-third vs
last-third variance ratio, each segment refit with its own exact
integer line), and the one-step Cochrane-Orcutt transform.

Exactness: autocovariance ratios clear to pure integers via
z_t = c_t*n - S (r_k = sum z z_{-k} / sum z^2 — the n^2 factors
cancel); the trend residuals are the q49 micro-quantized exact
integer e6; BG solves the 2-regressor Cramer system on cleared
HUGEINT moments; Cochrane-Orcutt's rho is an exact integer ratio and
the transformed rows micro-quantize BEFORE their moment sums.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# q49's daily-order-count trend machinery (exact micro-integer line
# over the ~2400-row calendar-day aggregate), shared by BG/GQ/CO.
_DAILY_REG_CTES = """d AS MATERIALIZED (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM d
    ),
    beta AS (
      SELECT n, sx, sy,
             CAST(floor(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6
      FROM m
    ),
    b0 AS (
      SELECT n, s6,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000
                         - CAST(s6 AS HUGEINT) * sx)
                        / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS i6
      FROM beta
    ),
    r AS MATERIALIZED (
      SELECT d.x, d.y, d.y * 1000000 - (b.i6 + b.s6 * d.x) AS e6, b.n
      FROM d CROSS JOIN b0 b
    )"""


def _daily_reg_resid(spark, sf_dir):
    """Spark twin of _DAILY_REG_CTES: (x, y, e6, n) residual frame of
    the daily-order-count trend line."""
    o = t(spark, sf_dir, "orders")
    d19 = "decimal(19,0)"
    d = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x")
    ).agg(F.count("*").cast("long").alias("y"))
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    beta = m.select(
        "n",
        "sx",
        "sy",
        F.floor(
            (nn * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19))
            .cast("double")
            / (nn * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19))
            .cast("double")
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s6"),
    )
    b0 = beta.select(
        "n",
        "s6",
        F.floor(
            (
                F.col("sy").cast(d19) * 1000000
                - F.col("s6").cast(d19) * F.col("sx").cast(d19)
            ).cast("double")
            / F.col("n").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("i6"),
    )
    return d.crossJoin(F.broadcast(b0)).select(
        "x",
        "y",
        (F.col("y") * 1000000 - (F.col("i6") + F.col("s6") * F.col("x"))).alias("e6"),
        "n",
    )


register(
    "evt_pacf_durbin_levinson",
    # PACF at lags 1-3 of daily event counts via Durbin-Levinson:
    # r_k = sum z_t z_{t-k} / sum z^2 with z_t = c_t*n - S (pure
    # integers), phi11 = r1, phi22 = (r2-r1^2)/(1-r1^2), phi33 =
    # (r3 - p21 r2 - p22 r1)/(1 - p21 r1 - p22 r2) with p21 =
    # r1(1-r2)/(1-r1^2).
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
            FROM daily),
    z AS (
      SELECT d, c * n - s AS z FROM daily CROSS JOIN mom
    ),
    lz AS (
      SELECT z, LAG(z, 1) OVER (ORDER BY d) AS z1,
                LAG(z, 2) OVER (ORDER BY d) AS z2,
                LAG(z, 3) OVER (ORDER BY d) AS z3
      FROM z
    ),
    s AS (
      SELECT SUM(CAST(z AS HUGEINT) * z) AS c0,
             SUM(CASE WHEN z1 IS NULL THEN 0 ELSE CAST(z AS HUGEINT) * z1 END) AS c1,
             SUM(CASE WHEN z2 IS NULL THEN 0 ELSE CAST(z AS HUGEINT) * z2 END) AS c2,
             SUM(CASE WHEN z3 IS NULL THEN 0 ELSE CAST(z AS HUGEINT) * z3 END) AS c3
      FROM lz
    ),
    rr AS (
      SELECT CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
             CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
             CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3
      FROM s
    )
    SELECT round(r1, 9) AS r1, round(r2, 9) AS r2, round(r3, 9) AS r3,
           round(r1, 9) AS pacf1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 9) AS pacf2,
           round((r3 - (r1 * (1 - r2) / (1 - r1 * r1)) * r2
                     - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1)
                 / (1 - (r1 * (1 - r2) / (1 - r1 * r1)) * r1
                      - ((r2 - r1 * r1) / (1 - r1 * r1)) * r2), 9) AS pacf3
    FROM rr
    """,
)


def _zlag_frame(spark, sf_dir):
    """(z, z1, z2, z3) integer deviation-lag frame of daily counts."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    mom = daily.agg(
        F.count("*").cast("long").alias("n"), F.sum("c").cast("long").alias("s")
    )
    z = daily.crossJoin(F.broadcast(mom)).select(
        "d", (F.col("c") * F.col("n") - F.col("s")).alias("z"), "n"
    )
    w = Window.orderBy("d")
    return z.select(
        "z",
        "n",
        F.lag("z", 1).over(w).alias("z1"),
        F.lag("z", 2).over(w).alias("z2"),
        F.lag("z", 3).over(w).alias("z3"),
    )


def _dpacf(spark, sf_dir):
    """Durbin-Levinson PACF 1-3 off integer z-products."""
    d38 = "decimal(38,0)"
    lz = _zlag_frame(spark, sf_dir)
    zz = lambda c: F.sum(  # noqa: E731
        F.when(F.col(c).isNull(), F.lit(0).cast(d38)).otherwise(
            F.col("z").cast(d38) * F.col(c)
        )
    )
    s = lz.agg(
        F.sum(F.col("z").cast(d38) * F.col("z")).alias("c0"),
        zz("z1").alias("c1"),
        zz("z2").alias("c2"),
        zz("z3").alias("c3"),
    )
    r1 = F.col("c1").cast("double") / F.col("c0").cast("double")
    r2 = F.col("c2").cast("double") / F.col("c0").cast("double")
    r3 = F.col("c3").cast("double") / F.col("c0").cast("double")
    p21 = r1 * (1 - r2) / (1 - r1 * r1)
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    return s.select(
        F.round(r1, 9).alias("r1"),
        F.round(r2, 9).alias("r2"),
        F.round(r3, 9).alias("r3"),
        F.round(r1, 9).alias("pacf1"),
        F.round(p22, 9).alias("pacf2"),
        F.round((r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2), 9).alias(
            "pacf3"
        ),
    )


CATALOG["evt_pacf_durbin_levinson"].fn = _dpacf


register(
    "evt_yule_walker_ar2",
    # Yule-Walker AR(2) fit of daily event counts: phi1 = r1(1-r2)/
    # (1-r1^2), phi2 = (r2-r1^2)/(1-r1^2), innovation variance
    # sigma2 = c0_hat (1 - phi1 r1 - phi2 r2) with c0_hat = sum z^2 /
    # n^3, and the in-sample one-step RMSE (per-day squared residual
    # micro-quantized before the sum).
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
            FROM daily),
    z AS (SELECT d, c * n - s AS z, n FROM daily CROSS JOIN mom),
    lz AS (
      SELECT z, n, LAG(z, 1) OVER (ORDER BY d) AS z1,
                   LAG(z, 2) OVER (ORDER BY d) AS z2
      FROM z
    ),
    s AS (
      SELECT MAX(n) AS n,
             SUM(CAST(z AS HUGEINT) * z) AS c0,
             SUM(CASE WHEN z1 IS NULL THEN 0 ELSE CAST(z AS HUGEINT) * z1 END) AS c1,
             SUM(CASE WHEN z2 IS NULL THEN 0 ELSE CAST(z AS HUGEINT) * z2 END) AS c2
      FROM lz
    ),
    ph AS (
      SELECT n,
             CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
             CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
             CAST(c0 AS DOUBLE) / n / n / n AS c0hat
      FROM s
    ),
    co AS (
      SELECT n, r1, r2, c0hat,
             r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
      FROM ph
    ),
    pe AS (
      SELECT co.n, co.phi1, co.phi2, co.r1, co.r2, co.c0hat,
             CAST(floor(((lz.z - co.phi1 * lz.z1 - co.phi2 * lz.z2) / co.n)
                        * ((lz.z - co.phi1 * lz.z1 - co.phi2 * lz.z2) / co.n)
                        * 1000000 + 0.5) AS HUGEINT) AS q6
      FROM lz CROSS JOIN co WHERE lz.z1 IS NOT NULL AND lz.z2 IS NOT NULL
    )
    SELECT MAX(n) AS n_days,
           round(MAX(phi1), 9) AS phi1, round(MAX(phi2), 9) AS phi2,
           floor(MAX(c0hat * (1 - phi1 * r1 - phi2 * r2)) * 1000 + 0.5) / 1e3
             AS sigma2_innov,
           round(sqrt(CAST(SUM(q6) AS DOUBLE) / 1e6 / COUNT(*)), 6)
             AS rmse_one_step
    FROM pe
    """,
)


def _dyulewalker(spark, sf_dir):
    """YW AR(2) + one-step RMSE off the integer z-lag frame."""
    d38 = "decimal(38,0)"
    lz = _zlag_frame(spark, sf_dir).localCheckpoint(eager=False)
    zz = lambda c: F.sum(  # noqa: E731
        F.when(F.col(c).isNull(), F.lit(0).cast(d38)).otherwise(
            F.col("z").cast(d38) * F.col(c)
        )
    )
    s = lz.agg(
        F.max("n").alias("n"),
        F.sum(F.col("z").cast(d38) * F.col("z")).alias("c0"),
        zz("z1").alias("c1"),
        zz("z2").alias("c2"),
    )
    r1 = F.col("c1").cast("double") / F.col("c0").cast("double")
    r2 = F.col("c2").cast("double") / F.col("c0").cast("double")
    co = s.select(
        "n",
        r1.alias("r1"),
        r2.alias("r2"),
        (F.col("c0").cast("double") / F.col("n") / F.col("n") / F.col("n")).alias(
            "c0hat"
        ),
        (r1 * (1 - r2) / (1 - r1 * r1)).alias("phi1"),
        ((r2 - r1 * r1) / (1 - r1 * r1)).alias("phi2"),
    )
    pred = (F.col("z") - F.col("phi1") * F.col("z1") - F.col("phi2") * F.col("z2")) / F.col(
        "n"
    )
    pe = (
        lz.filter(F.col("z1").isNotNull() & F.col("z2").isNotNull())
        .select("z", "z1", "z2")
        .crossJoin(F.broadcast(co))
        .select(
            F.col("n").alias("nn"),
            "phi1",
            "phi2",
            "r1",
            "r2",
            "c0hat",
            F.floor(pred * pred * F.lit(1000000) + F.lit(0.5)).cast(d38).alias("q6"),
        )
    )
    return pe.agg(
        F.max("nn").alias("n_days"),
        F.round(F.max("phi1"), 9).alias("phi1"),
        F.round(F.max("phi2"), 9).alias("phi2"),
        (
            F.floor(
                F.max(
                    F.col("c0hat")
                    * (1 - F.col("phi1") * F.col("r1") - F.col("phi2") * F.col("r2"))
                )
                * F.lit(1000)
                + F.lit(0.5)
            )
            / F.lit(1e3)
        ).alias("sigma2_innov"),
        F.round(
            F.sqrt(F.sum("q6").cast("double") / F.lit(1e6) / F.count("*")), 6
        ).alias("rmse_one_step"),
    )


CATALOG["evt_yule_walker_ar2"].fn = _dyulewalker


register(
    "ml_breusch_godfrey_lag1",
    # Breusch-Godfrey LM (lag 1) on the daily trend residuals:
    # auxiliary regression e_t ~ (x_t, e_{t-1}) over the n-1 usable
    # rows, LM = (n-1) * R^2 from the 2-regressor Cramer solution on
    # cleared HUGEINT moments (the q79 machinery with v = lagged
    # residual).
    oracle=f"""
    WITH {_DAILY_REG_CTES},
    lr AS (
      SELECT x AS u, e6 AS w, LAG(e6) OVER (ORDER BY x) AS v FROM r
    ),
    aux AS (SELECT u, v, w FROM lr WHERE v IS NOT NULL),
    s2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(u) AS HUGEINT) AS su, CAST(SUM(v) AS HUGEINT) AS sv,
             CAST(SUM(w) AS HUGEINT) AS sw,
             SUM(CAST(u AS HUGEINT) * u) AS suu,
             SUM(CAST(v AS HUGEINT) * v) AS svv,
             SUM(CAST(u AS HUGEINT) * v) AS suv,
             SUM(CAST(u AS HUGEINT) * w) AS suw,
             SUM(CAST(v AS HUGEINT) * w) AS svw,
             SUM(CAST(w AS HUGEINT) * w) AS sww
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
    )
    SELECT m AS n_usable,
           round(((cuw * cvv - cvw * cuv) * cuw
                  + (cvw * cuu - cuw * cuv) * cvw)
                 / (cuu * cvv - cuv * cuv) / cww, 9) AS r2_aux,
           round(m * ((cuw * cvv - cvw * cuv) * cuw
                      + (cvw * cuu - cuw * cuv) * cvw)
                 / (cuu * cvv - cuv * cuv) / cww, 6) AS bg_lm
    FROM c2
    """,
)


def _dbreuschgodfrey(spark, sf_dir):
    """BG LM off the daily residual frame + lag column."""
    d38 = "decimal(38,0)"
    r = _daily_reg_resid(spark, sf_dir)
    w = Window.orderBy("x")
    aux = (
        r.select(
            F.col("x").alias("u"),
            F.col("e6").alias("w"),
            F.lag("e6").over(w).alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    dec = lambda c: F.col(c).cast(d38)  # noqa: E731
    s = aux.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("u").cast(d38).alias("su"),
        F.sum("v").cast(d38).alias("sv"),
        F.sum("w").cast(d38).alias("sw"),
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
    r2 = ((cuw * cvv - cvw * cuv) * cuw + (cvw * cuu - cuw * cuv) * cvw) / (
        cuu * cvv - cuv * cuv
    ) / cww
    return s.select(
        m.alias("n_usable"),
        F.round(r2, 9).alias("r2_aux"),
        F.round(m * r2, 6).alias("bg_lm"),
    )


CATALOG["ml_breusch_godfrey_lag1"].fn = _dbreuschgodfrey


register(
    "ml_goldfeld_quandt_daily",
    # Goldfeld-Quandt heteroskedasticity test on the daily trend: the
    # first and last thirds of the day-ordered frame each get their
    # OWN exact micro-integer line; F = (SSE_late/df2)/(SSE_early/df1)
    # with exact wide-int SSEs.  (Middle third dropped, the classic
    # d = n/3 convention.)
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
    rk AS (
      SELECT x, y, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM d
    ),
    seg AS (
      SELECT CASE WHEN rn <= n // 3 THEN 0
                  WHEN rn > n - n // 3 THEN 1 END AS sg, x, y
      FROM rk CROSS JOIN nn
      WHERE rn <= n // 3 OR rn > n - n // 3
    ),
    m AS (
      SELECT sg, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM seg GROUP BY sg
    ),
    beta AS (
      SELECT sg, k, sx, sy,
             CAST(floor(CAST(k * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        / CAST(k * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS s6
      FROM m
    ),
    b0 AS (
      SELECT sg, k, s6,
             CAST(floor((CAST(sy AS HUGEINT) * 1000000
                         - CAST(s6 AS HUGEINT) * sx)
                        / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS i6
      FROM beta
    ),
    sse AS (
      SELECT seg.sg, MAX(b.k) AS k,
             SUM(CAST(seg.y * 1000000 - (b.i6 + b.s6 * seg.x) AS HUGEINT)
                 * (seg.y * 1000000 - (b.i6 + b.s6 * seg.x))) AS sse12
      FROM seg JOIN b0 b ON b.sg = seg.sg
      GROUP BY seg.sg
    )
    SELECT MAX(CASE WHEN sg = 0 THEN k END) AS n_early,
           MAX(CASE WHEN sg = 1 THEN k END) AS n_late,
           CAST(floor(MAX(CASE WHEN sg = 0 THEN CAST(sse12 AS DOUBLE) END)
                      / 1e12 + 0.5) AS BIGINT) AS sse_early,
           CAST(floor(MAX(CASE WHEN sg = 1 THEN CAST(sse12 AS DOUBLE) END)
                      / 1e12 + 0.5) AS BIGINT) AS sse_late,
           round((MAX(CASE WHEN sg = 1 THEN CAST(sse12 AS DOUBLE) END)
                  / (MAX(CASE WHEN sg = 1 THEN k END) - 2))
                 / (MAX(CASE WHEN sg = 0 THEN CAST(sse12 AS DOUBLE) END)
                    / (MAX(CASE WHEN sg = 0 THEN k END) - 2)), 9) AS gq_f
    FROM sse
    """,
)


def _dgoldfeldquandt(spark, sf_dir):
    """GQ variance-ratio F with per-segment exact integer lines."""
    o = t(spark, sf_dir, "orders")
    d19 = "decimal(19,0)"
    d38 = "decimal(38,0)"
    d = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x")
    ).agg(F.count("*").cast("long").alias("y"))
    nn = d.agg(F.count("*").cast("long").alias("n"))
    rk = d.select("x", "y", F.row_number().over(Window.orderBy("x")).alias("rn"))
    seg = (
        rk.crossJoin(F.broadcast(nn))
        .filter(
            (F.col("rn") <= F.expr("n div 3")) | (F.col("rn") > F.col("n") - F.expr("n div 3"))
        )
        .select(
            F.when(F.col("rn") <= F.expr("n div 3"), 0).otherwise(1).alias("sg"),
            "x",
            "y",
        )
        .localCheckpoint(eager=False)
    )
    m = seg.groupBy("sg").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
    )
    kk = F.col("k").cast(d38)
    beta = m.select(
        "sg",
        "k",
        "sx",
        "sy",
        F.floor(
            (kk * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19))
            .cast("double")
            / (kk * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19))
            .cast("double")
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s6"),
    )
    b0 = beta.select(
        "sg",
        "k",
        "s6",
        F.floor(
            (
                F.col("sy").cast(d19) * 1000000
                - F.col("s6").cast(d19) * F.col("sx").cast(d19)
            ).cast("double")
            / F.col("k").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("i6"),
    )
    e6 = F.col("y") * 1000000 - (F.col("i6") + F.col("s6") * F.col("x"))
    sse = (
        seg.join(F.broadcast(b0), "sg")
        .select("sg", "k", e6.alias("e6"))
        .groupBy("sg")
        .agg(
            F.max("k").alias("k"),
            F.sum(F.col("e6").cast(d38) * F.col("e6")).alias("sse12"),
        )
    )
    pick = lambda sg, c: F.max(F.when(F.col("sg") == sg, F.col(c)))  # noqa: E731
    return sse.agg(
        pick(0, "k").alias("n_early"),
        pick(1, "k").alias("n_late"),
        F.floor(pick(0, "sse12").cast("double") / F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("sse_early"),
        F.floor(pick(1, "sse12").cast("double") / F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("sse_late"),
        F.round(
            (pick(1, "sse12").cast("double") / (pick(1, "k") - 2))
            / (pick(0, "sse12").cast("double") / (pick(0, "k") - 2)),
            9,
        ).alias("gq_f"),
    )


CATALOG["ml_goldfeld_quandt_daily"].fn = _dgoldfeldquandt


register(
    "ml_cochrane_orcutt_onestep",
    # One-step Cochrane-Orcutt: rho = sum e_t e_{t-1} / sum e_{t-1}^2
    # (exact integer ratio off the q49 residuals), then OLS on the
    # rho-differenced rows (y_t - rho y_{t-1} on x_t - rho x_{t-1}),
    # each transformed value micro-quantized BEFORE the cleared moment
    # sums.  Reports rho, the original slope and the transformed slope.
    oracle=f"""
    WITH {_DAILY_REG_CTES},
    le AS (
      SELECT x, y, e6, LAG(e6) OVER (ORDER BY x) AS pe6,
             LAG(y) OVER (ORDER BY x) AS py,
             LAG(x) OVER (ORDER BY x) AS px
      FROM r
    ),
    rho AS (
      SELECT CAST(SUM(CASE WHEN pe6 IS NULL THEN 0
                           ELSE CAST(e6 AS HUGEINT) * pe6 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN pe6 IS NULL THEN 0
                             ELSE CAST(pe6 AS HUGEINT) * pe6 END) AS DOUBLE) AS rho
      FROM le
    ),
    tr AS (
      SELECT CAST(floor((y - rho * py) * 1000000 + 0.5) AS BIGINT) AS ys6,
             CAST(floor((x - rho * px) * 1000000 + 0.5) AS BIGINT) AS xs6
      FROM le CROSS JOIN rho WHERE py IS NOT NULL
    ),
    mm AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(xs6) AS HUGEINT) AS sx, CAST(SUM(ys6) AS HUGEINT) AS sy,
             SUM(CAST(xs6 AS HUGEINT) * xs6) AS sxx,
             SUM(CAST(xs6 AS HUGEINT) * ys6) AS sxy
      FROM tr
    )
    SELECT (SELECT round(rho, 9) FROM rho) AS rho,
           (SELECT round(CAST(s6 AS DOUBLE) / 1e6, 6) FROM beta) AS slope_ols,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS slope_co
    FROM mm
    """,
)


def _dcochraneorcutt(spark, sf_dir):
    """One-step CO transform off the daily residual frame."""
    d38 = "decimal(38,0)"
    r = _daily_reg_resid(spark, sf_dir).localCheckpoint(eager=False)
    w = Window.orderBy("x")
    le = r.select(
        "x",
        "y",
        "e6",
        F.lag("e6").over(w).alias("pe6"),
        F.lag("y").over(w).alias("py"),
        F.lag("x").over(w).alias("px"),
    ).localCheckpoint(eager=False)
    zz = lambda a, b: F.sum(  # noqa: E731
        F.when(F.col(b).isNull(), F.lit(0).cast(d38)).otherwise(
            F.col(a).cast(d38) * F.col(b)
        )
    )
    rho = le.agg(
        (zz("e6", "pe6").cast("double") / zz("pe6", "pe6").cast("double")).alias("rho")
    )
    # original slope from the shared beta recipe (recompute the cleared
    # moment ratio off the base frame — identical to q49's s6/1e6)
    d19 = "decimal(19,0)"
    m = r.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19)).alias("sxx"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19)).alias("sxy"),
    )
    s6 = F.floor(
        (F.col("n").cast(d38) * F.col("sxy") - F.col("sx").cast(d19) * F.col("sy").cast(d19))
        .cast("double")
        / (F.col("n").cast(d38) * F.col("sxx") - F.col("sx").cast(d19) * F.col("sx").cast(d19))
        .cast("double")
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    beta = m.select(s6.alias("s6"))
    tr = (
        le.filter(F.col("py").isNotNull())
        .crossJoin(F.broadcast(rho))
        .select(
            F.floor((F.col("y") - F.col("rho") * F.col("py")) * F.lit(1000000) + F.lit(0.5))
            .cast("long")
            .alias("ys6"),
            F.floor((F.col("x") - F.col("rho") * F.col("px")) * F.lit(1000000) + F.lit(0.5))
            .cast("long")
            .alias("xs6"),
            "rho",
        )
    )
    mm = tr.groupBy("rho").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("xs6").cast(d38).alias("sx2"),
        F.sum("ys6").cast(d38).alias("sy2"),
        F.sum(F.col("xs6").cast(d38) * F.col("xs6")).alias("sxx2"),
        F.sum(F.col("xs6").cast(d38) * F.col("ys6")).alias("sxy2"),
    )
    j = mm.crossJoin(F.broadcast(beta))
    return j.select(
        F.round(F.col("rho"), 9).alias("rho"),
        F.round(F.col("s6").cast("double") / F.lit(1e6), 6).alias("slope_ols"),
        F.round(
            (F.col("k") * F.col("sxy2") - F.col("sx2") * F.col("sy2")).cast("double")
            / (F.col("k") * F.col("sxx2") - F.col("sx2") * F.col("sx2")).cast("double"),
            6,
        ).alias("slope_co"),
    )


CATALOG["ml_cochrane_orcutt_onestep"].fn = _dcochraneorcutt
