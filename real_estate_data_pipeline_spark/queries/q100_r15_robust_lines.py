"""Round-15 wave 20 (post-close): robust + quantile regression LINES
on the 30-day daily value-mass series, all by exact combinatorial
candidate enumeration — the L1/quantile/LMS/LTA optima each pass
through (at least) two data points, so the 435 two-point candidate
lines are scanned with EXACT INTEGER losses (residual * dx is the
integer u_k = (y_k - y_i) dx - dy (x_k - x_i)) and the argmin is a
rank over the bounded candidate frame:

- LAD (L1) regression: minimize sum |u_k| / dx,
- quantile regression at tau = 0.75: minimize the check loss
  (4 rho dx = 3 u+ + u-),
- least median of squares: minimize (doubled-median |u_k|)^2 / 4 dx^2
  (squaring is monotone on |u| so the median of squares needs no
  128-bit squares),
- least trimmed absolutes (h = 20 of 30): minimize the sum of the 20
  smallest |u_k| (rank within candidate, |u| with point tie-break),

plus Siegel's repeated-median slope/intercept (median over i of the
median over j of pairwise slopes — the 50%-breakdown estimator that
beats Theil-Sen's 29%), via exact doubled medians at every level.

Exactness: y is exact daily cents (round(value*100)), x the integer
day offset; every candidate loss is an integer (or an integer-valued
double) divided once by dx for the sort key; slopes/intercepts snap at
9/6dp via floor(x+0.5) of deterministic doubles; Siegel's pairwise
slopes are exact-rounded doubles of integer ratios with doubled
medians (both coinciding rank hits counted — the r15 wave-3 lesson).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Daily (x = day offset, y = value-mass cents) + the 435 two-point
# candidate lines + per-(candidate, point) integer scaled residuals.
_LINES_CTE = """d AS (
      SELECT date_trunc('day', ts) AS dy,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(dy) AS d0 FROM d),
    pts AS (
      SELECT CAST(date_diff('day', d0.d0, d.dy) AS BIGINT) AS x, d.y
      FROM d CROSS JOIN d0
    ),
    pairs AS (
      SELECT a.x AS xi, a.y AS yi, b.x AS xj, b.y AS yj,
             b.x - a.x AS dx, b.y - a.y AS dyv
      FROM pts a JOIN pts b ON b.x > a.x
    ),
    terms AS (
      SELECT pairs.xi, pairs.xj, pairs.dx, pairs.dyv, pairs.yi, p.x AS px,
             (p.y - pairs.yi) * pairs.dx - pairs.dyv * (p.x - pairs.xi) AS u
      FROM pairs CROSS JOIN pts p
    )"""


def _line_terms(spark, sf_dir):
    """(candidate line, point) integer scaled-residual frame."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y")
    )
    d0 = d.agg(F.min("dy").alias("d0"))
    pts = d.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dy").cast("date"), F.col("d0").cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    ).localCheckpoint(eager=False)
    b = pts.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = pts.join(F.broadcast(b), F.col("xj") > F.col("x")).select(
        F.col("x").alias("xi"),
        F.col("y").alias("yi"),
        "xj",
        "yj",
        (F.col("xj") - F.col("x")).alias("dx"),
        (F.col("yj") - F.col("y")).alias("dyv"),
    )
    p = pts.select(F.col("x").alias("px"), F.col("y").alias("py"))
    return pairs.crossJoin(F.broadcast(p)).select(
        "xi",
        "xj",
        "dx",
        "dyv",
        "yi",
        "px",
        (
            (F.col("py") - F.col("yi")) * F.col("dx")
            - F.col("dyv") * (F.col("px") - F.col("xi"))
        ).alias("u"),
    )


def _line_out(best):
    """Common output projection: snapped slope/intercept + ids."""
    slope = F.round(
        F.floor(
            F.col("dyv").cast("double") / F.col("dx") * F.lit(1e9) + F.lit(0.5)
        ).cast("long")
        / F.lit(1e9),
        9,
    )
    icept = F.round(
        F.floor(
            (F.col("yi").cast("double") - F.col("dyv").cast("double") / F.col("dx") * F.col("xi"))
            / F.lit(100)
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long")
        / F.lit(1e6),
        6,
    )
    return best, slope, icept


_OUT_SQL = """SELECT xi AS day_i, xj AS day_j,
           round(CAST(floor(CAST(dyv AS DOUBLE) / dx * 1e9 + 0.5) AS BIGINT)
                 / 1e9, 9) AS slope_cents_per_day,
           round(CAST(floor((CAST(yi AS DOUBLE) - CAST(dyv AS DOUBLE) / dx * xi)
                            / 100 * 1e6 + 0.5) AS BIGINT) / 1e6, 6)
             AS intercept_dollars,"""


register(
    "ml_lad_regression_daily",
    # Exact LAD (L1) line: loss = sum |u_k| / dx over the 435
    # candidates, argmin by (loss, xi, xj) rank — the median-like
    # regression that shrugs off the value-mass spikes OLS chases.
    oracle=f"""
    WITH {_LINES_CTE},
    loss AS (
      SELECT xi, xj, dx, dyv, yi,
             CAST(SUM(ABS(u)) AS BIGINT) AS a
      FROM terms GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY CAST(a AS DOUBLE) / dx, xi, xj) AS rn
      FROM loss
    )
    {_OUT_SQL}
           round(CAST(a AS DOUBLE) / dx / 100, 6) AS lad_loss_dollars
    FROM best WHERE rn = 1
    """,
)


def _dlad(spark, sf_dir):
    """Combinatorial exact LAD over the candidate frame."""
    terms = _line_terms(spark, sf_dir)
    loss = terms.groupBy("xi", "xj", "dx", "dyv", "yi").agg(
        F.sum(F.abs("u")).cast("long").alias("a")
    )
    key = F.col("a").cast("double") / F.col("dx")
    best = loss.withColumn(
        "rn", F.row_number().over(Window.orderBy(key, "xi", "xj"))
    ).filter(F.col("rn") == 1)
    _, slope, icept = _line_out(best)
    return best.select(
        F.col("xi").alias("day_i"),
        F.col("xj").alias("day_j"),
        slope.alias("slope_cents_per_day"),
        icept.alias("intercept_dollars"),
        F.round(key / F.lit(100), 6).alias("lad_loss_dollars"),
    )


CATALOG["ml_lad_regression_daily"].fn = _dlad


register(
    "ml_quantile_regression_daily_q75",
    # Exact tau = 0.75 quantile-regression line: the check loss
    # cleared to integers (4 rho dx = 3 u+ + u-), argmin over the
    # same 435 candidates — the daily value-mass level below which
    # three quarters of days fall, as a TREND not a constant.
    oracle=f"""
    WITH {_LINES_CTE},
    loss AS (
      SELECT xi, xj, dx, dyv, yi,
             CAST(SUM(3 * GREATEST(u, 0) + GREATEST(-u, 0)) AS BIGINT) AS a4
      FROM terms GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY CAST(a4 AS DOUBLE) / dx, xi, xj) AS rn
      FROM loss
    )
    {_OUT_SQL}
           round(CAST(a4 AS DOUBLE) / 4 / dx / 100, 6) AS q75_loss_dollars
    FROM best WHERE rn = 1
    """,
)


def _dq75(spark, sf_dir):
    """Exact check-loss quantile regression at tau = 0.75."""
    terms = _line_terms(spark, sf_dir)
    loss = terms.groupBy("xi", "xj", "dx", "dyv", "yi").agg(
        F.sum(
            3 * F.greatest(F.col("u"), F.lit(0))
            + F.greatest(-F.col("u"), F.lit(0))
        )
        .cast("long")
        .alias("a4")
    )
    key = F.col("a4").cast("double") / F.col("dx")
    best = loss.withColumn(
        "rn", F.row_number().over(Window.orderBy(key, "xi", "xj"))
    ).filter(F.col("rn") == 1)
    _, slope, icept = _line_out(best)
    return best.select(
        F.col("xi").alias("day_i"),
        F.col("xj").alias("day_j"),
        slope.alias("slope_cents_per_day"),
        icept.alias("intercept_dollars"),
        F.round(key / F.lit(4) / F.lit(100), 6).alias("q75_loss_dollars"),
    )


CATALOG["ml_quantile_regression_daily_q75"].fn = _dq75


register(
    "ml_lms_regression_daily",
    # Least-median-of-squares line over the two-point candidates (the
    # PROGRESS p-subset scan): minimize med(u^2)/dx^2 = (med|u|)^2 /
    # dx^2 — squaring is monotone on |u|, so the exact doubled median
    # of the INTEGER |u| suffices and no 128-bit squares are needed.
    # Emits the 1.4826-scaled robust sigma of the winning line.
    oracle=f"""
    WITH {_LINES_CTE},
    med AS (
      SELECT xi, xj, dx, dyv, yi,
             CAST(2 * quantile_cont(ABS(u), 0.5) AS BIGINT) AS m2
      FROM terms GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY (CAST(m2 AS DOUBLE) / dx) * (CAST(m2 AS DOUBLE) / dx),
                 xi, xj) AS rn
      FROM med
    )
    {_OUT_SQL}
           round(CAST(m2 AS DOUBLE) / 2 / dx / 100, 6) AS lms_med_abs_dollars,
           round(1.4826 * CAST(m2 AS DOUBLE) / 2 / dx / 100, 6)
             AS lms_sigma_dollars
    FROM best WHERE rn = 1
    """,
)


def _dlms(spark, sf_dir):
    """LMS via grouped exact doubled medians of |u|."""
    terms = _line_terms(spark, sf_dir)
    med = terms.groupBy("xi", "xj", "dx", "dyv", "yi").agg(
        (2 * F.percentile(F.abs("u"), 0.5)).cast("long").alias("m2")
    )
    half = F.col("m2").cast("double") / F.col("dx")
    best = med.withColumn(
        "rn", F.row_number().over(Window.orderBy(half * half, "xi", "xj"))
    ).filter(F.col("rn") == 1)
    _, slope, icept = _line_out(best)
    return best.select(
        F.col("xi").alias("day_i"),
        F.col("xj").alias("day_j"),
        slope.alias("slope_cents_per_day"),
        icept.alias("intercept_dollars"),
        F.round(half / F.lit(2) / F.lit(100), 6).alias("lms_med_abs_dollars"),
        F.round(F.lit(1.4826) * half / F.lit(2) / F.lit(100), 6).alias(
            "lms_sigma_dollars"
        ),
    )


CATALOG["ml_lms_regression_daily"].fn = _dlms


register(
    "ml_lta_regression_daily",
    # Least-trimmed-absolutes line (h = 20 of 30): minimize the sum
    # of the 20 smallest |u_k| per candidate — the LTS-style
    # high-breakdown fit that simply ignores the 10 worst days.
    # Within-candidate rank of |u| with point tie-break, pure integer
    # trimmed sums.
    oracle=f"""
    WITH {_LINES_CTE},
    rk AS (
      SELECT xi, xj, dx, dyv, yi, u,
             ROW_NUMBER() OVER (PARTITION BY xi, xj
                                ORDER BY ABS(u), px) AS r
      FROM terms
    ),
    loss AS (
      SELECT xi, xj, dx, dyv, yi,
             CAST(SUM(ABS(u)) AS BIGINT) AS a20
      FROM rk WHERE r <= 20 GROUP BY 1, 2, 3, 4, 5
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY CAST(a20 AS DOUBLE) / dx, xi, xj) AS rn
      FROM loss
    )
    {_OUT_SQL}
           round(CAST(a20 AS DOUBLE) / dx / 100, 6) AS lta_loss_dollars
    FROM best WHERE rn = 1
    """,
)


def _dlta(spark, sf_dir):
    """Trimmed-absolutes loss over within-candidate |u| ranks."""
    terms = _line_terms(spark, sf_dir)
    wr = Window.partitionBy("xi", "xj").orderBy(F.abs("u"), "px")
    rk = terms.withColumn("r", F.row_number().over(wr)).filter(F.col("r") <= 20)
    loss = rk.groupBy("xi", "xj", "dx", "dyv", "yi").agg(
        F.sum(F.abs("u")).cast("long").alias("a20")
    )
    key = F.col("a20").cast("double") / F.col("dx")
    best = loss.withColumn(
        "rn", F.row_number().over(Window.orderBy(key, "xi", "xj"))
    ).filter(F.col("rn") == 1)
    _, slope, icept = _line_out(best)
    return best.select(
        F.col("xi").alias("day_i"),
        F.col("xj").alias("day_j"),
        slope.alias("slope_cents_per_day"),
        icept.alias("intercept_dollars"),
        F.round(key / F.lit(100), 6).alias("lta_loss_dollars"),
    )


CATALOG["ml_lta_regression_daily"].fn = _dlta


register(
    "ml_siegel_repeated_medians_daily",
    # Siegel's repeated-median line: slope = med_i med_{j!=i}
    # (y_j - y_i)/(x_j - x_i), intercept = med_i (y_i - b x_i) — the
    # 50%-breakdown robust regression (Theil-Sen breaks at 29%).
    # Pairwise slopes are exact-rounded doubles of integer ratios;
    # both median levels use 2*quantile_cont (exact midpoint
    # averages); the final slope/intercept snap at 9/6dp.
    oracle=f"""
    WITH {_LINES_CTE},
    sl AS (
      SELECT a.x AS xi,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
      FROM pts a JOIN pts b ON b.x <> a.x
    ),
    inner_med AS (
      SELECT xi, 2 * quantile_cont(s, 0.5) AS m2 FROM sl GROUP BY xi
    ),
    bslope AS (
      SELECT 2 * quantile_cont(m2, 0.5) AS b4 FROM inner_med
    ),
    icept AS (
      SELECT 2 * quantile_cont(CAST(pts.y AS DOUBLE)
                               - (bslope.b4 / 4) * pts.x, 0.5) AS i2
      FROM pts CROSS JOIN bslope
    )
    SELECT round(CAST(floor(bslope.b4 / 4 * 1e9 + 0.5) AS BIGINT) / 1e9, 9)
             AS siegel_slope_cents_per_day,
           round(CAST(floor(icept.i2 / 2 / 100 * 1e6 + 0.5) AS BIGINT) / 1e6, 6)
             AS siegel_intercept_dollars
    FROM bslope CROSS JOIN icept
    """,
)


def _dsiegel(spark, sf_dir):
    """Repeated medians via exact doubled quantile_cont at each level."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("y")
    )
    d0 = d.agg(F.min("dy").alias("d0"))
    pts = d.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dy").cast("date"), F.col("d0").cast("date"))
        .cast("long")
        .alias("x"),
        "y",
    ).localCheckpoint(eager=False)
    b = pts.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    sl = pts.join(F.broadcast(b), F.col("xb") != F.col("x")).select(
        F.col("x").alias("xi"),
        (
            (F.col("yb") - F.col("y")).cast("double") / (F.col("xb") - F.col("x"))
        ).alias("s"),
    )
    inner = sl.groupBy("xi").agg((2 * F.percentile("s", 0.5)).alias("m2"))
    bslope = inner.agg((2 * F.percentile("m2", 0.5)).alias("b4"))
    icept = (
        pts.crossJoin(F.broadcast(bslope))
        .agg(
            (
                2
                * F.percentile(
                    F.col("y").cast("double") - (F.col("b4") / 4) * F.col("x"), 0.5
                )
            ).alias("i2"),
            F.first("b4").alias("b4o"),
        )
    )
    return icept.select(
        F.round(
            F.floor(F.col("b4o") / 4 * F.lit(1e9) + F.lit(0.5)).cast("long")
            / F.lit(1e9),
            9,
        ).alias("siegel_slope_cents_per_day"),
        F.round(
            F.floor(F.col("i2") / 2 / F.lit(100) * F.lit(1e6) + F.lit(0.5)).cast(
                "long"
            )
            / F.lit(1e6),
            6,
        ).alias("siegel_intercept_dollars"),
    )


CATALOG["ml_siegel_repeated_medians_daily"].fn = _dsiegel
