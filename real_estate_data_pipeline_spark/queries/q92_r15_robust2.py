"""Round-15 wave 12: robust estimators II on the 50-value quantity
histogram — the Rousseeuw-Croux Sn scale (median of per-point medians
of absolute differences, fully integer via nested doubled medians),
Tukey's biweight midvariance, the trimean + midhinge + IQR bundle,
Gastwirth's location estimator, and the shorth / least-median-of-
squares location (shortest half interval).

Exactness: quantities are integer-valued doubles, so every order
statistic runs on the bounded 50-row histogram with doubled-rank
arithmetic (rank formulas ceil(kn/m) = (kn + m - 1)//m kept in
integers); Sn's inner medians come from per-anchor |v_i - v_j|
difference histograms (50x50 cells); biweight terms quantize per
VALUE (50 cells) before the weighted integer sums; the one
irrational constant (Sn's 1.1926) is a Python literal fed verbatim.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Shared histogram CTE: (q, c) + total n.
_QHIST = """h AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    cum AS (
      SELECT q, c, SUM(c) OVER (ORDER BY q) AS cc FROM h
    )"""


def _qhist(spark, sf_dir):
    """(hist, n, cum) frames of the integer quantity histogram."""
    li = t(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("c")
    ).localCheckpoint(eager=False)
    n = h.agg(F.sum("c").cast("long").alias("n"))
    cum = h.select(
        "q", "c", F.sum("c").over(Window.orderBy("q")).alias("cc")
    )
    return h, n, cum


# Doubled order statistic at rank pair (ceil(kn/m), floor(kn/m)+1):
# v@r = min q with cum >= r; the doubled value is the sum of both.
def _d2_sql(kn_expr: str, m: int) -> tuple[str, str]:
    """(rank_lo, rank_hi) SQL expressions for the doubled k*n/m
    order statistic."""
    return (
        f"(({kn_expr}) + {m - 1}) // {m}",
        f"({kn_expr}) // {m} + 1",
    )


register(
    "ml_sn_scale_quantity",
    # Rousseeuw-Croux Sn: 1.1926 * med_i med_{j!=i} |x_i - x_j|.
    # Inner medians run per anchor value over the 50x50 |v_i - v_j|
    # difference histogram (same-value pairs contribute c_i - 1
    # zeros); the outer median weights each anchor by c_i.  Both
    # levels use doubled-rank integer medians; the constant is the
    # one Python literal.
    oracle=f"""
    WITH {_QHIST},
    dif AS (
      SELECT a.q AS qa, a.c AS ca, ABS(a.q - b.q) AS d,
             CASE WHEN a.q = b.q THEN a.c - 1 ELSE b.c END AS w
      FROM h a JOIN h b ON TRUE
    ),
    dcum AS (
      SELECT qa, ca, d, SUM(w) OVER (PARTITION BY qa ORDER BY d) AS cw,
             MAX(n.n) OVER () - 1 AS m
      FROM dif CROSS JOIN n WHERE w > 0
    ),
    inner_med AS (
      SELECT qa, ca,
             CAST(MIN(CASE WHEN cw >= (m + 1) // 2 THEN d END)
                  + MIN(CASE WHEN cw >= (m + 2) // 2 THEN d END) AS BIGINT)
               AS m2
      FROM dcum GROUP BY qa, ca
    ),
    ocum AS (
      SELECT m2, SUM(ca) OVER (ORDER BY m2, qa) AS cc, qa
      FROM inner_med CROSS JOIN n
    ),
    outer_med AS (
      SELECT CAST(MIN(CASE WHEN 2 * cc >= (SELECT n FROM n) THEN m2 END)
                  + MIN(CASE WHEN 2 * cc >= (SELECT n FROM n) + 2 THEN m2 END)
               AS BIGINT) AS s4
      FROM ocum
    )
    SELECT (SELECT n FROM n) AS n_items,
           round(s4 / 4.0, 6) AS sn_raw,
           round(1.1926 * s4 / 4.0, 6) AS sn_scale
    FROM outer_med
    """,
)


def _dsn(spark, sf_dir):
    """Nested doubled-median Sn off the difference histogram."""
    h, n, cum = _qhist(spark, sf_dir)
    a = h.select(F.col("q").alias("qa"), F.col("c").alias("ca"))
    b = h.select(F.col("q").alias("qb"), F.col("c").alias("cb"))
    dif = (
        a.crossJoin(F.broadcast(b))
        .select(
            "qa",
            "ca",
            F.abs(F.col("qa") - F.col("qb")).alias("d"),
            F.when(F.col("qa") == F.col("qb"), F.col("ca") - 1)
            .otherwise(F.col("cb"))
            .alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    wA = Window.partitionBy("qa").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dcum = dif.crossJoin(F.broadcast(n)).select(
        "qa",
        "ca",
        "d",
        F.sum("w").over(wA).alias("cw"),
        (F.col("n") - 1).alias("m"),
    )
    inner = dcum.groupBy("qa", "ca").agg(
        (
            F.min(F.when(2 * F.col("cw") >= F.col("m") + 1, F.col("d")))
            + F.min(F.when(2 * F.col("cw") >= F.col("m") + 2, F.col("d")))
        )
        .cast("long")
        .alias("m2")
    )
    wO = Window.orderBy("m2", "qa").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ocum = inner.crossJoin(F.broadcast(n)).select(
        "m2", "qa", "n", F.sum("ca").over(wO).alias("cc")
    )
    outer = ocum.agg(
        (
            F.min(F.when(2 * F.col("cc") >= F.col("n"), F.col("m2")))
            + F.min(F.when(2 * F.col("cc") >= F.col("n") + 2, F.col("m2")))
        )
        .cast("long")
        .alias("s4"),
        F.max("n").alias("nn"),
    )
    return outer.select(
        F.col("nn").alias("n_items"),
        F.round(F.col("s4") / F.lit(4.0), 6).alias("sn_raw"),
        F.round(F.lit(1.1926) * F.col("s4") / F.lit(4.0), 6).alias("sn_scale"),
    )


CATALOG["ml_sn_scale_quantity"].fn = _dsn


register(
    "ml_biweight_midvariance_quantity",
    # Tukey biweight midvariance: u = (x - med)/(9 MAD), BWMV =
    # n * sum c (x-med)^2 (1-u^2)^4 / (sum c (1-u^2)(1-5u^2))^2 over
    # |u| < 1.  med and MAD are doubled-rank integers; per-VALUE
    # terms quantize (pico for the numerator, micro for the
    # denominator) before the 50-cell weighted sums.
    oracle=f"""
    WITH {_QHIST},
    med AS (
      SELECT CAST(MIN(CASE WHEN 2 * cc >= n.n THEN q END)
                  + MIN(CASE WHEN 2 * cc >= n.n + 2 THEN q END) AS BIGINT) AS m2
      FROM cum CROSS JOIN n
    ),
    ad AS (
      SELECT ABS(2 * h.q - med.m2) AS dd, h.c
      FROM h CROSS JOIN med
    ),
    adcum AS (
      SELECT dd, SUM(c) OVER (ORDER BY dd) AS cc FROM (
        SELECT dd, CAST(SUM(c) AS BIGINT) AS c FROM ad GROUP BY dd
      )
    ),
    mad AS (
      SELECT CAST(MIN(CASE WHEN 2 * cc >= n.n THEN dd END)
                  + MIN(CASE WHEN 2 * cc >= n.n + 2 THEN dd END) AS BIGINT) AS md4
      FROM adcum CROSS JOIN n
    ),
    u AS (
      SELECT h.q, h.c,
             (2.0 * h.q - med.m2) / (9.0 * mad.md4 / 2.0) AS uu,
             (2.0 * h.q - med.m2) / 2.0 AS dx
      FROM h CROSS JOIN med CROSS JOIN mad
    ),
    terms AS (
      SELECT c,
             CAST(floor(dx * dx * (1 - uu * uu) * (1 - uu * uu)
                        * (1 - uu * uu) * (1 - uu * uu)
                        * 1000000 + 0.5) AS BIGINT) AS num6,
             CAST(floor((1 - uu * uu) * (1 - 5 * uu * uu) * 1000000 + 0.5)
               AS BIGINT) AS den6
      FROM u WHERE uu * uu < 1
    )
    SELECT (SELECT n FROM n) AS n_items,
           round((SELECT m2 FROM med) / 2.0, 1) AS median_q,
           round((SELECT md4 FROM mad) / 4.0, 2) AS mad_q,
           round((SELECT n FROM n) * (CAST(SUM(c * num6) AS DOUBLE) / 1e6)
                 / ((CAST(SUM(c * den6) AS DOUBLE) / 1e6)
                    * (CAST(SUM(c * den6) AS DOUBLE) / 1e6)), 6)
             AS biweight_midvariance
    FROM terms
    """,
)


def _dbiweight(spark, sf_dir):
    """Biweight midvariance with per-value quantized terms."""
    h, n, cum = _qhist(spark, sf_dir)
    med = cum.crossJoin(F.broadcast(n)).agg(
        (
            F.min(F.when(2 * F.col("cc") >= F.col("n"), F.col("q")))
            + F.min(F.when(2 * F.col("cc") >= F.col("n") + 2, F.col("q")))
        )
        .cast("long")
        .alias("m2")
    )
    ad = (
        h.crossJoin(F.broadcast(med))
        .select(F.abs(2 * F.col("q") - F.col("m2")).alias("dd"), "c")
        .groupBy("dd")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    adcum = ad.select("dd", F.sum("c").over(Window.orderBy("dd")).alias("cc"))
    mad = adcum.crossJoin(F.broadcast(n)).agg(
        (
            F.min(F.when(2 * F.col("cc") >= F.col("n"), F.col("dd")))
            + F.min(F.when(2 * F.col("cc") >= F.col("n") + 2, F.col("dd")))
        )
        .cast("long")
        .alias("md4")
    )
    u = (
        h.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "c",
            "m2",
            "md4",
            ((2.0 * F.col("q") - F.col("m2")) / (9.0 * F.col("md4") / 2.0)).alias(
                "uu"
            ),
            ((2.0 * F.col("q") - F.col("m2")) / 2.0).alias("dx"),
        )
    )
    one_u2 = 1 - F.col("uu") * F.col("uu")
    num6 = F.floor(
        F.col("dx") * F.col("dx")
        * one_u2 * one_u2 * one_u2 * one_u2
        * F.lit(1000000)
        + F.lit(0.5)
    ).cast("long")
    den6 = F.floor(
        one_u2 * (1 - 5 * F.col("uu") * F.col("uu")) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    terms = u.filter(F.col("uu") * F.col("uu") < 1).select(
        "c", "m2", "md4", num6.alias("num6"), den6.alias("den6")
    )
    agg = terms.groupBy("m2", "md4").agg(
        F.sum(F.col("c") * F.col("num6")).alias("sn6"),
        F.sum(F.col("c") * F.col("den6")).alias("sd6"),
    ).crossJoin(F.broadcast(n))
    sd = F.col("sd6").cast("double") / F.lit(1e6)
    return agg.select(
        F.col("n").alias("n_items"),
        F.round(F.col("m2") / 2.0, 1).alias("median_q"),
        F.round(F.col("md4") / 4.0, 2).alias("mad_q"),
        F.round(
            F.col("n") * (F.col("sn6").cast("double") / F.lit(1e6)) / (sd * sd), 6
        ).alias("biweight_midvariance"),
    )


CATALOG["ml_biweight_midvariance_quantity"].fn = _dbiweight


register(
    "ml_trimean_midhinge_quantity",
    # Tukey's trimean (Q1 + 2Q2 + Q3)/4, the midhinge (Q1+Q3)/2 and
    # the IQR from doubled-rank quartiles: Qk doubled = v@ceil(kn/4)
    # + v@(floor(kn/4)+1) — all integers until the final divisions.
    oracle=f"""
    WITH {_QHIST},
    qs AS (
      SELECT
        CAST(MIN(CASE WHEN cc >= (1 * n.n + 3) // 4 THEN q END)
             + MIN(CASE WHEN cc >= (1 * n.n) // 4 + 1 THEN q END) AS BIGINT) AS q1d,
        CAST(MIN(CASE WHEN cc >= (2 * n.n + 3) // 4 THEN q END)
             + MIN(CASE WHEN cc >= (2 * n.n) // 4 + 1 THEN q END) AS BIGINT) AS q2d,
        CAST(MIN(CASE WHEN cc >= (3 * n.n + 3) // 4 THEN q END)
             + MIN(CASE WHEN cc >= (3 * n.n) // 4 + 1 THEN q END) AS BIGINT) AS q3d
      FROM cum CROSS JOIN n
    )
    SELECT (SELECT n FROM n) AS n_items,
           round(q1d / 2.0, 1) AS q1, round(q2d / 2.0, 1) AS q2,
           round(q3d / 2.0, 1) AS q3,
           round((q1d + 2 * q2d + q3d) / 8.0, 6) AS trimean,
           round((q1d + q3d) / 4.0, 6) AS midhinge,
           round((q3d - q1d) / 2.0, 1) AS iqr
    FROM qs
    """,
)


def _dtrimean(spark, sf_dir):
    """Doubled-rank quartile bundle."""
    h, n, cum = _qhist(spark, sf_dir)
    j = cum.crossJoin(F.broadcast(n))
    qd = lambda k: (  # noqa: E731
        F.min(F.when(F.col("cc") >= F.expr(f"({k} * n + 3) div 4"), F.col("q")))
        + F.min(F.when(F.col("cc") >= F.expr(f"({k} * n) div 4 + 1"), F.col("q")))
    ).cast("long")
    qs = j.agg(
        qd(1).alias("q1d"), qd(2).alias("q2d"), qd(3).alias("q3d"),
        F.max("n").alias("nn"),
    )
    return qs.select(
        F.col("nn").alias("n_items"),
        F.round(F.col("q1d") / 2.0, 1).alias("q1"),
        F.round(F.col("q2d") / 2.0, 1).alias("q2"),
        F.round(F.col("q3d") / 2.0, 1).alias("q3"),
        F.round((F.col("q1d") + 2 * F.col("q2d") + F.col("q3d")) / 8.0, 6).alias(
            "trimean"
        ),
        F.round((F.col("q1d") + F.col("q3d")) / 4.0, 6).alias("midhinge"),
        F.round((F.col("q3d") - F.col("q1d")) / 2.0, 1).alias("iqr"),
    )


CATALOG["ml_trimean_midhinge_quantity"].fn = _dtrimean


register(
    "ml_gastwirth_estimator_quantity",
    # Gastwirth's robust location: 0.3*Q(1/3) + 0.4*median +
    # 0.3*Q(2/3), cleared to (3*T1d + 4*Q2d + 3*T2d)/20 over doubled
    # tertile/median order statistics — one exact integer until the
    # final division.
    oracle=f"""
    WITH {_QHIST},
    qs AS (
      SELECT
        CAST(MIN(CASE WHEN cc >= (1 * n.n + 2) // 3 THEN q END)
             + MIN(CASE WHEN cc >= (1 * n.n) // 3 + 1 THEN q END) AS BIGINT) AS t1d,
        CAST(MIN(CASE WHEN 2 * cc >= n.n THEN q END)
             + MIN(CASE WHEN 2 * cc >= n.n + 2 THEN q END) AS BIGINT) AS q2d,
        CAST(MIN(CASE WHEN cc >= (2 * n.n + 2) // 3 THEN q END)
             + MIN(CASE WHEN cc >= (2 * n.n) // 3 + 1 THEN q END) AS BIGINT) AS t2d
      FROM cum CROSS JOIN n
    )
    SELECT (SELECT n FROM n) AS n_items,
           round(t1d / 2.0, 1) AS tertile1, round(q2d / 2.0, 1) AS median_q,
           round(t2d / 2.0, 1) AS tertile2,
           round((3 * t1d + 4 * q2d + 3 * t2d) / 20.0, 6) AS gastwirth
    FROM qs
    """,
)


def _dgastwirth(spark, sf_dir):
    """Gastwirth location off doubled tertiles + median."""
    h, n, cum = _qhist(spark, sf_dir)
    j = cum.crossJoin(F.broadcast(n))
    td = lambda k: (  # noqa: E731
        F.min(F.when(F.col("cc") >= F.expr(f"({k} * n + 2) div 3"), F.col("q")))
        + F.min(F.when(F.col("cc") >= F.expr(f"({k} * n) div 3 + 1"), F.col("q")))
    ).cast("long")
    m2 = (
        F.min(F.when(2 * F.col("cc") >= F.col("n"), F.col("q")))
        + F.min(F.when(2 * F.col("cc") >= F.col("n") + 2, F.col("q")))
    ).cast("long")
    qs = j.agg(
        td(1).alias("t1d"), m2.alias("q2d"), td(2).alias("t2d"),
        F.max("n").alias("nn"),
    )
    return qs.select(
        F.col("nn").alias("n_items"),
        F.round(F.col("t1d") / 2.0, 1).alias("tertile1"),
        F.round(F.col("q2d") / 2.0, 1).alias("median_q"),
        F.round(F.col("t2d") / 2.0, 1).alias("tertile2"),
        F.round(
            (3 * F.col("t1d") + 4 * F.col("q2d") + 3 * F.col("t2d")) / 20.0, 6
        ).alias("gastwirth"),
    )


CATALOG["ml_gastwirth_estimator_quantity"].fn = _dgastwirth


register(
    "ml_shorth_lms_quantity",
    # The shorth: the shortest interval [v_lo, v_hi] containing at
    # least n//2 + 1 items, found over the cumulative histogram
    # (50x50 candidate windows); the least-median-of-squares location
    # is its midpoint.  Tie-break: smallest width, then smallest
    # lower endpoint.  Pure integers.
    oracle=f"""
    WITH {_QHIST},
    lo AS (
      SELECT q AS vlo, cc - c AS below FROM cum
    ),
    win AS (
      SELECT lo.vlo, MIN(cum.q) AS vhi
      FROM lo CROSS JOIN n JOIN cum ON cum.cc - lo.below >= n.n // 2 + 1
      GROUP BY lo.vlo
    ),
    best AS (
      SELECT vlo, vhi, vhi - vlo AS width,
             ROW_NUMBER() OVER (ORDER BY vhi - vlo, vlo) AS rn
      FROM win
    )
    SELECT (SELECT n FROM n) AS n_items,
           (SELECT n.n // 2 + 1 FROM n) AS half_mass,
           vlo AS shorth_lo, vhi AS shorth_hi, width AS shorth_width,
           round((vlo + vhi) / 2.0, 1) AS lms_location
    FROM best WHERE rn = 1
    """,
)


def _dshorth(spark, sf_dir):
    """Shortest-half interval + LMS midpoint off the cum histogram."""
    h, n, cum = _qhist(spark, sf_dir)
    cum = cum.localCheckpoint(eager=False)
    lo = cum.select(F.col("q").alias("vlo"), (F.col("cc") - F.col("c")).alias("below"))
    win = (
        lo.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(cum.select(F.col("q").alias("qh"), F.col("cc").alias("cch"))))
        .filter(F.col("cch") - F.col("below") >= F.expr("n div 2 + 1"))
        .groupBy("vlo")
        .agg(F.min("qh").alias("vhi"))
    )
    best = win.select(
        "vlo",
        "vhi",
        (F.col("vhi") - F.col("vlo")).alias("width"),
        F.row_number()
        .over(Window.orderBy(F.col("vhi") - F.col("vlo"), F.col("vlo")))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.crossJoin(F.broadcast(n)).select(
        F.col("n").alias("n_items"),
        F.expr("n div 2 + 1").alias("half_mass"),
        F.col("vlo").alias("shorth_lo"),
        F.col("vhi").alias("shorth_hi"),
        F.col("width").alias("shorth_width"),
        F.round((F.col("vlo") + F.col("vhi")) / 2.0, 1).alias("lms_location"),
    )


CATALOG["ml_shorth_lms_quantity"].fn = _dshorth
