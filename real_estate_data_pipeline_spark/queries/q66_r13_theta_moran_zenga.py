"""Round-13 wave 10: ordinal-nominal association, spatial-style
autocorrelation, point-inequality and shape diagnostics — Freeman's
theta across the three return flags, Moran's I with lag-1 weights on
the daily series, the Zenga-07 inequality index on customer revenue,
Sarle's bimodality coefficient, and the D'Agostino K² omnibus normality
test (skewness z from the wave-6 chain + the Anscombe-Glynn kurtosis z).

Exactness: per-flag histograms and cumulative counts keep theta's
above/below masses integer; Moran's I clears the mean by Z_i = n*x_i -
S; Zenga's per-rank terms are nano-quantized before the cross-rank sum;
K²'s ln and cbrt calls are rounded at 9 decimals in both engines.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents

register(
    "ml_freeman_theta_flag_quantity",
    # Freeman's theta — the ordinal-by-nominal association — between
    # l_returnflag (3 groups) and l_quantity: theta = sum over group
    # pairs of |above - below| / sum of pair sample-size products,
    # where above/below count quantity-ordered cross-group pairs.
    # Each pair's masses come from one cumulative fold of the two
    # groups' histograms (above_gh = sum_j c_gj * tailcum_hj) — exact
    # HUGEINTs, one closing division.
    oracle="""
    WITH vc AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.g AS g1, b.g AS g2,
             CAST(SUM(CASE WHEN b.q > a.q THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS BIGINT) AS above,
             CAST(SUM(CASE WHEN b.q < a.q THEN CAST(a.c AS HUGEINT) * b.c
                           ELSE 0 END) AS BIGINT) AS below,
             CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS t
      FROM vc a JOIN vc b ON a.g < b.g
      GROUP BY a.g, b.g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_group_pairs,
           CAST(SUM(ABS(above - below)) AS BIGINT) AS delta_sum,
           round(CAST(SUM(ABS(above - below)) AS DOUBLE) / SUM(t), 6)
             AS freeman_theta
    FROM pairs
    """,
)


def _dfreemantheta(spark, sf_dir):
    """Freeman theta: one (flag, value) histogram, a bounded 150-cell
    cross-group grid, exact above/below masses, one division."""
    li = t(spark, sf_dir, "lineitem")
    vc = (
        li.groupBy(
            F.col("l_returnflag").alias("g"), F.col("l_quantity").cast("long").alias("q")
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = vc.select(F.col("g").alias("g1"), F.col("q").alias("aq"), F.col("c").alias("ac"))
    b = vc.select(F.col("g").alias("g2"), F.col("q").alias("bq"), F.col("c").alias("bc"))
    pairs = (
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(
            F.sum(
                F.when(
                    F.col("bq") > F.col("aq"),
                    F.col("ac").cast("decimal(38,0)") * F.col("bc"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("above"),
            F.sum(
                F.when(
                    F.col("bq") < F.col("aq"),
                    F.col("ac").cast("decimal(38,0)") * F.col("bc"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("below"),
            F.sum(F.col("ac").cast("decimal(38,0)") * F.col("bc"))
            .cast("long")
            .alias("t"),
        )
    )
    return pairs.agg(
        F.count("*").cast("long").alias("n_group_pairs"),
        F.sum(F.abs(F.col("above") - F.col("below"))).cast("long").alias("delta_sum"),
        F.round(
            F.sum(F.abs(F.col("above") - F.col("below"))).cast("double")
            / F.sum("t"),
            6,
        ).alias("freeman_theta"),
    )


CATALOG["ml_freeman_theta_flag_quantity"].fn = _dfreemantheta


register(
    "evt_moran_i_lag1",
    # Moran's I with lag-1 adjacency on the daily value series — the
    # spatial-autocorrelation statistic specialized to the time line
    # (W = 2(n-1) symmetric weights): I = n * sum Z_i Z_{i+1}
    # / ((n-1) * sum Z_i^2) with Z_i = n*x_i - S clearing the mean
    # exactly.  Expected value under H0, -1/(n-1), is reported beside
    # it; everything is exact integers until two closing divisions.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    z AS (
      SELECT k, n * cents - SUM(cents) OVER () AS zc, n
      FROM d
    ),
    lagz AS (
      SELECT zc, LEAD(zc) OVER (ORDER BY k) AS znext, n
      FROM z
    ),
    agg AS (
      SELECT MAX(n) AS n,
             CAST(SUM(CAST(zc AS HUGEINT) * znext) AS DOUBLE) AS szz,
             CAST(SUM(CAST(zc AS HUGEINT) * zc) AS DOUBLE) AS sz2
      FROM lagz
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(n AS DOUBLE) * szz / ((n - 1) * sz2), 6) AS moran_i,
           round(-1.0 / (n - 1), 6) AS expected_i
    FROM agg
    """,
)


def _dmorani(spark, sf_dir):
    """Moran's I lag-1: mean cleared by integer cross-multiplication,
    one lead window over the 30-row frame, exact moment sums."""
    d = _daily_cents(spark, sf_dir)
    wall = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    z = d.select(
        "k",
        (F.col("n") * F.col("cents") - F.sum("cents").over(wall)).alias("zc"),
        "n",
    )
    lagz = z.select(
        "zc", F.lead("zc").over(Window.orderBy("k")).alias("znext"), "n"
    )
    agg = lagz.agg(
        F.max("n").alias("n"),
        F.sum(F.col("zc").cast("decimal(38,0)") * F.col("znext"))
        .cast("double")
        .alias("szz"),
        F.sum(F.col("zc").cast("decimal(38,0)") * F.col("zc"))
        .cast("double")
        .alias("sz2"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.col("n").cast("double") * F.col("szz") / ((F.col("n") - 1) * F.col("sz2")),
            6,
        ).alias("moran_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 6).alias("expected_i"),
    )


CATALOG["evt_moran_i_lag1"].fn = _dmorani


register(
    "cust_zenga_index",
    # Zenga-07 inequality index on per-customer order revenue: the mean
    # over ranks i = 1..n-1 of the point index Z(p_i) = 1 -
    # (L_i * (n - i)) / (i * (S - L_i-part)), comparing the mean of the
    # poorest i customers to the mean of the richest n-i.  Each
    # per-rank term is one identical IEEE expression of exact integers,
    # nano-quantized before the cross-rank sum.
    oracle="""
    WITH cr AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
             SUM(cents) OVER (ORDER BY cents, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS l,
             COUNT(*) OVER () AS n, SUM(cents) OVER () AS s
      FROM cr
    ),
    terms AS (
      SELECT n,
             CAST(FLOOR((1.0 - CAST(l AS DOUBLE) * (n - i)
                               / (CAST(i AS DOUBLE) * (s - l)))
                        * 1000000000.0 + 0.5) AS BIGINT) AS z9
      FROM rk WHERE i < n
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           round(CAST(SUM(z9) AS DOUBLE) / (1000000000.0 * (MAX(n) - 1)), 6)
             AS zenga_index
    FROM terms
    """,
)


def _dzenga(spark, sf_dir):
    """Zenga index: the per-customer ranked running sum (the Gini
    window class), one nano-quantized per-rank projection, one exact
    sum — the lower-vs-upper-mean inequality curve collapsed to its
    mean."""
    o = t(spark, sf_dir, "orders")
    cr = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents")
    )
    word = Window.orderBy("cents", "o_custkey")
    wall = word.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rk = cr.select(
        F.row_number().over(word).alias("i"),
        F.sum("cents")
        .over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("l"),
        F.count("*").over(wall).alias("n"),
        F.sum("cents").over(wall).alias("s"),
    )
    terms = rk.filter(F.col("i") < F.col("n")).select(
        "n",
        F.floor(
            (
                F.lit(1.0)
                - F.col("l").cast("double") * (F.col("n") - F.col("i"))
                / (F.col("i").cast("double") * (F.col("s") - F.col("l")))
            )
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("z9"),
    )
    return terms.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(
            F.sum("z9").cast("double") / (F.lit(1000000000.0) * (F.max("n") - 1)), 6
        ).alias("zenga_index"),
    )


CATALOG["cust_zenga_index"].fn = _dzenga


register(
    "ml_sarle_bimodality_quantity",
    # Sarle's bimodality coefficient of l_quantity: b = (g1^2 + 1) /
    # (g2 + 3(n-1)^2 / ((n-2)(n-3))) with sample skewness g1 and excess
    # kurtosis g2 from exact power sums S1..S4 — b > 5/9 flags
    # non-unimodality (the uniform quantity column lands well above).
    oracle="""
    WITH mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s3,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM lineitem
    ),
    cm AS (
      SELECT n,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n AS m2,
             (CAST(s3 AS DOUBLE) - 3.0 * CAST(s1 AS DOUBLE) * s2 / n
              + 2.0 * CAST(s1 AS DOUBLE) * s1 * s1 / (CAST(n AS DOUBLE) * n)) / n
               AS m3,
             (CAST(s4 AS DOUBLE) - 4.0 * CAST(s1 AS DOUBLE) * s3 / n
              + 6.0 * CAST(s1 AS DOUBLE) * s1 * s2 / (CAST(n AS DOUBLE) * n)
              - 3.0 * CAST(s1 AS DOUBLE) * s1 * s1 * s1
                / (CAST(n AS DOUBLE) * n * n)) / n AS m4
      FROM mom
    )
    SELECT n AS n_rows,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness_g1,
           round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis_g2,
           round((m3 / (m2 * sqrt(m2)) * (m3 / (m2 * sqrt(m2))) + 1.0)
                 / (m4 / (m2 * m2) - 3.0
                    + 3.0 * (CAST(n AS DOUBLE) - 1) * (n - 1)
                      / ((CAST(n AS DOUBLE) - 2) * (n - 3))), 6)
             AS bimodality_coef
    FROM cm
    """,
)


def _dsarle(spark, sf_dir):
    """Sarle's b: one exact power-sum aggregate (S1..S4), the central
    moments in one written-order expression, one closing ratio."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    mom = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q.cast("decimal(38,0)") * q * q).cast("long").alias("s3"),
        F.sum(q.cast("decimal(38,0)") * q * q * q).cast("long").alias("s4"),
    )
    n = F.col("n")
    nd = n.cast("double")
    s1, s2, s3, s4 = (F.col(c).cast("double") for c in ("s1", "s2", "s3", "s4"))
    m2 = (s2 - s1 * F.col("s1") / n) / n
    m3 = (s3 - 3.0 * s1 * F.col("s2") / n + 2.0 * s1 * F.col("s1") * F.col("s1") / (nd * n)) / n
    m4 = (
        s4
        - 4.0 * s1 * F.col("s3") / n
        + 6.0 * s1 * F.col("s1") * F.col("s2") / (nd * n)
        - 3.0 * s1 * F.col("s1") * F.col("s1") * F.col("s1") / (nd * n * n)
    ) / n
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    return mom.select(
        n.alias("n_rows"),
        F.round(g1, 6).alias("skewness_g1"),
        F.round(g2, 6).alias("excess_kurtosis_g2"),
        F.round(
            (g1 * g1 + 1.0)
            / (g2 + 3.0 * (nd - 1) * (n - 1) / ((nd - 2) * (n - 3))),
            6,
        ).alias("bimodality_coef"),
    )


CATALOG["ml_sarle_bimodality_quantity"].fn = _dsarle


register(
    "ml_dagostino_k2_omnibus",
    # The D'Agostino-Pearson K² omnibus normality test: the wave-6
    # skewness z and the Anscombe-Glynn kurtosis z combined as K² =
    # z_s² + z_k² (chi-square with 2 df under H0).  Both transform
    # chains run from ONE exact power-sum row; the ln and cbrt calls
    # are rounded at 9 decimals in both engines.
    oracle="""
    WITH mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s3,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM lineitem
    ),
    cm AS (
      SELECT n,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n AS m2,
             (CAST(s3 AS DOUBLE) - 3.0 * CAST(s1 AS DOUBLE) * s2 / n
              + 2.0 * CAST(s1 AS DOUBLE) * s1 * s1 / (CAST(n AS DOUBLE) * n)) / n
               AS m3,
             (CAST(s4 AS DOUBLE) - 4.0 * CAST(s1 AS DOUBLE) * s3 / n
              + 6.0 * CAST(s1 AS DOUBLE) * s1 * s2 / (CAST(n AS DOUBLE) * n)
              - 3.0 * CAST(s1 AS DOUBLE) * s1 * s1 * s1
                / (CAST(n AS DOUBLE) * n * n)) / n AS m4
      FROM mom
    ),
    zs AS (
      SELECT n, m2, m4,
             m3 / (m2 * sqrt(m2))
               * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3) / (6.0 * (n - 2))) AS y,
             3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)
               / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2
      FROM cm
    ),
    zskew AS (
      SELECT n, m2, m4,
             (1.0 / sqrt(round(ln(sqrt(-1.0 + sqrt(2.0 * (beta2 - 1.0)))), 9)))
               * round(ln(y / sqrt(2.0 / (-2.0 + sqrt(2.0 * (beta2 - 1.0))))
                          + sqrt((y / sqrt(2.0 / (-2.0 + sqrt(2.0 * (beta2 - 1.0)))))
                                 * (y / sqrt(2.0 / (-2.0
                                     + sqrt(2.0 * (beta2 - 1.0))))) + 1.0)), 9)
               AS z_s
      FROM zs
    ),
    kurt AS (
      SELECT n, z_s,
             (m4 / (m2 * m2)
              - 3.0 * (CAST(n AS DOUBLE) - 1) / (n + 1))
               / sqrt(24.0 * n * (n - 2) * (n - 3)
                      / ((CAST(n AS DOUBLE) + 1) * (n + 1) * (n + 3) * (n + 5)))
               AS x,
             6.0 * (CAST(n AS DOUBLE) * n - 5 * n + 2) / ((n + 7) * (n + 9))
               * sqrt(6.0 * (n + 3) * (n + 5)
                      / (CAST(n AS DOUBLE) * (n - 2) * (n - 3))) AS sb
      FROM zskew
    ),
    zk AS (
      SELECT n, z_s,
             (
               (1.0 - 2.0 / (9.0 * (6.0 + (8.0 / sb)
                  * (2.0 / sb + sqrt(1.0 + 4.0 / (sb * sb))))))
               - round(cbrt((1.0 - 2.0 / (6.0 + (8.0 / sb)
                    * (2.0 / sb + sqrt(1.0 + 4.0 / (sb * sb)))))
                  / (1.0 + x * sqrt(2.0 / ((6.0 + (8.0 / sb)
                       * (2.0 / sb + sqrt(1.0 + 4.0 / (sb * sb)))) - 4.0)))), 9)
             )
             / sqrt(2.0 / (9.0 * (6.0 + (8.0 / sb)
                  * (2.0 / sb + sqrt(1.0 + 4.0 / (sb * sb)))))) AS z_k
      FROM kurt
    )
    SELECT n AS n_rows, round(z_s, 6) AS z_skew, round(z_k, 6) AS z_kurt,
           round(z_s * z_s + z_k * z_k, 6) AS k2_omnibus
    FROM zk
    """,
)


def _ddagostinok2(spark, sf_dir):
    """K² omnibus: one exact power-sum row feeds both transform chains
    (skewness via the wave-6 asinh chain, kurtosis via Anscombe-Glynn
    with cbrt at the 9-decimal convention); K² is two squares."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    mom = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q.cast("decimal(38,0)") * q * q).cast("long").alias("s3"),
        F.sum(q.cast("decimal(38,0)") * q * q * q).cast("long").alias("s4"),
    )
    n = F.col("n")
    nd = n.cast("double")
    s1, s2, s3, s4 = (F.col(c).cast("double") for c in ("s1", "s2", "s3", "s4"))
    m2 = (s2 - s1 * F.col("s1") / n) / n
    m3 = (s3 - 3.0 * s1 * F.col("s2") / n + 2.0 * s1 * F.col("s1") * F.col("s1") / (nd * n)) / n
    m4 = (
        s4
        - 4.0 * s1 * F.col("s3") / n
        + 6.0 * s1 * F.col("s1") * F.col("s2") / (nd * n)
        - 3.0 * s1 * F.col("s1") * F.col("s1") * F.col("s1") / (nd * n * n)
    ) / n
    y = m3 / (m2 * F.sqrt(m2)) * F.sqrt((nd + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (nd * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((nd - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w = F.sqrt(F.lit(-1.0) + F.sqrt(2.0 * (beta2 - 1.0)))
    alpha = F.sqrt(2.0 / (F.lit(-2.0) + F.sqrt(2.0 * (beta2 - 1.0))))
    z_s = (F.lit(1.0) / F.sqrt(F.round(F.log(w), 9))) * F.round(
        F.log(y / alpha + F.sqrt((y / alpha) * (y / alpha) + 1.0)), 9
    )
    x = (m4 / (m2 * m2) - 3.0 * (nd - 1) / (n + 1)) / F.sqrt(
        24.0 * n * (n - 2) * (n - 3) / ((nd + 1) * (n + 1) * (n + 3) * (n + 5))
    )
    sb = (
        6.0 * (nd * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * F.sqrt(6.0 * (n + 3) * (n + 5) / (nd * (n - 2) * (n - 3)))
    )
    a = 6.0 + (8.0 / sb) * (2.0 / sb + F.sqrt(1.0 + 4.0 / (sb * sb)))
    z_k = (
        (F.lit(1.0) - 2.0 / (9.0 * a))
        - F.round(
            F.cbrt(
                (F.lit(1.0) - 2.0 / a)
                / (F.lit(1.0) + x * F.sqrt(2.0 / (a - 4.0)))
            ),
            9,
        )
    ) / F.sqrt(2.0 / (9.0 * a))
    return mom.select(
        n.alias("n_rows"),
        F.round(z_s, 6).alias("z_skew"),
        F.round(z_k, 6).alias("z_kurt"),
        F.round(z_s * z_s + z_k * z_k, 6).alias("k2_omnibus"),
    )


CATALOG["ml_dagostino_k2_omnibus"].fn = _ddagostinok2
