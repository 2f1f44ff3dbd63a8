"""Split from queries.py lines 31575-32167 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q29_r9_rank_stats import _MW_U_CTES, _mw_u_agg

# ===========================================================================
# catalog ordering: the driver's evidence window
# ===========================================================================
# The correctness driver samples the FIRST 50 catalog entries each round.
# Rounds 1-4 sampled an identical window, so by round 4 the 100+ queries
# added later — kNN joins, all streaming runs, SCD2/CDF, decontamination,
# the io_* family, the curation tier — had only local parity evidence.
# ===========================================================================
# Round-12 wave 1: classical-test twins from exact histogram moments.
# Every statistic below reduces the fact table to either a tiny value-
# domain histogram (quantity is 1..50) or a single conditional-aggregate
# row of exact integer moments, so the 100 TB cost is one map-side-
# combinable GROUP BY; the closing arithmetic runs on one row.
# ===========================================================================

register(
    "ml_g_test_brand_size",
    # the G-test (likelihood-ratio) twin of the chi-square independence
    # family, on the same brand x size contingency table as
    # part_brand_size_chi2_residuals: G = 2 * sum O*ln(O*N/(nb*nc)).
    # Every marginal is an exact integer, the per-cell log argument is
    # one double ratio of exact ints, ln is rounded to 6 dp, and the
    # cell term is micro-quantized BEFORE the sum so the reduction is
    # an exact integer (order-independent at any parallelism).
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS psize,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rb AS (SELECT brand, CAST(SUM(o) AS BIGINT) AS nb FROM cells GROUP BY 1),
    rc AS (SELECT psize, CAST(SUM(o) AS BIGINT) AS nc FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT CAST(floor(c.o * round(ln(CAST(c.o AS DOUBLE) * nn.n
                                       / (CAST(rb.nb AS DOUBLE) * rc.nc)), 6)
                        * 1000000.0 + 0.5) AS BIGINT) AS t6
      FROM cells c JOIN rb USING (brand) JOIN rc USING (psize) CROSS JOIN nn
    ),
    st AS (SELECT CAST(SUM(t6) AS BIGINT) AS s6 FROM terms),
    dims AS (
      SELECT CAST(COUNT(DISTINCT brand) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT psize) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM cells
    )
    SELECT n_cells, (r - 1) * (c - 1) AS df,
           2.0 * s6 / 1000000 AS g_stat
    FROM dims CROSS JOIN st
    """,
)


def _dgtest(spark, sf_dir):
    """G-test of independence: one contingency pass, marginals from the
    bounded cell frame, per-cell micro-nat terms, one exact integer sum."""
    p = t(spark, sf_dir, "part")
    cells = (
        p.groupBy(
            F.col("p_brand").alias("brand"), F.col("p_size").cast("long").alias("psize")
        )
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    rb = cells.groupBy("brand").agg(F.sum("o").cast("long").alias("nb"))
    rc = cells.groupBy("psize").agg(F.sum("o").cast("long").alias("nc"))
    nn = cells.agg(F.sum("o").cast("long").alias("n"))
    ratio = (
        F.col("o").cast("double") * F.col("n")
        / (F.col("nb").cast("double") * F.col("nc"))
    )
    terms = (
        cells.join(F.broadcast(rb), "brand")
        .join(F.broadcast(rc), "psize")
        .crossJoin(F.broadcast(nn))
        .select(
            F.floor(F.col("o") * F.round(F.log(ratio), 6) * 1000000.0 + 0.5)
            .cast("long")
            .alias("t6")
        )
    )
    st = terms.agg(F.sum("t6").cast("long").alias("s6"))
    dims = cells.agg(
        F.countDistinct("brand").cast("long").alias("r"),
        F.countDistinct("psize").cast("long").alias("c"),
        F.count("*").cast("long").alias("n_cells"),
    )
    return dims.crossJoin(F.broadcast(st)).select(
        "n_cells",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("df"),
        (F.lit(2.0) * F.col("s6") / 1000000).alias("g_stat"),
    )


CATALOG["ml_g_test_brand_size"].fn = _dgtest


register(
    "ml_rank_biserial_quantity",
    # the effect-size panel behind the Mann-Whitney U test, closing
    # over the SAME _MW_U_CTES doubled-U aggregate as the test itself:
    # CLES = U/(n1*n2) (probability a random returned line outranks a
    # random delivered one, ties half-counted), rank-biserial
    # r = 2*CLES - 1, and the z-based effect r = z/sqrt(N). Every
    # numerator/denominator is an exact integer or the exact doubled-U
    # double; divisions and the one sqrt are identical IEEE ops.
    oracle=f"""
    {_MW_U_CTES}
    SELECT nr AS n_r, nn AS n_n,
           u2x / 2.0 AS u_stat,
           round(u2x / 2.0 / (nr * CAST(nn AS DOUBLE)), 6) AS cles,
           round(u2x / (nr * CAST(nn AS DOUBLE)) - 1.0, 6) AS rank_biserial,
           round(((u2x / 2.0 - nr * CAST(nn AS DOUBLE) / 2.0)
                  / sqrt(nr * CAST(nn AS DOUBLE) / 12.0
                         * ((nr + nn + 1)
                            - tsum / ((nr + nn) * (nr + nn - 1.0)))))
                 / sqrt(CAST(nr + nn AS DOUBLE)), 6) AS r_from_z
    FROM agg
    """,
)


def _drankbiserial(spark, sf_dir):
    """Rank-biserial / CLES / r-from-z over the shared _mw_u_agg frame."""
    agg = _mw_u_agg(spark, sf_dir)
    nn_d = F.col("nr") * F.col("nn").cast("double")
    var_u = (
        nn_d / 12.0
        * (
            (F.col("nr") + F.col("nn") + 1)
            - F.col("tsum")
            / ((F.col("nr") + F.col("nn")) * (F.col("nr") + F.col("nn") - 1.0))
        )
    )
    z = (F.col("u2x") / 2.0 - nn_d / 2.0) / F.sqrt(var_u)
    return agg.select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        (F.col("u2x") / 2.0).alias("u_stat"),
        F.round(F.col("u2x") / 2.0 / nn_d, 6).alias("cles"),
        F.round(F.col("u2x") / nn_d - 1.0, 6).alias("rank_biserial"),
        F.round(z / F.sqrt((F.col("nr") + F.col("nn")).cast("double")), 6).alias("r_from_z"),
    )


CATALOG["ml_rank_biserial_quantity"].fn = _drankbiserial


register(
    "ml_welch_t_quantity",
    # Welch's unequal-variance t between returned ('R') and delivered
    # ('N') quantities, with the Welch-Satterthwaite df: one conditional
    # aggregate of exact integer (n, sum, sumsq) per group; means,
    # variances, t and df are fixed single-row expressions (squares via
    # explicit multiplication, one sqrt — both IEEE-identical).
    oracle="""
    WITH mo AS (
      SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_r,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_r,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_n,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_n
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    v AS (
      SELECT n_r, n_n,
             CAST(s_r AS DOUBLE) / n_r AS m_r,
             CAST(s_n AS DOUBLE) / n_n AS m_n,
             (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r) / (n_r - 1) / n_r AS a,
             (CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n) / (n_n - 1) / n_n AS b
      FROM mo
    )
    SELECT n_r, n_n,
           round(m_r, 6) AS mean_r, round(m_n, 6) AS mean_n,
           round((m_r - m_n) / sqrt(a + b), 6) AS t_stat,
           round((a + b) * (a + b)
                 / (a * a / (n_r - 1) + b * b / (n_n - 1)), 6) AS df_welch
    FROM v
    """,
)


def _dwelch(spark, sf_dir):
    """Welch's t from one conditional-aggregate row of exact moments."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    q = F.col("l_quantity").cast("long")
    is_r = F.col("l_returnflag") == "R"
    is_n = F.col("l_returnflag") == "N"
    mo = li.agg(
        F.sum(F.when(is_r, 1).otherwise(0)).cast("long").alias("n_r"),
        F.sum(F.when(is_r, q).otherwise(0)).cast("long").alias("s_r"),
        F.sum(F.when(is_r, q * q).otherwise(0)).cast("long").alias("q_r"),
        F.sum(F.when(is_n, 1).otherwise(0)).cast("long").alias("n_n"),
        F.sum(F.when(is_n, q).otherwise(0)).cast("long").alias("s_n"),
        F.sum(F.when(is_n, q * q).otherwise(0)).cast("long").alias("q_n"),
    )
    m_r = F.col("s_r").cast("double") / F.col("n_r")
    m_n = F.col("s_n").cast("double") / F.col("n_n")
    a = (
        (F.col("q_r").cast("double") - F.col("s_r").cast("double") * F.col("s_r") / F.col("n_r"))
        / (F.col("n_r") - 1) / F.col("n_r")
    )
    b = (
        (F.col("q_n").cast("double") - F.col("s_n").cast("double") * F.col("s_n") / F.col("n_n"))
        / (F.col("n_n") - 1) / F.col("n_n")
    )
    v = mo.select("n_r", "n_n", m_r.alias("m_r"), m_n.alias("m_n"), a.alias("a"), b.alias("b"))
    return v.select(
        "n_r",
        "n_n",
        F.round("m_r", 6).alias("mean_r"),
        F.round("m_n", 6).alias("mean_n"),
        F.round((F.col("m_r") - F.col("m_n")) / F.sqrt(F.col("a") + F.col("b")), 6).alias("t_stat"),
        F.round(
            (F.col("a") + F.col("b")) * (F.col("a") + F.col("b"))
            / (
                F.col("a") * F.col("a") / (F.col("n_r") - 1)
                + F.col("b") * F.col("b") / (F.col("n_n") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


CATALOG["ml_welch_t_quantity"].fn = _dwelch


register(
    "ml_levene_brown_forsythe",
    # the Brown-Forsythe (median-centered Levene) test for equal
    # variances across the three return flags. Group medians come from
    # the 150-row (flag, quantity) histogram as DOUBLED medians (exact
    # integers: value-at-rank floor((n-1)/2) + value-at-rank floor(n/2)),
    # so the absolute deviations 2|x - med| stay integers; the one-way
    # ANOVA F over those deviations is scale-invariant, so the doubling
    # cancels. All moments are exact integer sums pivoted into ONE row
    # (the flag domain is fixed A/N/R), and F is a fixed expression.
    oracle="""
    WITH h AS MATERIALIZED (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R') GROUP BY 1, 2
    ),
    w AS (
      SELECT flag, q, c,
             CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n,
             CAST(SUM(c) OVER (PARTITION BY flag ORDER BY q) AS BIGINT) AS cum
      FROM h
    ),
    med AS (
      SELECT flag,
             MIN(CASE WHEN cum >= CAST(floor((n - 1) / 2.0) AS BIGINT) + 1 THEN q END)
           + MIN(CASE WHEN cum >= CAST(floor(n / 2.0) AS BIGINT) + 1 THEN q END) AS med2
      FROM w GROUP BY flag
    ),
    z AS (
      SELECT h.flag, h.c, m.med2, abs(2 * h.q - m.med2) AS z2
      FROM h JOIN med m ON h.flag = m.flag
    ),
    mo AS (
      SELECT
        CAST(SUM(CASE WHEN flag = 'A' THEN c ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN flag = 'A' THEN c * z2 ELSE 0 END) AS BIGINT) AS s_a,
        CAST(SUM(CASE WHEN flag = 'A' THEN c * z2 * z2 ELSE 0 END) AS BIGINT) AS q_a,
        MAX(CASE WHEN flag = 'A' THEN med2 END) AS med2_a,
        CAST(SUM(CASE WHEN flag = 'N' THEN c ELSE 0 END) AS BIGINT) AS n_n,
        CAST(SUM(CASE WHEN flag = 'N' THEN c * z2 ELSE 0 END) AS BIGINT) AS s_n,
        CAST(SUM(CASE WHEN flag = 'N' THEN c * z2 * z2 ELSE 0 END) AS BIGINT) AS q_n,
        MAX(CASE WHEN flag = 'N' THEN med2 END) AS med2_n,
        CAST(SUM(CASE WHEN flag = 'R' THEN c ELSE 0 END) AS BIGINT) AS n_r,
        CAST(SUM(CASE WHEN flag = 'R' THEN c * z2 ELSE 0 END) AS BIGINT) AS s_r,
        CAST(SUM(CASE WHEN flag = 'R' THEN c * z2 * z2 ELSE 0 END) AS BIGINT) AS q_r,
        MAX(CASE WHEN flag = 'R' THEN med2 END) AS med2_r
      FROM z
    ),
    f AS (
      SELECT n_a, n_n, n_r, med2_a, med2_n, med2_r,
             n_a + n_n + n_r AS nt,
             s_a + s_n + s_r AS st,
             (CAST(s_a AS DOUBLE) * s_a / n_a
              + CAST(s_n AS DOUBLE) * s_n / n_n
              + CAST(s_r AS DOUBLE) * s_r / n_r) AS grp,
             (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
             + (CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n)
             + (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r) AS ssw
      FROM mo
    )
    SELECT n_a, n_n, n_r,
           med2_a / 2.0 AS median_a, med2_n / 2.0 AS median_n,
           med2_r / 2.0 AS median_r,
           CAST(2 AS BIGINT) AS df1, nt - 3 AS df2,
           round(((grp - CAST(st AS DOUBLE) * st / nt) / 2.0)
                 / (ssw / (nt - 3)), 6) AS f_stat
    FROM f
    """,
)


def _dlevene(spark, sf_dir):
    """Brown-Forsythe from the (flag, quantity) histogram: doubled
    medians at exact integer ranks, deviations weighted by cell counts,
    moments pivoted into one row, F as a fixed expression."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("A", "N", "R"))
    h = (
        li.groupBy(
            F.col("l_returnflag").alias("flag"), F.col("l_quantity").cast("long").alias("q")
        )
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    wn = Window.partitionBy("flag")
    wc = Window.partitionBy("flag").orderBy("q")
    w = h.select(
        "flag",
        "q",
        "c",
        F.sum("c").over(wn).cast("long").alias("n"),
        F.sum("c").over(wc).cast("long").alias("cum"),
    )
    k1 = F.floor((F.col("n") - 1) / 2.0).cast("long")
    k2 = F.floor(F.col("n") / 2.0).cast("long")
    med = w.groupBy("flag").agg(
        (
            F.min(F.when(F.col("cum") >= k1 + 1, F.col("q")))
            + F.min(F.when(F.col("cum") >= k2 + 1, F.col("q")))
        ).alias("med2")
    )
    z = h.join(F.broadcast(med), "flag").select(
        "flag", "c", "med2", F.abs(2 * F.col("q") - F.col("med2")).alias("z2")
    )

    def _m(flag, expr, alias):
        return F.sum(F.when(F.col("flag") == flag, expr).otherwise(0)).cast("long").alias(alias)

    aggs = []
    for flag in ("a", "n", "r"):
        fl = flag.upper()
        aggs += [
            _m(fl, F.col("c"), f"n_{flag}"),
            _m(fl, F.col("c") * F.col("z2"), f"s_{flag}"),
            _m(fl, F.col("c") * F.col("z2") * F.col("z2"), f"q_{flag}"),
            F.max(F.when(F.col("flag") == fl, F.col("med2"))).alias(f"med2_{flag}"),
        ]
    mo = z.agg(*aggs)

    def _ss(flag):
        # per-group S^2/n, written once so 'grp' and 'ssw' share the text
        return (
            F.col(f"s_{flag}").cast("double") * F.col(f"s_{flag}") / F.col(f"n_{flag}")
        )

    nt = F.col("n_a") + F.col("n_n") + F.col("n_r")
    st = F.col("s_a") + F.col("s_n") + F.col("s_r")
    grp = _ss("a") + _ss("n") + _ss("r")
    ssw = (
        (F.col("q_a").cast("double") - _ss("a"))
        + (F.col("q_n").cast("double") - _ss("n"))
        + (F.col("q_r").cast("double") - _ss("r"))
    )
    f = mo.select(
        "n_a", "n_n", "n_r", "med2_a", "med2_n", "med2_r",
        nt.alias("nt"), st.alias("st"), grp.alias("grp"), ssw.alias("ssw"),
    )
    return f.select(
        "n_a",
        "n_n",
        "n_r",
        (F.col("med2_a") / 2.0).alias("median_a"),
        (F.col("med2_n") / 2.0).alias("median_n"),
        (F.col("med2_r") / 2.0).alias("median_r"),
        F.lit(2).cast("long").alias("df1"),
        (F.col("nt") - 3).alias("df2"),
        F.round(
            ((F.col("grp") - F.col("st").cast("double") * F.col("st") / F.col("nt")) / 2.0)
            / (F.col("ssw") / (F.col("nt") - 3)),
            6,
        ).alias("f_stat"),
    )


CATALOG["ml_levene_brown_forsythe"].fn = _dlevene


register(
    "ml_jarque_bera_quantity",
    # Jarque-Bera normality test on lineitem quantity: the 1st-4th raw
    # moments are exact BIGINT sums (quantity <= 50, so q^4 <= 6.25e6
    # per row — no overflow at any realistic cardinality); skewness,
    # kurtosis and JB are fixed single-row expressions with powers via
    # explicit multiplication (m2^1.5 written as m2*sqrt(m2), never pow).
    oracle="""
    WITH mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM lineitem
    ),
    c AS (
      SELECT n, CAST(s1 AS DOUBLE) / n AS m FROM mo
    ),
    cm AS (
      SELECT mo.n, c.m,
             CAST(mo.s2 AS DOUBLE) / mo.n - c.m * c.m AS m2,
             CAST(mo.s3 AS DOUBLE) / mo.n - 3.0 * c.m * (CAST(mo.s2 AS DOUBLE) / mo.n)
               + 2.0 * c.m * c.m * c.m AS m3,
             CAST(mo.s4 AS DOUBLE) / mo.n - 4.0 * c.m * (CAST(mo.s3 AS DOUBLE) / mo.n)
               + 6.0 * c.m * c.m * (CAST(mo.s2 AS DOUBLE) / mo.n)
               - 3.0 * c.m * c.m * c.m * c.m AS m4
      FROM mo CROSS JOIN c
    ),
    sk AS (
      SELECT n, m, m2,
             m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) AS kurt
      FROM cm
    )
    SELECT n, round(m, 6) AS mean_qty, round(m2, 6) AS var_pop,
           round(skew, 6) AS skewness, round(kurt, 6) AS kurtosis,
           round(n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 6) AS jb_stat
    FROM sk
    """,
)


def _djarquebera(spark, sf_dir):
    """Jarque-Bera from one row of exact raw moments."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    mo = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q * q * q).cast("long").alias("s3"),
        F.sum(q * q * q * q).cast("long").alias("s4"),
    )
    c = mo.withColumn("m", F.col("s1").cast("double") / F.col("n"))
    m = F.col("m")
    cm = c.select(
        "n",
        "m",
        (F.col("s2").cast("double") / F.col("n") - m * m).alias("m2"),
        (
            F.col("s3").cast("double") / F.col("n")
            - 3.0 * m * (F.col("s2").cast("double") / F.col("n"))
            + 2.0 * m * m * m
        ).alias("m3"),
        (
            F.col("s4").cast("double") / F.col("n")
            - 4.0 * m * (F.col("s3").cast("double") / F.col("n"))
            + 6.0 * m * m * (F.col("s2").cast("double") / F.col("n"))
            - 3.0 * m * m * m * m
        ).alias("m4"),
    )
    sk = cm.select(
        "n",
        "m",
        "m2",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2"))).alias("kurt"),
    )
    return sk.select(
        "n",
        F.round("m", 6).alias("mean_qty"),
        F.round("m2", 6).alias("var_pop"),
        F.round("skew", 6).alias("skewness"),
        F.round("kurt", 6).alias("kurtosis"),
        F.round(
            F.col("n") / 6.0
            * (
                F.col("skew") * F.col("skew")
                + (F.col("kurt") - 3.0) * (F.col("kurt") - 3.0) / 4.0
            ),
            6,
        ).alias("jb_stat"),
    )


CATALOG["ml_jarque_bera_quantity"].fn = _djarquebera


register(
    "ml_bartlett_variance_test",
    # Bartlett's test for equal variances across the three return
    # flags (the parametric sibling of Brown-Forsythe above — Bartlett
    # is ln-based and normality-sensitive, BF is robust; shipping both
    # lets a user cross-check). Group moments are one conditional
    # aggregate of exact integers; each ln runs on a deterministic
    # double and is rounded to 9 dp before entering the FIXED 3-term
    # combination (never a row-ordered float sum). 9 dp, not the usual
    # 6: the statistic is a near-cancellation of two ~N-scale log
    # masses, so 6-dp ln rounding injects O(N*5e-7) ~ 0.03 absolute
    # error into a O(0.1) statistic (caught by the independent numpy
    # reference in the round-12 review pass).
    oracle="""
    WITH mo AS (
      SELECT
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_a,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_n,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_n,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS s_r,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q_r
      FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
    ),
    v AS (
      SELECT n_a, n_n, n_r, n_a + n_n + n_r AS nt,
             (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a) / (n_a - 1) AS v_a,
             (CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n) / (n_n - 1) AS v_n,
             (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r) / (n_r - 1) AS v_r,
             ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
              + (CAST(q_n AS DOUBLE) - CAST(s_n AS DOUBLE) * s_n / n_n)
              + (CAST(q_r AS DOUBLE) - CAST(s_r AS DOUBLE) * s_r / n_r))
             / (n_a + n_n + n_r - 3) AS sp2
      FROM mo
    )
    SELECT n_a, n_n, n_r,
           round(v_a, 6) AS var_a, round(v_n, 6) AS var_n, round(v_r, 6) AS var_r,
           round(((nt - 3) * round(ln(sp2), 9)
                  - ((n_a - 1) * round(ln(v_a), 9)
                     + (n_n - 1) * round(ln(v_n), 9)
                     + (n_r - 1) * round(ln(v_r), 9)))
                 / (1.0 + ((1.0 / (n_a - 1) + 1.0 / (n_n - 1) + 1.0 / (n_r - 1))
                           - 1.0 / (nt - 3)) / 6.0), 6) AS bartlett_stat
    FROM v
    """,
)


def _dbartlett(spark, sf_dir):
    """Bartlett's test from one conditional-aggregate row of exact
    moments; ln rounded to 9 dp before the fixed 3-term combination."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("A", "N", "R"))
    q = F.col("l_quantity").cast("long")
    aggs = []
    for flag in ("a", "n", "r"):
        fl = flag.upper()
        cond = F.col("l_returnflag") == fl
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{flag}"),
            F.sum(F.when(cond, q).otherwise(0)).cast("long").alias(f"s_{flag}"),
            F.sum(F.when(cond, q * q).otherwise(0)).cast("long").alias(f"q_{flag}"),
        ]
    mo = li.agg(*aggs)

    def _ssq(flag):
        return (
            F.col(f"q_{flag}").cast("double")
            - F.col(f"s_{flag}").cast("double") * F.col(f"s_{flag}") / F.col(f"n_{flag}")
        )

    nt = F.col("n_a") + F.col("n_n") + F.col("n_r")
    v = mo.select(
        "n_a",
        "n_n",
        "n_r",
        nt.alias("nt"),
        (_ssq("a") / (F.col("n_a") - 1)).alias("v_a"),
        (_ssq("n") / (F.col("n_n") - 1)).alias("v_n"),
        (_ssq("r") / (F.col("n_r") - 1)).alias("v_r"),
        ((_ssq("a") + _ssq("n") + _ssq("r")) / (nt - 3)).alias("sp2"),
    )
    num = (F.col("nt") - 3) * F.round(F.log("sp2"), 9) - (
        (F.col("n_a") - 1) * F.round(F.log("v_a"), 9)
        + (F.col("n_n") - 1) * F.round(F.log("v_n"), 9)
        + (F.col("n_r") - 1) * F.round(F.log("v_r"), 9)
    )
    cc = 1.0 + (
        (1.0 / (F.col("n_a") - 1) + 1.0 / (F.col("n_n") - 1) + 1.0 / (F.col("n_r") - 1))
        - 1.0 / (F.col("nt") - 3)
    ) / 6.0
    return v.select(
        "n_a",
        "n_n",
        "n_r",
        F.round("v_a", 6).alias("var_a"),
        F.round("v_n", 6).alias("var_n"),
        F.round("v_r", 6).alias("var_r"),
        F.round(num / cc, 6).alias("bartlett_stat"),
    )


CATALOG["ml_bartlett_variance_test"].fn = _dbartlett


