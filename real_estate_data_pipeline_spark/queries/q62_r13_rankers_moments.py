"""Round-13 wave 6: ranker-agreement distances and higher-moment
diagnostics — Spearman's footrule between the BM25 and QL rankings, the
Bartels rank von-Neumann randomness test and the lag-1 Spearman
autocorrelation on the daily series, the Quade weighted-block rank test,
and the D'Agostino skewness z-test from exact power sums.

The footrule rides the shared retrieval scorer chain; the daily-series
tests ride _DAILY_CENTS_CTE / _daily_cents; ranks are exact doubled
midranks throughout; D'Agostino's two ln calls follow the repo's
9-decimal libm rounding convention.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q26_r8_mixed import _BM25_SQL_CHAIN, _QL_SQL_CHAIN, _TOK_SQL_CTES
from .q26_r8_mixed import _bm25_score_frame, _ql_score_frame, _retrieval_wide
from .q27_r9_retrieval import _ranked_top
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents

register(
    "ml_spearman_footrule_rankers",
    # Spearman's footrule — the L1 rank-displacement distance — between
    # the BM25 ordering of its top-20 and the QL re-ranking: F =
    # sum|ra - rb|, its max-displacement companion, the normalized
    # footrule F / (k^2/2), and the Spearman rho from the same tie-free
    # ranks.  Every rank is a row_number over the bounded 20-row frame;
    # everything but the two closing divisions is exact integers.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    {_QL_SQL_CHAIN},
    top AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b6 DESC, doc_id) AS ra
      FROM bscore ORDER BY b6 DESC, doc_id LIMIT 20
    ),
    j AS (
      SELECT top.ra,
             ROW_NUMBER() OVER (ORDER BY q.q6 DESC, top.doc_id) AS rb
      FROM top JOIN qscore q ON q.doc_id = top.doc_id
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ABS(ra - rb)) AS BIGINT) AS fr,
             CAST(MAX(ABS(ra - rb)) AS BIGINT) AS maxd,
             CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS d2
      FROM j
    )
    SELECT k AS n_docs, fr AS footrule, maxd AS max_displacement,
           round(CAST(fr AS DOUBLE) / (CAST(k AS DOUBLE) * k / 2.0), 6)
             AS footrule_normalized,
           round(1.0 - 6.0 * d2 / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) * k - 1)),
                 6) AS spearman_rho
    FROM agg
    """,
)


def _dfootrule(spark, sf_dir):
    """Footrule A/B distance: the shared scorer chain is the only
    corpus-scale work; the displacement fold runs on the 20-row joined
    frame."""
    wide = _retrieval_wide(spark, sf_dir)
    top = _ranked_top(_bm25_score_frame(wide), "b6", 20).select(
        "doc_id", F.col("r").alias("ra")
    )
    q = _ql_score_frame(wide)
    wb = Window.orderBy(F.desc("q6"), "doc_id")
    j = (
        top.join(q, "doc_id")
        .withColumn("rb", F.row_number().over(wb).cast("long"))
        .select("ra", "rb")
    )
    disp = F.abs(F.col("ra") - F.col("rb"))
    agg = j.agg(
        F.count("*").cast("long").alias("k"),
        F.sum(disp).cast("long").alias("fr"),
        F.max(disp).cast("long").alias("maxd"),
        F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
        .cast("long")
        .alias("d2"),
    )
    kd = F.col("k").cast("double")
    return agg.select(
        F.col("k").alias("n_docs"),
        F.col("fr").alias("footrule"),
        F.col("maxd").alias("max_displacement"),
        F.round(F.col("fr").cast("double") / (kd * F.col("k") / 2.0), 6).alias(
            "footrule_normalized"
        ),
        F.round(
            F.lit(1.0) - 6.0 * F.col("d2") / (kd * (kd * F.col("k") - 1)), 6
        ).alias("spearman_rho"),
    )


CATALOG["ml_spearman_footrule_rankers"].fn = _dfootrule


register(
    "evt_bartels_rank_test",
    # Bartels' rank von Neumann ratio — the rank-based randomness test
    # — on the daily value series: RVN = sum (R_i - R_{i+1})^2 /
    # sum (R_i - Rbar)^2 with tie midranks.  Doubled midranks keep both
    # sums exact (the 4x factors cancel); the centered denominator
    # clears its mean by cross-multiplication (n*S2 - S1^2).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    rk AS (
      SELECT k, n,
             2 * RANK() OVER (ORDER BY cents) + COUNT(*) OVER (PARTITION BY cents)
               - 1 AS r2
      FROM d
    ),
    df AS (
      SELECT n, r2, r2 - LEAD(r2) OVER (ORDER BY k) AS stepd
      FROM rk
    ),
    agg AS (
      SELECT MAX(n) AS n,
             CAST(SUM(CAST(stepd AS HUGEINT) * stepd) AS BIGINT) AS num4,
             CAST(SUM(CAST(r2 AS HUGEINT) * r2) AS BIGINT) AS s2,
             CAST(SUM(r2) AS BIGINT) AS s1
      FROM df
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(CAST(num4 AS DOUBLE) * n
                 / (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1), 6)
             AS rvn_ratio,
           round(CAST(num4 AS DOUBLE) * n
                 / (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) - 2.0, 6)
             AS rvn_centered
    FROM agg
    """,
)


def _dbartels(spark, sf_dir):
    """Bartels RVN: midranks from one bounded window over the 30-row
    day frame, one lead difference, exact integer sums, one closing
    division."""
    d = _daily_cents(spark, sf_dir)
    rk = d.select(
        "k",
        "n",
        (
            2 * F.rank().over(Window.orderBy("cents"))
            + F.count("*").over(Window.partitionBy("cents"))
            - 1
        ).alias("r2"),
    )
    df = rk.select(
        "n", "r2", (F.col("r2") - F.lead("r2").over(Window.orderBy("k"))).alias("stepd")
    )
    agg = df.agg(
        F.max("n").alias("n"),
        F.sum(F.col("stepd").cast("decimal(38,0)") * F.col("stepd"))
        .cast("long")
        .alias("num4"),
        F.sum(F.col("r2").cast("decimal(38,0)") * F.col("r2")).cast("long").alias("s2"),
        F.sum("r2").cast("long").alias("s1"),
    )
    rvn = (
        F.col("num4").cast("double")
        * F.col("n")
        / (
            F.col("n").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(rvn, 6).alias("rvn_ratio"),
        F.round(rvn - 2.0, 6).alias("rvn_centered"),
    )


CATALOG["evt_bartels_rank_test"].fn = _dbartels


register(
    "ml_quade_test",
    # Quade's weighted-block rank test over 4 complete weeks x 7
    # weekday positions (the range-weighted refinement of Friedman):
    # within-block midranks R, block weights Q = ranks of block ranges,
    # S_ij = Q_i(R_ij - (k+1)/2); F = (b-1) * sum_j Sj^2
    # / (b * sum S^2 - sum_j Sj^2).  Doubled midranks make S2 = Q2 *
    # (R2 - 8) a 4x-exact integer; the 16x factors cancel in F, so the
    # statistic is a ratio of exact integer sums.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    wd AS (
      SELECT CAST(FLOOR(off / 7.0) AS BIGINT) AS blk,
             (off % 7) + 1 AS trt, cents
      FROM d WHERE off <= 27
    ),
    rk AS (
      SELECT blk, trt,
             2 * RANK() OVER (PARTITION BY blk ORDER BY cents)
               + COUNT(*) OVER (PARTITION BY blk, cents) - 1 AS r2
      FROM wd
    ),
    rng AS (
      SELECT blk, MAX(cents) - MIN(cents) AS rge
      FROM wd GROUP BY blk
    ),
    qw AS (
      SELECT blk,
             2 * RANK() OVER (ORDER BY rge) + COUNT(*) OVER (PARTITION BY rge)
               - 1 AS q2
      FROM rng
    ),
    sij AS (
      SELECT rk.trt, CAST(qw.q2 * (rk.r2 - 8) AS BIGINT) AS s2
      FROM rk JOIN qw ON qw.blk = rk.blk
    ),
    sj AS (
      SELECT trt, CAST(SUM(s2) AS BIGINT) AS sj2,
             CAST(SUM(CAST(s2 AS HUGEINT) * s2) AS BIGINT) AS ss2
      FROM sij GROUP BY trt
    ),
    agg AS (
      SELECT CAST(SUM(CAST(sj2 AS HUGEINT) * sj2) AS BIGINT) AS b_num,
             CAST(SUM(ss2) AS BIGINT) AS a_sum
      FROM sj
    )
    SELECT round((4.0 - 1.0) * b_num
                 / (4.0 * a_sum - CAST(b_num AS DOUBLE)), 6) AS quade_f,
           CAST(b_num AS BIGINT) AS weighted_rank_ss,
           CAST(a_sum AS BIGINT) AS total_ss
    FROM agg
    """,
)


def _dquade(spark, sf_dir):
    """Quade test: the 28-day (block, treatment) frame, two bounded
    midrank windows (within-block and across the 4 block ranges), exact
    integer score sums — the weighted Friedman at GROUP-BY cost."""
    d = _daily_cents(spark, sf_dir)
    wd = d.filter(F.col("off") <= 27).select(
        F.floor(F.col("off") / F.lit(7.0)).alias("blk"),
        (F.col("off") % 7 + 1).alias("trt"),
        "cents",
    ).localCheckpoint(eager=False)  # feeds the rank frame and the range frame
    rk = wd.select(
        "blk",
        "trt",
        (
            2 * F.rank().over(Window.partitionBy("blk").orderBy("cents"))
            + F.count("*").over(Window.partitionBy("blk", "cents"))
            - 1
        ).alias("r2"),
    )
    rng = wd.groupBy("blk").agg((F.max("cents") - F.min("cents")).alias("rge"))
    qw = rng.select(
        F.col("blk").alias("qblk"),
        (
            2 * F.rank().over(Window.orderBy("rge"))
            + F.count("*").over(Window.partitionBy("rge"))
            - 1
        ).alias("q2"),
    )
    sij = rk.join(F.broadcast(qw), F.col("blk") == F.col("qblk")).select(
        "trt", (F.col("q2") * (F.col("r2") - 8)).cast("long").alias("s2")
    )
    sj = sij.groupBy("trt").agg(
        F.sum("s2").cast("long").alias("sj2"),
        F.sum(F.col("s2").cast("decimal(38,0)") * F.col("s2")).cast("long").alias("ss2"),
    )
    agg = sj.agg(
        F.sum(F.col("sj2").cast("decimal(38,0)") * F.col("sj2"))
        .cast("long")
        .alias("b_num"),
        F.sum("ss2").cast("long").alias("a_sum"),
    )
    return agg.select(
        F.round(
            (F.lit(4.0) - 1.0)
            * F.col("b_num")
            / (4.0 * F.col("a_sum") - F.col("b_num").cast("double")),
            6,
        ).alias("quade_f"),
        F.col("b_num").cast("long").alias("weighted_rank_ss"),
        F.col("a_sum").cast("long").alias("total_ss"),
    )


CATALOG["ml_quade_test"].fn = _dquade


register(
    "ml_dagostino_skewness_z",
    # D'Agostino's skewness z-test on l_quantity: sqrt(b1) from exact
    # power sums (n, S1, S2, S3 — the centered moments assemble in one
    # written-order expression), the finite-sample transform Y, the
    # W/delta/alpha chain, and Z = delta * ln(Y/alpha +
    # sqrt((Y/alpha)^2 + 1)).  The two ln calls follow the repo's
    # 9-decimal rounding convention; every sqrt is IEEE-exact.
    oracle="""
    WITH mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS s3
      FROM lineitem
    ),
    cm AS (
      SELECT n,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n AS m2,
             (CAST(s3 AS DOUBLE) - 3.0 * CAST(s1 AS DOUBLE) * s2 / n
              + 2.0 * CAST(s1 AS DOUBLE) * s1 * s1 / (CAST(n AS DOUBLE) * n)) / n
               AS m3
      FROM mom
    ),
    tr AS (
      SELECT n, m3 / (m2 * sqrt(m2)) AS b1s,
             m3 / (m2 * sqrt(m2))
               * sqrt((CAST(n AS DOUBLE) + 1) * (n + 3) / (6.0 * (n - 2))) AS y,
             3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)
               / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)) AS beta2
      FROM cm
    ),
    wd AS (
      SELECT n, b1s, y,
             sqrt(-1.0 + sqrt(2.0 * (beta2 - 1.0))) AS w
      FROM tr
    ),
    da AS (
      SELECT n, b1s, y,
             1.0 / sqrt(round(ln(w), 9)) AS delta,
             sqrt(2.0 / (-2.0 + sqrt(2.0
               * (3.0 * (CAST(n AS DOUBLE) * n + 27 * n - 70) * (n + 1) * (n + 3)
                  / ((CAST(n AS DOUBLE) - 2) * (n + 5) * (n + 7) * (n + 9)) - 1.0))))
               AS alpha
      FROM wd
    )
    SELECT n AS n_rows, round(b1s, 6) AS sqrt_b1,
           round(delta * round(ln(y / alpha
                 + sqrt((y / alpha) * (y / alpha) + 1.0)), 9), 6) AS z_skew
    FROM da
    """,
)


def _ddagostino(spark, sf_dir):
    """D'Agostino skewness z: one exact power-sum aggregate is the only
    fact-sized stage; the transform chain is scalar expressions on a
    single row (ln at the repo's 9-decimal convention)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    mom = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q.cast("decimal(38,0)") * q * q).cast("long").alias("s3"),
    )
    n = F.col("n")
    nd = n.cast("double")
    m2 = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n) / n
    m3 = (
        F.col("s3").cast("double")
        - 3.0 * F.col("s1").cast("double") * F.col("s2") / n
        + 2.0 * F.col("s1").cast("double") * F.col("s1") * F.col("s1") / (nd * n)
    ) / n
    b1s = m3 / (m2 * F.sqrt(m2))
    y = b1s * F.sqrt((nd + 1) * (n + 3) / (6.0 * (n - 2)))
    beta2 = (
        3.0 * (nd * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((nd - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w = F.sqrt(F.lit(-1.0) + F.sqrt(2.0 * (beta2 - 1.0)))
    delta = F.lit(1.0) / F.sqrt(F.round(F.log(w), 9))
    # alpha^2 = 2 / (W^2 - 1), and W^2 = -1 + sqrt(2(beta2-1)), so the
    # denominator is -2 + sqrt(2(beta2-1)) — the wave-6 numpy cross-check
    # caught the -1 transcription slip here before it shipped
    alpha = F.sqrt(2.0 / (F.lit(-2.0) + F.sqrt(2.0 * (beta2 - 1.0))))
    z = delta * F.round(
        F.log(y / alpha + F.sqrt((y / alpha) * (y / alpha) + 1.0)), 9
    )
    return mom.select(
        n.alias("n_rows"),
        F.round(b1s, 6).alias("sqrt_b1"),
        F.round(z, 6).alias("z_skew"),
    )


CATALOG["ml_dagostino_skewness_z"].fn = _ddagostino


register(
    "evt_spearman_lag1_autocorr",
    # Lag-1 Spearman (rank) autocorrelation of the daily value series:
    # the 29 (x_t, x_{t+1}) pairs are ranked per component with tie
    # midranks (doubled, exact), and rho is the Pearson correlation of
    # the two rank columns via exact integer moment sums — the robust
    # companion to the Pearson ACF in the Ljung-Box panel.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    pr AS (
      SELECT cents AS x, LEAD(cents) OVER (ORDER BY k) AS y
      FROM d QUALIFY y IS NOT NULL
    ),
    rk AS (
      SELECT 2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x) - 1 AS rx,
             2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y) - 1 AS ry
      FROM pr
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(CAST(rx AS HUGEINT) * rx) AS BIGINT) AS sxx,
             CAST(SUM(CAST(ry AS HUGEINT) * ry) AS BIGINT) AS syy,
             CAST(SUM(CAST(rx AS HUGEINT) * ry) AS BIGINT) AS sxy
      FROM rk
    )
    SELECT m AS n_pairs,
           round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS spearman_lag1
    FROM agg
    """,
)


def _dspearlag1(spark, sf_dir):
    """Lag-1 rank autocorrelation: one lead window builds the 29 pairs,
    two bounded midrank windows, one exact moment row, one closing
    correlation expression."""
    d = _daily_cents(spark, sf_dir)
    pr = d.select(
        F.col("cents").alias("x"),
        F.lead("cents").over(Window.orderBy("k")).alias("y"),
    ).filter(F.col("y").isNotNull())
    rk = pr.select(
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count("*").over(Window.partitionBy("x"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count("*").over(Window.partitionBy("y"))
            - 1
        ).alias("ry"),
    )
    agg = rk.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry").cast("decimal(38,0)") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx").cast("decimal(38,0)") * F.col("ry")).cast("long").alias("sxy"),
    )
    md = F.col("m").cast("double")
    return agg.select(
        F.col("m").alias("n_pairs"),
        F.round(
            (md * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / F.sqrt(
                (md * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
                * (md * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("spearman_lag1"),
    )


CATALOG["evt_spearman_lag1_autocorr"].fn = _dspearlag1
