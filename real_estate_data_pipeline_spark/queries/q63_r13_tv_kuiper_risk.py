"""Round-13 wave 7: distribution distance / GOF / epidemiology-style
effect sizes — total-variation distance between the R and N quantity
distributions, the Kuiper test (the cyclic-invariant sibling of KS)
against the discrete uniform, the weekday ANOVA eta-squared on daily
event value, the 2x2 relative risk with its log-RR Wald interval, and
Gwet's AC1 chance-corrected agreement beside Cohen's kappa.

Same exactness discipline as the rest of the catalog: histogram-first,
integer cross-multiplication for ECDF gaps, unit-quantized per-group
variance terms before cross-group sums, ln at the 9-decimal convention.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q15_curation_r3 import _NB_CTES
from .q31_r9_wave2_rank_embed import _KAPPA_J_CTES

register(
    "ml_total_variation_flags",
    # Total-variation distance between the returned (R) and delivered
    # (N) l_quantity distributions: TV = (1/2) sum_j |p_j - q_j|,
    # computed exactly as sum_j |cr_j*nN - cn_j*nR| / (2*nR*nN) over
    # the 50-cell histogram — the L1 counterpart of the Hellinger
    # query, sharing its two-class histogram shape.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cn
      FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cn) AS BIGINT) AS nn
            FROM vc),
    agg AS (
      SELECT CAST(SUM(ABS(CAST(vc.cr AS HUGEINT) * tot.nn
                          - CAST(vc.cn AS HUGEINT) * tot.nr)) AS DOUBLE) AS num
      FROM vc CROSS JOIN tot
    )
    SELECT tot.nr AS n_r, tot.nn AS n_n,
           round(agg.num / (2.0 * tot.nr * tot.nn), 6) AS tv_distance
    FROM tot CROSS JOIN agg
    """,
)


def _dtvdist(spark, sf_dir):
    """TV distance: one two-class histogram, one exact integer fold,
    one division."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    vc = (
        li.groupBy(F.col("l_quantity").cast("long").alias("q"))
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("cr"),
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
            .cast("long")
            .alias("cn"),
        )
        .localCheckpoint(eager=False)
    )
    tot = vc.agg(
        F.sum("cr").cast("long").alias("nr"), F.sum("cn").cast("long").alias("nn")
    )
    agg = vc.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.abs(
                F.col("cr").cast("decimal(38,0)") * F.col("nn")
                - F.col("cn").cast("decimal(38,0)") * F.col("nr")
            )
        )
        .cast("double")
        .alias("num")
    )
    return tot.crossJoin(F.broadcast(agg)).select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.round(F.col("num") / (2.0 * F.col("nr") * F.col("nn")), 6).alias(
            "tv_distance"
        ),
    )


CATALOG["ml_total_variation_flags"].fn = _dtvdist


register(
    "ml_kuiper_test_quantity",
    # Kuiper's V against the discrete uniform on {1..50}: V = D+ + D-
    # where D+ = max_j (F_j - j/50) and D- = max_j (j/50 - F_j) — the
    # cyclic-invariant sibling of KS, sensitive in the tails where KS
    # is not.  Both maxima are exact integer decisions on the signed
    # deviations D_j = 50*cum_j - j*n; one closing division.
    oracle="""
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    grid AS (
      SELECT g.j, COALESCE(vc.cnt, 0) AS cnt
      FROM (SELECT unnest(generate_series(1, 50)) AS j) g
      LEFT JOIN vc ON vc.q = g.j
    ),
    cw AS (
      SELECT j, SUM(cnt) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM grid
    ),
    agg AS (
      SELECT MAX(n) AS n,
             MAX(50 * cum - j * n) AS dplus,
             MAX(j * n - 50 * cum) AS dminus
      FROM cw WHERE j <= 49
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(GREATEST(CAST(dplus AS DOUBLE), 0.0) / (50.0 * n), 6) AS d_plus,
           round(GREATEST(CAST(dminus AS DOUBLE), 0.0) / (50.0 * n), 6) AS d_minus,
           round((GREATEST(CAST(dplus AS DOUBLE), 0.0)
                  + GREATEST(CAST(dminus AS DOUBLE), 0.0)) / (50.0 * n), 6)
             AS kuiper_v,
           round((GREATEST(CAST(dplus AS DOUBLE), 0.0)
                  + GREATEST(CAST(dminus AS DOUBLE), 0.0)) / (50.0 * n)
                 * (sqrt(CAST(n AS DOUBLE)) + 0.155 + 0.24 / sqrt(CAST(n AS DOUBLE))),
                 6) AS kuiper_stat
    FROM agg
    """,
)


def _dkuiper(spark, sf_dir):
    """Kuiper V: the same 50-row ECDF frame as AD/Watson; two exact
    integer maxima, Stephens' finite-sample scaling at the close."""
    li = t(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    grid = (
        spark.range(1, 51)
        .select(F.col("id").alias("j"))
        .join(F.broadcast(vc), F.col("q") == F.col("j"), "left")
        .select("j", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cw = grid.select(
        "j", F.sum("cnt").over(wcum).alias("cum"), F.sum("cnt").over(wall).alias("n")
    )
    agg = cw.filter(F.col("j") <= 49).agg(
        F.max("n").alias("n"),
        F.max(50 * F.col("cum") - F.col("j") * F.col("n")).alias("dplus"),
        F.max(F.col("j") * F.col("n") - 50 * F.col("cum")).alias("dminus"),
    )
    nd = F.col("n").cast("double")
    dp = F.greatest(F.col("dplus").cast("double"), F.lit(0.0)) / (50.0 * F.col("n"))
    dm = F.greatest(F.col("dminus").cast("double"), F.lit(0.0)) / (50.0 * F.col("n"))
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(dp, 6).alias("d_plus"),
        F.round(dm, 6).alias("d_minus"),
        F.round(dp + dm, 6).alias("kuiper_v"),
        F.round(
            (dp + dm) * (F.sqrt(nd) + 0.155 + 0.24 / F.sqrt(nd)), 6
        ).alias("kuiper_stat"),
    )


CATALOG["ml_kuiper_test_quantity"].fn = _dkuiper


register(
    "evt_eta_squared_weekday",
    # One-way ANOVA effect size of weekday on daily event value:
    # eta^2 = SS_between / SS_total over the 30 daily cents grouped by
    # weekday position (off % 7).  Per-group terms S_g^2/n_g are
    # quantized at unit (cents^2) granularity before the 7-term sum so
    # both engines add identical integers; all raw sums are exact.
    oracle="""
    WITH dd AS (
      SELECT CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT (dn - MIN(dn) OVER ()) % 7 AS wd, cents FROM dd
    ),
    grp AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(cents) AS BIGINT) AS sg
      FROM d GROUP BY wd
    ),
    tot AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s1,
             CAST(SUM(CAST(FLOOR(CAST(CAST(sg AS HUGEINT) * sg AS DOUBLE) / ng + 0.5)
                           AS BIGINT)) AS BIGINT) AS bsum
      FROM grp
    ),
    sq AS (
      SELECT CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS s2 FROM d
    )
    SELECT tot.n AS n_days,
           round((CAST(tot.bsum AS DOUBLE)
                  - FLOOR(CAST(tot.s1 AS DOUBLE) * tot.s1 / tot.n + 0.5))
                 / (sq.s2 - FLOOR(CAST(tot.s1 AS DOUBLE) * tot.s1 / tot.n + 0.5)),
                 6) AS eta_squared
    FROM tot CROSS JOIN sq
    """,
)


def _detasq(spark, sf_dir):
    """Weekday eta^2: the stream reduces to 30 daily rows, grouped
    into 7 weekday cells; between/total sums of squares assemble from
    exact integer moments with unit-quantized per-group terms."""
    ev = t(spark, sf_dir, "events")
    dd = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).alias("dn")
    ).agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
    wall = Window.orderBy("dn").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = dd.select(
        ((F.col("dn") - F.min("dn").over(wall)) % 7).alias("wd"), "cents"
    ).localCheckpoint(eager=False)
    grp = d.groupBy("wd").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
    )
    tot = grp.agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s1"),
        F.sum(
            F.floor(
                (F.col("sg").cast("decimal(38,0)") * F.col("sg")).cast("double")
                / F.col("ng")
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("bsum"),
    )
    sq = d.agg(
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("double")
        .alias("s2")
    )
    grand = F.floor(F.col("s1").cast("double") * F.col("s1") / F.col("n") + F.lit(0.5))
    return tot.crossJoin(F.broadcast(sq)).select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("bsum").cast("double") - grand) / (F.col("s2") - grand), 6
        ).alias("eta_squared"),
    )


CATALOG["evt_eta_squared_weekday"].fn = _detasq


register(
    "ml_relative_risk_2x2",
    # Relative risk on the same 2x2 as the odds-ratio query (urgent
    # priority vs order value above the global median): RR =
    # (a/(a+b)) / (c/(c+d)), the risk difference, and the Wald 95%
    # interval from SE(ln RR) = sqrt(1/a - 1/(a+b) + 1/c - 1/(c+d)).
    # Cells are exact; ln follows the 9-decimal convention; the CI
    # exponentiates the same rounded quantities in both engines.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    med AS (
      SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM x
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM x CROSS JOIN med
    )
    SELECT a AS n_urgent_high, b AS n_urgent_low,
           c AS n_other_high, d AS n_other_low,
           round(CAST(a AS DOUBLE) * (c + d) / ((CAST(a AS DOUBLE) + b) * c), 6)
             AS relative_risk,
           round(CAST(a AS DOUBLE) / (a + b) - CAST(c AS DOUBLE) / (c + d), 6)
             AS risk_difference,
           round(exp(round(ln(CAST(a AS DOUBLE) * (c + d)
                              / ((CAST(a AS DOUBLE) + b) * c)), 9)
                     - 1.96 * sqrt(1.0 / a - 1.0 / (CAST(a AS DOUBLE) + b)
                                   + 1.0 / c - 1.0 / (CAST(c AS DOUBLE) + d))), 6)
             AS rr_ci_lo,
           round(exp(round(ln(CAST(a AS DOUBLE) * (c + d)
                              / ((CAST(a AS DOUBLE) + b) * c)), 9)
                     + 1.96 * sqrt(1.0 / a - 1.0 / (CAST(a AS DOUBLE) + b)
                                   + 1.0 / c - 1.0 / (CAST(c AS DOUBLE) + d))), 6)
             AS rr_ci_hi
    FROM cells
    """,
)


def _drelrisk(spark, sf_dir):
    """Relative risk: the odds-ratio query's exact 2x2 cells, three
    closing ratio expressions and one Wald interval (ln at 9dp)."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    cells = x.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0)).cast("long").alias("d"),
    )
    a, b, c, d = (F.col(k) for k in "abcd")
    ad, bd, cd_, dd_ = (k.cast("double") for k in (a, b, c, d))
    rr = ad * (c + d) / ((ad + b) * c)
    se = F.sqrt(
        1.0 / a - 1.0 / (ad + b) + 1.0 / c - 1.0 / (cd_ + d)
    )
    lnrr = F.round(F.log(rr), 9)
    return cells.select(
        a.alias("n_urgent_high"),
        b.alias("n_urgent_low"),
        c.alias("n_other_high"),
        d.alias("n_other_low"),
        F.round(rr, 6).alias("relative_risk"),
        F.round(ad / (a + b) - cd_ / (c + d), 6).alias("risk_difference"),
        F.round(F.exp(lnrr - 1.96 * se), 6).alias("rr_ci_lo"),
        F.round(F.exp(lnrr + 1.96 * se), 6).alias("rr_ci_hi"),
    )


CATALOG["ml_relative_risk_2x2"].fn = _drelrisk


register(
    "ml_gwet_ac1_lang",
    # Gwet's AC1 between the NB classifier and the lang-ID heuristic —
    # the chance-corrected agreement whose expected-agreement model
    # (pe = sum_c pi_c(1-pi_c)/(k-1), pi_c the POOLED marginal) stays
    # stable where Cohen's kappa collapses under prevalence skew.
    # Exact: pe's numerator is sum_c m_c(2n - m_c) over 4n^2(k-1) with
    # m_c = ma_c + mb_c, all BIGINTs until two closing divisions.
    oracle=f"""
    WITH {_NB_CTES},
    {_KAPPA_J_CTES},
    nn AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN nb_pred = heur_pred THEN 1 ELSE 0 END) AS BIGINT)
               AS agree
      FROM j
    ),
    ma AS (SELECT nb_pred AS cls, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
    mb AS (SELECT heur_pred AS cls, CAST(COUNT(*) AS BIGINT) AS cnt FROM j GROUP BY 1),
    mm AS (
      SELECT COALESCE(ma.cls, mb.cls) AS cls,
             COALESCE(ma.cnt, 0) + COALESCE(mb.cnt, 0) AS m
      FROM ma FULL OUTER JOIN mb USING (cls)
    ),
    pe AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(m AS HUGEINT) * (2 * nn.n - m)) AS DOUBLE) AS penum,
             MAX(nn.n) AS n, MAX(nn.agree) AS agree
      FROM mm CROSS JOIN nn
    )
    SELECT n AS n_docs, k AS n_classes,
           round(agree / CAST(n AS DOUBLE), 6) AS observed_agreement,
           round(penum / (4.0 * CAST(n AS DOUBLE) * n * (k - 1)), 6)
             AS gwet_pe,
           round((agree / CAST(n AS DOUBLE)
                  - penum / (4.0 * CAST(n AS DOUBLE) * n * (k - 1)))
                 / (1.0 - penum / (4.0 * CAST(n AS DOUBLE) * n * (k - 1))), 6)
             AS gwet_ac1
    FROM pe
    """,
)


def _dgwetac1(spark, sf_dir):
    """Gwet AC1: the shared two-rater verdict frame, pooled marginals
    from one full-outer of two class counts, exact integers until the
    closing divisions."""
    from .q31_r9_wave2_rank_embed import _kappa_j

    j = _kappa_j(spark, sf_dir).localCheckpoint(eager=False)
    nn = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("nb_pred") == F.col("heur_pred"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    ma = j.groupBy(F.col("nb_pred").alias("cls")).agg(
        F.count("*").cast("long").alias("ca")
    )
    mb = j.groupBy(F.col("heur_pred").alias("cls")).agg(
        F.count("*").cast("long").alias("cb")
    )
    mm = ma.join(mb, "cls", "full").select(
        "cls",
        (F.coalesce(F.col("ca"), F.lit(0)) + F.coalesce(F.col("cb"), F.lit(0))).alias(
            "m"
        ),
    )
    pe = mm.crossJoin(F.broadcast(nn)).agg(
        F.count("*").cast("long").alias("k"),
        F.sum(F.col("m").cast("decimal(38,0)") * (2 * F.col("n") - F.col("m")))
        .cast("double")
        .alias("penum"),
        F.max("n").alias("n"),
        F.max("agree").alias("agree"),
    )
    nd = F.col("n").cast("double")
    po = F.col("agree") / nd
    ped = F.col("penum") / (4.0 * nd * F.col("n") * (F.col("k") - 1))
    return pe.select(
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_classes"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(ped, 6).alias("gwet_pe"),
        F.round((po - ped) / (1.0 - ped), 6).alias("gwet_ac1"),
    )


CATALOG["ml_gwet_ac1_lang"].fn = _dgwetac1
