"""Split from queries.py lines 22338-23190 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t, text
from .q09_llm_dedup_text_sim import _LANG_CASE_SQL
from .q14_tpch_deep import _q2
from .q15_curation_r3 import _NB_CTES, _nb_frames

# ===========================================================================
# round-10 wave 1: effect sizes, ANOVA-on-medians, robust slope — the
# nonparametric-statistics tier extended with the established exactness
# recipes (value-domain histograms, wide-int products, one shared-order
# division at the end).
# ===========================================================================

register(
    "ml_auc_price_urgent",
    # ROC AUC of order value as a score for the urgent-priority class,
    # via the Mann-Whitney identity AUC = (U + ties/2) / (n1*n0). The
    # score is the exact $1000 price band (integer cents div 100000 —
    # a bounded ~500-value domain, so the rank machinery runs on a
    # histogram, never on raw rows), ties get the standard 1/2 credit
    # through the same doubled-U trick the Mann-Whitney query proved,
    # and AUC stays integer until one shared-order division.
    oracle="""
    WITH x AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS band
      FROM orders
    ),
    vc AS (
      SELECT band,
             CAST(SUM(pos) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n0
      FROM x GROUP BY band
    ),
    cw AS (
      SELECT band, n1, n0,
             SUM(n0) OVER (ORDER BY band) - n0 AS cum0_less
      FROM vc
    ),
    agg AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS np, CAST(SUM(n0) AS BIGINT) AS nn,
             CAST(SUM(CAST(n1 AS HUGEINT) * (2 * cum0_less + n0)) AS DOUBLE)
                 AS u2x
      FROM cw
    )
    SELECT np AS n_pos, nn AS n_neg,
           round(u2x / 2.0 / np / nn, 6) AS auc,
           round(u2x / np / nn - 1.0, 6) AS gini_coef
    FROM agg
    """,
)


def _daucprice(spark, sf_dir):
    """AUC via the rank-sum identity over the price-band histogram: one
    grouped count on a bounded integer domain, a running sum over that
    ~500-row frame, one closing aggregate — scoring a binary classifier
    at 100 TB for the cost of a GROUP BY (the ranks never touch raw
    rows)."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("pos"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100000"
        ).alias("band"),
    )
    vc = x.groupBy("band").agg(
        F.sum("pos").cast("long").alias("n1"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n0"),
    )
    w = Window.orderBy("band")
    cw = vc.withColumn("cum0_less", F.sum("n0").over(w) - F.col("n0"))
    agg = cw.agg(
        F.sum("n1").cast("long").alias("np"),
        F.sum("n0").cast("long").alias("nn"),
        F.sum(
            F.col("n1").cast("decimal(18,0)") * (2 * F.col("cum0_less") + F.col("n0"))
        )
        .cast("double")
        .alias("u2x"),
    )
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(F.col("u2x") / 2.0 / F.col("np") / F.col("nn"), 6).alias("auc"),
        F.round(F.col("u2x") / F.col("np") / F.col("nn") - 1.0, 6).alias("gini_coef"),
    )


CATALOG["ml_auc_price_urgent"].fn = _daucprice

register(
    "ml_cliffs_delta_quantity",
    # the nonparametric effect size next to the Mann-Whitney TEST:
    # Cliff's delta between returned and delivered quantities,
    # delta = (#(r>n) - #(r<n)) / (n_r*n_n). Wins and ties come from
    # the 50-value histogram's running sum; losses are derived
    # exactly (total - wins - ties), so every count is one BIGINT and
    # delta is a single division.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    vc AS (
      SELECT q,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM x GROUP BY q
    ),
    cw AS (
      SELECT q, n1, n2, SUM(n2) OVER (ORDER BY q) - n2 AS cum2_less FROM vc
    ),
    agg AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS nr, CAST(SUM(n2) AS BIGINT) AS nn,
             CAST(SUM(CAST(n1 AS HUGEINT) * cum2_less) AS BIGINT) AS wins,
             CAST(SUM(CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ties
      FROM cw
    )
    SELECT nr AS n_r, nn AS n_n, wins AS n_wins,
           nr * nn - wins - ties AS n_losses, ties AS n_ties,
           round(CAST(wins - (nr * nn - wins - ties) AS DOUBLE)
                 / (CAST(nr AS DOUBLE) * nn), 6) AS cliffs_delta
    FROM agg
    """,
)


def _dcliffs(spark, sf_dir):
    """Cliff's delta over the value-domain histogram — the dominance
    effect size without materializing a single pair: wins from the
    running sum, losses by complement, one division."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    vc = x.groupBy("q").agg(
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).cast("long").alias("n2"),
    )
    w = Window.orderBy("q")
    cw = vc.withColumn("cum2_less", F.sum("n2").over(w) - F.col("n2"))
    agg = cw.agg(
        F.sum("n1").cast("long").alias("nr"),
        F.sum("n2").cast("long").alias("nn"),
        F.sum(F.col("n1").cast("decimal(18,0)") * F.col("cum2_less"))
        .cast("long")
        .alias("wins"),
        F.sum(F.col("n1").cast("decimal(18,0)") * F.col("n2"))
        .cast("long")
        .alias("ties"),
    )
    losses = F.col("nr") * F.col("nn") - F.col("wins") - F.col("ties")
    return agg.select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.col("wins").alias("n_wins"),
        losses.alias("n_losses"),
        F.col("ties").alias("n_ties"),
        F.round(
            (F.col("wins") - losses).cast("double")
            / (F.col("nr").cast("double") * F.col("nn")),
            6,
        ).alias("cliffs_delta"),
    )


CATALOG["ml_cliffs_delta_quantity"].fn = _dcliffs

register(
    "ml_cvm_two_sample_quantity",
    # Cramér–von Mises two-sample statistic between returned and
    # delivered quantities: T = (n*m/N^2) * sum over pooled points of
    # (F1 - F2)^2, the integral-distance companion to the KS sup-
    # distance. Per value, F1-F2 = (c1*n2 - c2*n1)/(n1*n2) has an
    # exact wide-int numerator; the square quantizes to picounits
    # (1e12) BEFORE the weighted sum so the 50-term accumulation is
    # order-independent integers in both engines.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    vc AS (
      SELECT q,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM x GROUP BY q
    ),
    tot AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS nr, CAST(SUM(n2) AS BIGINT) AS nn FROM vc
    ),
    cw AS (
      SELECT n1, n2,
             SUM(n1) OVER (ORDER BY q) AS c1,
             SUM(n2) OVER (ORDER BY q) AS c2
      FROM vc
    ),
    terms AS (
      SELECT n1 + n2 AS cnt,
             CAST(floor(round(
               (CAST(CAST(c1 AS HUGEINT) * tot.nn
                     - CAST(c2 AS HUGEINT) * tot.nr AS DOUBLE) / tot.nr / tot.nn)
               * (CAST(CAST(c1 AS HUGEINT) * tot.nn
                       - CAST(c2 AS HUGEINT) * tot.nr AS DOUBLE) / tot.nr / tot.nn),
               12) * 1000000000000 + 0.5) AS BIGINT) AS d12
      FROM cw CROSS JOIN tot
    ),
    s AS (
      SELECT CAST(SUM(CAST(cnt AS HUGEINT) * d12) AS DOUBLE) AS s12 FROM terms
    )
    SELECT tot.nr AS n_r, tot.nn AS n_n,
           round(CAST(tot.nr AS DOUBLE) * tot.nn
                 / (tot.nr + tot.nn) / (tot.nr + tot.nn)
                 * (s12 / 1000000000000.0), 6) AS cvm_t
    FROM s CROSS JOIN tot
    """,
)


def _dcvm(spark, sf_dir):
    """Cramér–von Mises over the same 50-value histogram as KS: two
    running counts, one picounit-quantized squared-gap sum, one
    closing product — the whole-distribution distance at histogram
    cost."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    vc = x.groupBy("q").agg(
        F.sum(F.when(F.col("flag") == "R", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("flag") == "N", 1).otherwise(0)).cast("long").alias("n2"),
    ).localCheckpoint(eager=False)
    tot = vc.agg(
        F.sum("n1").cast("long").alias("nr"), F.sum("n2").cast("long").alias("nn")
    )
    w = Window.orderBy("q")
    cw = vc.select(
        "n1",
        "n2",
        F.sum("n1").over(w).alias("c1"),
        F.sum("n2").over(w).alias("c2"),
    )
    d = (
        (
            F.col("c1").cast("decimal(18,0)") * F.col("nn")
            - F.col("c2").cast("decimal(18,0)") * F.col("nr")
        ).cast("double")
        / F.col("nr")
        / F.col("nn")
    )
    terms = cw.crossJoin(F.broadcast(tot)).select(
        (F.col("n1") + F.col("n2")).alias("cnt"),
        F.floor(F.round(d * d, 12) * 1e12 + 0.5).cast("long").alias("d12"),
    )
    s = terms.agg(
        F.sum(F.col("cnt").cast("decimal(18,0)") * F.col("d12"))
        .cast("double")
        .alias("s12")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("nr").alias("n_r"),
        F.col("nn").alias("n_n"),
        F.round(
            F.col("nr").cast("double")
            * F.col("nn")
            / (F.col("nr") + F.col("nn"))
            / (F.col("nr") + F.col("nn"))
            * (F.col("s12") / 1e12),
            6,
        ).alias("cvm_t"),
    )


CATALOG["ml_cvm_two_sample_quantity"].fn = _dcvm

register(
    "ml_brown_forsythe_quantity",
    # Brown–Forsythe (Levene-with-medians) homogeneity-of-variance test
    # across the three return flags: z = |q - median_g| stays integer
    # by doubling (z2 = |2q - 2*median|, and 2*median of an integer
    # domain is itself an integer), the one-way ANOVA F on z2 needs
    # only per-group sums and sums of squares (wide-int, exact), and
    # the groups pivot into ONE row so the F statistic is a single
    # shared-order expression with no float accumulation anywhere.
    oracle="""
    WITH x AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
    ),
    med AS (
      SELECT flag, CAST(2 * quantile_cont(q, 0.5) AS BIGINT) AS m2
      FROM x GROUP BY flag
    ),
    z AS (
      SELECT x.flag, med.m2, abs(2 * x.q - med.m2) AS z2
      FROM x JOIN med USING (flag)
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN flag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN flag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             CAST(SUM(CASE WHEN flag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
             CAST(SUM(CASE WHEN flag = 'A' THEN z2 ELSE 0 END) AS BIGINT) AS sa,
             CAST(SUM(CASE WHEN flag = 'N' THEN z2 ELSE 0 END) AS BIGINT) AS sn,
             CAST(SUM(CASE WHEN flag = 'R' THEN z2 ELSE 0 END) AS BIGINT) AS sr,
             CAST(SUM(CASE WHEN flag = 'A'
                       THEN CAST(z2 AS HUGEINT) * z2 ELSE 0 END) AS DOUBLE) AS qa,
             CAST(SUM(CASE WHEN flag = 'N'
                       THEN CAST(z2 AS HUGEINT) * z2 ELSE 0 END) AS DOUBLE) AS qn,
             CAST(SUM(CASE WHEN flag = 'R'
                       THEN CAST(z2 AS HUGEINT) * z2 ELSE 0 END) AS DOUBLE) AS qr,
             MAX(CASE WHEN flag = 'A' THEN m2 END) / 2.0 AS med_a,
             MAX(CASE WHEN flag = 'N' THEN m2 END) / 2.0 AS med_n,
             MAX(CASE WHEN flag = 'R' THEN m2 END) / 2.0 AS med_r
      FROM z
    )
    SELECT n AS n_total, med_a, med_n, med_r,
           round((CAST(CAST(sa AS HUGEINT) * sa AS DOUBLE) / na
                  + CAST(CAST(sn AS HUGEINT) * sn AS DOUBLE) / nn
                  + CAST(CAST(sr AS HUGEINT) * sr AS DOUBLE) / nr
                  - CAST(CAST(sa + sn + sr AS HUGEINT) * (sa + sn + sr) AS DOUBLE)
                    / n) / 4.0, 6) AS ss_between,
           round((qa + qn + qr
                  - CAST(CAST(sa AS HUGEINT) * sa AS DOUBLE) / na
                  - CAST(CAST(sn AS HUGEINT) * sn AS DOUBLE) / nn
                  - CAST(CAST(sr AS HUGEINT) * sr AS DOUBLE) / nr) / 4.0, 6)
               AS ss_within,
           round(((CAST(CAST(sa AS HUGEINT) * sa AS DOUBLE) / na
                   + CAST(CAST(sn AS HUGEINT) * sn AS DOUBLE) / nn
                   + CAST(CAST(sr AS HUGEINT) * sr AS DOUBLE) / nr
                   - CAST(CAST(sa + sn + sr AS HUGEINT) * (sa + sn + sr) AS DOUBLE)
                     / n) / 2.0)
                 / ((qa + qn + qr
                     - CAST(CAST(sa AS HUGEINT) * sa AS DOUBLE) / na
                     - CAST(CAST(sn AS HUGEINT) * sn AS DOUBLE) / nn
                     - CAST(CAST(sr AS HUGEINT) * sr AS DOUBLE) / nr)
                    / (n - 3.0)), 6) AS bf_f
    FROM g
    """,
)


def _dbrownforsythe(spark, sf_dir):
    """Brown–Forsythe as two passes: a 3-row exact-median frame
    broadcast back onto the fact scan, then ONE conditional aggregate
    that pivots all per-group sums into a single row — the variance-
    homogeneity gate with no per-group re-scan and no float sums."""
    li = t(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    med = x.groupBy("flag").agg(
        (2 * F.percentile("q", 0.5)).cast("long").alias("m2")
    )
    z = x.join(F.broadcast(med), "flag").select(
        "flag", "m2", F.abs(2 * F.col("q") - F.col("m2")).alias("z2")
    )

    def _cnt(fl):
        return F.sum(F.when(F.col("flag") == fl, 1).otherwise(0)).cast("long")

    def _s(fl):
        return F.sum(F.when(F.col("flag") == fl, F.col("z2")).otherwise(0)).cast(
            "long"
        )

    def _q2(fl):
        return F.sum(
            F.when(
                F.col("flag") == fl,
                F.col("z2").cast("decimal(18,0)") * F.col("z2"),
            ).otherwise(F.lit(0).cast("decimal(18,0)"))
        ).cast("double")

    g = z.agg(
        F.count("*").cast("long").alias("n"),
        _cnt("A").alias("na"),
        _cnt("N").alias("nn"),
        _cnt("R").alias("nr"),
        _s("A").alias("sa"),
        _s("N").alias("sn"),
        _s("R").alias("sr"),
        _q2("A").alias("qa"),
        _q2("N").alias("qn"),
        _q2("R").alias("qr"),
        (F.max(F.when(F.col("flag") == "A", F.col("m2"))) / 2.0).alias("med_a"),
        (F.max(F.when(F.col("flag") == "N", F.col("m2"))) / 2.0).alias("med_n"),
        (F.max(F.when(F.col("flag") == "R", F.col("m2"))) / 2.0).alias("med_r"),
    )
    ta = (F.col("sa").cast("decimal(18,0)") * F.col("sa")).cast("double") / F.col("na")
    tn = (F.col("sn").cast("decimal(18,0)") * F.col("sn")).cast("double") / F.col("nn")
    tr = (F.col("sr").cast("decimal(18,0)") * F.col("sr")).cast("double") / F.col("nr")
    st = F.col("sa") + F.col("sn") + F.col("sr")
    tall = (st.cast("decimal(18,0)") * st).cast("double") / F.col("n")
    ssb = ta + tn + tr - tall
    ssw = F.col("qa") + F.col("qn") + F.col("qr") - ta - tn - tr
    return g.select(
        F.col("n").alias("n_total"),
        "med_a",
        "med_n",
        "med_r",
        F.round(ssb / 4.0, 6).alias("ss_between"),
        F.round(ssw / 4.0, 6).alias("ss_within"),
        F.round((ssb / 2.0) / (ssw / (F.col("n") - 3.0)), 6).alias("bf_f"),
    )


CATALOG["ml_brown_forsythe_quantity"].fn = _dbrownforsythe

register(
    "ml_friedman_priority_month",
    # Friedman's rank test for k correlated treatments: do the five
    # order priorities keep the same value ranking month after month?
    # Blocks are the 80 order months, the blocked metric is the exact
    # decimal mean order value snapped to 6dp, within-block ranks are
    # doubled average ranks (2*rank + ties - 1, integers under any
    # ties), and chi2_F = S/(10 b) - 18 b for k=5 — one division from
    # exact integer rank sums.
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS blk, o_orderpriority AS pri,
             round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM orders GROUP BY 1, 2
    ),
    cb AS (SELECT blk FROM m GROUP BY blk HAVING COUNT(*) = 5),
    r AS (
      SELECT m.pri,
             2 * RANK() OVER (PARTITION BY m.blk ORDER BY m.v)
               + COUNT(*) OVER (PARTITION BY m.blk, m.v) - 1 AS r2
      FROM m JOIN cb USING (blk)
    ),
    rs AS (
      SELECT CAST(SUM(CASE WHEN pri = '1-URGENT' THEN r2 ELSE 0 END) AS BIGINT)
                 AS r2_urgent,
             CAST(SUM(CASE WHEN pri = '2-HIGH' THEN r2 ELSE 0 END) AS BIGINT)
                 AS r2_high,
             CAST(SUM(CASE WHEN pri = '3-MEDIUM' THEN r2 ELSE 0 END) AS BIGINT)
                 AS r2_medium,
             CAST(SUM(CASE WHEN pri = '4-NOT SPECIFIED' THEN r2 ELSE 0 END)
                  AS BIGINT) AS r2_notspec,
             CAST(SUM(CASE WHEN pri = '5-LOW' THEN r2 ELSE 0 END) AS BIGINT)
                 AS r2_low
      FROM r
    ),
    b AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM cb)
    SELECT nb AS n_blocks,
           round(r2_urgent / (2.0 * nb), 6) AS meanrank_urgent,
           round(r2_high / (2.0 * nb), 6) AS meanrank_high,
           round(r2_medium / (2.0 * nb), 6) AS meanrank_medium,
           round(r2_notspec / (2.0 * nb), 6) AS meanrank_notspec,
           round(r2_low / (2.0 * nb), 6) AS meanrank_low,
           round(CAST(CAST(r2_urgent AS HUGEINT) * r2_urgent
                      + CAST(r2_high AS HUGEINT) * r2_high
                      + CAST(r2_medium AS HUGEINT) * r2_medium
                      + CAST(r2_notspec AS HUGEINT) * r2_notspec
                      + CAST(r2_low AS HUGEINT) * r2_low AS DOUBLE)
                 / (10.0 * nb) - 18.0 * nb, 6) AS friedman_chi2
    FROM rs CROSS JOIN b
    """,
)


def _dfriedman(spark, sf_dir):
    """Friedman test: one grouped mean over (month, priority) — the
    only corpus-sized pass — then rank windows PARTITIONED by month
    (bounded 5-row frames), a 5-row pivot, and a 1-row block-count
    broadcast. The repeated-measures ranking test at GROUP BY cost."""
    o = t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("blk"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double") / F.count("*"),
                6,
            ).alias("v")
        )
        .localCheckpoint(eager=False)
    )
    cb = m.groupBy("blk").agg(F.count("*").alias("__k")).filter(F.col("__k") == 5)
    r = (
        m.join(cb.select("blk"), "blk")
        .select(
            "pri",
            (
                2 * F.rank().over(Window.partitionBy("blk").orderBy("v"))
                + F.count("*").over(Window.partitionBy("blk", "v"))
                - 1
            ).alias("r2"),
        )
    )

    def _rsum(p, alias):
        return (
            F.sum(F.when(F.col("pri") == p, F.col("r2")).otherwise(0))
            .cast("long")
            .alias(alias)
        )

    rs = r.agg(
        _rsum("1-URGENT", "r2_urgent"),
        _rsum("2-HIGH", "r2_high"),
        _rsum("3-MEDIUM", "r2_medium"),
        _rsum("4-NOT SPECIFIED", "r2_notspec"),
        _rsum("5-LOW", "r2_low"),
    )
    b = cb.agg(F.count("*").cast("long").alias("nb"))

    def _sq(c):
        return F.col(c).cast("decimal(18,0)") * F.col(c)

    s = (
        _sq("r2_urgent")
        + _sq("r2_high")
        + _sq("r2_medium")
        + _sq("r2_notspec")
        + _sq("r2_low")
    )
    return rs.crossJoin(F.broadcast(b)).select(
        F.col("nb").alias("n_blocks"),
        F.round(F.col("r2_urgent") / (2.0 * F.col("nb")), 6).alias("meanrank_urgent"),
        F.round(F.col("r2_high") / (2.0 * F.col("nb")), 6).alias("meanrank_high"),
        F.round(F.col("r2_medium") / (2.0 * F.col("nb")), 6).alias("meanrank_medium"),
        F.round(F.col("r2_notspec") / (2.0 * F.col("nb")), 6).alias(
            "meanrank_notspec"
        ),
        F.round(F.col("r2_low") / (2.0 * F.col("nb")), 6).alias("meanrank_low"),
        F.round(
            s.cast("double") / (10.0 * F.col("nb")) - 18.0 * F.col("nb"), 6
        ).alias("friedman_chi2"),
    )


CATALOG["ml_friedman_priority_month"].fn = _dfriedman

register(
    "ml_theil_sen_qty_price",
    # the robust regression companion to OLS and Huber: Theil–Sen over
    # the quantity→mean-price profile. The corpus reduces to a 50-row
    # exact-decimal profile (one GROUP BY), ALL 1225 pairwise slopes
    # materialize from that bounded frame (never from raw rows), and
    # the estimator is the exact interpolated median of slopes, with
    # the intercept the median of m - slope*v.
    oracle="""
    WITH prof AS MATERIALIZED (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM lineitem GROUP BY 1
    ),
    sl AS (
      SELECT (b.m - a.m) / (b.v - a.v) AS s
      FROM prof a JOIN prof b ON a.v < b.v
    ),
    est AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             quantile_cont(s, 0.5) AS slope
      FROM sl
    ),
    ic AS (
      SELECT quantile_cont(m - est.slope * v, 0.5) AS icpt
      FROM prof CROSS JOIN est
    )
    SELECT est.n_pairs, round(est.slope, 6) AS ts_slope,
           round(ic.icpt, 6) AS ts_intercept
    FROM est CROSS JOIN ic
    """,
)


def _dtheilsen(spark, sf_dir):
    """Theil–Sen on the value-domain profile: the pair join runs on a
    broadcast 50-row frame (1225 pairs, bounded by the quantity domain
    — not the corpus), so the median-of-slopes estimator costs one
    GROUP BY plus constant work at any scale."""
    li = t(spark, sf_dir, "lineitem")
    prof = (
        li.groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.count("*"),
                6,
            ).alias("m")
        )
        .localCheckpoint(eager=False)
    )
    a = prof.select(F.col("v").alias("av"), F.col("m").alias("am"))
    b = prof.select(F.col("v").alias("bv"), F.col("m").alias("bm"))
    sl = (
        a.join(F.broadcast(b), F.col("av") < F.col("bv"))
        .select(((F.col("bm") - F.col("am")) / (F.col("bv") - F.col("av"))).alias("s"))
    )
    est = sl.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.percentile("s", 0.5).alias("slope"),
    )
    ic = (
        prof.crossJoin(F.broadcast(est))
        .agg(F.percentile(F.col("m") - F.col("slope") * F.col("v"), 0.5).alias("icpt"))
    )
    return est.crossJoin(F.broadcast(ic)).select(
        "n_pairs",
        F.round(F.col("slope"), 6).alias("ts_slope"),
        F.round(F.col("icpt"), 6).alias("ts_intercept"),
    )


CATALOG["ml_theil_sen_qty_price"].fn = _dtheilsen

register(
    "ml_mcnemar_lang",
    # the paired-classifier test next to Cohen's kappa: McNemar on the
    # SAME two raters (trained NB vs the stopword lang-ID heuristic)
    # scored against the true label over the NB test split. Only the
    # discordant counts matter: b = heuristic right where NB is wrong,
    # c = the reverse; chi2 = (b-c)^2/(b+c) is integers until one
    # division.
    oracle=f"""
    WITH {_NB_CTES},
    pred AS (
      SELECT doc_id, lang AS nb_pred FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score6 DESC, lang) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    heur AS ({_LANG_CASE_SQL.replace("lang_pred", "heur_pred")}),
    j AS (
      SELECT CASE WHEN p.nb_pred = td.lang THEN 1 ELSE 0 END AS nb_ok,
             CASE WHEN h.heur_pred = td.lang THEN 1 ELSE 0 END AS heur_ok
      FROM test_docs td
      JOIN pred p USING (doc_id)
      JOIN heur h USING (doc_id)
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(nb_ok * heur_ok) AS BIGINT) AS both_right,
             CAST(SUM((1 - nb_ok) * (1 - heur_ok)) AS BIGINT) AS both_wrong,
             CAST(SUM((1 - nb_ok) * heur_ok) AS BIGINT) AS b_heur,
             CAST(SUM(nb_ok * (1 - heur_ok)) AS BIGINT) AS c_nb
      FROM j
    )
    SELECT n AS n_docs, both_right AS n_both_right, both_wrong AS n_both_wrong,
           b_heur AS b_heur_only, c_nb AS c_nb_only,
           round(CAST((b_heur - c_nb) * (b_heur - c_nb) AS DOUBLE)
                 / NULLIF(CAST(b_heur + c_nb AS DOUBLE), 0.0), 6) AS mcnemar_chi2
    FROM g
    """,
)


def _dmcnemar(spark, sf_dir):
    """McNemar over the shared NB train+score pipeline: both raters'
    verdicts against truth reduce to four conditional counts in ONE
    aggregate over the joined test split — the cheapest possible
    'is the new classifier actually better on the same docs' gate."""
    from ..ops import text

    test, scored = _nb_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.desc("__score6"), "lang")
    pred = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", F.col("lang").alias("nb_pred"))
    )
    d = t(spark, sf_dir, "documents")
    heur = d.select("doc_id", text.lang_id(F.col("text")).alias("heur_pred"))
    j = (
        test.select("doc_id", F.col("lang").alias("truth"))
        .join(pred, "doc_id")
        .join(heur, "doc_id")
        .select(
            F.when(F.col("nb_pred") == F.col("truth"), 1).otherwise(0).alias("nb_ok"),
            F.when(F.col("heur_pred") == F.col("truth"), 1)
            .otherwise(0)
            .alias("heur_ok"),
        )
    )
    g = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("nb_ok") * F.col("heur_ok")).cast("long").alias("both_right"),
        F.sum((1 - F.col("nb_ok")) * (1 - F.col("heur_ok")))
        .cast("long")
        .alias("both_wrong"),
        F.sum((1 - F.col("nb_ok")) * F.col("heur_ok")).cast("long").alias("b_heur"),
        F.sum(F.col("nb_ok") * (1 - F.col("heur_ok"))).cast("long").alias("c_nb"),
    )
    bc = F.col("b_heur") - F.col("c_nb")
    return g.select(
        F.col("n").alias("n_docs"),
        F.col("both_right").alias("n_both_right"),
        F.col("both_wrong").alias("n_both_wrong"),
        F.col("b_heur").alias("b_heur_only"),
        F.col("c_nb").alias("c_nb_only"),
        F.round(
            (bc * bc).cast("double")
            / F.nullif((F.col("b_heur") + F.col("c_nb")).cast("double"), F.lit(0.0)),
            6,
        ).alias("mcnemar_chi2"),
    )


CATALOG["ml_mcnemar_lang"].fn = _dmcnemar

register(
    "ml_cramers_v_pairs",
    # effect-size screening across THREE categorical pairs from three
    # tables in one melted pass: Cramér's V from the exact chi-square
    # identity chi2 = sum over cells (n*o - ri*cj)^2 / (n*ri*cj). The
    # wide-int numerator is exact, each cell's term quantizes to
    # micro-units before the (bounded, cells-sized) sum, and V is one
    # sqrt of a ratio of exact quantities — the 'which features are
    # actually associated' report.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT 'flag_status' AS pair, l_returnflag AS a, l_linestatus AS b
      FROM lineitem
      UNION ALL
      SELECT 'status_priority', o_orderstatus, o_orderpriority FROM orders
      UNION ALL
      SELECT 'lang_source', lang, source FROM documents
    ),
    cells AS MATERIALIZED (
      SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS o FROM x GROUP BY 1, 2, 3
    ),
    ra AS (SELECT pair, a, CAST(SUM(o) AS BIGINT) AS ri FROM cells GROUP BY 1, 2),
    cc AS (SELECT pair, b, CAST(SUM(o) AS BIGINT) AS cj FROM cells GROUP BY 1, 2),
    nn AS (
      SELECT pair, CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c
      FROM cells GROUP BY pair
    ),
    terms AS (
      SELECT cells.pair,
             CAST(floor(round(
               CAST((CAST(nn.n AS HUGEINT) * cells.o - CAST(ra.ri AS HUGEINT) * cc.cj)
                    * (CAST(nn.n AS HUGEINT) * cells.o - CAST(ra.ri AS HUGEINT) * cc.cj)
                    AS DOUBLE) / nn.n / ra.ri / cc.cj,
               6) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM cells
      JOIN ra ON ra.pair = cells.pair AND ra.a = cells.a
      JOIN cc ON cc.pair = cells.pair AND cc.b = cells.b
      JOIN nn ON nn.pair = cells.pair
    ),
    chi AS (
      SELECT pair, CAST(SUM(t6) AS BIGINT) AS chi6 FROM terms GROUP BY pair
    )
    SELECT nn.pair, nn.n AS n_rows, nn.r AS r_levels, nn.c AS c_levels,
           round(chi6 / 1000000.0, 6) AS chi2,
           round(sqrt(chi6 / 1000000.0
                      / (nn.n * LEAST(nn.r - 1, nn.c - 1))), 6) AS cramers_v
    FROM chi JOIN nn USING (pair)
    ORDER BY pair
    """,
)


def _dcramersv(spark, sf_dir):
    """Cramér's V for three table-crossing categorical pairs: the melt
    is one union of three narrow scans, everything after runs on the
    cells frame (bounded by the level-domain product, not the data) —
    marginals, wide-int chi-square terms, one micro-unit sum per
    pair."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    d = t(spark, sf_dir, "documents")
    x = (
        li.select(
            F.lit("flag_status").alias("pair"),
            F.col("l_returnflag").alias("a"),
            F.col("l_linestatus").alias("b"),
        )
        .unionByName(
            o.select(
                F.lit("status_priority").alias("pair"),
                F.col("o_orderstatus").alias("a"),
                F.col("o_orderpriority").alias("b"),
            )
        )
        .unionByName(
            d.select(
                F.lit("lang_source").alias("pair"),
                F.col("lang").alias("a"),
                F.col("source").alias("b"),
            )
        )
    )
    cells = (
        x.groupBy("pair", "a", "b")
        .agg(F.count("*").cast("long").alias("o"))
        .localCheckpoint(eager=False)
    )
    ra = cells.groupBy("pair", "a").agg(F.sum("o").cast("long").alias("ri"))
    cc = cells.groupBy("pair", "b").agg(F.sum("o").cast("long").alias("cj"))
    nn = cells.groupBy("pair").agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("r"),
        F.countDistinct("b").cast("long").alias("c"),
    ).localCheckpoint(eager=False)
    dnum = (
        F.col("n").cast("decimal(19,0)") * F.col("o")
        - F.col("ri").cast("decimal(19,0)") * F.col("cj")
    ).cast("decimal(19,0)")
    terms = (
        cells.join(F.broadcast(ra), ["pair", "a"])
        .join(F.broadcast(cc), ["pair", "b"])
        .join(F.broadcast(nn), "pair")
        .select(
            "pair",
            F.floor(
                F.round(
                    (dnum * dnum).cast("double")
                    / F.col("n")
                    / F.col("ri")
                    / F.col("cj"),
                    6,
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("t6"),
        )
    )
    chi = terms.groupBy("pair").agg(F.sum("t6").cast("long").alias("chi6"))
    return (
        chi.join(nn, "pair")
        .select(
            "pair",
            F.col("n").alias("n_rows"),
            F.col("r").alias("r_levels"),
            F.col("c").alias("c_levels"),
            F.round(F.col("chi6") / 1e6, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi6")
                    / 1e6
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
        .orderBy("pair")
    )


CATALOG["ml_cramers_v_pairs"].fn = _dcramersv


