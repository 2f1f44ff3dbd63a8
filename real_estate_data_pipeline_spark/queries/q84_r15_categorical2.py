"""Round-15 wave 4: categorical association II — Yule's Q and Y on
the urgent x above-median 2x2 (the q36 cell convention), the Pearson
contingency coefficient C with Sakoda's adjustment on brand x size,
the Stuart-Maxwell marginal-homogeneity test on the top-3-language
restriction of the NB-vs-heuristic confusion frame (the k=3 closed
form with the exact 2x2 inverse), Woolf's test of odds-ratio
homogeneity across year strata (the CMH stratification), and the
symmetric Goodman-Kruskal lambda on brand x size.

Exactness: every cell/marginal is an exact integer; Yule Q and the
Stuart-Maxwell statistic are exact integer rationals evaluated once
in double; Yule Y uses IEEE-exact sqrt of integer products; the
brand x size chi-square uses the zero-cell-free identity
chi2 = N*(sum O^2/(r*c) - 1) with pico-quantized per-cell terms;
Woolf weights/ln-OR micro-quantize per stratum before the <=7-term
sums (w6*l6 products in 128-bit — they exceed BIGINT at the 10x
probe).
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q15_curation_r3 import _NB_CTES
from .q31_r9_wave2_rank_embed import _KAPPA_J_CTES, _kappa_j

# The q36 urgent x above-global-median 2x2, shared by the Yule entry.
_U2X2_SQL = """x AS MATERIALIZED (
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
    )"""


def _u2x2(spark, sf_dir):
    """Spark twin of _U2X2_SQL: the 1-row (a, b, c, d) cell frame."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    return x.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0)).cast("long").alias("d"),
    )


register(
    "ml_yule_q_y_2x2",
    # Yule's Q = (ad-bc)/(ad+bc) (the odds-ratio transform of gamma
    # for 2x2) and Yule's Y (coefficient of colligation) =
    # (sqrt(ad)-sqrt(bc))/(sqrt(ad)+sqrt(bc)), both exact off integer
    # cross products (sqrt is IEEE-exact).
    oracle=f"""
    WITH {_U2X2_SQL}
    SELECT a, b, c, d,
           round(CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS DOUBLE)
                 / CAST(CAST(a AS HUGEINT) * d + CAST(b AS HUGEINT) * c AS DOUBLE),
                 9) AS yule_q,
           round((sqrt(CAST(CAST(a AS HUGEINT) * d AS DOUBLE))
                  - sqrt(CAST(CAST(b AS HUGEINT) * c AS DOUBLE)))
                 / (sqrt(CAST(CAST(a AS HUGEINT) * d AS DOUBLE))
                    + sqrt(CAST(CAST(b AS HUGEINT) * c AS DOUBLE))), 9) AS yule_y,
           round(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE), 6) AS odds_ratio
    FROM cells
    """,
)


def _dyule(spark, sf_dir):
    """Yule Q / Y off the shared 2x2 cells."""
    cells = _u2x2(spark, sf_dir)
    d19 = "decimal(19,0)"
    ad = (F.col("a").cast(d19) * F.col("d")).cast("double")
    bc = (F.col("b").cast(d19) * F.col("c")).cast("double")
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round((ad - bc) / (ad + bc), 9).alias("yule_q"),
        F.round(
            (F.sqrt(ad) - F.sqrt(bc)) / (F.sqrt(ad) + F.sqrt(bc)), 9
        ).alias("yule_y"),
        F.round(ad / bc, 6).alias("odds_ratio"),
    )


CATALOG["ml_yule_q_y_2x2"].fn = _dyule


register(
    "ml_contingency_coef_brand_size",
    # Pearson's contingency coefficient on brand x size via the
    # zero-cell-free identity chi2 = N*(sum O^2/(r_i*c_j) - 1) (absent
    # combos contribute exactly 0 to the sum, so only observed cells
    # are scanned), per-cell terms pico-quantized; C = sqrt(chi2/
    # (chi2+N)), Sakoda's C* = C/sqrt((q-1)/q), phi2 = chi2/N.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT p_brand AS b, p_size AS s, CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS rb FROM cells GROUP BY b),
    cm AS (SELECT s, CAST(SUM(o) AS BIGINT) AS cs FROM cells GROUP BY s),
    n AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST((SELECT COUNT(*) FROM rm) AS BIGINT) AS nb,
             CAST((SELECT COUNT(*) FROM cm) AS BIGINT) AS ns
      FROM cells
    ),
    terms AS (
      SELECT CAST(floor(CAST(CAST(o AS HUGEINT) * o AS DOUBLE)
                        / (CAST(rb AS HUGEINT) * cs) * 1e12 + 0.5) AS HUGEINT)
               AS t12
      FROM cells JOIN rm USING (b) JOIN cm USING (s)
    ),
    s AS (
      SELECT n.n, n.nb, n.ns,
             n.n * (CAST(SUM(t12) AS DOUBLE) / 1e12 - 1) AS chi2
      FROM terms CROSS JOIN n GROUP BY n.n, n.nb, n.ns
    )
    SELECT n, nb AS n_brands, ns AS n_sizes,
           round(chi2, 6) AS chi2,
           round(chi2 / n, 9) AS phi2,
           round(sqrt(chi2 / (chi2 + n)), 9) AS pearson_c,
           round(sqrt(chi2 / (chi2 + n))
                 / sqrt((LEAST(nb, ns) - 1.0) / LEAST(nb, ns)), 9) AS sakoda_c
    FROM s
    """,
)


def _dcontingency(spark, sf_dir):
    """C / Sakoda C* off pico-quantized O^2/(r*c) terms."""
    p = t(spark, sf_dir, "part")
    cells = p.groupBy(F.col("p_brand").alias("b"), F.col("p_size").alias("s")).agg(
        F.count("*").cast("long").alias("o")
    ).localCheckpoint(eager=False)
    rm = cells.groupBy("b").agg(F.sum("o").cast("long").alias("rb"))
    cm = cells.groupBy("s").agg(F.sum("o").cast("long").alias("cs"))
    n = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("b").cast("long").alias("nb"),
        F.countDistinct("s").cast("long").alias("ns"),
    )
    d19 = "decimal(19,0)"
    terms = (
        cells.join(rm, "b")
        .join(cm, "s")
        .select(
            F.floor(
                (F.col("o").cast(d19) * F.col("o")).cast("double")
                / (F.col("rb").cast(d19) * F.col("cs")).cast("double")
                * F.lit(1e12)
                + F.lit(0.5)
            )
            .cast("decimal(38,0)")
            .alias("t12")
        )
    )
    s = terms.agg(F.sum("t12").alias("st12")).crossJoin(F.broadcast(n))
    chi2 = F.col("n") * (F.col("st12").cast("double") / F.lit(1e12) - 1)
    q = F.least(F.col("nb"), F.col("ns"))
    return s.select(
        "n",
        F.col("nb").alias("n_brands"),
        F.col("ns").alias("n_sizes"),
        F.round(chi2, 6).alias("chi2"),
        F.round(chi2 / F.col("n"), 9).alias("phi2"),
        F.round(F.sqrt(chi2 / (chi2 + F.col("n"))), 9).alias("pearson_c"),
        F.round(
            F.sqrt(chi2 / (chi2 + F.col("n"))) / F.sqrt((q - 1.0) / q), 9
        ).alias("sakoda_c"),
    )


CATALOG["ml_contingency_coef_brand_size"].fn = _dcontingency


register(
    "ml_stuart_maxwell_marginal",
    # Stuart-Maxwell marginal-homogeneity test on the NB-vs-heuristic
    # confusion frame restricted to the TOP-3 languages (by combined
    # marginal appearance count, name tie-break): with d_i = row_i -
    # col_i and the 2x2 covariance block S (S_ii = r_i + c_i - 2n_ii,
    # S_12 = -(n_12 + n_21)), chi2 = (S22*d1^2 - 2*S12*d1*d2 +
    # S11*d2^2) / (S11*S22 - S12^2) — an exact integer rational, df=2.
    oracle=f"""
    WITH {_NB_CTES},
    {_KAPPA_J_CTES},
    marg AS (
      SELECT l, CAST(SUM(n) AS BIGINT) AS c FROM (
        SELECT nb_pred AS l, COUNT(*) AS n FROM j GROUP BY 1
        UNION ALL
        SELECT heur_pred AS l, COUNT(*) AS n FROM j GROUP BY 1
      ) GROUP BY l
    ),
    top3 AS (
      SELECT l, ROW_NUMBER() OVER (ORDER BY l) AS idx
      FROM (SELECT l, ROW_NUMBER() OVER (ORDER BY c DESC, l) AS rk FROM marg)
      WHERE rk <= 3
    ),
    jf AS (
      SELECT ta.idx AS ia, tb.idx AS ib
      FROM j JOIN top3 ta ON j.nb_pred = ta.l
             JOIN top3 tb ON j.heur_pred = tb.l
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn,
             CAST(SUM(CASE WHEN ia = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             CAST(SUM(CASE WHEN ia = 2 THEN 1 ELSE 0 END) AS BIGINT) AS r2,
             CAST(SUM(CASE WHEN ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN ib = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN ia = 2 AND ib = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n22,
             CAST(SUM(CASE WHEN ia = 1 AND ib = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n12,
             CAST(SUM(CASE WHEN ia = 2 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n21
      FROM jf
    )
    SELECT nn AS n_pairs,
           r1 - c1 AS d1, r2 - c2 AS d2,
           round(CAST((r2 + c2 - 2 * n22) * CAST((r1 - c1) AS HUGEINT) * (r1 - c1)
                      + 2 * (n12 + n21) * CAST((r1 - c1) AS HUGEINT) * (r2 - c2)
                      + (r1 + c1 - 2 * n11) * CAST((r2 - c2) AS HUGEINT) * (r2 - c2)
                      AS DOUBLE)
                 / CAST(CAST(r1 + c1 - 2 * n11 AS HUGEINT) * (r2 + c2 - 2 * n22)
                        - CAST(n12 + n21 AS HUGEINT) * (n12 + n21) AS DOUBLE),
                 6) AS stuart_maxwell_chi2,
           CAST(2 AS BIGINT) AS df
    FROM m
    """,
)


def _dstuartmaxwell(spark, sf_dir):
    """k=3 Stuart-Maxwell off the shared verdict frame (top-3 langs)."""
    j = _kappa_j(spark, sf_dir).localCheckpoint(eager=False)
    marg = (
        j.select(F.col("nb_pred").alias("l"))
        .unionAll(j.select(F.col("heur_pred").alias("l")))
        .groupBy("l")
        .agg(F.count("*").cast("long").alias("c"))
    )
    top3 = (
        marg.select(
            "l", F.row_number().over(Window.orderBy(F.desc("c"), "l")).alias("rk")
        )
        .filter(F.col("rk") <= 3)
        .select("l", F.row_number().over(Window.orderBy("l")).alias("idx"))
    )
    ta = top3.select(F.col("l").alias("la"), F.col("idx").alias("ia"))
    tb = top3.select(F.col("l").alias("lb"), F.col("idx").alias("ib"))
    jf = j.join(F.broadcast(ta), j["nb_pred"] == ta["la"]).join(
        F.broadcast(tb), j["heur_pred"] == tb["lb"]
    )
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    m = jf.agg(
        F.count("*").cast("long").alias("nn"),
        one(F.col("ia") == 1).alias("r1"),
        one(F.col("ia") == 2).alias("r2"),
        one(F.col("ib") == 1).alias("c1"),
        one(F.col("ib") == 2).alias("c2"),
        one((F.col("ia") == 1) & (F.col("ib") == 1)).alias("n11"),
        one((F.col("ia") == 2) & (F.col("ib") == 2)).alias("n22"),
        one((F.col("ia") == 1) & (F.col("ib") == 2)).alias("n12"),
        one((F.col("ia") == 2) & (F.col("ib") == 1)).alias("n21"),
    )
    d38 = "decimal(38,0)"
    d1 = F.col("r1") - F.col("c1")
    d2 = F.col("r2") - F.col("c2")
    s11 = F.col("r1") + F.col("c1") - 2 * F.col("n11")
    s22 = F.col("r2") + F.col("c2") - 2 * F.col("n22")
    s12n = F.col("n12") + F.col("n21")
    num = (
        s22 * d1.cast(d38) * d1
        + 2 * s12n * d1.cast(d38) * d2
        + s11 * d2.cast(d38) * d2
    ).cast("double")
    den = (s11.cast(d38) * s22 - s12n.cast(d38) * s12n).cast("double")
    return m.select(
        F.col("nn").alias("n_pairs"),
        d1.alias("d1"),
        d2.alias("d2"),
        F.round(num / den, 6).alias("stuart_maxwell_chi2"),
        F.lit(2).cast("long").alias("df"),
    )


CATALOG["ml_stuart_maxwell_marginal"].fn = _dstuartmaxwell


register(
    "ml_woolf_or_homogeneity",
    # Woolf's test of odds-ratio homogeneity across the 7 order-year
    # strata of the CMH 2x2 (urgent x above-global-median): weights
    # w_k = harmonic cell mean = abcd/(bcd+acd+abd+abc), pooled
    # ln-OR = sum(w*l)/sum(w), X2 = sum w_k (l_k - pooled)^2 over
    # all-positive-cell strata.  l_k 6dp-quantized, w_k micro-
    # quantized, w*l products in 128-bit, per-stratum X2 terms
    # nano-quantized before the <=7-term integer sum.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    med AS (SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM x),
    cells AS (
      SELECT yr,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM x CROSS JOIN med GROUP BY yr
    ),
    strat AS (
      SELECT yr,
             CAST(floor(round(ln(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE)), 6)
                        * 1000000 + 0.5) AS BIGINT) AS l6,
             CAST(floor(CAST(CAST(a AS HUGEINT) * b * c * d AS DOUBLE)
                        / CAST(CAST(b AS HUGEINT) * c * d
                               + CAST(a AS HUGEINT) * c * d
                               + CAST(a AS HUGEINT) * b * d
                               + CAST(a AS HUGEINT) * b * c AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS w6
      FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(w6) AS HUGEINT) AS sw6,
             SUM(CAST(w6 AS HUGEINT) * l6) AS swl12
      FROM strat
    ),
    terms AS (
      SELECT CAST(floor((w6 / 1e6)
                        * (l6 / 1e6 - CAST(swl12 AS DOUBLE) / CAST(sw6 AS DOUBLE)
                           / 1e6)
                        * (l6 / 1e6 - CAST(swl12 AS DOUBLE) / CAST(sw6 AS DOUBLE)
                           / 1e6)
                        * 1e9 + 0.5) AS HUGEINT) AS t9
      FROM strat CROSS JOIN pooled
    )
    SELECT (SELECT k FROM pooled) AS k_strata,
           round(CAST((SELECT swl12 FROM pooled) AS DOUBLE)
                 / CAST((SELECT sw6 FROM pooled) AS DOUBLE) / 1e6, 9)
             AS pooled_ln_or,
           round(CAST(SUM(t9) AS DOUBLE) / 1e9, 6) AS woolf_chi2
    FROM terms
    """,
)


def _dwoolf(spark, sf_dir):
    """Woolf homogeneity X2 across year strata."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    cells = (
        x.crossJoin(F.broadcast(med))
        .groupBy("yr")
        .agg(
            F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0)).cast("long").alias("a"),
            F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0)).cast("long").alias("b"),
            F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0)).cast("long").alias("c"),
            F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0)).cast("long").alias("d"),
        )
    )
    d38 = "decimal(38,0)"
    ad = (F.col("a").cast(d38) * F.col("d")).cast("double")
    bc = (F.col("b").cast(d38) * F.col("c")).cast("double")
    wnum = (F.col("a").cast(d38) * F.col("b") * F.col("c") * F.col("d")).cast("double")
    wden = (
        F.col("b").cast(d38) * F.col("c") * F.col("d")
        + F.col("a").cast(d38) * F.col("c") * F.col("d")
        + F.col("a").cast(d38) * F.col("b") * F.col("d")
        + F.col("a").cast(d38) * F.col("b") * F.col("c")
    ).cast("double")
    strat = cells.filter(
        (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
    ).select(
        F.floor(F.round(F.log(ad / bc), 6) * F.lit(1000000) + F.lit(0.5))
        .cast("long")
        .alias("l6"),
        F.floor(wnum / wden * F.lit(1000000) + F.lit(0.5)).cast("long").alias("w6"),
    ).localCheckpoint(eager=False)
    pooled = strat.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("w6").cast(d38).alias("sw6"),
        F.sum(F.col("w6").cast(d38) * F.col("l6")).alias("swl12"),
    )
    lbar = F.col("swl12").cast("double") / F.col("sw6").cast("double") / F.lit(1e6)
    terms = strat.crossJoin(F.broadcast(pooled)).select(
        "k",
        "sw6",
        "swl12",
        F.floor(
            (F.col("w6") / F.lit(1e6))
            * (F.col("l6") / F.lit(1e6) - lbar)
            * (F.col("l6") / F.lit(1e6) - lbar)
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast(d38)
        .alias("t9"),
    )
    return terms.groupBy("k", "sw6", "swl12").agg(F.sum("t9").alias("st9")).select(
        F.col("k").alias("k_strata"),
        F.round(
            F.col("swl12").cast("double") / F.col("sw6").cast("double") / F.lit(1e6), 9
        ).alias("pooled_ln_or"),
        F.round(F.col("st9").cast("double") / F.lit(1e9), 6).alias("woolf_chi2"),
    )


CATALOG["ml_woolf_or_homogeneity"].fn = _dwoolf


register(
    "ml_lambda_symmetric_brand_size",
    # Symmetric Goodman-Kruskal lambda on brand x size: lambda_sym =
    # (sum_i max_j n_ij + sum_j max_i n_ij - max_j c_j - max_i r_i) /
    # (2N - max_j c_j - max_i r_i) — the proportional reduction in
    # prediction error averaged over both directions. Pure integers;
    # the one ratio evaluates once in double.
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT p_brand AS b, p_size AS s, CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rowmax AS (SELECT CAST(SUM(m) AS BIGINT) AS srm
               FROM (SELECT b, MAX(o) AS m FROM cells GROUP BY b)),
    colmax AS (SELECT CAST(SUM(m) AS BIGINT) AS scm
               FROM (SELECT s, MAX(o) AS m FROM cells GROUP BY s)),
    marg AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST((SELECT MAX(t) FROM (SELECT SUM(o) AS t FROM cells GROUP BY b))
               AS BIGINT) AS maxr,
             CAST((SELECT MAX(t) FROM (SELECT SUM(o) AS t FROM cells GROUP BY s))
               AS BIGINT) AS maxc
      FROM cells
    )
    SELECT n, srm AS sum_row_max, scm AS sum_col_max,
           maxr AS max_row_marginal, maxc AS max_col_marginal,
           round(CAST(srm + scm - maxc - maxr AS DOUBLE)
                 / (2 * n - maxc - maxr), 9) AS lambda_symmetric
    FROM marg CROSS JOIN rowmax CROSS JOIN colmax
    """,
)


def _dlambdasym(spark, sf_dir):
    """Symmetric lambda off integer cell maxima."""
    p = t(spark, sf_dir, "part")
    cells = p.groupBy(F.col("p_brand").alias("b"), F.col("p_size").alias("s")).agg(
        F.count("*").cast("long").alias("o")
    ).localCheckpoint(eager=False)
    rowmax = cells.groupBy("b").agg(F.max("o").alias("m")).agg(
        F.sum("m").cast("long").alias("srm")
    )
    colmax = cells.groupBy("s").agg(F.max("o").alias("m")).agg(
        F.sum("m").cast("long").alias("scm")
    )
    rmarg = cells.groupBy("b").agg(F.sum("o").alias("t")).agg(
        F.max("t").cast("long").alias("maxr")
    )
    cmarg = cells.groupBy("s").agg(F.sum("o").alias("t")).agg(
        F.max("t").cast("long").alias("maxc")
    )
    n = cells.agg(F.sum("o").cast("long").alias("n"))
    j = (
        n.crossJoin(F.broadcast(rowmax))
        .crossJoin(F.broadcast(colmax))
        .crossJoin(F.broadcast(rmarg))
        .crossJoin(F.broadcast(cmarg))
    )
    return j.select(
        "n",
        F.col("srm").alias("sum_row_max"),
        F.col("scm").alias("sum_col_max"),
        F.col("maxr").alias("max_row_marginal"),
        F.col("maxc").alias("max_col_marginal"),
        F.round(
            (F.col("srm") + F.col("scm") - F.col("maxc") - F.col("maxr")).cast("double")
            / (2 * F.col("n") - F.col("maxc") - F.col("maxr")),
            9,
        ).alias("lambda_symmetric"),
    )


CATALOG["ml_lambda_symmetric_brand_size"].fn = _dlambdasym
