"""Round-15 wave 30 (post-close): panel econometrics + agreement +
audit sampling + sequential outliers — the fixed-effects within
estimator on the customer-year revenue panel (vs pooled and between:
the panel triptych, with within moments via the group-product identity
so no demeaned row is ever materialized), Bland-Altman agreement
between two token-count methods (whitespace split vs n_chars/5) with
limits of agreement and the outside share, the DeLong variance of the
price->urgent AUC from placement values on the $1000-band ROC frame,
monetary-unit (PPS Poisson) audit sampling with the Horvitz-Thompson
count estimate and the self-weighting value check, and a 3-round
generalized-ESD (Rosner) outlier scan of the daily event counts via
exact argmax + moment subtraction.

Exactness: within/between moments clear to integers with per-group
products micro-quantized by exact BIGINT division; Bland-Altman diffs
are pure integers; DeLong placements quantize at nano over the
bounded band frame; PPS inclusion is the exact cross-multiplied
integer comparison hv * V < k * v * 2^32 in decimal-38; each ESD
round subtracts the removed point's exact moments.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t


register(
    "cust_panel_fixed_effects",
    # The panel triptych on (customer, year) cells — y = yearly
    # revenue cents, x = yearly order count: pooled OLS slope,
    # the within (fixed-effects) slope from Wxy = Sxy - sum_i
    # (Sx_i Sy_i / n_i) (group products by exact integer division at
    # micro scale; no demeaning pass), and the between slope on the
    # group means — when the three disagree, customer heterogeneity
    # is driving the pooled number.
    oracle="""
    WITH p AS MATERIALIZED (
      SELECT o_custkey AS ck,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    g AS (
      SELECT ck, CAST(COUNT(*) AS BIGINT) AS ni,
             CAST(SUM(x) AS BIGINT) AS sxi, CAST(SUM(y) AS BIGINT) AS syi,
             (CAST(SUM(x) AS HUGEINT) * SUM(y) * 1000000)
               // CAST(COUNT(*) AS BIGINT) AS pxy6,
             (CAST(SUM(x) AS HUGEINT) * SUM(x) * 1000000)
               // CAST(COUNT(*) AS BIGINT) AS pxx6
      FROM p GROUP BY ck
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      FROM p
    ),
    gg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(pxy6) AS HUGEINT) AS spxy6,
             CAST(SUM(pxx6) AS HUGEINT) AS spxx6,
             CAST(SUM((sxi * 1000000) // ni) AS HUGEINT) AS smx6,
             CAST(SUM((syi * 1000000) // ni) AS HUGEINT) AS smy6,
             CAST(SUM((CAST(sxi AS HUGEINT) * sxi * 1000000) // (ni * ni))
               AS HUGEINT) AS smxx6,
             CAST(SUM((CAST(sxi AS HUGEINT) * syi * 1000000) // (ni * ni))
               AS HUGEINT) AS smxy6
      FROM g
    )
    SELECT gg.ng AS n_customers, m.n AS n_obs,
           round(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                 / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) / 100, 6)
             AS beta_pooled_dollars,
           round((CAST(m.sxy AS DOUBLE) - CAST(gg.spxy6 AS DOUBLE) / 1e6)
                 / (CAST(m.sxx AS DOUBLE) - CAST(gg.spxx6 AS DOUBLE) / 1e6)
                 / 100, 6) AS beta_within_dollars,
           round((CAST(gg.ng AS DOUBLE) * gg.smxy6 / 1e6
                  - (CAST(gg.smx6 AS DOUBLE) / 1e6)
                    * (CAST(gg.smy6 AS DOUBLE) / 1e6))
                 / (CAST(gg.ng AS DOUBLE) * gg.smxx6 / 1e6
                    - (CAST(gg.smx6 AS DOUBLE) / 1e6)
                      * (CAST(gg.smx6 AS DOUBLE) / 1e6)) / 100, 6)
             AS beta_between_dollars
    FROM m CROSS JOIN gg
    """,
)


def _dpanelfe(spark, sf_dir):
    """Pooled / within-FE / between slopes on the customer-year panel."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    p = o.groupBy(
        F.col("o_custkey").alias("ck"), F.year("o_orderdate").cast("long").alias("yr")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("y"),
    ).localCheckpoint(eager=False)
    g = p.groupBy("ck").agg(
        F.count("*").cast("long").alias("ni"),
        F.sum("x").cast("long").alias("sxi"),
        F.sum("y").cast("long").alias("syi"),
    ).select(
        "ni",
        "sxi",
        "syi",
        F.expr("(CAST(sxi AS decimal(38,0)) * syi * 1000000) div ni").alias(
            "pxy6"
        ),
        F.expr("(CAST(sxi AS decimal(38,0)) * sxi * 1000000) div ni").alias(
            "pxx6"
        ),
        F.expr("(sxi * 1000000) div ni").alias("mx6"),
        F.expr("(syi * 1000000) div ni").alias("my6"),
        F.expr(
            "(CAST(sxi AS decimal(38,0)) * sxi * 1000000) div (ni * ni)"
        ).alias("mxx6"),
        F.expr(
            "(CAST(sxi AS decimal(38,0)) * syi * 1000000) div (ni * ni)"
        ).alias("mxy6"),
    )
    m = p.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    gg = g.agg(
        F.count("*").cast("long").alias("ng"),
        F.sum(F.col("pxy6").cast(d38)).alias("spxy6"),
        F.sum(F.col("pxx6").cast(d38)).alias("spxx6"),
        F.sum(F.col("mx6").cast(d38)).alias("smx6"),
        F.sum(F.col("my6").cast(d38)).alias("smy6"),
        F.sum(F.col("mxx6").cast(d38)).alias("smxx6"),
        F.sum(F.col("mxy6").cast(d38)).alias("smxy6"),
    )
    j = m.crossJoin(F.broadcast(gg))
    pooled = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    within = (
        F.col("sxy").cast("double") - F.col("spxy6").cast("double") / F.lit(1e6)
    ) / (
        F.col("sxx").cast("double") - F.col("spxx6").cast("double") / F.lit(1e6)
    )
    between = (
        F.col("ng").cast("double") * F.col("smxy6").cast("double") / F.lit(1e6)
        - (F.col("smx6").cast("double") / F.lit(1e6))
        * (F.col("smy6").cast("double") / F.lit(1e6))
    ) / (
        F.col("ng").cast("double") * F.col("smxx6").cast("double") / F.lit(1e6)
        - (F.col("smx6").cast("double") / F.lit(1e6))
        * (F.col("smx6").cast("double") / F.lit(1e6))
    )
    return j.select(
        F.col("ng").alias("n_customers"),
        F.col("n").alias("n_obs"),
        F.round(pooled / 100, 6).alias("beta_pooled_dollars"),
        F.round(within / 100, 6).alias("beta_within_dollars"),
        F.round(between / 100, 6).alias("beta_between_dollars"),
    )


CATALOG["cust_panel_fixed_effects"].fn = _dpanelfe


register(
    "ml_bland_altman_token_methods",
    # Bland-Altman agreement between two token-count methods on every
    # document — whitespace split vs the n_chars/5 heuristic: bias
    # (mean diff), SD of diffs, limits of agreement bias +/- 1.959964
    # SD, and the share outside the limits.  Diffs are pure integers;
    # the outside test compares identical deterministic doubles.
    oracle="""
    WITH dx AS (
      SELECT CAST(len(list_filter(string_split(lower(d.text), ' '),
                                  x -> x <> '')) AS BIGINT)
             - d.n_chars // 5 AS df
      FROM documents d
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(df) AS BIGINT) AS s,
             CAST(SUM(CAST(df AS HUGEINT) * df) AS HUGEINT) AS s2
      FROM dx
    ),
    lim AS (
      SELECT n, CAST(s AS DOUBLE) / n AS bias,
             sqrt(CAST(n * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * (n - 1))) AS sd
      FROM m
    )
    SELECT lim.n AS n_docs, round(lim.bias, 6) AS bias,
           round(lim.sd, 6) AS sd_diff,
           round(lim.bias - 1.959964 * lim.sd, 6) AS loa_lower,
           round(lim.bias + 1.959964 * lim.sd, 6) AS loa_upper,
           round(CAST((SELECT SUM(CASE WHEN (dx.df - lim.bias)
                                            * (dx.df - lim.bias)
                                           > 1.959964 * lim.sd
                                             * (1.959964 * lim.sd)
                                      THEN 1 ELSE 0 END)
                       FROM dx) AS DOUBLE) / lim.n, 9) AS share_outside
    FROM lim
    """,
)


def _dblandaltman(spark, sf_dir):
    """Bland-Altman on the two per-doc token counters."""
    d38 = "decimal(38,0)"
    d = t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
        )
    ).cast("long")
    dx = d.select((toks - F.expr("n_chars div 5")).alias("df")).localCheckpoint(
        eager=False
    )
    m = dx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("df").cast("long").alias("s"),
        F.sum(F.col("df").cast(d38) * F.col("df")).alias("s2"),
    )
    bias = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
            "double"
        )
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    lim = m.select("n", bias.alias("bias"), sd.alias("sd"))
    outside = (
        dx.crossJoin(F.broadcast(lim))
        .agg(
            F.sum(
                F.when(
                    (F.col("df") - F.col("bias")) * (F.col("df") - F.col("bias"))
                    > 1.959964 * F.col("sd") * (1.959964 * F.col("sd")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("out")
        )
    )
    return lim.crossJoin(F.broadcast(outside)).select(
        F.col("n").alias("n_docs"),
        F.round(F.col("bias"), 6).alias("bias"),
        F.round(F.col("sd"), 6).alias("sd_diff"),
        F.round(F.col("bias") - 1.959964 * F.col("sd"), 6).alias("loa_lower"),
        F.round(F.col("bias") + 1.959964 * F.col("sd"), 6).alias("loa_upper"),
        F.round(F.col("out").cast("double") / F.col("n"), 9).alias(
            "share_outside"
        ),
    )


CATALOG["ml_bland_altman_token_methods"].fn = _dblandaltman


register(
    "ml_delong_auc_variance",
    # DeLong's AUC variance for the price->urgent classifier on the
    # $1000-band ROC frame: per-band positive placements V10 =
    # (cum_neg_below + neg_same/2)/NN and negative placements V01
    # (nano-quantized), AUC = weighted mean of V10, SE^2 = S10/NP +
    # S01/NN with the placement sample variances from cleared
    # quantized moments, and the Wald 95% CI.
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS band,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    h AS (
      SELECT band,
             CAST(SUM(pos) AS BIGINT) AS np_,
             CAST(SUM(1 - pos) AS BIGINT) AS nn_
      FROM b GROUP BY band
    ),
    n AS (
      SELECT CAST(SUM(np_) AS BIGINT) AS np, CAST(SUM(nn_) AS BIGINT) AS nn
      FROM h
    ),
    cum AS (
      SELECT band, np_, nn_,
             CAST(COALESCE(SUM(nn_) OVER (ORDER BY band
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS nn_below,
             CAST(COALESCE(SUM(np_) OVER (ORDER BY band DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS np_above
      FROM h
    ),
    v AS (
      SELECT np_, nn_,
             CAST(floor((nn_below + nn_ / 2.0) / n.nn * 1e9 + 0.5) AS BIGINT)
               AS v10,
             CAST(floor((np_above + np_ / 2.0) / n.np * 1e9 + 0.5) AS BIGINT)
               AS v01
      FROM cum CROSS JOIN n
    ),
    s AS (
      SELECT CAST(SUM(np_ * v10) AS HUGEINT) AS s10,
             CAST(SUM(np_ * CAST(v10 AS HUGEINT) * v10) AS HUGEINT) AS s10b,
             CAST(SUM(nn_ * v01) AS HUGEINT) AS s01,
             CAST(SUM(nn_ * CAST(v01 AS HUGEINT) * v01) AS HUGEINT) AS s01b
      FROM v
    )
    SELECT n.np AS n_pos, n.nn AS n_neg,
           round(CAST(s.s10 AS DOUBLE) / n.np / 1e9, 9) AS auc,
           round(sqrt((CAST(n.np * s.s10b - s.s10 * s.s10 AS DOUBLE)
                       / (CAST(n.np AS DOUBLE) * (n.np - 1)) / 1e18) / n.np
                      + (CAST(n.nn * s.s01b - s.s01 * s.s01 AS DOUBLE)
                         / (CAST(n.nn AS DOUBLE) * (n.nn - 1)) / 1e18) / n.nn),
                 9) AS se_delong,
           round(CAST(s.s10 AS DOUBLE) / n.np / 1e9
                 - 1.959964
                   * sqrt((CAST(n.np * s.s10b - s.s10 * s.s10 AS DOUBLE)
                           / (CAST(n.np AS DOUBLE) * (n.np - 1)) / 1e18) / n.np
                          + (CAST(n.nn * s.s01b - s.s01 * s.s01 AS DOUBLE)
                             / (CAST(n.nn AS DOUBLE) * (n.nn - 1)) / 1e18)
                            / n.nn), 6) AS ci_lower,
           round(CAST(s.s10 AS DOUBLE) / n.np / 1e9
                 + 1.959964
                   * sqrt((CAST(n.np * s.s10b - s.s10 * s.s10 AS DOUBLE)
                           / (CAST(n.np AS DOUBLE) * (n.np - 1)) / 1e18) / n.np
                          + (CAST(n.nn * s.s01b - s.s01 * s.s01 AS DOUBLE)
                             / (CAST(n.nn AS DOUBLE) * (n.nn - 1)) / 1e18)
                            / n.nn), 6) AS ci_upper
    FROM s CROSS JOIN n
    """,
)


def _ddelong(spark, sf_dir):
    """DeLong AUC SE from band placement values."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    b = o.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 100000"
        ).alias("band"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "pos"
        ),
    )
    h = b.groupBy("band").agg(
        F.sum("pos").cast("long").alias("np_"),
        F.sum(1 - F.col("pos")).cast("long").alias("nn_"),
    )
    n = h.agg(
        F.sum("np_").cast("long").alias("np"), F.sum("nn_").cast("long").alias("nn")
    )
    wlo = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    whi = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = h.select(
        "band",
        "np_",
        "nn_",
        F.coalesce(F.sum("nn_").over(wlo), F.lit(0)).cast("long").alias(
            "nn_below"
        ),
        F.coalesce(F.sum("np_").over(whi), F.lit(0)).cast("long").alias(
            "np_above"
        ),
    )
    v = cum.crossJoin(F.broadcast(n)).select(
        "np_",
        "nn_",
        F.floor(
            (F.col("nn_below") + F.col("nn_") / 2.0) / F.col("nn") * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v10"),
        F.floor(
            (F.col("np_above") + F.col("np_") / 2.0) / F.col("np") * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v01"),
    )
    s = v.agg(
        F.sum(F.col("np_").cast(d38) * F.col("v10")).alias("s10"),
        F.sum(F.col("np_").cast(d38) * F.col("v10") * F.col("v10")).alias("s10b"),
        F.sum(F.col("nn_").cast(d38) * F.col("v01")).alias("s01"),
        F.sum(F.col("nn_").cast(d38) * F.col("v01") * F.col("v01")).alias("s01b"),
    )
    j = s.crossJoin(F.broadcast(n))
    auc = F.col("s10").cast("double") / F.col("np") / F.lit(1e9)
    var10 = (
        (F.col("np") * F.col("s10b") - F.col("s10") * F.col("s10")).cast("double")
        / (F.col("np").cast("double") * (F.col("np") - 1))
        / F.lit(1e18)
    )
    var01 = (
        (F.col("nn") * F.col("s01b") - F.col("s01") * F.col("s01")).cast("double")
        / (F.col("nn").cast("double") * (F.col("nn") - 1))
        / F.lit(1e18)
    )
    se = F.sqrt(var10 / F.col("np") + var01 / F.col("nn"))
    return j.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(auc, 9).alias("auc"),
        F.round(se, 9).alias("se_delong"),
        F.round(auc - 1.959964 * se, 6).alias("ci_lower"),
        F.round(auc + 1.959964 * se, 6).alias("ci_upper"),
    )


CATALOG["ml_delong_auc_variance"].fn = _ddelong


register(
    "orders_pps_poisson_estimate",
    # Monetary-unit sampling (PPS Poisson): include order i iff
    # hash_i * V < k * v_i * 2^32 — the EXACT cross-multiplied
    # integer inclusion test for pi_i = k v_i / V at target size
    # k = 150 — then the Horvitz-Thompson COUNT estimate sum 1/pi
    # (micro-quantized per sampled row) against the true order count,
    # and the self-weighting VALUE check sum v/pi = V n_s / k.  The
    # audit-sampling design where big-money orders are (almost)
    # certainties.
    oracle="""
    WITH v AS MATERIALIZED (
      SELECT o_orderkey AS ok,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS vv, CAST(COUNT(*) AS BIGINT) AS n
      FROM v
    ),
    s AS (
      SELECT v.cents, tot.vv, tot.n
      FROM v CROSS JOIN tot
      WHERE CAST(('0x' || substr(sha256(CAST(v.ok AS VARCHAR) || 'pps15'),
                                 1, 8))::UBIGINT AS HUGEINT) * tot.vv
            < CAST(150 AS HUGEINT) * v.cents * 4294967296
    ),
    e AS (
      SELECT MAX(vv) AS vv, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(CAST(floor(CAST(vv AS DOUBLE) / (150.0 * cents) * 1e6
                                 + 0.5) AS BIGINT)) AS HUGEINT) AS sht6
      FROM s
    )
    SELECT n AS true_n_orders, ns AS n_sampled,
           round(CAST(sht6 AS DOUBLE) / 1e6, 6) AS ht_count_estimate,
           round((CAST(sht6 AS DOUBLE) / 1e6 - n) / n, 9) AS ht_rel_err,
           round(CAST(vv AS DOUBLE) / 100 * ns / 150, 2)
             AS value_self_weighted,
           round(CAST(vv AS DOUBLE) / 100, 2) AS true_value
    FROM e
    """,
)


def _dpps(spark, sf_dir):
    """PPS Poisson sample + HT count estimate + self-weighting check."""
    d38 = "decimal(38,0)"
    o = t(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderkey").alias("ok"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    )
    tot = v.agg(
        F.sum("cents").cast("long").alias("vv"), F.count("*").cast("long").alias("n")
    )
    hv = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("ok").cast("string"), F.lit("pps15")), 256), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    s = v.crossJoin(F.broadcast(tot)).filter(
        hv.cast(d38) * F.col("vv")
        < F.lit(150).cast(d38) * F.col("cents") * F.lit(4294967296)
    )
    e = s.agg(
        F.max("vv").alias("vv"),
        F.max("n").alias("n"),
        F.count("*").cast("long").alias("ns"),
        F.sum(
            F.floor(
                F.col("vv").cast("double") / (150.0 * F.col("cents")) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long")
        )
        .cast(d38)
        .alias("sht6"),
    )
    ht = F.col("sht6").cast("double") / F.lit(1e6)
    return e.select(
        F.col("n").alias("true_n_orders"),
        F.col("ns").alias("n_sampled"),
        F.round(ht, 6).alias("ht_count_estimate"),
        F.round((ht - F.col("n")) / F.col("n"), 9).alias("ht_rel_err"),
        F.round(
            F.col("vv").cast("double") / 100 * F.col("ns") / 150, 2
        ).alias("value_self_weighted"),
        F.round(F.col("vv").cast("double") / 100, 2).alias("true_value"),
    )


CATALOG["orders_pps_poisson_estimate"].fn = _dpps


register(
    "evt_rosner_esd_outliers",
    # A 3-round generalized-ESD (Rosner) scan of the 30 daily event
    # counts: each round takes the exact integer argmax of |n y - S|
    # (the same argmax as |y - mean|, day tie-break), reports
    # R = |y - mean|/sd, then REMOVES the point by subtracting its
    # exact moments — the sequential version of Grubbs that does not
    # mask the second outlier with the first.
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS dy, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    m1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
      FROM d
    ),
    p1 AS (
      SELECT d.dy, d.y FROM d CROSS JOIN m1
      ORDER BY ABS(m1.n * d.y - m1.s) DESC, d.dy LIMIT 1
    ),
    m2 AS (
      SELECT m1.n - 1 AS n, m1.s - p1.y AS s,
             m1.s2 - CAST(p1.y AS HUGEINT) * p1.y AS s2
      FROM m1 CROSS JOIN p1
    ),
    p2 AS (
      SELECT d.dy, d.y FROM d CROSS JOIN m2 CROSS JOIN p1
      WHERE d.dy <> p1.dy
      ORDER BY ABS(m2.n * d.y - m2.s) DESC, d.dy LIMIT 1
    ),
    m3 AS (
      SELECT m2.n - 1 AS n, m2.s - p2.y AS s,
             m2.s2 - CAST(p2.y AS HUGEINT) * p2.y AS s2
      FROM m2 CROSS JOIN p2
    ),
    p3 AS (
      SELECT d.dy, d.y FROM d CROSS JOIN m3 CROSS JOIN p1 CROSS JOIN p2
      WHERE d.dy <> p1.dy AND d.dy <> p2.dy
      ORDER BY ABS(m3.n * d.y - m3.s) DESC, d.dy LIMIT 1
    ),
    rows_out AS (
      SELECT 1 AS it, strftime(p1.dy, '%Y-%m-%d') AS day_s, p1.y,
             ABS(p1.y - CAST(m1.s AS DOUBLE) / m1.n)
             / sqrt(CAST(m1.n * m1.s2 - CAST(m1.s AS HUGEINT) * m1.s
                         AS DOUBLE) / (CAST(m1.n AS DOUBLE) * (m1.n - 1)))
               AS r
      FROM p1 CROSS JOIN m1
      UNION ALL
      SELECT 2, strftime(p2.dy, '%Y-%m-%d'), p2.y,
             ABS(p2.y - CAST(m2.s AS DOUBLE) / m2.n)
             / sqrt(CAST(m2.n * m2.s2 - CAST(m2.s AS HUGEINT) * m2.s
                         AS DOUBLE) / (CAST(m2.n AS DOUBLE) * (m2.n - 1)))
      FROM p2 CROSS JOIN m2
      UNION ALL
      SELECT 3, strftime(p3.dy, '%Y-%m-%d'), p3.y,
             ABS(p3.y - CAST(m3.s AS DOUBLE) / m3.n)
             / sqrt(CAST(m3.n * m3.s2 - CAST(m3.s AS HUGEINT) * m3.s
                         AS DOUBLE) / (CAST(m3.n AS DOUBLE) * (m3.n - 1)))
      FROM p3 CROSS JOIN m3
    )
    SELECT it AS iteration, day_s AS day, y AS n_events,
           round(r, 6) AS esd_r
    FROM rows_out ORDER BY it
    """,
)


def _drosner(spark, sf_dir):
    """3 unrolled ESD rounds via exact argmax + moment subtraction."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("dy")).agg(
        F.count("*").cast("long").alias("y")
    ).localCheckpoint(eager=False)
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("s2"),
    )
    removed = []
    rows = None
    for it in (1, 2, 3):
        cand = d
        for ri, rdf in enumerate(removed):
            cand = cand.join(
                F.broadcast(rdf.select(F.col("dy").alias(f"rd_{it}_{ri}"))),
                F.col("dy") == F.col(f"rd_{it}_{ri}"),
                "left_anti",
            )
        p = (
            cand.crossJoin(F.broadcast(m))
            .orderBy(
                F.abs(F.col("n") * F.col("y") - F.col("s")).desc(), "dy"
            )
            .limit(1)
            .select("dy", "y")
            .localCheckpoint(eager=False)
        )
        r = (
            p.crossJoin(F.broadcast(m))
            .select(
                F.lit(it).cast("long").alias("iteration"),
                F.date_format("dy", "yyyy-MM-dd").alias("day"),
                F.col("y").alias("n_events"),
                F.round(
                    F.abs(F.col("y") - F.col("s").cast("double") / F.col("n"))
                    / F.sqrt(
                        (
                            F.col("n") * F.col("s2")
                            - F.col("s").cast(d38) * F.col("s")
                        ).cast("double")
                        / (F.col("n").cast("double") * (F.col("n") - 1))
                    ),
                    6,
                ).alias("esd_r"),
            )
        )
        rows = r if rows is None else rows.unionByName(r)
        m = (
            m.crossJoin(F.broadcast(p.select(F.col("y").alias("py"))))
            .select(
                (F.col("n") - 1).alias("n"),
                (F.col("s") - F.col("py")).alias("s"),
                (F.col("s2") - F.col("py").cast(d38) * F.col("py")).alias("s2"),
            )
        )
        removed.append(p)
    return rows.orderBy("iteration")


CATALOG["evt_rosner_esd_outliers"].fn = _drosner
