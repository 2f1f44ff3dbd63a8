"""Round-15 wave 26 (post-close): higher-order Markov diagnostics on
the per-user event-type journeys — the likelihood-ratio test of
second- vs first-order memory over the 125-cell trigram table, the
Chapman-Kolmogorov consistency check (empirical two-step matrix vs
the one-step matrix squared), transition-matrix stationarity across
the window halves (the q84 zero-cell-free chi2 identity per source
state), the detailed-balance reversibility census (pure integer flow
asymmetry |n_ab - n_ba|), and a held-out last-week perplexity duel
between add-one-smoothed bigram and trigram sequence models — the
order-selection question answered on PREDICTION, not fit.

Exactness: every transition/trigram count is an exact integer from
lead windows with (sec, event_id) ordering; G2 and perplexity terms
are count * 6dp-micro-nat products (integers before the sums);
probabilities quantize via BIGINT integer division at nano scale;
the matrix square sums 5 nano-product terms per cell in decimal-38;
chi2 rides the N(sum O^2/(r c) - 1) identity with pico-quantized
cell terms.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Ordered per-user event streams with one- and two-step leads.
_SEQ_CTE = """ev AS (
      SELECT user_id, event_type AS a,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec, event_id
      FROM events
    ),
    sq AS (
      SELECT user_id, sec, a,
             LEAD(a, 1) OVER (PARTITION BY user_id
                              ORDER BY sec, event_id) AS b,
             LEAD(a, 2) OVER (PARTITION BY user_id
                              ORDER BY sec, event_id) AS c
      FROM ev
    )"""


def _seq(spark, sf_dir):
    """Per-user (a, b, c) one/two-step lead frame."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("a"),
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    return ev.select(
        "user_id",
        "sec",
        "a",
        F.lead("a", 1).over(w).alias("b"),
        F.lead("a", 2).over(w).alias("c"),
    )


register(
    "evt_markov_memory_g2",
    # The LR test of second- vs first-order memory: G2 = 2 sum n_abc
    # ln(n_abc n_b / (n_ab n_bc)) over the trigram table, all
    # marginals taken FROM the trigram frame so the test is
    # self-consistent; df = |A| (|A| - 1)^2 for the 5-state chain.
    # Count * micro-nat products are exact integers before the sum.
    oracle=f"""
    WITH {_SEQ_CTE},
    tri AS (
      SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM sq WHERE c IS NOT NULL GROUP BY a, b, c
    ),
    mb AS (SELECT a, b, CAST(SUM(n) AS BIGINT) AS nab FROM tri GROUP BY a, b),
    mc AS (SELECT b, c, CAST(SUM(n) AS BIGINT) AS nbc FROM tri GROUP BY b, c),
    mm AS (SELECT b, CAST(SUM(n) AS BIGINT) AS nb FROM tri GROUP BY b),
    terms AS (
      SELECT tri.n * CAST(floor(round(ln(CAST(tri.n AS DOUBLE) * mm.nb
                                         / (CAST(mb.nab AS DOUBLE) * mc.nbc)),
                                      6) * 1000000 + 0.5) AS BIGINT) AS t6
      FROM tri
      JOIN mb ON mb.a = tri.a AND mb.b = tri.b
      JOIN mc ON mc.b = tri.b AND mc.c = tri.c
      JOIN mm ON mm.b = tri.b
    ),
    k AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS k FROM tri)
    SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM tri) AS n_trigrams,
           round(2.0 * (SELECT SUM(t6) FROM terms) / 1e6, 6) AS g2,
           CAST(k.k * (k.k - 1) * (k.k - 1) AS BIGINT) AS df
    FROM k
    """,
)


def _dmemoryg2(spark, sf_dir):
    """G2 order test over the 125-cell trigram frame."""
    sq = _seq(spark, sf_dir)
    tri = (
        sq.filter(F.col("c").isNotNull())
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    mb = tri.groupBy("a", "b").agg(F.sum("n").cast("long").alias("nab"))
    mc = tri.groupBy(F.col("b").alias("b2"), F.col("c").alias("c2")).agg(
        F.sum("n").cast("long").alias("nbc")
    )
    mm = tri.groupBy(F.col("b").alias("b3")).agg(
        F.sum("n").cast("long").alias("nb")
    )
    terms = (
        tri.join(F.broadcast(mb), ["a", "b"])
        .join(
            F.broadcast(mc),
            (F.col("b") == F.col("b2")) & (F.col("c") == F.col("c2")),
        )
        .join(F.broadcast(mm), F.col("b") == F.col("b3"))
        .select(
            (
                F.col("n")
                * F.floor(
                    F.round(
                        F.log(
                            F.col("n").cast("double") * F.col("nb")
                            / (F.col("nab").cast("double") * F.col("nbc"))
                        ),
                        6,
                    )
                    * F.lit(1000000)
                    + F.lit(0.5)
                ).cast("long")
            ).alias("t6")
        )
    )
    tot = tri.agg(F.sum("n").cast("long").alias("n_trigrams"))
    k = tri.agg(F.countDistinct("a").cast("long").alias("k"))
    st = terms.agg(F.sum("t6").cast("long").alias("st6"))
    return (
        tot.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(k))
        .select(
            "n_trigrams",
            F.round(2.0 * F.col("st6") / F.lit(1e6), 6).alias("g2"),
            (F.col("k") * (F.col("k") - 1) * (F.col("k") - 1))
            .cast("long")
            .alias("df"),
        )
    )


CATALOG["evt_markov_memory_g2"].fn = _dmemoryg2


register(
    "evt_markov_ck_check",
    # Chapman-Kolmogorov: the empirical two-step matrix P(2) vs the
    # one-step matrix squared P^2 — both rows nano-quantized BIGINT
    # divisions, the 5-term matrix-square sums in decimal-38; the
    # mean/max absolute cell gap is the Markov-property health gauge.
    oracle=f"""
    WITH {_SEQ_CTE},
    bi AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM sq WHERE b IS NOT NULL GROUP BY a, b
    ),
    na AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM bi GROUP BY a),
    p1 AS (
      SELECT bi.a, bi.b, (bi.n * 1000000000) // na.na AS p9
      FROM bi JOIN na ON na.a = bi.a
    ),
    two AS (
      SELECT a, c, CAST(COUNT(*) AS BIGINT) AS m
      FROM sq WHERE c IS NOT NULL GROUP BY a, c
    ),
    ma AS (SELECT a, CAST(SUM(m) AS BIGINT) AS ma FROM two GROUP BY a),
    p2e AS (
      SELECT two.a, two.c, (two.m * 1000000000) // ma.ma AS q9
      FROM two JOIN ma ON ma.a = two.a
    ),
    p2m AS (
      SELECT x.a, y.b AS c,
             CAST(SUM(CAST(x.p9 AS HUGEINT) * y.p9) AS HUGEINT) AS s18
      FROM p1 x JOIN p1 y ON y.a = x.b
      GROUP BY x.a, y.b
    ),
    gaps AS (
      SELECT p2m.a, p2m.c,
             ABS(CAST(p2m.s18 AS DOUBLE) / 1e9
                 - COALESCE(p2e.q9, 0)) AS gap9
      FROM p2m LEFT JOIN p2e ON p2e.a = p2m.a AND p2e.c = p2m.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           round(MAX(gap9) / 1e9, 9) AS max_abs_gap,
           round(CAST(SUM(CAST(floor(gap9 + 0.5) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1e9, 9) AS mean_abs_gap
    FROM gaps
    """,
)


def _dckcheck(spark, sf_dir):
    """P(2) vs P^2 cell gaps over the 5x5 state grid."""
    d38 = "decimal(38,0)"
    sq = _seq(spark, sf_dir).localCheckpoint(eager=False)
    bi = (
        sq.filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    na = bi.groupBy(F.col("a").alias("a2")).agg(
        F.sum("n").cast("long").alias("na")
    )
    p1 = bi.join(F.broadcast(na), F.col("a") == F.col("a2")).select(
        "a", "b", F.expr("(n * 1000000000) div na").alias("p9")
    ).localCheckpoint(eager=False)
    two = (
        sq.filter(F.col("c").isNotNull())
        .groupBy("a", "c")
        .agg(F.count("*").cast("long").alias("m"))
    )
    ma = two.groupBy(F.col("a").alias("a3")).agg(
        F.sum("m").cast("long").alias("ma")
    )
    p2e = two.join(F.broadcast(ma), F.col("a") == F.col("a3")).select(
        F.col("a").alias("ae"), F.col("c").alias("ce"),
        F.expr("(m * 1000000000) div ma").alias("q9"),
    )
    y = p1.select(
        F.col("a").alias("ya"), F.col("b").alias("yb"), F.col("p9").alias("yp9")
    )
    p2m = (
        p1.join(F.broadcast(y), F.col("ya") == F.col("b"))
        .groupBy("a", F.col("yb").alias("c"))
        .agg(F.sum(F.col("p9").cast(d38) * F.col("yp9")).alias("s18"))
    )
    gaps = p2m.join(
        F.broadcast(p2e),
        (F.col("a") == F.col("ae")) & (F.col("c") == F.col("ce")),
        "left",
    ).select(
        F.abs(
            F.col("s18").cast("double") / F.lit(1e9)
            - F.coalesce(F.col("q9"), F.lit(0))
        ).alias("gap9")
    )
    return gaps.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.max("gap9") / F.lit(1e9), 9).alias("max_abs_gap"),
        F.round(
            F.sum(F.floor(F.col("gap9") + F.lit(0.5)).cast("long")).cast("double")
            / F.count("*")
            / F.lit(1e9),
            9,
        ).alias("mean_abs_gap"),
    )


CATALOG["evt_markov_ck_check"].fn = _dckcheck


register(
    "evt_markov_stationarity_halves",
    # Transition-matrix stationarity: first vs second half of the
    # window (split at the global midpoint second, transitions keyed
    # by their FIRST event), per-source 2xK homogeneity chi2 via the
    # zero-cell-free N(sum O^2/(r c) - 1) identity with pico-quantized
    # terms, summed over sources; df = sum (k_a - 1).
    oracle=f"""
    WITH {_SEQ_CTE},
    mid AS (SELECT (MIN(sec) + MAX(sec)) // 2 AS m FROM ev),
    tr AS (
      SELECT sq.a, sq.b,
             CASE WHEN sq.sec <= mid.m THEN 0 ELSE 1 END AS h
      FROM sq CROSS JOIN mid WHERE sq.b IS NOT NULL
    ),
    cells AS (
      SELECT a, b, h, CAST(COUNT(*) AS BIGINT) AS o FROM tr GROUP BY a, b, h
    ),
    rt AS (SELECT a, h, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a, h),
    ct AS (SELECT a, b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY a, b),
    nt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS n FROM cells GROUP BY a),
    terms AS (
      SELECT cells.a,
             CAST(floor(CAST(cells.o AS DOUBLE) * cells.o
                        / (CAST(rt.r AS DOUBLE) * ct.c) * 1e12 + 0.5)
               AS BIGINT) AS t12
      FROM cells
      JOIN rt ON rt.a = cells.a AND rt.h = cells.h
      JOIN ct ON ct.a = cells.a AND ct.b = cells.b
    ),
    chi AS (
      SELECT terms.a, nt.n,
             CAST(SUM(terms.t12) AS BIGINT) AS st12,
             CAST(COUNT(*) AS BIGINT) AS ncells
      FROM terms JOIN nt ON nt.a = terms.a
      GROUP BY terms.a, nt.n
    ),
    dfc AS (
      SELECT a, CAST(COUNT(DISTINCT b) AS BIGINT) AS kb FROM cells GROUP BY a
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           round(SUM(CAST(chi.n AS DOUBLE) * (chi.st12 / 1e12 - 1)), 6)
             AS chi2_total,
           CAST(SUM(dfc.kb - 1) AS BIGINT) AS df
    FROM chi JOIN dfc ON dfc.a = chi.a
    """,
)


def _dstationarity(spark, sf_dir):
    """Half-window homogeneity chi2 summed over source states."""
    sq = _seq(spark, sf_dir).localCheckpoint(eager=False)
    mid = sq.agg(F.expr("(min(sec) + max(sec)) div 2").alias("m"))
    tr = (
        sq.filter(F.col("b").isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            "a",
            "b",
            F.when(F.col("sec") <= F.col("m"), 0).otherwise(1).alias("h"),
        )
    )
    cells = tr.groupBy("a", "b", "h").agg(
        F.count("*").cast("long").alias("o")
    ).localCheckpoint(eager=False)
    rt = cells.groupBy(F.col("a").alias("ar"), F.col("h").alias("hr")).agg(
        F.sum("o").cast("long").alias("r")
    )
    ct = cells.groupBy(F.col("a").alias("ac"), F.col("b").alias("bc")).agg(
        F.sum("o").cast("long").alias("c")
    )
    nt = cells.groupBy(F.col("a").alias("an")).agg(
        F.sum("o").cast("long").alias("n")
    )
    terms = (
        cells.join(
            F.broadcast(rt),
            (F.col("a") == F.col("ar")) & (F.col("h") == F.col("hr")),
        )
        .join(
            F.broadcast(ct),
            (F.col("a") == F.col("ac")) & (F.col("b") == F.col("bc")),
        )
        .select(
            "a",
            F.floor(
                F.col("o").cast("double") * F.col("o")
                / (F.col("r").cast("double") * F.col("c"))
                * F.lit(1e12)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t12"),
        )
    )
    chi = (
        terms.groupBy("a")
        .agg(F.sum("t12").cast("long").alias("st12"))
        .join(F.broadcast(nt), F.col("a") == F.col("an"))
    )
    dfc = cells.groupBy(F.col("a").alias("ad")).agg(
        F.countDistinct("b").cast("long").alias("kb")
    )
    out = chi.join(F.broadcast(dfc), F.col("a") == F.col("ad"))
    return out.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.round(
            F.sum(
                F.col("n").cast("double") * (F.col("st12") / F.lit(1e12) - 1)
            ),
            6,
        ).alias("chi2_total"),
        F.sum(F.col("kb") - 1).cast("long").alias("df"),
    )


CATALOG["evt_markov_stationarity_halves"].fn = _dstationarity


register(
    "evt_markov_reversibility",
    # Detailed-balance census, all pure integers: the empirical flow
    # asymmetry sum_{a<b} |n_ab - n_ba| over the off-diagonal
    # transition counts, its share of total off-diagonal flow, and
    # the most asymmetric ordered pair — whether the journey graph
    # has a direction (funnels do, noise does not).
    oracle=f"""
    WITH {_SEQ_CTE},
    bi AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM sq WHERE b IS NOT NULL AND a <> b GROUP BY a, b
    ),
    pair AS (
      SELECT LEAST(x.a, x.b) AS p, GREATEST(x.a, x.b) AS q,
             CAST(SUM(CASE WHEN x.a < x.b THEN x.n ELSE 0 END) AS BIGINT)
               AS fwd,
             CAST(SUM(CASE WHEN x.a > x.b THEN x.n ELSE 0 END) AS BIGINT)
               AS bwd
      FROM bi x GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(SUM(fwd + bwd) AS BIGINT) AS tot,
             CAST(SUM(ABS(fwd - bwd)) AS BIGINT) AS asym
      FROM pair
    ),
    top AS (
      SELECT p, q, fwd, bwd, ABS(fwd - bwd) AS gap
      FROM pair ORDER BY ABS(fwd - bwd) DESC, p, q LIMIT 1
    )
    SELECT agg.tot AS n_offdiag_transitions, agg.asym AS asym_sum,
           round(CAST(agg.asym AS DOUBLE) / agg.tot, 9) AS asym_ratio,
           top.p || '->' || top.q AS top_pair,
           top.fwd AS top_forward, top.bwd AS top_backward
    FROM agg CROSS JOIN top
    """,
)


def _dreversibility(spark, sf_dir):
    """Pure-integer flow-asymmetry census of the journey digraph."""
    sq = _seq(spark, sf_dir)
    bi = (
        sq.filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    pair = bi.groupBy(
        F.least("a", "b").alias("p"), F.greatest("a", "b").alias("q")
    ).agg(
        F.sum(F.when(F.col("a") < F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("fwd"),
        F.sum(F.when(F.col("a") > F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("bwd"),
    ).localCheckpoint(eager=False)
    agg = pair.agg(
        F.sum(F.col("fwd") + F.col("bwd")).cast("long").alias("tot"),
        F.sum(F.abs(F.col("fwd") - F.col("bwd"))).cast("long").alias("asym"),
    )
    top = (
        pair.select(
            "p", "q", "fwd", "bwd", F.abs(F.col("fwd") - F.col("bwd")).alias("gap")
        )
        .orderBy(F.col("gap").desc(), "p", "q")
        .limit(1)
    )
    return agg.crossJoin(F.broadcast(top)).select(
        F.col("tot").alias("n_offdiag_transitions"),
        F.col("asym").alias("asym_sum"),
        F.round(F.col("asym").cast("double") / F.col("tot"), 9).alias(
            "asym_ratio"
        ),
        F.concat(F.col("p"), F.lit("->"), F.col("q")).alias("top_pair"),
        F.col("fwd").alias("top_forward"),
        F.col("bwd").alias("top_backward"),
    )


CATALOG["evt_markov_reversibility"].fn = _dreversibility


register(
    "evt_sequence_holdout_perplexity",
    # The order-selection duel on PREDICTION: add-one-smoothed bigram
    # vs trigram sequence models trained on days 0-20, scored by
    # held-out perplexity on the last-week transitions (both events
    # inside each window).  Per-cell count * micro-nat(ln p) products
    # are exact integers; unseen contexts fall back to the uniform
    # 1/(k+... ) smoothing mass via the same add-one formula with
    # zero counts.
    oracle=f"""
    WITH {_SEQ_CTE},
    d0 AS (SELECT CAST(epoch(date_trunc('day', MIN(ts))) AS BIGINT) AS t0
           FROM events),
    lbl AS (
      SELECT sq.a, sq.b, sq.c,
             (sq.sec - d0.t0) // 86400 AS dy
      FROM sq CROSS JOIN d0
    ),
    tr_bi AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM lbl WHERE b IS NOT NULL AND dy <= 20 GROUP BY a, b
    ),
    tr_bia AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM tr_bi GROUP BY a),
    tr_tri AS (
      SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM lbl WHERE c IS NOT NULL AND dy <= 18 GROUP BY a, b, c
    ),
    tr_triab AS (
      SELECT a, b, CAST(SUM(n) AS BIGINT) AS nab FROM tr_tri GROUP BY a, b
    ),
    te_bi AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS m
      FROM lbl WHERE b IS NOT NULL AND dy >= 23 GROUP BY a, b
    ),
    te_tri AS (
      SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS m
      FROM lbl WHERE c IS NOT NULL AND dy >= 23 GROUP BY a, b, c
    ),
    sb AS (
      SELECT CAST(SUM(te_bi.m) AS BIGINT) AS mm,
             CAST(SUM(te_bi.m
                      * CAST(floor(round(ln((COALESCE(tr_bi.n, 0) + 1.0)
                                            / (COALESCE(tr_bia.na, 0) + 5.0)),
                                         6) * 1000000 + 0.5) AS BIGINT))
               AS BIGINT) AS sl6
      FROM te_bi
      LEFT JOIN tr_bi ON tr_bi.a = te_bi.a AND tr_bi.b = te_bi.b
      LEFT JOIN tr_bia ON tr_bia.a = te_bi.a
    ),
    st AS (
      SELECT CAST(SUM(te_tri.m) AS BIGINT) AS mm,
             CAST(SUM(te_tri.m
                      * CAST(floor(round(ln((COALESCE(tr_tri.n, 0) + 1.0)
                                            / (COALESCE(tr_triab.nab, 0)
                                               + 5.0)), 6) * 1000000 + 0.5)
                             AS BIGINT)) AS BIGINT) AS sl6
      FROM te_tri
      LEFT JOIN tr_tri ON tr_tri.a = te_tri.a AND tr_tri.b = te_tri.b
                       AND tr_tri.c = te_tri.c
      LEFT JOIN tr_triab ON tr_triab.a = te_tri.a AND tr_triab.b = te_tri.b
    )
    SELECT sb.mm AS n_test_bigrams, st.mm AS n_test_trigrams,
           round(exp(round(-CAST(sb.sl6 AS DOUBLE) / sb.mm / 1e6, 6)), 6)
             AS pp_bigram,
           round(exp(round(-CAST(st.sl6 AS DOUBLE) / st.mm / 1e6, 6)), 6)
             AS pp_trigram,
           round(exp(round(-CAST(sb.sl6 AS DOUBLE) / sb.mm / 1e6, 6))
                 - exp(round(-CAST(st.sl6 AS DOUBLE) / st.mm / 1e6, 6)), 6)
             AS bigram_minus_trigram
    FROM sb CROSS JOIN st
    """,
)


def _dholdout(spark, sf_dir):
    """Held-out perplexity: bigram vs trigram add-one models."""
    ev = t(spark, sf_dir, "events")
    d0 = ev.agg(
        F.unix_timestamp(F.date_trunc("day", F.min("ts")).cast("timestamp"))
        .cast("long")
        .alias("t0")
    )
    sq = _seq(spark, sf_dir)
    lbl = sq.crossJoin(F.broadcast(d0)).select(
        "a", "b", "c", F.expr("(sec - t0) div 86400").alias("dy")
    ).localCheckpoint(eager=False)
    tr_bi = (
        lbl.filter(F.col("b").isNotNull() & (F.col("dy") <= 20))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tr_bia = tr_bi.groupBy(F.col("a").alias("aa")).agg(
        F.sum("n").cast("long").alias("na")
    )
    tr_tri = (
        lbl.filter(F.col("c").isNotNull() & (F.col("dy") <= 18))
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tr_triab = tr_tri.groupBy(
        F.col("a").alias("ta"), F.col("b").alias("tb")
    ).agg(F.sum("n").cast("long").alias("nab"))
    te_bi = (
        lbl.filter(F.col("b").isNotNull() & (F.col("dy") >= 23))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("m"))
    )
    te_tri = (
        lbl.filter(F.col("c").isNotNull() & (F.col("dy") >= 23))
        .groupBy("a", "b", "c")
        .agg(F.count("*").cast("long").alias("m"))
    )
    l6 = lambda num, den: F.floor(  # noqa: E731
        F.round(F.log(num / den), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    sb = (
        te_bi.join(
            tr_bi.select(
                F.col("a").alias("ba"), F.col("b").alias("bb"), F.col("n")
            ),
            (F.col("a") == F.col("ba")) & (F.col("b") == F.col("bb")),
            "left",
        )
        .join(F.broadcast(tr_bia), F.col("a") == F.col("aa"), "left")
        .agg(
            F.sum("m").cast("long").alias("mm"),
            F.sum(
                F.col("m")
                * l6(
                    F.coalesce(F.col("n"), F.lit(0)) + F.lit(1.0),
                    F.coalesce(F.col("na"), F.lit(0)) + F.lit(5.0),
                )
            )
            .cast("long")
            .alias("sl6"),
        )
    )
    st = (
        te_tri.join(
            tr_tri.select(
                F.col("a").alias("xa"),
                F.col("b").alias("xb"),
                F.col("c").alias("xc"),
                F.col("n"),
            ),
            (F.col("a") == F.col("xa"))
            & (F.col("b") == F.col("xb"))
            & (F.col("c") == F.col("xc")),
            "left",
        )
        .join(
            F.broadcast(tr_triab),
            (F.col("a") == F.col("ta")) & (F.col("b") == F.col("tb")),
            "left",
        )
        .agg(
            F.sum("m").cast("long").alias("mm2"),
            F.sum(
                F.col("m")
                * l6(
                    F.coalesce(F.col("n"), F.lit(0)) + F.lit(1.0),
                    F.coalesce(F.col("nab"), F.lit(0)) + F.lit(5.0),
                )
            )
            .cast("long")
            .alias("sl62"),
        )
    )
    ppb = F.exp(
        F.round(-F.col("sl6").cast("double") / F.col("mm") / F.lit(1e6), 6)
    )
    ppt = F.exp(
        F.round(-F.col("sl62").cast("double") / F.col("mm2") / F.lit(1e6), 6)
    )
    return sb.crossJoin(F.broadcast(st)).select(
        F.col("mm").alias("n_test_bigrams"),
        F.col("mm2").alias("n_test_trigrams"),
        F.round(ppb, 6).alias("pp_bigram"),
        F.round(ppt, 6).alias("pp_trigram"),
        F.round(ppb - ppt, 6).alias("bigram_minus_trigram"),
    )


CATALOG["evt_sequence_holdout_perplexity"].fn = _dholdout
