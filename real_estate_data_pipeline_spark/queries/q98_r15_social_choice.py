"""Round-15 wave 18 (post-close): ranking + social choice over the 25
part brands — Bradley-Terry strengths from within-order pairwise spend
duels (3 unrolled MM iterations under the pagerank snap discipline),
Borda counts + Condorcet duel records from per-order brand rankings,
Kendall's W concordance of the 7 yearly brand-revenue rankings (a pure
integer rational via the doubled-deviation trick), Spearman-footrule
drift between consecutive years' rankings, and Shapley channel
attribution of purchase conversion over the view/click/error exposure
sets (3 channels -> the 8-coalition grid makes every Shapley value an
EXACT integer rational with weights 2/1/1/2 over 6).

Exactness: duels and ranks come from exact cent totals with brand-name
tie-breaks; MM round terms n_bo/(pi_b + pi_o) are nano-quantized per
opponent before the <=24-term integer sums and each round's strengths
are re-normalized and snapped at 6dp; Kendall W = 3 S4 / (m^2(n^3-n))
with S4 = sum (2R - m(n+1))^2 all integer; Shapley coalition rates are
exact BIGINT integer divisions (conv * 1e9 div n) on the densified
8-subset grid; the efficiency identity sum phi = v(111) - v(000) is
emitted as a self-check.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# Within-order per-brand spend (exact cents, brand-name tie-breaks).
_ORDER_BRAND_CTE = """ob AS MATERIALIZED (
      SELECT l.l_orderkey AS ok, p.p_brand AS b,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    )"""


def _order_brand(spark, sf_dir):
    """(order, brand, cents) frame shared by the duel queries."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", F.col("p_brand").alias("b"))),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("ok"), "b")
        .agg(
            F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)
    )


register(
    "lineitem_bradley_terry_brands",
    # Bradley-Terry strengths of the 25 brands from within-order
    # pairwise duels (higher order-spend wins; equal-spend pairs are
    # discarded), fit by 3 unrolled minorize-maximize rounds
    # pi_b <- W_b / sum_o n_bo/(pi_b + pi_o), renormalized to sum 1
    # and snapped at 6dp each round (the pagerank oracle discipline).
    oracle=f"""
    WITH {_ORDER_BRAND_CTE},
    duel AS (
      SELECT a.b AS wb, c.b AS lb
      FROM ob a JOIN ob c ON a.ok = c.ok AND a.cents > c.cents
    ),
    games AS (
      SELECT LEAST(wb, lb) AS b1, GREATEST(wb, lb) AS b2,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN wb < lb THEN 1 ELSE 0 END) AS BIGINT) AS w1
      FROM duel GROUP BY 1, 2
    ),
    gb AS (
      SELECT b1 AS b, b2 AS o, n, w1 AS w FROM games
      UNION ALL
      SELECT b2 AS b, b1 AS o, n, n - w1 AS w FROM games
    ),
    wins AS (SELECT b, CAST(SUM(w) AS BIGINT) AS wb, CAST(SUM(n) AS BIGINT)
                    AS nb FROM gb GROUP BY b),
    p0 AS (SELECT b, CAST(40000 AS BIGINT) AS pi6 FROM wins),
    d1 AS (
      SELECT gb.b,
             CAST(SUM(CAST(floor(CAST(gb.n AS DOUBLE) * 1e9
                                 / (pa.pi6 / 1e6 + pb.pi6 / 1e6) + 0.5)
                           AS BIGINT)) AS BIGINT) AS d9
      FROM gb JOIN p0 pa ON pa.b = gb.b JOIN p0 pb ON pb.b = gb.o
      GROUP BY gb.b
    ),
    r1 AS (
      SELECT wins.b, CAST(wins.wb AS DOUBLE) / NULLIF(d1.d9 / 1e9, 0) AS raw
      FROM wins JOIN d1 ON d1.b = wins.b
    ),
    p1 AS (
      SELECT b, CAST(floor(raw / (SELECT SUM(raw) FROM r1) * 1e6 + 0.5)
               AS BIGINT) AS pi6
      FROM r1
    ),
    d2 AS (
      SELECT gb.b,
             CAST(SUM(CAST(floor(CAST(gb.n AS DOUBLE) * 1e9
                                 / (pa.pi6 / 1e6 + pb.pi6 / 1e6) + 0.5)
                           AS BIGINT)) AS BIGINT) AS d9
      FROM gb JOIN p1 pa ON pa.b = gb.b JOIN p1 pb ON pb.b = gb.o
      GROUP BY gb.b
    ),
    r2 AS (
      SELECT wins.b, CAST(wins.wb AS DOUBLE) / NULLIF(d2.d9 / 1e9, 0) AS raw
      FROM wins JOIN d2 ON d2.b = wins.b
    ),
    p2 AS (
      SELECT b, CAST(floor(raw / (SELECT SUM(raw) FROM r2) * 1e6 + 0.5)
               AS BIGINT) AS pi6
      FROM r2
    ),
    d3 AS (
      SELECT gb.b,
             CAST(SUM(CAST(floor(CAST(gb.n AS DOUBLE) * 1e9
                                 / (pa.pi6 / 1e6 + pb.pi6 / 1e6) + 0.5)
                           AS BIGINT)) AS BIGINT) AS d9
      FROM gb JOIN p2 pa ON pa.b = gb.b JOIN p2 pb ON pb.b = gb.o
      GROUP BY gb.b
    ),
    r3 AS (
      SELECT wins.b, CAST(wins.wb AS DOUBLE) / NULLIF(d3.d9 / 1e9, 0) AS raw
      FROM wins JOIN d3 ON d3.b = wins.b
    ),
    p3 AS (
      SELECT b, CAST(floor(raw / (SELECT SUM(raw) FROM r3) * 1e6 + 0.5)
               AS BIGINT) AS pi6
      FROM r3
    )
    SELECT p3.b AS brand, wins.nb AS n_games, wins.wb AS n_wins,
           round(p3.pi6 / 1e6, 6) AS bt_strength,
           CAST(ROW_NUMBER() OVER (ORDER BY p3.pi6 DESC, p3.b) AS BIGINT)
             AS bt_rank
    FROM p3 JOIN wins ON wins.b = p3.b ORDER BY bt_rank
    """,
)


def _dbradleyterry(spark, sf_dir):
    """3 unrolled BT-MM rounds over the bounded 25-brand duel frame."""
    ob = _order_brand(spark, sf_dir)
    oc = ob.select(
        F.col("ok").alias("ok2"), F.col("b").alias("b2x"), F.col("cents").alias("c2")
    )
    duel = ob.join(
        oc, (F.col("ok") == F.col("ok2")) & (F.col("cents") > F.col("c2"))
    ).select(F.col("b").alias("wb"), F.col("b2x").alias("lb"))
    games = duel.groupBy(
        F.least("wb", "lb").alias("b1"), F.greatest("wb", "lb").alias("b2")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("wb") < F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("w1"),
    )
    gb = (
        games.select(
            F.col("b1").alias("b"), F.col("b2").alias("o"), "n", F.col("w1").alias("w")
        )
        .unionByName(
            games.select(
                F.col("b2").alias("b"),
                F.col("b1").alias("o"),
                "n",
                (F.col("n") - F.col("w1")).alias("w"),
            )
        )
        .localCheckpoint(eager=False)
    )
    wins = gb.groupBy("b").agg(
        F.sum("w").cast("long").alias("wb"), F.sum("n").cast("long").alias("nb")
    ).localCheckpoint(eager=False)
    pi = wins.select("b", F.lit(40000).cast("long").alias("pi6"))
    for _ in range(3):
        pa = pi.select(F.col("b").alias("ba"), F.col("pi6").alias("pia"))
        pb = pi.select(F.col("b").alias("bo"), F.col("pi6").alias("pio"))
        d = (
            gb.join(F.broadcast(pa), F.col("b") == F.col("ba"))
            .join(F.broadcast(pb), F.col("o") == F.col("bo"))
            .groupBy("b")
            .agg(
                F.sum(
                    F.floor(
                        F.col("n").cast("double")
                        * F.lit(1e9)
                        / (F.col("pia") / F.lit(1e6) + F.col("pio") / F.lit(1e6))
                        + F.lit(0.5)
                    ).cast("long")
                )
                .cast("long")
                .alias("d9")
            )
        )
        r = wins.join(d, "b").select(
            "b",
            (
                F.col("wb").cast("double")
                / F.nullif(F.col("d9") / F.lit(1e9), F.lit(0.0))
            ).alias("raw"),
        )
        tot = r.agg(F.sum("raw").alias("sraw"))
        pi = r.crossJoin(F.broadcast(tot)).select(
            "b",
            F.floor(F.col("raw") / F.col("sraw") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("pi6"),
        ).localCheckpoint(eager=False)
    return (
        pi.join(wins, "b")
        .select(
            F.col("b").alias("brand"),
            F.col("nb").alias("n_games"),
            F.col("wb").alias("n_wins"),
            F.round(F.col("pi6") / F.lit(1e6), 6).alias("bt_strength"),
            F.row_number()
            .over(Window.orderBy(F.col("pi6").desc(), F.col("b")))
            .cast("long")
            .alias("bt_rank"),
        )
        .orderBy("bt_rank")
    )


CATALOG["lineitem_bradley_terry_brands"].fn = _dbradleyterry


register(
    "lineitem_borda_condorcet_brands",
    # Borda counts from per-order brand rankings by spend (points =
    # brands-in-order minus rank) and the Condorcet duel record: a
    # brand's majority duels won out of its 24 pairings, with the
    # Condorcet-winner flag (wins every duel it has).  Strict-spend
    # duels; equal spends contribute to neither side.
    oracle=f"""
    WITH {_ORDER_BRAND_CTE},
    rk AS (
      SELECT ok, b,
             ROW_NUMBER() OVER (PARTITION BY ok ORDER BY cents DESC, b) AS r,
             COUNT(*) OVER (PARTITION BY ok) AS k
      FROM ob
    ),
    borda AS (
      SELECT b, CAST(SUM(k - r) AS BIGINT) AS pts FROM rk GROUP BY b
    ),
    duel AS (
      SELECT a.b AS wb, c.b AS lb
      FROM ob a JOIN ob c ON a.ok = c.ok AND a.cents > c.cents
    ),
    mat AS (
      SELECT LEAST(wb, lb) AS b1, GREATEST(wb, lb) AS b2,
             CAST(SUM(CASE WHEN wb < lb THEN 1 ELSE 0 END) AS BIGINT) AS w12,
             CAST(SUM(CASE WHEN wb > lb THEN 1 ELSE 0 END) AS BIGINT) AS w21
      FROM duel GROUP BY 1, 2
    ),
    dw AS (
      SELECT b1 AS b,
             CASE WHEN w12 > w21 THEN 1 ELSE 0 END AS won,
             1 AS played
      FROM mat
      UNION ALL
      SELECT b2 AS b,
             CASE WHEN w21 > w12 THEN 1 ELSE 0 END AS won,
             1 AS played
      FROM mat
    ),
    rec AS (
      SELECT b, CAST(SUM(won) AS BIGINT) AS duels_won,
             CAST(SUM(played) AS BIGINT) AS duels_played
      FROM dw GROUP BY b
    )
    SELECT borda.b AS brand, borda.pts AS borda_points,
           rec.duels_won, rec.duels_played,
           CAST(CASE WHEN rec.duels_won = rec.duels_played THEN 1 ELSE 0 END
                AS BIGINT) AS is_condorcet_winner
    FROM borda JOIN rec ON rec.b = borda.b
    ORDER BY borda.pts DESC, borda.b
    """,
)


def _dborda(spark, sf_dir):
    """Borda points + Condorcet duel record per brand."""
    ob = _order_brand(spark, sf_dir)
    wr = Window.partitionBy("ok").orderBy(F.col("cents").desc(), "b")
    wk = Window.partitionBy("ok")
    rk = ob.select(
        "b",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wk).alias("k"),
    )
    borda = rk.groupBy("b").agg(
        F.sum(F.col("k") - F.col("r")).cast("long").alias("pts")
    )
    oc = ob.select(
        F.col("ok").alias("ok2"), F.col("b").alias("b2x"), F.col("cents").alias("c2")
    )
    duel = ob.join(
        oc, (F.col("ok") == F.col("ok2")) & (F.col("cents") > F.col("c2"))
    ).select(F.col("b").alias("wb"), F.col("b2x").alias("lb"))
    mat = duel.groupBy(
        F.least("wb", "lb").alias("b1"), F.greatest("wb", "lb").alias("b2")
    ).agg(
        F.sum(F.when(F.col("wb") < F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("w12"),
        F.sum(F.when(F.col("wb") > F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("w21"),
    )
    dw = mat.select(
        F.col("b1").alias("b"),
        F.when(F.col("w12") > F.col("w21"), 1).otherwise(0).alias("won"),
        F.lit(1).alias("played"),
    ).unionByName(
        mat.select(
            F.col("b2").alias("b"),
            F.when(F.col("w21") > F.col("w12"), 1).otherwise(0).alias("won"),
            F.lit(1).alias("played"),
        )
    )
    rec = dw.groupBy("b").agg(
        F.sum("won").cast("long").alias("duels_won"),
        F.sum("played").cast("long").alias("duels_played"),
    )
    return (
        borda.join(rec, "b")
        .select(
            F.col("b").alias("brand"),
            F.col("pts").alias("borda_points"),
            "duels_won",
            "duels_played",
            F.when(F.col("duels_won") == F.col("duels_played"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_condorcet_winner"),
        )
        .orderBy(F.col("borda_points").desc(), "brand")
    )


CATALOG["lineitem_borda_condorcet_brands"].fn = _dborda


# Yearly brand-revenue rankings (exact cents, brand tie-break).
_YEAR_RANK_CTE = """yb AS MATERIALIZED (
      SELECT CAST(year(l.l_shipdate) AS BIGINT) AS yr, p.p_brand AS b,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS revc
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT yr, b,
             CAST(ROW_NUMBER() OVER (PARTITION BY yr
                                     ORDER BY revc DESC, b) AS BIGINT) AS r
      FROM yb
    )"""


def _year_ranks(spark, sf_dir):
    """(year, brand, rank) of brand revenue per ship year."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    yb = (
        li.join(
            F.broadcast(p.select("p_partkey", F.col("p_brand").alias("b"))),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(F.year("l_shipdate").cast("long").alias("yr"), "b")
        .agg(
            F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("long"))
            .cast("long")
            .alias("revc")
        )
    )
    wr = Window.partitionBy("yr").orderBy(F.col("revc").desc(), "b")
    return yb.select(
        "yr", "b", F.row_number().over(wr).cast("long").alias("r")
    ).localCheckpoint(eager=False)


register(
    "orders_kendall_w_years",
    # Kendall's W concordance of the 7 yearly brand-revenue rankings
    # of the 25 brands: W = 3 S4 / (m^2 (n^3 - n)) with S4 =
    # sum_b (2 R_b - m(n+1))^2 — the doubled-deviation trick keeps the
    # whole statistic a pure integer rational; the companion chi2 is
    # m(n-1)W.
    oracle=f"""
    WITH {_YEAR_RANK_CTE},
    rs AS (SELECT b, CAST(SUM(r) AS BIGINT) AS rb FROM rk GROUP BY b),
    mm AS (
      SELECT CAST(COUNT(DISTINCT yr) AS BIGINT) AS m,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS n
      FROM rk
    ),
    s AS (
      SELECT CAST(SUM((2 * rb - mm.m * (mm.n + 1))
                      * (2 * rb - mm.m * (mm.n + 1))) AS BIGINT) AS s4,
             mm.m, mm.n
      FROM rs CROSS JOIN mm GROUP BY mm.m, mm.n
    )
    SELECT n AS n_brands, m AS m_years,
           round(3.0 * s4 / (CAST(m AS DOUBLE) * m * (n * n * n - n)), 9)
             AS kendall_w,
           round(CAST(m AS DOUBLE) * (n - 1)
                 * (3.0 * s4 / (CAST(m AS DOUBLE) * m * (n * n * n - n))), 6)
             AS friedman_chi2
    FROM s
    """,
)


def _dkendallw(spark, sf_dir):
    """Kendall's W off the integer rank-sum deviations."""
    rk = _year_ranks(spark, sf_dir)
    rs = rk.groupBy("b").agg(F.sum("r").cast("long").alias("rb"))
    mm = rk.agg(
        F.countDistinct("yr").cast("long").alias("m"),
        F.countDistinct("b").cast("long").alias("n"),
    )
    dev = 2 * F.col("rb") - F.col("m") * (F.col("n") + 1)
    s = (
        rs.crossJoin(F.broadcast(mm))
        .groupBy("m", "n")
        .agg(F.sum(dev * dev).cast("long").alias("s4"))
    )
    w = 3.0 * F.col("s4") / (
        F.col("m").cast("double")
        * F.col("m")
        * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
    )
    return s.select(
        F.col("n").alias("n_brands"),
        F.col("m").alias("m_years"),
        F.round(w, 9).alias("kendall_w"),
        F.round(F.col("m").cast("double") * (F.col("n") - 1) * w, 6).alias(
            "friedman_chi2"
        ),
    )


CATALOG["orders_kendall_w_years"].fn = _dkendallw


register(
    "orders_footrule_yearly_rankings",
    # Spearman-footrule drift between consecutive years' 25-brand
    # revenue rankings: F = sum_b |r_y(b) - r_{y+1}(b)| (pure
    # integer), normalized by the odd-n maximum (n^2 - 1)/2 = 312 —
    # how much the brand league table reshuffles year over year.
    oracle=f"""
    WITH {_YEAR_RANK_CTE},
    pair AS (
      SELECT a.yr AS y0, a.b, a.r AS r0, c.r AS r1
      FROM rk a JOIN rk c ON c.b = a.b AND c.yr = a.yr + 1
    )
    SELECT y0 AS year_from, y0 + 1 AS year_to,
           CAST(SUM(ABS(r0 - r1)) AS BIGINT) AS footrule,
           round(CAST(SUM(ABS(r0 - r1)) AS DOUBLE) / 312, 9)
             AS footrule_normalized
    FROM pair GROUP BY y0 ORDER BY y0
    """,
)


def _dfootrule(spark, sf_dir):
    """Footrule distance between consecutive yearly rankings."""
    rk = _year_ranks(spark, sf_dir)
    c = rk.select(
        (F.col("yr") - 1).alias("y0b"), F.col("b").alias("bb"), F.col("r").alias("r1")
    )
    pair = rk.join(
        c, (F.col("b") == F.col("bb")) & (F.col("yr") == F.col("y0b"))
    )
    return (
        pair.groupBy(F.col("yr").alias("year_from"))
        .agg(F.sum(F.abs(F.col("r") - F.col("r1"))).cast("long").alias("footrule"))
        .select(
            "year_from",
            (F.col("year_from") + 1).alias("year_to"),
            "footrule",
            F.round(F.col("footrule").cast("double") / F.lit(312), 9).alias(
                "footrule_normalized"
            ),
        )
        .orderBy("year_from")
    )


CATALOG["orders_footrule_yearly_rankings"].fn = _dfootrule


register(
    "cust_shapley_channel_attribution",
    # Shapley attribution of purchase conversion over the view/click/
    # error exposure channels at (user, day) granularity (a whole-
    # window exposure unit is degenerate: every user touches every
    # channel in 30 days): v(S) = conversion rate of user-days whose
    # exposure set is EXACTLY S (8-coalition grid, densified, rates
    # as exact conv*1e9 div n integers; empty coalitions contribute
    # v=0), and with 3 channels every Shapley value is the exact
    # integer rational (2(v_c - v_0) + (v_ca - v_a) + (v_cb - v_b)
    # + 2(v_abc - v_ab)) / 6 (half-up snapped to an exact 9dp value
    # before the output round — num/6e9 can land on a round-half
    # boundary).  The efficiency identity sum phi = v(111) - v(000)
    # is an exact INTEGER identity (sum num = 6(v111 - v000)), emitted
    # as the self-check.
    oracle="""
    WITH u AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS he,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    cells AS (
      SELECT hv, hc, he, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS cv
      FROM u GROUP BY 1, 2, 3
    ),
    grid AS (
      SELECT g.hv, g.hc, g.he,
             COALESCE((cells.cv * 1000000000) // cells.n, 0) AS v9
      FROM (SELECT a.x AS hv, b.x AS hc, c.x AS he
            FROM (VALUES (0), (1)) a(x)
            CROSS JOIN (VALUES (0), (1)) b(x)
            CROSS JOIN (VALUES (0), (1)) c(x)) g
      LEFT JOIN cells ON cells.hv = g.hv AND cells.hc = g.hc
                     AND cells.he = g.he
    ),
    p AS (
      SELECT
        MAX(CASE WHEN hv = 0 AND hc = 0 AND he = 0 THEN v9 END) AS v000,
        MAX(CASE WHEN hv = 1 AND hc = 0 AND he = 0 THEN v9 END) AS v100,
        MAX(CASE WHEN hv = 0 AND hc = 1 AND he = 0 THEN v9 END) AS v010,
        MAX(CASE WHEN hv = 0 AND hc = 0 AND he = 1 THEN v9 END) AS v001,
        MAX(CASE WHEN hv = 1 AND hc = 1 AND he = 0 THEN v9 END) AS v110,
        MAX(CASE WHEN hv = 1 AND hc = 0 AND he = 1 THEN v9 END) AS v101,
        MAX(CASE WHEN hv = 0 AND hc = 1 AND he = 1 THEN v9 END) AS v011,
        MAX(CASE WHEN hv = 1 AND hc = 1 AND he = 1 THEN v9 END) AS v111
      FROM grid
    ),
    phi AS (
      SELECT 'view' AS channel,
             2 * (v100 - v000) + (v110 - v010) + (v101 - v001)
             + 2 * (v111 - v011) AS num
      FROM p
      UNION ALL
      SELECT 'click',
             2 * (v010 - v000) + (v110 - v100) + (v011 - v001)
             + 2 * (v111 - v101)
      FROM p
      UNION ALL
      SELECT 'error',
             2 * (v001 - v000) + (v101 - v100) + (v011 - v010)
             + 2 * (v111 - v110)
      FROM p
    )
    SELECT phi.channel,
           round(CAST(floor(phi.num / 6.0 + 0.5) AS BIGINT) / 1e9, 9)
             AS shapley_value,
           round(((SELECT SUM(num) FROM phi) - 6 * (p.v111 - p.v000)) / 6e9, 9)
             AS efficiency_gap
    FROM phi CROSS JOIN p ORDER BY phi.channel
    """,
)


def _dshapley(spark, sf_dir):
    """Exact 3-channel Shapley attribution off the 8-coalition grid."""
    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("hv"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("hc"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("he"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    cells = u.groupBy("hv", "hc", "he").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("cv"),
    )
    gr = spark.createDataFrame(
        [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)],
        "hv int, hc int, he int",
    )
    grid = gr.join(cells, ["hv", "hc", "he"], "left").select(
        "hv",
        "hc",
        "he",
        F.coalesce(F.expr("(cv * 1000000000) div n"), F.lit(0)).alias("v9"),
    )

    def v(a, b, c):
        return F.max(
            F.when(
                (F.col("hv") == a) & (F.col("hc") == b) & (F.col("he") == c),
                F.col("v9"),
            )
        )

    p = grid.agg(
        v(0, 0, 0).alias("v000"),
        v(1, 0, 0).alias("v100"),
        v(0, 1, 0).alias("v010"),
        v(0, 0, 1).alias("v001"),
        v(1, 1, 0).alias("v110"),
        v(1, 0, 1).alias("v101"),
        v(0, 1, 1).alias("v011"),
        v(1, 1, 1).alias("v111"),
    ).localCheckpoint(eager=False)
    nums = {
        "view": (
            2 * (F.col("v100") - F.col("v000"))
            + (F.col("v110") - F.col("v010"))
            + (F.col("v101") - F.col("v001"))
            + 2 * (F.col("v111") - F.col("v011"))
        ),
        "click": (
            2 * (F.col("v010") - F.col("v000"))
            + (F.col("v110") - F.col("v100"))
            + (F.col("v011") - F.col("v001"))
            + 2 * (F.col("v111") - F.col("v101"))
        ),
        "error": (
            2 * (F.col("v001") - F.col("v000"))
            + (F.col("v101") - F.col("v100"))
            + (F.col("v011") - F.col("v010"))
            + 2 * (F.col("v111") - F.col("v110"))
        ),
    }
    phi = None
    for ch, num in nums.items():
        row = p.select(
            F.lit(ch).alias("channel"),
            num.cast("long").alias("num"),
            ((F.col("v111") - F.col("v000"))).cast("long").alias("eff9"),
        )
        phi = row if phi is None else phi.unionByName(row)
    tot = phi.agg(F.sum("num").cast("long").alias("snum"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(
                F.floor(F.col("num") / F.lit(6.0) + F.lit(0.5)).cast("long")
                / F.lit(1e9),
                9,
            ).alias("shapley_value"),
            F.round(
                (F.col("snum") - 6 * F.col("eff9")) / F.lit(6e9), 9
            ).alias("efficiency_gap"),
        )
        .orderBy("channel")
    )


CATALOG["cust_shapley_channel_attribution"].fn = _dshapley
