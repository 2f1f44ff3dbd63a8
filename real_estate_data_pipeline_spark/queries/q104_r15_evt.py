"""Round-15 wave 24 (post-close): extreme-value tail diagnostics on
the inter-event gap distribution — the Hill tail-index estimator at
k = 100/200, Pickands' estimator from the k/2k/4k order statistics,
the Dekkers-Einmahl-de Haan moment estimator (valid for ALL tail
regimes, not just heavy), the mean-excess function at five snapped
percentile thresholds (GPD linearity check), and the max-to-sum
ratios for moments p = 1..4 (R_n -> 0 iff E[X^p] < infinity — the
cheapest heavy-tail screen there is).

Exactness: gaps are integer seconds; the top-k order-statistic frames
come from sort + LIMIT (TakeOrdered — bounded by construction, never
a global rank window); Hill/moment terms are 6dp micro-nat snapped
integers; mean-excess sums and max-to-sum p-th powers are exact
integers (p = 4 rides decimal-38); thresholds snap type-7 percentiles
to integer seconds (the wave-19 precedent).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

_GAPS_CTE = """ev AS (
      SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
             event_id
      FROM events
    ),
    gaps AS (
      SELECT sec - LAG(sec) OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS g
      FROM ev
    ),
    gp AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0)"""


def _gaps(spark, sf_dir):
    """Positive integer-second per-user consecutive gaps."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
    )
    return (
        base.select((F.col("sec") - F.lag("sec").over(w)).alias("g"))
        .filter(F.col("g").isNotNull() & (F.col("g") > 0))
    )


register(
    "evt_hill_estimator_gaps",
    # The Hill estimator of the tail index at k = 100 and k = 200:
    # H_k = (1/k) sum_{i<=k} ln(x_(i) / x_(k+1)) over the descending
    # order statistics (top-401 via LIMIT — bounded), each ln term
    # 6dp micro-nat snapped before the integer sum; the implied
    # Pareto alpha = 1/H is emitted alongside.
    oracle=f"""
    WITH {_GAPS_CTE},
    topk AS (
      SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
      FROM (SELECT g FROM gp ORDER BY g DESC LIMIT 401) t
    ),
    ks(k) AS (VALUES (100), (200)),
    ref AS (
      SELECT ks.k, topk.g AS xk1 FROM ks JOIN topk ON topk.rn = ks.k + 1
    ),
    terms AS (
      SELECT ref.k,
             CAST(floor(round(ln(CAST(topk.g AS DOUBLE) / ref.xk1), 6)
                        * 1000000 + 0.5) AS BIGINT) AS l6
      FROM ref JOIN topk ON topk.rn <= ref.k
    )
    SELECT k, CAST(k AS BIGINT) AS n_top,
           round(CAST(SUM(l6) AS DOUBLE) / k / 1e6, 9) AS hill_gamma,
           round(CAST(k AS DOUBLE) * 1e6 / SUM(l6), 6) AS implied_alpha
    FROM terms GROUP BY k ORDER BY k
    """,
)


def _dhill(spark, sf_dir):
    """Hill gamma at k = 100/200 off the top-401 LIMIT frame."""
    gp = _gaps(spark, sf_dir)
    topk = (
        gp.orderBy(F.col("g").desc())
        .limit(401)
        .select("g", F.row_number().over(Window.orderBy(F.col("g").desc())).alias("rn"))
        .localCheckpoint(eager=False)
    )
    ks = spark.createDataFrame([(100,), (200,)], "k long")
    ref = ks.join(
        F.broadcast(topk.select(F.col("rn").alias("rk"), F.col("g").alias("xk1"))),
        F.col("rk") == F.col("k") + 1,
    ).select("k", "xk1")
    terms = topk.crossJoin(F.broadcast(ref)).filter(
        F.col("rn") <= F.col("k")
    ).select(
        "k",
        F.floor(
            F.round(F.log(F.col("g").cast("double") / F.col("xk1")), 6)
            * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("l6"),
    )
    return (
        terms.groupBy("k")
        .agg(F.sum("l6").cast("long").alias("sl6"))
        .select(
            "k",
            F.col("k").cast("long").alias("n_top"),
            F.round(F.col("sl6").cast("double") / F.col("k") / F.lit(1e6), 9).alias(
                "hill_gamma"
            ),
            F.round(
                F.col("k").cast("double") * F.lit(1e6) / F.col("sl6"), 6
            ).alias("implied_alpha"),
        )
        .orderBy("k")
    )


CATALOG["evt_hill_estimator_gaps"].fn = _dhill


register(
    "evt_pickands_dedh_estimators",
    # Pickands' estimator ln((x_k - x_2k)/(x_2k - x_4k)) / ln 2 at
    # k = 100 (three order statistics off the bounded top-400 frame)
    # and the Dekkers-Einmahl-de Haan moment estimator gamma_M =
    # M1 + 1 - 0.5/(1 - M1^2/M2) at k = 200 (micro-nat first and
    # second log-excess moments) — the estimators that stay valid
    # when the tail is NOT heavy (gamma <= 0), unlike Hill.
    oracle=f"""
    WITH {_GAPS_CTE},
    topk AS (
      SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
      FROM (SELECT g FROM gp ORDER BY g DESC LIMIT 401) t
    ),
    pick AS (
      SELECT
        (SELECT g FROM topk WHERE rn = 100) AS xk,
        (SELECT g FROM topk WHERE rn = 200) AS x2k,
        (SELECT g FROM topk WHERE rn = 400) AS x4k,
        (SELECT g FROM topk WHERE rn = 201) AS xref
    ),
    terms AS (
      SELECT CAST(floor(round(ln(CAST(topk.g AS DOUBLE) / pick.xref), 6)
                        * 1000000 + 0.5) AS BIGINT) AS l6
      FROM topk CROSS JOIN pick WHERE topk.rn <= 200
    ),
    mm AS (
      SELECT CAST(SUM(l6) AS BIGINT) AS s1,
             CAST(SUM(CAST(l6 AS HUGEINT) * l6) AS HUGEINT) AS s2
      FROM terms
    )
    SELECT round(ln(CAST(pick.xk - pick.x2k AS DOUBLE)
                   / (pick.x2k - pick.x4k)) / ln(2.0), 9)
             AS pickands_gamma,
           round(CAST(mm.s1 AS DOUBLE) / 200 / 1e6, 9) AS m1,
           round(CAST(mm.s2 AS DOUBLE) / 200 / 1e12, 9) AS m2,
           round(CAST(mm.s1 AS DOUBLE) / 200 / 1e6 + 1
                 - 0.5 / (1 - (CAST(mm.s1 AS DOUBLE) / 200 / 1e6)
                              * (CAST(mm.s1 AS DOUBLE) / 200 / 1e6)
                              / (CAST(mm.s2 AS DOUBLE) / 200 / 1e12)), 9)
             AS dedh_gamma
    FROM pick CROSS JOIN mm
    """,
)


def _dpickands(spark, sf_dir):
    """Pickands + DEdH moment estimators off the top-401 frame."""
    d38 = "decimal(38,0)"
    gp = _gaps(spark, sf_dir)
    topk = (
        gp.orderBy(F.col("g").desc())
        .limit(401)
        .select(
            "g", F.row_number().over(Window.orderBy(F.col("g").desc())).alias("rn")
        )
        .localCheckpoint(eager=False)
    )

    def at(r):
        return F.max(F.when(F.col("rn") == r, F.col("g")))

    pick = topk.agg(
        at(100).alias("xk"),
        at(200).alias("x2k"),
        at(400).alias("x4k"),
        at(201).alias("xref"),
    )
    terms = (
        topk.crossJoin(F.broadcast(pick))
        .filter(F.col("rn") <= 200)
        .select(
            F.floor(
                F.round(F.log(F.col("g").cast("double") / F.col("xref")), 6)
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("l6")
        )
    )
    mm = terms.agg(
        F.sum("l6").cast("long").alias("s1"),
        F.sum(F.col("l6").cast(d38) * F.col("l6")).alias("s2"),
    )
    m1 = F.col("s1").cast("double") / 200 / F.lit(1e6)
    m2 = F.col("s2").cast("double") / 200 / F.lit(1e12)
    return pick.crossJoin(F.broadcast(mm)).select(
        F.round(
            F.log(
                (F.col("xk") - F.col("x2k")).cast("double")
                / (F.col("x2k") - F.col("x4k"))
            )
            / F.log(F.lit(2.0)),
            9,
        ).alias("pickands_gamma"),
        F.round(m1, 9).alias("m1"),
        F.round(m2, 9).alias("m2"),
        F.round(m1 + 1 - 0.5 / (1 - m1 * m1 / m2), 9).alias("dedh_gamma"),
    )


CATALOG["evt_pickands_dedh_estimators"].fn = _dpickands


register(
    "evt_mean_excess_thresholds",
    # The mean-excess function e(u) = E[X - u | X > u] at the snapped
    # 50/75/90/95/99th percentile thresholds — linear-in-u means GPD
    # (the graphical threshold-selection check behind every POT fit),
    # with the exceedance counts.  Exact integer excess sums.
    oracle=f"""
    WITH {_GAPS_CTE},
    qa AS (
      SELECT CAST(floor(quantile_cont(g, 0.50) + 0.5) AS BIGINT) AS u50,
             CAST(floor(quantile_cont(g, 0.75) + 0.5) AS BIGINT) AS u75,
             CAST(floor(quantile_cont(g, 0.90) + 0.5) AS BIGINT) AS u90,
             CAST(floor(quantile_cont(g, 0.95) + 0.5) AS BIGINT) AS u95,
             CAST(floor(quantile_cont(g, 0.99) + 0.5) AS BIGINT) AS u99
      FROM gp
    ),
    ls(lvl) AS (VALUES (50), (75), (90), (95), (99)),
    th AS (
      SELECT ls.lvl,
             CASE ls.lvl WHEN 50 THEN u50 WHEN 75 THEN u75 WHEN 90 THEN u90
                         WHEN 95 THEN u95 ELSE u99 END AS u
      FROM ls CROSS JOIN qa
    ),
    ex AS (
      SELECT th.lvl, th.u,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(gp.g - th.u) AS BIGINT) AS s
      FROM th JOIN gp ON gp.g > th.u
      GROUP BY th.lvl, th.u
    )
    SELECT lvl AS pct_threshold, u AS threshold_s, k AS n_exceed,
           round(CAST(s AS DOUBLE) / k, 6) AS mean_excess_s
    FROM ex ORDER BY lvl
    """,
)


def _dmeanexcess(spark, sf_dir):
    """Mean excess at five snapped percentile thresholds."""
    gp = _gaps(spark, sf_dir).localCheckpoint(eager=False)
    qa = gp.agg(
        *[
            F.floor(F.percentile("g", q) + 0.5).cast("long").alias(f"u{lvl}")
            for lvl, q in ((50, 0.50), (75, 0.75), (90, 0.90), (95, 0.95), (99, 0.99))
        ]
    )
    ls = spark.createDataFrame([(x,) for x in (50, 75, 90, 95, 99)], "lvl long")
    th = ls.crossJoin(F.broadcast(qa)).select(
        "lvl",
        F.when(F.col("lvl") == 50, F.col("u50"))
        .when(F.col("lvl") == 75, F.col("u75"))
        .when(F.col("lvl") == 90, F.col("u90"))
        .when(F.col("lvl") == 95, F.col("u95"))
        .otherwise(F.col("u99"))
        .alias("u"),
    )
    ex = (
        gp.crossJoin(F.broadcast(th))
        .filter(F.col("g") > F.col("u"))
        .groupBy("lvl", "u")
        .agg(
            F.count("*").cast("long").alias("k"),
            F.sum(F.col("g") - F.col("u")).cast("long").alias("s"),
        )
    )
    return ex.select(
        F.col("lvl").alias("pct_threshold"),
        F.col("u").alias("threshold_s"),
        F.col("k").alias("n_exceed"),
        F.round(F.col("s").cast("double") / F.col("k"), 6).alias("mean_excess_s"),
    ).orderBy("pct_threshold")


CATALOG["evt_mean_excess_thresholds"].fn = _dmeanexcess


register(
    "evt_max_to_sum_ratios",
    # Max-to-sum ratios R(p) = max(X^p) / sum(X^p) for p = 1..4: if
    # E[X^p] is finite R(p) -> 0 as n grows; a ratio stuck near 1
    # says the p-th moment does not exist — the one-aggregate
    # heavy-tail screen.  Exact integer powers (p = 3, 4 ride
    # decimal-38).
    oracle=f"""
    WITH {_GAPS_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(g) AS BIGINT) AS mx,
             CAST(SUM(g) AS HUGEINT) AS s1,
             CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS s2,
             CAST(SUM(CAST(g AS HUGEINT) * g * g) AS HUGEINT) AS s3,
             CAST(SUM(CAST(g AS HUGEINT) * g * g * g) AS HUGEINT) AS s4
      FROM gp
    )
    SELECT n AS n_gaps, mx AS max_gap_s,
           round(CAST(mx AS DOUBLE) / CAST(s1 AS DOUBLE), 9) AS r1,
           round(CAST(mx AS DOUBLE) * mx / CAST(s2 AS DOUBLE), 9) AS r2,
           round(CAST(mx AS DOUBLE) * mx * mx / CAST(s3 AS DOUBLE), 9) AS r3,
           round(CAST(mx AS DOUBLE) * mx * mx * mx / CAST(s4 AS DOUBLE), 9)
             AS r4
    FROM m
    """,
)


def _dmaxsum(spark, sf_dir):
    """Max-to-sum moment-existence screen for p = 1..4."""
    d38 = "decimal(38,0)"
    gp = _gaps(spark, sf_dir)
    g = F.col("g")
    m = gp.agg(
        F.count("*").cast("long").alias("n"),
        F.max("g").cast("long").alias("mx"),
        F.sum(g.cast(d38)).alias("s1"),
        F.sum(g.cast(d38) * g).alias("s2"),
        F.sum(g.cast(d38) * g * g).alias("s3"),
        F.sum(g.cast(d38) * g * g * g).alias("s4"),
    )
    mx = F.col("mx").cast("double")
    return m.select(
        F.col("n").alias("n_gaps"),
        F.col("mx").alias("max_gap_s"),
        F.round(mx / F.col("s1").cast("double"), 9).alias("r1"),
        F.round(mx * F.col("mx") / F.col("s2").cast("double"), 9).alias("r2"),
        F.round(
            mx * F.col("mx") * F.col("mx") / F.col("s3").cast("double"), 9
        ).alias("r3"),
        F.round(
            mx * F.col("mx") * F.col("mx") * F.col("mx")
            / F.col("s4").cast("double"),
            9,
        ).alias("r4"),
    )


CATALOG["evt_max_to_sum_ratios"].fn = _dmaxsum


register(
    "evt_hill_plot_stability",
    # The Hill "plot" summarized: gamma_k at k = 50/100/150/200/250
    # off one bounded top-251 frame — the stability-across-k readout
    # an analyst eyeballs before trusting any single Hill number,
    # with the relative spread (max-min)/median of the five.
    oracle=f"""
    WITH {_GAPS_CTE},
    topk AS (
      SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
      FROM (SELECT g FROM gp ORDER BY g DESC LIMIT 251) t
    ),
    ks(k) AS (VALUES (50), (100), (150), (200), (250)),
    ref AS (
      SELECT ks.k, topk.g AS xk1 FROM ks JOIN topk ON topk.rn = ks.k + 1
    ),
    terms AS (
      SELECT ref.k,
             CAST(floor(round(ln(CAST(topk.g AS DOUBLE) / ref.xk1), 6)
                        * 1000000 + 0.5) AS BIGINT) AS l6
      FROM ref JOIN topk ON topk.rn <= ref.k
    ),
    gam AS (
      SELECT k, CAST(SUM(l6) AS BIGINT) AS sl6,
             CAST(floor(CAST(SUM(l6) AS DOUBLE) / k + 0.5) AS BIGINT) AS g6
      FROM terms GROUP BY k
    ),
    sp AS (
      SELECT CAST(MAX(g6) AS BIGINT) AS gmax, CAST(MIN(g6) AS BIGINT) AS gmin,
             CAST(2 * quantile_cont(g6, 0.5) AS BIGINT) AS gmed2
      FROM gam
    )
    SELECT gam.k, round(gam.g6 / 1e6, 6) AS hill_gamma_k,
           round(CAST(sp.gmax - sp.gmin AS DOUBLE) * 2 / sp.gmed2, 9)
             AS rel_spread
    FROM gam CROSS JOIN sp ORDER BY gam.k
    """,
)


def _dhillplot(spark, sf_dir):
    """Hill stability across k = 50..250 with the relative spread."""
    gp = _gaps(spark, sf_dir)
    topk = (
        gp.orderBy(F.col("g").desc())
        .limit(251)
        .select(
            "g", F.row_number().over(Window.orderBy(F.col("g").desc())).alias("rn")
        )
        .localCheckpoint(eager=False)
    )
    ks = spark.createDataFrame([(x,) for x in (50, 100, 150, 200, 250)], "k long")
    ref = ks.join(
        F.broadcast(topk.select(F.col("rn").alias("rk"), F.col("g").alias("xk1"))),
        F.col("rk") == F.col("k") + 1,
    ).select("k", "xk1")
    terms = (
        topk.crossJoin(F.broadcast(ref))
        .filter(F.col("rn") <= F.col("k"))
        .select(
            "k",
            F.floor(
                F.round(F.log(F.col("g").cast("double") / F.col("xk1")), 6)
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("l6"),
        )
    )
    gam = terms.groupBy("k").agg(
        F.floor(F.sum("l6").cast("double") / F.col("k") + F.lit(0.5))
        .cast("long")
        .alias("g6")
    ).localCheckpoint(eager=False)
    sp = gam.agg(
        F.max("g6").cast("long").alias("gmax"),
        F.min("g6").cast("long").alias("gmin"),
        (2 * F.percentile("g6", 0.5)).cast("long").alias("gmed2"),
    )
    return gam.crossJoin(F.broadcast(sp)).select(
        "k",
        F.round(F.col("g6") / F.lit(1e6), 6).alias("hill_gamma_k"),
        F.round(
            (F.col("gmax") - F.col("gmin")).cast("double") * 2 / F.col("gmed2"), 9
        ).alias("rel_spread"),
    ).orderBy("k")


CATALOG["evt_hill_plot_stability"].fn = _dhillplot
