"""Round-15 wave 28 (post-close): monitoring + anomaly III — HBOS
(histogram-based outlier scores) over three per-customer order
features with snapped decile bins, the STL-style seasonal/trend
strength of the daily order series (weekday seasonality over a Cramer
trend), Cochran's C + Hartley's F_max variance-homogeneity screens
across the weekday groups, sample entropy SampEn(m=2, r) of the
densified hourly event counts (template matching on the
calendar-bounded 720-row frame), and the month-end/quarter-end
calendar lift of order volume.

Exactness: HBOS bins come from snapped type-7 percentile cuts with
9-comparison bin ids and ln(count) micro-nats (scores are integer
sums); detrended residuals micro-quantize before every variance
(cleared integer moments); SampEn's tolerance r snaps to an integer
count (floor(0.2 sd + 0.5)) so template matches are pure integer
comparisons; calendar flags are exact date arithmetic
(month(d + 3 days) <> month(d)).
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t


register(
    "cust_hbos_outlier_scores",
    # HBOS: per-customer (order count, revenue, avg order value),
    # each binned by its own snapped decile cuts (bin id = sum of
    # 9 threshold comparisons), score = sum_f ln(N / n_bin_f) in
    # exact micro-nats — the histogram outlier detector that runs at
    # GROUP-BY cost; top-10 customers by score, custkey tie-break.
    oracle="""
    WITH cy AS MATERIALIZED (
      SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS x1,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS x2,
             (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS BIGINT))
               // CAST(COUNT(*) AS BIGINT) AS x3
      FROM orders GROUP BY o_custkey
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cy),
    cuts0 AS (
      SELECT
        quantile_cont(x1, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q1,
        quantile_cont(x2, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q2,
        quantile_cont(x3, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q3
      FROM cy
    ),
    cuts AS (
      SELECT [CAST(floor(q + 0.5) AS BIGINT) FOR q IN q1] AS c1,
             [CAST(floor(q + 0.5) AS BIGINT) FOR q IN q2] AS c2,
             [CAST(floor(q + 0.5) AS BIGINT) FOR q IN q3] AS c3
      FROM cuts0
    ),
    binned AS (
      SELECT cy.ck, cy.x1, cy.x2, cy.x3,
             CAST(len(list_filter(cuts.c1, c -> cy.x1 > c)) AS BIGINT) AS b1,
             CAST(len(list_filter(cuts.c2, c -> cy.x2 > c)) AS BIGINT) AS b2,
             CAST(len(list_filter(cuts.c3, c -> cy.x3 > c)) AS BIGINT) AS b3
      FROM cy CROSS JOIN cuts
    ),
    h1 AS (SELECT b1, CAST(COUNT(*) AS BIGINT) AS n1 FROM binned GROUP BY b1),
    h2 AS (SELECT b2, CAST(COUNT(*) AS BIGINT) AS n2 FROM binned GROUP BY b2),
    h3 AS (SELECT b3, CAST(COUNT(*) AS BIGINT) AS n3 FROM binned GROUP BY b3),
    scored AS (
      SELECT binned.ck, binned.b1, binned.b2, binned.b3,
             (CAST(floor(round(ln(CAST(n.n AS DOUBLE)), 6) * 1000000 + 0.5)
                AS BIGINT) * 3)
             - CAST(floor(round(ln(CAST(h1.n1 AS DOUBLE)), 6) * 1000000 + 0.5)
                 AS BIGINT)
             - CAST(floor(round(ln(CAST(h2.n2 AS DOUBLE)), 6) * 1000000 + 0.5)
                 AS BIGINT)
             - CAST(floor(round(ln(CAST(h3.n3 AS DOUBLE)), 6) * 1000000 + 0.5)
                 AS BIGINT) AS s6
      FROM binned
      JOIN h1 USING (b1) JOIN h2 USING (b2) JOIN h3 USING (b3)
      CROSS JOIN n
    )
    SELECT ck AS custkey, b1 AS bin_count, b2 AS bin_revenue,
           b3 AS bin_avg_value, round(s6 / 1e6, 6) AS hbos_score
    FROM scored ORDER BY s6 DESC, ck LIMIT 10
    """,
)


def _dhbos(spark, sf_dir):
    """HBOS top-10 off snapped decile bins."""
    o = t(spark, sf_dir, "orders")
    cy = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count("*").cast("long").alias("x1"),
        F.sum((F.col("o_totalprice").cast(DEC) * 100).cast("long"))
        .cast("long")
        .alias("x2"),
    ).select(
        "ck", "x1", "x2", F.expr("x2 div x1").alias("x3")
    ).localCheckpoint(eager=False)
    n = cy.agg(F.count("*").cast("long").alias("n"))
    qs = [k / 10.0 for k in range(1, 10)]
    cuts = cy.agg(
        *[
            F.floor(F.percentile("x1", q) + 0.5).cast("long").alias(f"c1_{i}")
            for i, q in enumerate(qs)
        ],
        *[
            F.floor(F.percentile("x2", q) + 0.5).cast("long").alias(f"c2_{i}")
            for i, q in enumerate(qs)
        ],
        *[
            F.floor(F.percentile("x3", q) + 0.5).cast("long").alias(f"c3_{i}")
            for i, q in enumerate(qs)
        ],
    )

    def binexpr(x, pref):
        e = F.lit(0)
        for i in range(9):
            e = e + F.when(F.col(x) > F.col(f"{pref}_{i}"), 1).otherwise(0)
        return e.cast("long")

    binned = cy.crossJoin(F.broadcast(cuts)).select(
        "ck",
        "x1",
        "x2",
        "x3",
        binexpr("x1", "c1").alias("b1"),
        binexpr("x2", "c2").alias("b2"),
        binexpr("x3", "c3").alias("b3"),
    ).localCheckpoint(eager=False)
    h1 = binned.groupBy("b1").agg(F.count("*").cast("long").alias("n1"))
    h2 = binned.groupBy("b2").agg(F.count("*").cast("long").alias("n2"))
    h3 = binned.groupBy("b3").agg(F.count("*").cast("long").alias("n3"))
    l6 = lambda c: F.floor(  # noqa: E731
        F.round(F.log(c.cast("double")), 6) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    scored = (
        binned.join(F.broadcast(h1), "b1")
        .join(F.broadcast(h2), "b2")
        .join(F.broadcast(h3), "b3")
        .crossJoin(F.broadcast(n))
        .select(
            "ck",
            "b1",
            "b2",
            "b3",
            (
                l6(F.col("n")) * 3
                - l6(F.col("n1"))
                - l6(F.col("n2"))
                - l6(F.col("n3"))
            ).alias("s6"),
        )
    )
    return (
        scored.orderBy(F.col("s6").desc(), "ck")
        .limit(10)
        .select(
            F.col("ck").alias("custkey"),
            F.col("b1").alias("bin_count"),
            F.col("b2").alias("bin_revenue"),
            F.col("b3").alias("bin_avg_value"),
            F.round(F.col("s6") / F.lit(1e6), 6).alias("hbos_score"),
        )
    )


CATALOG["cust_hbos_outlier_scores"].fn = _dhbos


# Daily order counts with the day index and weekday.
_DAILY_CTE = """d AS (
      SELECT CAST(o_orderdate AS DATE) AS dy, CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    d0 AS (SELECT MIN(dy) AS d0 FROM d),
    p AS (
      SELECT CAST(date_diff('day', d0.d0, d.dy) AS BIGINT) AS x, d.y,
             CAST(isodow(d.dy) AS BIGINT) AS wd
      FROM d CROSS JOIN d0
    )"""


def _daily(spark, sf_dir):
    """(day index, count, ISO weekday) over the order calendar."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("dy")).agg(
        F.count("*").cast("long").alias("y")
    )
    d0 = d.agg(F.min("dy").alias("d0"))
    return d.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dy"), F.col("d0")).cast("long").alias("x"),
        "y",
        # Spark dayofweek: 1=Sunday..7=Saturday; ISO dow = ((dow+5)%7)+1
        (((F.dayofweek("dy") + 5) % 7) + 1).cast("long").alias("wd"),
    ).localCheckpoint(eager=False)


register(
    "orders_seasonal_strength_weekday",
    # STL-style strength-of-components on the daily order series:
    # Cramer trend T, weekday seasonal S of the micro-quantized
    # detrended values, remainder R — F_seasonal = max(0,
    # 1 - Var(R)/Var(detrended)) and F_trend = max(0,
    # 1 - Var(R)/Var(deseasonalized)), the pair a forecaster reads
    # before choosing a model family.  All variances from cleared
    # integer micro moments.
    oracle=f"""
    WITH {_DAILY_CTE},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM p
    ),
    det AS (
      SELECT p.x, p.wd,
             CAST(floor((p.y
                         - ((CAST(m.sy AS DOUBLE)
                             - CAST(m.k * m.sxy - m.sx * m.sy AS DOUBLE)
                               / CAST(m.k * m.sxx
                                      - CAST(m.sx AS HUGEINT) * m.sx
                                      AS DOUBLE) * m.sx) / m.k
                            + CAST(m.k * m.sxy - m.sx * m.sy AS DOUBLE)
                              / CAST(m.k * m.sxx
                                     - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE)
                              * p.x))
                        * 1e6 + 0.5) AS BIGINT) AS d6,
             p.y
      FROM p CROSS JOIN m
    ),
    s AS (
      SELECT wd,
             CAST(floor(CAST(SUM(d6) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
               AS s6
      FROM det GROUP BY wd
    ),
    r AS (
      SELECT det.d6, det.d6 - s.s6 AS r6, det.y * 1000000 - s.s6 AS e6
      FROM det JOIN s ON s.wd = det.wd
    ),
    v AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(d6) AS HUGEINT) AS sd, CAST(SUM(CAST(d6 AS HUGEINT)
               * d6) AS HUGEINT) AS sd2,
             CAST(SUM(r6) AS HUGEINT) AS sr, CAST(SUM(CAST(r6 AS HUGEINT)
               * r6) AS HUGEINT) AS sr2,
             CAST(SUM(e6) AS HUGEINT) AS se, CAST(SUM(CAST(e6 AS HUGEINT)
               * e6) AS HUGEINT) AS se2
      FROM r
    )
    SELECT k AS n_days,
           round(GREATEST(0, 1 - CAST(k * sr2 - sr * sr AS DOUBLE)
                                 / CAST(k * sd2 - sd * sd AS DOUBLE)), 9)
             AS f_seasonal,
           round(GREATEST(0, 1 - CAST(k * sr2 - sr * sr AS DOUBLE)
                                 / CAST(k * se2 - se * se AS DOUBLE)), 9)
             AS f_trend,
           round(CAST(k * sr2 - sr * sr AS DOUBLE)
                 / (CAST(k AS DOUBLE) * (k - 1)) / 1e12, 6) AS var_remainder
    FROM v
    """,
)


def _dseasstrength(spark, sf_dir):
    """F_seasonal / F_trend from cleared micro-moment variances."""
    d38 = "decimal(38,0)"
    p = _daily(spark, sf_dir)
    m = p.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y")).alias("sxy"),
    )
    b = (F.col("k") * F.col("sxy") - F.col("sx").cast(d38) * F.col("sy")).cast(
        "double"
    ) / (F.col("k") * F.col("sxx") - F.col("sx").cast(d38) * F.col("sx")).cast(
        "double"
    )
    a = (F.col("sy").cast("double") - b * F.col("sx")) / F.col("k")
    det = p.crossJoin(F.broadcast(m)).select(
        "wd",
        "y",
        F.floor((F.col("y") - (a + b * F.col("x"))) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("d6"),
    ).localCheckpoint(eager=False)
    s = det.groupBy(F.col("wd").alias("wd2")).agg(
        F.floor(F.sum("d6").cast("double") / F.count("*") + F.lit(0.5))
        .cast("long")
        .alias("s6")
    )
    r = det.join(F.broadcast(s), F.col("wd") == F.col("wd2")).select(
        "d6",
        (F.col("d6") - F.col("s6")).alias("r6"),
        (F.col("y") * 1000000 - F.col("s6")).alias("e6"),
    )
    v = r.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("d6").cast(d38).alias("sd"),
        F.sum(F.col("d6").cast(d38) * F.col("d6")).alias("sd2"),
        F.sum("r6").cast(d38).alias("sr"),
        F.sum(F.col("r6").cast(d38) * F.col("r6")).alias("sr2"),
        F.sum("e6").cast(d38).alias("se"),
        F.sum(F.col("e6").cast(d38) * F.col("e6")).alias("se2"),
    )
    vr = (F.col("k") * F.col("sr2") - F.col("sr") * F.col("sr")).cast("double")
    vd = (F.col("k") * F.col("sd2") - F.col("sd") * F.col("sd")).cast("double")
    ve = (F.col("k") * F.col("se2") - F.col("se") * F.col("se")).cast("double")
    return v.select(
        F.col("k").alias("n_days"),
        F.round(F.greatest(F.lit(0), 1 - vr / vd), 9).alias("f_seasonal"),
        F.round(F.greatest(F.lit(0), 1 - vr / ve), 9).alias("f_trend"),
        F.round(
            vr / (F.col("k").cast("double") * (F.col("k") - 1)) / F.lit(1e12), 6
        ).alias("var_remainder"),
    )


CATALOG["orders_seasonal_strength_weekday"].fn = _dseasstrength


register(
    "orders_cochran_hartley_variance",
    # The quick variance-homogeneity screens across the 7 weekday
    # groups of daily order counts: Cochran's C = max var / sum vars
    # and Hartley's F_max = max var / min var, with the offending
    # weekdays — the 10-second check before any pooled-variance
    # model.  Cleared integer group variances, nano-quantized once.
    oracle=f"""
    WITH {_DAILY_CTE},
    g AS (
      SELECT wd, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS HUGEINT) AS s2
      FROM p GROUP BY wd
    ),
    v AS (
      SELECT wd,
             CAST(floor(CAST(k * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                        / (CAST(k AS DOUBLE) * (k - 1)) * 1e9 + 0.5)
               AS BIGINT) AS v9
      FROM g
    ),
    agg AS (
      SELECT CAST(MAX(v9) AS BIGINT) AS vmax, CAST(MIN(v9) AS BIGINT) AS vmin,
             CAST(SUM(v9) AS BIGINT) AS vsum
      FROM v
    )
    SELECT round(CAST(agg.vmax AS DOUBLE) / agg.vsum, 9) AS cochran_c,
           round(CAST(agg.vmax AS DOUBLE) / agg.vmin, 9) AS hartley_fmax,
           (SELECT MAX(wd) FROM v WHERE v9 = agg.vmax) AS max_var_weekday,
           (SELECT MAX(wd) FROM v WHERE v9 = agg.vmin) AS min_var_weekday
    FROM agg
    """,
)


def _dcochranc(spark, sf_dir):
    """Cochran's C + Hartley F_max across weekday variances."""
    d38 = "decimal(38,0)"
    p = _daily(spark, sf_dir)
    g = p.groupBy("wd").agg(
        F.count("*").cast("long").alias("k"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("s2"),
    )
    v = g.select(
        "wd",
        F.floor(
            (F.col("k") * F.col("s2") - F.col("s").cast(d38) * F.col("s")).cast(
                "double"
            )
            / (F.col("k").cast("double") * (F.col("k") - 1))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v9"),
    ).localCheckpoint(eager=False)
    agg = v.agg(
        F.max("v9").cast("long").alias("vmax"),
        F.min("v9").cast("long").alias("vmin"),
        F.sum("v9").cast("long").alias("vsum"),
    )
    out = v.crossJoin(F.broadcast(agg))
    return out.agg(
        F.round(
            F.first(F.col("vmax").cast("double") / F.col("vsum")), 9
        ).alias("cochran_c"),
        F.round(
            F.first(F.col("vmax").cast("double") / F.col("vmin")), 9
        ).alias("hartley_fmax"),
        F.max(F.when(F.col("v9") == F.col("vmax"), F.col("wd"))).alias(
            "max_var_weekday"
        ),
        F.max(F.when(F.col("v9") == F.col("vmin"), F.col("wd"))).alias(
            "min_var_weekday"
        ),
    )


CATALOG["orders_cochran_hartley_variance"].fn = _dcochranc


register(
    "evt_sample_entropy_hourly",
    # Sample entropy SampEn(m=2, r) of the densified hourly event
    # counts: r snaps to the integer floor(0.2 sd + 0.5) so template
    # matches are pure integer Chebyshev comparisons over the
    # calendar-bounded (<=718-row) template frame; SampEn =
    # -ln(A/B) with A/B the exact 3-/2-template match-pair counts —
    # the regularity gauge (low = predictable rhythm).
    oracle="""
    WITH ev AS (
      SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec FROM events
    ),
    cal AS (
      SELECT CAST(epoch(date_trunc('day', MIN(ts))) AS BIGINT) AS t0,
             CAST(date_diff('day', date_trunc('day', MIN(ts)),
                            date_trunc('day', MAX(ts))) + 1 AS BIGINT) AS nd
      FROM events
    ),
    hc AS (
      SELECT (sec - t0) // 3600 AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM ev CROSS JOIN cal GROUP BY 1
    ),
    bins AS (
      SELECT unnest(generate_series(0, cal.nd * 24 - 1)) AS b FROM cal
    ),
    dense AS (
      SELECT bins.b, COALESCE(hc.c, 0) AS c
      FROM bins LEFT JOIN hc ON hc.h = bins.b
    ),
    sd AS (
      SELECT CAST(floor(0.2 * sqrt(CAST(COUNT(*) * SUM(CAST(c AS HUGEINT) * c)
                                        - CAST(SUM(c) AS HUGEINT) * SUM(c)
                                        AS DOUBLE)
                                   / (CAST(COUNT(*) AS DOUBLE)
                                      * (COUNT(*) - 1))) + 0.5) AS BIGINT) AS r
      FROM dense
    ),
    tpl AS (
      SELECT b, c AS x1,
             LEAD(c, 1) OVER (ORDER BY b) AS x2,
             LEAD(c, 2) OVER (ORDER BY b) AS x3
      FROM dense
    ),
    t3 AS (SELECT b, x1, x2, x3 FROM tpl WHERE x3 IS NOT NULL),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN ABS(a.x1 - c.x1) <= sd.r
                            AND ABS(a.x2 - c.x2) <= sd.r
                           THEN 1 ELSE 0 END) AS BIGINT) AS bb,
             CAST(SUM(CASE WHEN ABS(a.x1 - c.x1) <= sd.r
                            AND ABS(a.x2 - c.x2) <= sd.r
                            AND ABS(a.x3 - c.x3) <= sd.r
                           THEN 1 ELSE 0 END) AS BIGINT) AS aa
      FROM t3 a JOIN t3 c ON c.b > a.b CROSS JOIN sd
    )
    SELECT sd.r AS tolerance, pairs.bb AS n_matches_m2,
           pairs.aa AS n_matches_m3,
           CASE WHEN pairs.aa > 0
                THEN round(-ln(CAST(pairs.aa AS DOUBLE) / pairs.bb), 6)
           END AS sample_entropy
    FROM pairs CROSS JOIN sd
    """,
)


def _dsampen(spark, sf_dir):
    """SampEn(2, r) over the bounded hourly template frame."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec")
    )
    cal = ev.agg(
        F.unix_timestamp(F.date_trunc("day", F.min("ts")).cast("timestamp"))
        .cast("long")
        .alias("t0"),
        (
            F.datediff(
                F.date_trunc("day", F.max("ts")).cast("date"),
                F.date_trunc("day", F.min("ts")).cast("date"),
            )
            + 1
        )
        .cast("long")
        .alias("nd"),
    )
    hc = (
        base.crossJoin(F.broadcast(cal))
        .select(F.expr("(sec - t0) div 3600").alias("h"))
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("c"))
    )
    bins = cal.select(
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("nd") * 24 - 1)
        ).alias("b")
    )
    dense = bins.join(hc, F.col("b") == F.col("h"), "left").select(
        "b", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    ).localCheckpoint(eager=False)
    sd = dense.agg(
        F.floor(
            0.2
            * F.sqrt(
                (
                    F.count("*") * F.sum(F.col("c").cast(d38) * F.col("c"))
                    - F.sum("c").cast(d38) * F.sum("c")
                ).cast("double")
                / (F.count("*").cast("double") * (F.count("*") - 1))
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("r")
    )
    w = Window.orderBy("b")
    t3 = dense.select(
        "b",
        F.col("c").alias("x1"),
        F.lead("c", 1).over(w).alias("x2"),
        F.lead("c", 2).over(w).alias("x3"),
    ).filter(F.col("x3").isNotNull()).localCheckpoint(eager=False)
    cjoin = t3.select(
        F.col("b").alias("b2"),
        F.col("x1").alias("y1"),
        F.col("x2").alias("y2"),
        F.col("x3").alias("y3"),
    )
    pairs = (
        t3.join(F.broadcast(cjoin), F.col("b2") > F.col("b"))
        .crossJoin(F.broadcast(sd))
        .agg(
            F.sum(
                F.when(
                    (F.abs(F.col("x1") - F.col("y1")) <= F.col("r"))
                    & (F.abs(F.col("x2") - F.col("y2")) <= F.col("r")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("bb"),
            F.sum(
                F.when(
                    (F.abs(F.col("x1") - F.col("y1")) <= F.col("r"))
                    & (F.abs(F.col("x2") - F.col("y2")) <= F.col("r"))
                    & (F.abs(F.col("x3") - F.col("y3")) <= F.col("r")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("aa"),
        )
    )
    return pairs.crossJoin(F.broadcast(sd)).select(
        F.col("r").alias("tolerance"),
        F.col("bb").alias("n_matches_m2"),
        F.col("aa").alias("n_matches_m3"),
        F.when(
            F.col("aa") > 0,
            F.round(-F.log(F.col("aa").cast("double") / F.col("bb")), 6),
        ).alias("sample_entropy"),
    )


CATALOG["evt_sample_entropy_hourly"].fn = _dsampen


register(
    "orders_calendar_edge_effects",
    # Month-end and quarter-end calendar lifts of daily order volume:
    # a day is an edge day iff month(d + 3 days) <> month(d) (exact
    # date arithmetic, both engines), quarter edges restrict to
    # Mar/Jun/Sep/Dec — mean edge-day volume vs the rest with the
    # lift ratios, all exact integer sums.
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS dy, CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    f AS (
      SELECT y,
             CASE WHEN EXTRACT(month FROM dy + INTERVAL 3 DAY)
                       <> EXTRACT(month FROM dy) THEN 1 ELSE 0 END AS me,
             CASE WHEN EXTRACT(month FROM dy + INTERVAL 3 DAY)
                       <> EXTRACT(month FROM dy)
                   AND EXTRACT(month FROM dy) IN (3, 6, 9, 12)
                  THEN 1 ELSE 0 END AS qe
      FROM d
    ),
    agg AS (
      SELECT CAST(SUM(me) AS BIGINT) AS nme,
             CAST(SUM(CASE WHEN me = 1 THEN y ELSE 0 END) AS BIGINT) AS sme,
             CAST(SUM(1 - me) AS BIGINT) AS nrest,
             CAST(SUM(CASE WHEN me = 0 THEN y ELSE 0 END) AS BIGINT) AS srest,
             CAST(SUM(qe) AS BIGINT) AS nqe,
             CAST(SUM(CASE WHEN qe = 1 THEN y ELSE 0 END) AS BIGINT) AS sqe
      FROM f
    )
    SELECT nme AS n_month_end_days, nqe AS n_quarter_end_days,
           round(CAST(sme AS DOUBLE) / nme, 6) AS mean_month_end,
           round(CAST(srest AS DOUBLE) / nrest, 6) AS mean_rest,
           round((CAST(sme AS DOUBLE) / nme)
                 / (CAST(srest AS DOUBLE) / nrest), 9) AS month_end_lift,
           round((CAST(sqe AS DOUBLE) / nqe)
                 / (CAST(srest AS DOUBLE) / nrest), 9) AS quarter_end_lift
    FROM agg
    """,
)


def _dcalendar(spark, sf_dir):
    """Month-/quarter-end volume lifts via exact date arithmetic."""
    o = t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("dy")).agg(
        F.count("*").cast("long").alias("y")
    )
    me = F.when(
        F.month(F.date_add(F.col("dy"), 3)) != F.month(F.col("dy")), 1
    ).otherwise(0)
    qe = F.when(
        (F.month(F.date_add(F.col("dy"), 3)) != F.month(F.col("dy")))
        & F.month(F.col("dy")).isin(3, 6, 9, 12),
        1,
    ).otherwise(0)
    f = d.select("y", me.alias("me"), qe.alias("qe"))
    agg = f.agg(
        F.sum("me").cast("long").alias("nme"),
        F.sum(F.when(F.col("me") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sme"),
        F.sum(1 - F.col("me")).cast("long").alias("nrest"),
        F.sum(F.when(F.col("me") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("srest"),
        F.sum("qe").cast("long").alias("nqe"),
        F.sum(F.when(F.col("qe") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sqe"),
    )
    m_me = F.col("sme").cast("double") / F.col("nme")
    m_rest = F.col("srest").cast("double") / F.col("nrest")
    m_qe = F.col("sqe").cast("double") / F.col("nqe")
    return agg.select(
        F.col("nme").alias("n_month_end_days"),
        F.col("nqe").alias("n_quarter_end_days"),
        F.round(m_me, 6).alias("mean_month_end"),
        F.round(m_rest, 6).alias("mean_rest"),
        F.round(m_me / m_rest, 9).alias("month_end_lift"),
        F.round(m_qe / m_rest, 9).alias("quarter_end_lift"),
    )


CATALOG["orders_calendar_edge_effects"].fn = _dcalendar
