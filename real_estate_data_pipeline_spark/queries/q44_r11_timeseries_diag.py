"""Split from queries.py lines 29578-30048 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t

# ===========================================================================
# round-11 wave 2: the time-series diagnostics tier — STL-lite
# decomposition, the Ljung-Box/ACF/PACF portmanteau, seasonal
# Mann-Kendall, and Grubbs' outlier test. Exact-integer renditions of
# the four checks every forecasting pipeline runs before it trusts a
# series.
# ===========================================================================

register(
    "evt_stl_decomposition_hourly",
    # STL-lite: trend = centered 25-hour moving average over the hourly
    # revenue series (rows-frame, exact cents sums), seasonal = per
    # hour-of-day mean of the detrended series, remainder = the rest.
    # Every stage quantizes to exact micro-dollars BEFORE its
    # cross-row reduction, and the seasonal-strength gauge
    # 1 - SS_remainder/SS_detrended is a ratio of exact wide-integer
    # sums — decomposition whose three components re-add exactly.
    oracle="""
    WITH obs AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT h, cents,
             CAST(floor(CAST(SUM(cents) OVER w AS DOUBLE) * 10000
                        / COUNT(*) OVER w + 0.5) AS BIGINT) AS trend6
      FROM obs
      WINDOW w AS (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS MATERIALIZED (
      SELECT h, CAST(date_part('hour', h) AS BIGINT) AS hod,
             cents * 10000 - trend6 AS detr6
      FROM tr
    ),
    seas AS MATERIALIZED (
      SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(floor(CAST(SUM(detr6) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS s6
      FROM det GROUP BY hod
    ),
    rem AS (
      SELECT d.hod, d.detr6, d.detr6 - s.s6 AS r6
      FROM det d JOIN seas s USING (hod)
    ),
    strength AS (
      SELECT round(GREATEST(0.0,
                 1.0 - CAST(SUM(CAST(r6 AS HUGEINT) * r6) AS DOUBLE)
                       / CAST(SUM(CAST(detr6 AS HUGEINT) * detr6) AS DOUBLE)), 6)
                 AS seasonal_strength
      FROM rem
    ),
    remagg AS (
      SELECT hod, CAST(floor(CAST(SUM(abs(r6)) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
                 AS mar6
      FROM rem GROUP BY hod
    )
    SELECT s.hod, s.n_hours,
           round(s.s6 / 1000000.0, 6) AS seasonal,
           round(ra.mar6 / 1000000.0, 6) AS mean_abs_remainder,
           st.seasonal_strength
    FROM seas s JOIN remagg ra USING (hod) CROSS JOIN strength st
    ORDER BY s.hod
    """,
)


def _dstl(spark, sf_dir):
    """STL-lite in three bounded stages: one hourly rollup, one
    25-row centered rows-window (global but over the hour-bucket
    aggregate — ~1 row per wall-clock hour at ANY data scale), one
    24-group seasonal aggregate; the strength gauge reuses the same
    detrended frame. All reductions integer-exact."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("h").rowsBetween(-12, 12)
    tr = obs.select(
        "h",
        "cents",
        F.floor(
            F.sum("cents").over(w).cast("double") * 10000 / F.count("*").over(w) + 0.5
        )
        .cast("long")
        .alias("trend6"),
    )
    det = tr.select(
        "h",
        F.hour("h").cast("long").alias("hod"),
        (F.col("cents") * 10000 - F.col("trend6")).alias("detr6"),
    ).localCheckpoint(eager=False)
    seas = (
        det.groupBy("hod")
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.floor(F.sum("detr6").cast("double") / F.count("*") + 0.5)
            .cast("long")
            .alias("s6"),
        )
        .localCheckpoint(eager=False)
    )
    d19 = "decimal(19,0)"
    rem = det.join(F.broadcast(seas.select("hod", "s6")), "hod").select(
        "hod", "detr6", (F.col("detr6") - F.col("s6")).alias("r6")
    ).localCheckpoint(eager=False)
    strength = rem.agg(
        F.round(
            F.greatest(
                F.lit(0.0),
                1.0
                - F.sum(F.col("r6").cast(d19) * F.col("r6").cast(d19)).cast("double")
                / F.sum(F.col("detr6").cast(d19) * F.col("detr6").cast(d19)).cast(
                    "double"
                ),
            ),
            6,
        ).alias("seasonal_strength")
    )
    remagg = rem.groupBy("hod").agg(
        F.floor(F.sum(F.abs(F.col("r6"))).cast("double") / F.count("*") + 0.5)
        .cast("long")
        .alias("mar6")
    )
    return (
        seas.join(remagg, "hod")
        .crossJoin(F.broadcast(strength))
        .select(
            "hod",
            "n_hours",
            F.round(F.col("s6") / 1e6, 6).alias("seasonal"),
            F.round(F.col("mar6") / 1e6, 6).alias("mean_abs_remainder"),
            "seasonal_strength",
        )
        .orderBy("hod")
    )


CATALOG["evt_stl_decomposition_hourly"].fn = _dstl

register(
    "evt_ljung_box_acf_pacf",
    # the portmanteau test: autocorrelations r1..r6 of the hourly
    # revenue series, the Durbin-Levinson second partial phi22, and
    # Ljung-Box Q(6). Centering never leaves integer space (y_t =
    # n*x_t - S is an exact scaled deviation, the n^2 factor cancels
    # in every ratio), each c_k is one wide-int lead-product sum, and
    # Q's six terms are summed in one FIXED left-to-right expression —
    # white-noise screening with zero float accumulation.
    oracle="""
    WITH obs AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
      FROM obs
    ),
    y AS (
      SELECT h, m.n * cents - m.s AS y,
             LEAD(m.n * cents - m.s, 1) OVER (ORDER BY h) AS y1,
             LEAD(m.n * cents - m.s, 2) OVER (ORDER BY h) AS y2,
             LEAD(m.n * cents - m.s, 3) OVER (ORDER BY h) AS y3,
             LEAD(m.n * cents - m.s, 4) OVER (ORDER BY h) AS y4,
             LEAD(m.n * cents - m.s, 5) OVER (ORDER BY h) AS y5,
             LEAD(m.n * cents - m.s, 6) OVER (ORDER BY h) AS y6
      FROM obs CROSS JOIN m
    ),
    c AS (
      SELECT SUM(CAST(y AS HUGEINT) * y) AS c0,
             SUM(CASE WHEN y1 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y1 END) AS c1,
             SUM(CASE WHEN y2 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y2 END) AS c2,
             SUM(CASE WHEN y3 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y3 END) AS c3,
             SUM(CASE WHEN y4 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y4 END) AS c4,
             SUM(CASE WHEN y5 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y5 END) AS c5,
             SUM(CASE WHEN y6 IS NULL THEN 0 ELSE CAST(y AS HUGEINT) * y6 END) AS c6
      FROM y
    )
    SELECT m.n AS n_hours,
           round(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r1,
           round(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r2,
           round(CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r3,
           round(CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r4,
           round(CAST(c5 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r5,
           round(CAST(c6 AS DOUBLE) / CAST(c0 AS DOUBLE), 6) AS r6,
           round((CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE)
                  - (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))
                    * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)))
                 / (1.0 - (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))
                          * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))), 6) AS pacf2,
           round(m.n * (m.n + 2.0)
                 * ((CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))
                    * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 1)
                    + (CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE))
                      * (CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 2)
                    + (CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE))
                      * (CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 3)
                    + (CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE))
                      * (CAST(c4 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 4)
                    + (CAST(c5 AS DOUBLE) / CAST(c0 AS DOUBLE))
                      * (CAST(c5 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 5)
                    + (CAST(c6 AS DOUBLE) / CAST(c0 AS DOUBLE))
                      * (CAST(c6 AS DOUBLE) / CAST(c0 AS DOUBLE)) / (m.n - 6)), 6)
               AS ljung_box_q6
    FROM c CROSS JOIN m
    """,
)


def _dljungbox(spark, sf_dir):
    """Ljung-Box over the hourly aggregate: one 1-row moment scalar,
    one six-lead window pass over the hour-bucket frame, one wide-int
    product aggregate — the ACF panel at rollup cost. The lead
    products deliberately skip the k tail rows of each lag (standard
    n-k term numerator over the full-series denominator)."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    m = obs.agg(
        F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("s")
    ).localCheckpoint(eager=False)
    wl = Window.orderBy("h")
    ycol = (F.col("n") * F.col("cents") - F.col("s")).alias("y")
    y = obs.crossJoin(F.broadcast(m.select("n", "s"))).select(
        "h",
        ycol,
        *[
            F.lead(F.col("n") * F.col("cents") - F.col("s"), k).over(wl).alias(f"y{k}")
            for k in range(1, 7)
        ],
    )
    d19 = "decimal(19,0)"
    c = y.agg(
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19)).alias("c0"),
        *[
            F.sum(
                F.when(F.col(f"y{k}").isNull(), F.lit(0).cast(d19)).otherwise(
                    F.col("y").cast(d19) * F.col(f"y{k}").cast(d19)
                )
            ).alias(f"c{k}")
            for k in range(1, 7)
        ],
    )
    out = c.crossJoin(F.broadcast(m.select("n")))
    rk = {
        k: F.col(f"c{k}").cast("double") / F.col("c0").cast("double") for k in range(1, 7)
    }
    q = F.lit(0.0)
    for k in range(1, 7):
        q = q + rk[k] * rk[k] / (F.col("n") - k)
    return out.select(
        F.col("n").alias("n_hours"),
        *[F.round(rk[k], 6).alias(f"r{k}") for k in range(1, 7)],
        F.round((rk[2] - rk[1] * rk[1]) / (1.0 - rk[1] * rk[1]), 6).alias("pacf2"),
        F.round(F.col("n") * (F.col("n") + 2.0) * q, 6).alias("ljung_box_q6"),
    )


CATALOG["evt_ljung_box_acf_pacf"].fn = _dljungbox

register(
    "evt_seasonal_mann_kendall",
    # seasonal Mann-Kendall: the MK S statistic computed WITHIN each
    # hour-of-day season of the daily revenue series, then pooled
    # (Hirsch-Slack). Removing the diurnal cycle from the trend test
    # is what makes it honest on operational data. S and the
    # tie-corrected variance numerators are pure integers (the /18
    # happens once, on the pooled total), and the pair space is
    # day-pairs within season — bounded by the calendar, not the data.
    oracle="""
    WITH d AS MATERIALIZED (
      SELECT CAST(date_part('hour', ts) AS BIGINT) AS hod, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT a.hod,
             CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS s_h
      FROM d a JOIN d b ON a.hod = b.hod AND a.day < b.day
      GROUP BY a.hod
    ),
    nh AS (
      SELECT hod, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY hod
    ),
    ties AS (
      SELECT hod, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
      FROM (SELECT hod, cents, CAST(COUNT(*) AS BIGINT) AS t
            FROM d GROUP BY hod, cents)
      GROUP BY hod
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_seasons,
             CAST(SUM(nh.n) AS BIGINT) AS n_points,
             CAST(SUM(s.s_h) AS BIGINT) AS s_total,
             CAST(SUM(nh.n * (nh.n - 1) * (2 * nh.n + 5) - COALESCE(t.tie18, 0))
                  AS BIGINT) AS var18
      FROM nh JOIN s USING (hod) LEFT JOIN ties t USING (hod)
    )
    SELECT n_seasons, n_points, s_total,
           round(var18 / 18.0, 6) AS var_s,
           round(CASE WHEN s_total > 0 THEN (s_total - 1) / sqrt(var18 / 18.0)
                      WHEN s_total < 0 THEN (s_total + 1) / sqrt(var18 / 18.0)
                      ELSE 0.0 END, 6) AS z,
           CASE WHEN s_total > 0 THEN 'increasing'
                WHEN s_total < 0 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM pooled
    """,
)


def _dseasonalmk(spark, sf_dir):
    """Seasonal MK: the (hod, day) frame self-joins ONLY within its
    season key (an equi-join whose pair space is day-pairs per season
    — calendar-bounded), tie masses come from one more GROUP BY, and
    the pooled Z is a single-row projection. The deseasonalized trend
    verdict at shuffle-join cost."""
    ev = t(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.hour("ts").cast("long").alias("hod"),
            F.to_date("ts").alias("day"),
        )
        .agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
        .localCheckpoint(eager=False)
    )
    a = d.select(F.col("hod"), F.col("day").alias("da"), F.col("cents").alias("ca"))
    b_ = d.select(F.col("hod"), F.col("day").alias("db"), F.col("cents").alias("cb"))
    s = (
        a.join(b_, "hod")
        .filter(F.col("da") < F.col("db"))
        .groupBy("hod")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_h")
        )
    )
    nh = d.groupBy("hod").agg(F.count("*").cast("long").alias("n"))
    ties = (
        d.groupBy("hod", "cents")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("hod")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie18")
        )
    )
    pooled = (
        nh.join(s, "hod")
        .join(ties, "hod", "left")
        .agg(
            F.count("*").cast("long").alias("n_seasons"),
            F.sum("n").cast("long").alias("n_points"),
            F.sum("s_h").cast("long").alias("s_total"),
            F.sum(
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie18"), F.lit(0))
            )
            .cast("long")
            .alias("var18"),
        )
    )
    zpos = (F.col("s_total") - 1) / F.sqrt(F.col("var18") / 18.0)
    zneg = (F.col("s_total") + 1) / F.sqrt(F.col("var18") / 18.0)
    return pooled.select(
        "n_seasons",
        "n_points",
        "s_total",
        F.round(F.col("var18") / 18.0, 6).alias("var_s"),
        F.round(
            F.when(F.col("s_total") > 0, zpos)
            .when(F.col("s_total") < 0, zneg)
            .otherwise(0.0),
            6,
        ).alias("z"),
        F.when(F.col("s_total") > 0, "increasing")
        .when(F.col("s_total") < 0, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


CATALOG["evt_seasonal_mann_kendall"].fn = _dseasonalmk

register(
    "evt_grubbs_outlier_daily",
    # Grubbs' test statistic for the daily revenue series: G =
    # max|x - mean| / s. The argmax rides the EXACT integer |n*x - S|
    # (scale factor n cancels), so the flagged day can never drift by
    # a float rounding; mean and s come from the same exact moments.
    # The single-outlier screen that runs before any robust fit.
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s1,
             SUM(CAST(cents AS HUGEINT) * cents) AS s2
      FROM d
    ),
    dev AS (
      SELECT d.day, abs(m.n * d.cents - m.s1) AS adev,
             ROW_NUMBER() OVER (ORDER BY abs(m.n * d.cents - m.s1) DESC, d.day) AS rn
      FROM d CROSS JOIN m
    )
    SELECT m.n AS n_days,
           round(CAST(m.s1 AS DOUBLE) / m.n / 100.0, 6) AS mean_daily,
           round(sqrt((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) / m.n)
                      / (m.n - 1)) / 100.0, 6) AS stddev_daily,
           round(CAST(dev.adev AS DOUBLE) / m.n
                 / sqrt((CAST(m.s2 AS DOUBLE) - CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE) / m.n)
                        / (m.n - 1)), 6) AS g_stat,
           strftime(dev.day, '%Y-%m-%d') AS outlier_day
    FROM dev CROSS JOIN m WHERE dev.rn = 1
    """,
)


def _dgrubbs(spark, sf_dir):
    """Grubbs: one daily rollup, one 1-row moment scalar, one integer
    argmax — the flagged day and G in a single projection."""
    ev = t(spark, sf_dir, "events")
    d19 = "decimal(19,0)"
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    m = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents").cast(d19) * F.col("cents").cast(d19)).alias("s2"),
    ).localCheckpoint(eager=False)
    dev = (
        d.crossJoin(F.broadcast(m.select("n", "s1")))
        .select(
            "day", F.abs(F.col("n") * F.col("cents") - F.col("s1")).alias("adev")
        )
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("adev"), "day"))
        )
        .filter(F.col("rn") == 1)
    )
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    return dev.crossJoin(F.broadcast(m)).select(
        F.col("n").alias("n_days"),
        F.round(F.col("s1").cast("double") / F.col("n") / 100.0, 6).alias("mean_daily"),
        F.round(sd / 100.0, 6).alias("stddev_daily"),
        F.round(F.col("adev").cast("double") / F.col("n") / sd, 6).alias("g_stat"),
        F.date_format("day", "yyyy-MM-dd").alias("outlier_day"),
    )


CATALOG["evt_grubbs_outlier_daily"].fn = _dgrubbs


