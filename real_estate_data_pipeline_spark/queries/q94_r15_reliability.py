"""Round-15 wave 14 (post-close): reliability / recurrent-event
analysis of the event stream — the mean cumulative function (MCF) of
recurrences per user by day, the scaled Total-Time-on-Test transform
at deciles of inter-event gaps, the discrete (day-granularity)
empirical hazard of gaps, the Duane reliability-growth slope at daily
checkpoints, and an inspection-paradox census (the length-biased
covering gap at the window midpoint vs the plain mean gap — the
ratio's excess over 1 is renewal theory's CV^2).

Exactness: all gaps are integer seconds (second-truncated epochs,
per-user consecutive diffs with event_id tie-break); the TTT
transform bands gaps to integer MINUTES so its order-statistic
machinery runs on a calendar-bounded (<= 43200-row) domain; hazard
and MCF are pure integer ratios; Duane fits the cleared quantized
regression of ln(T/N) on ln(T) over 30 daily checkpoints (ln at 6dp,
micro-integer pairs, decimal-38 moments).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t

# Shared per-user consecutive-gap CTE (integer seconds).
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
    gp AS (SELECT g FROM gaps WHERE g IS NOT NULL)"""


def _gaps(spark, sf_dir):
    """Integer-second per-user consecutive gaps."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
    )
    return (
        base.select((F.col("sec") - F.lag("sec").over(w)).alias("g"))
        .filter(F.col("g").isNotNull())
    )


register(
    "evt_mean_cumulative_function_daily",
    # MCF of recurrent events: cumulative events through day t over
    # the fixed user population — the Nelson-Aalen analogue for
    # recurrences when every unit is observed the whole window.
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT MIN(d) AS d0 FROM daily),
    u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM events),
    cum AS (
      SELECT CAST(date_diff('day', d0.d0, daily.d) AS BIGINT) AS day_offset,
             SUM(c) OVER (ORDER BY daily.d) AS ce
      FROM daily CROSS JOIN d0
    )
    SELECT day_offset, CAST(ce AS BIGINT) AS cum_events,
           round(CAST(ce AS DOUBLE) / u.nu, 6) AS mcf
    FROM cum CROSS JOIN u ORDER BY day_offset
    """,
)


def _dmcf(spark, sf_dir):
    """MCF over the 30-day daily aggregate."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    u = ev.agg(F.countDistinct("user_id").cast("long").alias("nu"))
    cum = (
        daily.crossJoin(F.broadcast(d0))
        .select(
            F.datediff(F.col("d").cast("date"), F.col("d0").cast("date"))
            .cast("long")
            .alias("day_offset"),
            F.col("d"),
            "c",
        )
        .select(
            "day_offset", F.sum("c").over(Window.orderBy("d")).alias("ce")
        )
    )
    return (
        cum.crossJoin(F.broadcast(u))
        .select(
            "day_offset",
            F.col("ce").cast("long").alias("cum_events"),
            F.round(F.col("ce").cast("double") / F.col("nu"), 6).alias("mcf"),
        )
        .orderBy("day_offset")
    )


CATALOG["evt_mean_cumulative_function_daily"].fn = _dmcf


register(
    "evt_ttt_transform_deciles",
    # Scaled Total-Time-on-Test transform at deciles of the minute-
    # banded inter-event gaps: TTT(r/n) = (sum_{i<=r} x_(i) +
    # (n-r) x_(r)) / sum x at r = ceil(k n / 10).  The partial order-
    # statistic sum comes from the bounded minute histogram (domain
    # <= 43200 by the 30-day calendar); everything integer until the
    # one division.  Concave-above-diagonal TTT = IFR-ish gaps.
    oracle=f"""
    WITH {_GAPS_CTE},
    gm AS (SELECT g // 60 AS v FROM gp),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM gm GROUP BY v),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(v * c) AS BIGINT) AS sx
          FROM h),
    cumh AS (
      SELECT v, c, SUM(c) OVER (ORDER BY v) AS cc,
             SUM(v * c) OVER (ORDER BY v) AS cvx
      FROM h
    ),
    ks(k) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)),
    cuts AS (
      SELECT k, (k * n.n + 9) // 10 AS r, n.n, n.sx FROM ks CROSS JOIN n
    ),
    pick AS (
      SELECT cuts.k, cuts.r, cuts.n, cuts.sx,
             MIN(cumh.v) AS vr
      FROM cuts JOIN cumh ON cumh.cc >= cuts.r
      GROUP BY 1, 2, 3, 4
    ),
    part AS (
      SELECT p.k, p.r, p.n, p.sx, p.vr,
             COALESCE((SELECT MAX(cvx) FROM cumh WHERE cumh.v < p.vr), 0)
               AS sum_below,
             COALESCE((SELECT MAX(cc) FROM cumh WHERE cumh.v < p.vr), 0)
               AS cnt_below
      FROM pick p
    )
    SELECT k AS decile, r AS rank_r, vr AS gap_minutes_at_r,
           round((CAST(sum_below AS DOUBLE) + vr * (r - cnt_below)
                  + CAST(n - r AS DOUBLE) * vr) / sx, 9) AS ttt_scaled
    FROM part ORDER BY k
    """,
)


def _dttt(spark, sf_dir):
    """Scaled TTT at deciles off the minute-band histogram."""
    gp = _gaps(spark, sf_dir)
    gm = gp.select(F.expr("g div 60").alias("v"))
    h = gm.groupBy("v").agg(F.count("*").cast("long").alias("c"))
    n = h.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("sx"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cumh = h.select(
        "v",
        "c",
        F.sum("c").over(wv).alias("cc"),
        F.sum(F.col("v") * F.col("c")).over(wv).alias("cvx"),
    ).localCheckpoint(eager=False)
    ks = spark.createDataFrame([(k,) for k in range(1, 10)], "k int")
    cuts = ks.crossJoin(F.broadcast(n)).select(
        "k", F.expr("(k * n + 9) div 10").alias("r"), "n", "sx"
    )
    pick = (
        cumh.crossJoin(F.broadcast(cuts))
        .filter(F.col("cc") >= F.col("r"))
        .groupBy("k", "r", "n", "sx")
        .agg(F.min("v").alias("vr"))
    )
    below = (
        cumh.crossJoin(F.broadcast(pick.select("k", "vr")))
        .filter(F.col("v") < F.col("vr"))
        .groupBy("k")
        .agg(F.max("cvx").alias("sum_below"), F.max("cc").alias("cnt_below"))
    )
    part = pick.join(F.broadcast(below), "k", "left").select(
        "k",
        "r",
        "n",
        "sx",
        "vr",
        F.coalesce(F.col("sum_below"), F.lit(0)).alias("sum_below"),
        F.coalesce(F.col("cnt_below"), F.lit(0)).alias("cnt_below"),
    )
    return part.select(
        F.col("k").alias("decile"),
        F.col("r").alias("rank_r"),
        F.col("vr").alias("gap_minutes_at_r"),
        F.round(
            (
                F.col("sum_below").cast("double")
                + F.col("vr") * (F.col("r") - F.col("cnt_below"))
                + (F.col("n") - F.col("r")).cast("double") * F.col("vr")
            )
            / F.col("sx"),
            9,
        ).alias("ttt_scaled"),
    ).orderBy("decile")


CATALOG["evt_ttt_transform_deciles"].fn = _dttt


register(
    "evt_discrete_hazard_days",
    # Discrete empirical hazard of inter-event gaps at day
    # granularity: h(d) = #(gap_days = d) / #(gap_days >= d) for
    # d = 0..7, with the at-risk and event counts — pure integer
    # ratios off the bounded day-band histogram.
    oracle=f"""
    WITH {_GAPS_CTE},
    gd AS (SELECT g // 86400 AS d FROM gp),
    h AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM gd GROUP BY d),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    cum AS (
      SELECT d, c, SUM(c) OVER (ORDER BY d) AS cc FROM h
    ),
    ks(d) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
    j AS (
      SELECT ks.d,
             COALESCE((SELECT c FROM h WHERE h.d = ks.d), 0) AS ev,
             n.n - COALESCE((SELECT MAX(cc) FROM cum WHERE cum.d < ks.d), 0)
               AS at_risk
      FROM ks CROSS JOIN n
    )
    SELECT d AS gap_days, CAST(ev AS BIGINT) AS n_events,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           round(CAST(ev AS DOUBLE) / NULLIF(at_risk, 0), 9) AS hazard
    FROM j ORDER BY d
    """,
)


def _dhazard(spark, sf_dir):
    """Discrete hazard over the day-band gap histogram."""
    gp = _gaps(spark, sf_dir)
    h = gp.select(F.expr("g div 86400").alias("d")).groupBy("d").agg(
        F.count("*").cast("long").alias("c")
    )
    n = h.agg(F.sum("c").cast("long").alias("n"))
    cum = h.select(
        "d", "c", F.sum("c").over(Window.orderBy("d")).alias("cc")
    ).localCheckpoint(eager=False)
    ks = spark.createDataFrame([(d,) for d in range(8)], "d long")
    ev = ks.join(cum.select("d", F.col("c").alias("ev")), "d", "left")
    below = (
        cum.crossJoin(F.broadcast(ks.select(F.col("d").alias("dk"))))
        .filter(F.col("d") < F.col("dk"))
        .groupBy("dk")
        .agg(F.max("cc").alias("cb"))
    )
    j = (
        ev.join(F.broadcast(below), ev["d"] == below["dk"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.coalesce(F.col("ev"), F.lit(0)).cast("long").alias("ev"),
            (F.col("n") - F.coalesce(F.col("cb"), F.lit(0))).cast("long").alias(
                "at_risk"
            ),
        )
    )
    return j.select(
        F.col("d").alias("gap_days"),
        F.col("ev").alias("n_events"),
        F.col("at_risk").alias("n_at_risk"),
        F.round(
            F.col("ev").cast("double") / F.nullif(F.col("at_risk"), F.lit(0)), 9
        ).alias("hazard"),
    ).orderBy("gap_days")


CATALOG["evt_discrete_hazard_days"].fn = _dhazard


register(
    "evt_duane_growth_daily",
    # Duane reliability-growth plot at daily checkpoints: cumulative
    # MTBF T/N vs T on log-log axes; the slope of ln(T/N) on ln(T)
    # over the 30 checkpoints (cleared quantized regression) is the
    # growth exponent alpha (0 = homogeneous Poisson).  T_d =
    # calendar seconds from the window start to the END of day d.
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    d0 AS (SELECT CAST(epoch(MIN(d)) AS BIGINT) AS t0 FROM daily),
    ck AS (
      SELECT CAST(epoch(d + INTERVAL 1 DAY) AS BIGINT) - d0.t0 AS tt,
             SUM(c) OVER (ORDER BY d) AS nn
      FROM daily CROSS JOIN d0
    ),
    q AS (
      SELECT CAST(floor(round(ln(CAST(tt AS DOUBLE)), 6) * 1000000 + 0.5)
               AS BIGINT) AS x6,
             CAST(floor(round(ln(CAST(tt AS DOUBLE) / nn), 6) * 1000000 + 0.5)
               AS BIGINT) AS y6
      FROM ck
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x6) AS HUGEINT) AS sx, CAST(SUM(y6) AS HUGEINT) AS sy,
             SUM(CAST(x6 AS HUGEINT) * x6) AS sxx,
             SUM(CAST(x6 AS HUGEINT) * y6) AS sxy
      FROM q
    )
    SELECT k AS n_checkpoints,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 9) AS duane_alpha
    FROM m
    """,
)


def _dduane(spark, sf_dir):
    """Duane slope over 30 daily (ln T, ln T/N) checkpoints."""
    d38 = "decimal(38,0)"
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").cast("long").alias("c")
    )
    d0 = daily.agg(
        F.unix_timestamp(F.min("d").cast("timestamp")).cast("long").alias("t0")
    )
    ck = daily.crossJoin(F.broadcast(d0)).select(
        (
            F.unix_timestamp(
                (F.col("d") + F.expr("INTERVAL 1 DAY")).cast("timestamp")
            ).cast("long")
            - F.col("t0")
        ).alias("tt"),
        F.col("d"),
        "c",
    ).select("tt", F.sum("c").over(Window.orderBy("d")).alias("nn"))
    i6 = lambda x: F.floor(F.round(x, 6) * F.lit(1000000) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    q = ck.select(
        i6(F.log(F.col("tt").cast("double"))).alias("x6"),
        i6(F.log(F.col("tt").cast("double") / F.col("nn"))).alias("y6"),
    )
    m = q.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("x6").cast(d38).alias("sx"),
        F.sum("y6").cast(d38).alias("sy"),
        F.sum(F.col("x6").cast(d38) * F.col("x6")).alias("sxx"),
        F.sum(F.col("x6").cast(d38) * F.col("y6")).alias("sxy"),
    )
    return m.select(
        F.col("k").alias("n_checkpoints"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
            9,
        ).alias("duane_alpha"),
    )


CATALOG["evt_duane_growth_daily"].fn = _dduane


register(
    "evt_inspection_paradox_census",
    # The inspection paradox, measured: at the window midpoint t*,
    # the gap COVERING t* (per user: last event <= t* to first event
    # > t*) is length-biased — renewal theory says E[covering] =
    # mu (1 + CV^2).  Reports the plain mean gap, the mean covering
    # gap, their ratio and the implied CV^2 = ratio - 1.  All integer
    # second sums.
    oracle=f"""
    WITH {_GAPS_CTE},
    bounds AS (
      SELECT (MIN(sec) + MAX(sec)) // 2 AS tstar FROM ev
    ),
    cover AS (
      SELECT user_id,
             MAX(CASE WHEN sec <= tstar THEN sec END) AS a,
             MIN(CASE WHEN sec > tstar THEN sec END) AS b
      FROM ev CROSS JOIN bounds GROUP BY user_id
    ),
    cg AS (
      SELECT b - a AS cgap FROM cover WHERE a IS NOT NULL AND b IS NOT NULL
    ),
    s AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gp) AS n_gaps,
             (SELECT CAST(SUM(g) AS BIGINT) FROM gp) AS sg,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cg) AS n_cov,
             (SELECT CAST(SUM(cgap) AS BIGINT) FROM cg) AS sc
    )
    SELECT n_gaps, n_cov,
           round(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
           round(CAST(sc AS DOUBLE) / n_cov, 6) AS mean_covering_gap_s,
           round((CAST(sc AS DOUBLE) / n_cov) / (CAST(sg AS DOUBLE) / n_gaps), 9)
             AS length_bias_ratio,
           round((CAST(sc AS DOUBLE) / n_cov) / (CAST(sg AS DOUBLE) / n_gaps) - 1,
                 9) AS implied_cv2
    FROM s
    """,
)


def _dinspection(spark, sf_dir):
    """Length-biased covering gap vs plain mean gap."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
        "event_id",
    ).localCheckpoint(eager=False)
    gp = (
        base.select(
            (
                F.col("sec")
                - F.lag("sec").over(
                    Window.partitionBy("user_id").orderBy("sec", "event_id")
                )
            ).alias("g")
        )
        .filter(F.col("g").isNotNull())
    )
    bounds = base.agg(
        F.expr("(min(sec) + max(sec)) div 2").alias("tstar")
    )
    cover = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("sec") <= F.col("tstar"), F.col("sec"))).alias("a"),
            F.min(F.when(F.col("sec") > F.col("tstar"), F.col("sec"))).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .select((F.col("b") - F.col("a")).alias("cgap"))
    )
    sg = gp.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
    )
    sc = cover.agg(
        F.count("*").cast("long").alias("n_cov"),
        F.sum("cgap").cast("long").alias("sc"),
    )
    s = sg.crossJoin(F.broadcast(sc))
    mg = F.col("sg").cast("double") / F.col("n_gaps")
    mc = F.col("sc").cast("double") / F.col("n_cov")
    return s.select(
        "n_gaps",
        "n_cov",
        F.round(mg, 6).alias("mean_gap_s"),
        F.round(mc, 6).alias("mean_covering_gap_s"),
        F.round(mc / mg, 9).alias("length_bias_ratio"),
        F.round(mc / mg - 1, 9).alias("implied_cv2"),
    )


CATALOG["evt_inspection_paradox_census"].fn = _dinspection
