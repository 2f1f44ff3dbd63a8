"""Split from queries.py lines 11698-12286 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, t
from .q15_curation_r3 import _HOURLY_TYPE_CENTS_CTE, _hourly_type_cents

# ===========================================================================
# round-7 additions: time-series decomposition / behavioral analytics
# ===========================================================================

register(
    "evt_dow_seasonal_profile",
    # day-of-week seasonality of hourly event value (the profile a
    # capacity planner subtracts before alerting): hourly totals ride as
    # exact BIGINT cents, the per-dow and overall means are single
    # divisions of exact integers, and the seasonal index is one more
    # identical-IEEE division, rounded to 6 dp.
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    prof AS (
      SELECT CAST(extract(dow FROM h) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM hourly GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(sum_cents) AS BIGINT) AS t,
             CAST(SUM(n_hours) AS BIGINT) AS n
      FROM prof
    )
    SELECT dow, n_hours,
           CAST(sum_cents AS DOUBLE) / (100.0 * n_hours) AS mean_hourly_value,
           round((CAST(sum_cents AS DOUBLE) / n_hours)
                 / (CAST(t AS DOUBLE) / n), 6) AS seasonal_index
    FROM prof, tot
    ORDER BY dow
    """,
)


def _ddowprofile(spark, sf_dir):
    """Day-of-week seasonal profile of hourly totals: two tiny
    aggregates (hour buckets, then dow) plus a 1-row broadcast of the
    overall mean — the index a deseasonalizer divides by. DuckDB's
    extract(dow) is Sunday=0; Spark's dayofweek is Sunday=1, hence -1."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    prof = hourly.groupBy(
        (F.dayofweek("h") - 1).cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    tot = prof.agg(
        F.sum("sum_cents").cast("long").alias("__t"),
        F.sum("n_hours").cast("long").alias("__n"),
    )
    return (
        prof.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_hours",
            (F.col("sum_cents").cast("double") / (F.lit(100.0) * F.col("n_hours")))
            .alias("mean_hourly_value"),
            F.round(
                (F.col("sum_cents").cast("double") / F.col("n_hours"))
                / (F.col("__t").cast("double") / F.col("__n")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


CATALOG["evt_dow_seasonal_profile"].fn = _ddowprofile


def _ewma_terms(col: str, win: str, taps: int = 8, alpha: float = 0.25):
    """Shared numerator/denominator expression text for the truncated
    EWMA: ``taps`` exponential weights over a bounded lag fan-out. The
    SAME generated strings parse in Spark SQL and DuckDB, so the
    left-to-right float addition order is identical by construction."""
    num, den = [], []
    for j in range(taps):
        w = repr((1.0 - alpha) ** j)
        cur = (
            f"CAST({col} AS DOUBLE)"
            if j == 0
            else f"COALESCE(CAST(lag({col}, {j}) OVER {win} AS DOUBLE), 0.0)"
        )
        num.append(f"{cur} * {w}")
        guard = (
            w
            if j == 0
            else f"(CASE WHEN lag({col}, {j}) OVER {win} IS NULL THEN 0.0 ELSE {w} END)"
        )
        den.append(guard)
    return " + ".join(num), " + ".join(den)


_EWMA_WIN = "(PARTITION BY event_type ORDER BY h)"
_EWMA_NUM, _EWMA_DEN = _ewma_terms("cents", _EWMA_WIN)

register(
    "evt_ewma_hourly",
    # 8-tap truncated EWMA (alpha=0.25) of hourly totals per event_type:
    # the recursive filter unrolled into a bounded lag fan-out so it is
    # a pure windowed expression — weights are identical float literals
    # on both engines and the additions run in identical written order
    # over exact BIGINT cents, so the 6-dp round is bit-stable.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE}
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           CAST(cents AS DOUBLE) / 100.0 AS total_value,
           round((({_EWMA_NUM}) / ({_EWMA_DEN})) / 100.0, 6) AS ewma8
    FROM obs
    ORDER BY event_type, h
    """,
)


def _dewma(spark, sf_dir):
    """Truncated exponentially-weighted moving average per event_type:
    EWMA's recursion is hostile to both engines' windowing, so the
    standard scale-out shape is the 8-tap unrolled filter — one
    partitioned window, no self-join, each output row touching a
    bounded O(taps) neighborhood. At 100 TB this is a single shuffle by
    event_type with linear work."""
    obs = _hourly_type_cents(spark, sf_dir)
    return (
        obs.select(
            "event_type",
            "h",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            (F.col("cents").cast("double") / F.lit(100.0)).alias("total_value"),
            F.expr(f"round((({_EWMA_NUM}) / ({_EWMA_DEN})) / 100.0, 6)").alias("ewma8"),
        )
        .orderBy("event_type", "h")
        .drop("h")
    )


CATALOG["evt_ewma_hourly"].fn = _dewma

register(
    "evt_autocorr_lags",
    # autocorrelation of the global hourly-total series at lags 1-3 (the
    # self-similarity probe behind seasonality detection): all five
    # moment sums are exact BIGINT accumulations of cents products; the
    # Pearson assembly converts each exact integer to double and runs
    # the identical expression on both engines, rounded to 6 dp.
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT cents AS x,
             lag(cents, 1) OVER (ORDER BY h) AS y1,
             lag(cents, 2) OVER (ORDER BY h) AS y2,
             lag(cents, 3) OVER (ORDER BY h) AS y3
      FROM hourly
    ),
    m AS (
      SELECT 1 AS lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y1) AS BIGINT) AS sy,
             CAST(SUM(x * y1) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y1 * y1) AS BIGINT) AS syy
      FROM lagged WHERE y1 IS NOT NULL
      UNION ALL
      SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(x) AS BIGINT),
             CAST(SUM(y2) AS BIGINT), CAST(SUM(x * y2) AS BIGINT),
             CAST(SUM(x * x) AS BIGINT), CAST(SUM(y2 * y2) AS BIGINT)
      FROM lagged WHERE y2 IS NOT NULL
      UNION ALL
      SELECT 3, CAST(COUNT(*) AS BIGINT), CAST(SUM(x) AS BIGINT),
             CAST(SUM(y3) AS BIGINT), CAST(SUM(x * y3) AS BIGINT),
             CAST(SUM(x * x) AS BIGINT), CAST(SUM(y3 * y3) AS BIGINT)
      FROM lagged WHERE y3 IS NOT NULL
    )
    SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
    FROM m
    ORDER BY lag
    """,
)


def _dautocorr(spark, sf_dir):
    """ACF at lags 1-3 of the global hourly series: ONE ordered window
    produces all three lag columns, then three exact-integer moment
    aggregates union into the 3-row result. The global window is
    bounded by the hour-bucket cardinality (an aggregate output, ~720
    rows/month regardless of raw volume), which is the
    _GLOBAL_WINDOW_AGG_BOUNDED_OK shape."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        F.col("cents").alias("x"),
        *[F.lag("cents", j).over(w).alias(f"y{j}") for j in (1, 2, 3)],
    )
    parts = []
    for j in (1, 2, 3):
        y = F.col(f"y{j}")
        parts.append(
            lagged.filter(y.isNotNull()).agg(
                F.lit(j).cast("long").alias("lag"),
                F.count("*").cast("long").alias("n_pairs"),
                F.sum("x").cast("long").alias("__sx"),
                F.sum(y).cast("long").alias("__sy"),
                F.sum(F.col("x") * y).cast("long").alias("__sxy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("__sxx"),
                F.sum(y * y).cast("long").alias("__syy"),
            )
        )
    m = parts[0].unionByName(parts[1]).unionByName(parts[2])
    n, sx, sy = [F.col(c).cast("double") for c in ("n_pairs", "__sx", "__sy")]
    sxy, sxx, syy = [F.col(c).cast("double") for c in ("__sxy", "__sxx", "__syy")]
    return m.select(
        "lag",
        "n_pairs",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("acf"),
    ).orderBy("lag")


CATALOG["evt_autocorr_lags"].fn = _dautocorr

register(
    "evt_seasonal_decompose_weekly",
    # classical decomposition, weekly period: trend = centered 7-day
    # moving average over daily cents (exact integers, single division,
    # complete frames only), residual = value - trend (identical IEEE),
    # seasonal component = per-dow mean of residuals summed as 6-dp
    # micro-unit BIGINTs so accumulation order can't matter.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT d, cents,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN CAST(SUM(cents) OVER w AS DOUBLE) / 7.0 END AS trend_cents
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    resid AS (
      SELECT CAST(extract(dow FROM d) AS BIGINT) AS dow,
             CAST(floor(round((CAST(cents AS DOUBLE) - trend_cents) / 100.0, 6)
                        * 1000000 + 0.5) AS BIGINT) AS rmicro
      FROM tr WHERE trend_cents IS NOT NULL
    )
    SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(CAST(SUM(rmicro) AS BIGINT) AS DOUBLE)
                 / (1000000.0 * COUNT(*)), 6) AS seasonal
    FROM resid GROUP BY dow
    ORDER BY dow
    """,
)


def _dseasonal(spark, sf_dir):
    """Weekly seasonal component of the daily value series via
    classical decomposition: one day-bucket aggregate, one centered
    rows-frame window (complete 7-day frames only, so edges don't bias
    the trend), residuals quantized to micro-units for an
    order-independent per-dow mean. The global window runs over the
    day-bucket aggregate (~30 rows/month) — agg-bounded."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        (F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d",
        "cents",
        F.when(
            F.count("*").over(w) == 7, F.sum("cents").over(w).cast("double") / 7.0
        ).alias("trend_cents"),
    )
    resid = tr.filter(F.col("trend_cents").isNotNull()).select(
        (F.dayofweek("d") - 1).cast("long").alias("dow"),
        F.floor(
            F.round((F.col("cents").cast("double") - F.col("trend_cents")) / 100.0, 6)
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rmicro"),
    )
    return (
        resid.groupBy("dow")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(
                F.sum("rmicro").cast("long").cast("double")
                / (F.lit(1000000.0) * F.count("*")),
                6,
            ).alias("seasonal"),
        )
        .orderBy("dow")
    )


CATALOG["evt_seasonal_decompose_weekly"].fn = _dseasonal

register(
    "evt_bounce_rate_daily",
    # single-event-session ("bounce") rate per day: sessions are the
    # standard 30-minute-inactivity-gap cumulative-flag windows per
    # user (second-truncated epochs, exact integers), bounce when the
    # session holds exactly one event; rate is one exact division.
    oracle="""
    WITH es AS (
      SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, sec, event_id,
             CASE WHEN sec - lag(sec) OVER w > 1800 OR lag(sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM es
      WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
      -- event_id tie-break on the running sum too: same-second rows
      -- must accumulate in the SAME order the flag window used, or a
      -- flagged row's sibling can land in the previous session
      SELECT user_id, sec,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sid, MIN(sec) AS start_sec, COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    -- make_timestamp is tz-free (epoch micros -> TIMESTAMP); the
    -- to_timestamp alternative yields TIMESTAMPTZ whose DATE cast
    -- follows DuckDB's session TimeZone, which is never pinned
    SELECT strftime(CAST(make_timestamp(start_sec * 1000000) AS DATE),
                    '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS sessions,
           CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS bounces,
           round(CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM per_sess
    GROUP BY 1 ORDER BY 1
    """,
)


def _dbounce(spark, sf_dir):
    """Daily bounce rate over gap-based sessions: the classic
    two-window sessionization (new-session flag, running sum) partitioned
    by user — both windows share one shuffle by user_id — then a
    per-session rollup and a per-day rate. Bounces (1-event sessions)
    are the engagement red flag the reference's analytics layer tracks."""
    ev = t(spark, sf_dir, "events")
    es = ev.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = es.select(
        "user_id",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 1800)
            | F.lag("sec").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        "event_id",
    )
    ws = Window.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = flagged.select(
        "user_id", "sec", F.sum("new_sess").over(ws).alias("sid")
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.min("sec").alias("start_sec"), F.count("*").alias("n_events")
    )
    bounces = F.count(F.when(F.col("n_events") == 1, 1))
    return (
        per_sess.groupBy(
            F.date_format(
                F.timestamp_seconds(F.col("start_sec")).cast("timestamp_ntz"),
                "yyyy-MM-dd",
            ).alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("sessions"),
            bounces.cast("long").alias("bounces"),
            F.round(bounces.cast("double") / F.count("*"), 6).alias("bounce_rate"),
        )
        .orderBy("day")
    )


CATALOG["evt_bounce_rate_daily"].fn = _dbounce

register(
    "evt_gap_percentiles_by_type",
    # inter-event-time distribution per event_type: consecutive gaps in
    # whole seconds (second-truncated epochs, exact BIGINTs), summarized
    # at p50/p90/p99 — DuckDB quantile_cont and Spark's exact percentile
    # share the same linear-interpolation definition over integers.
    oracle="""
    WITH es AS (
      SELECT event_type, event_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      FROM events
    ),
    gaps AS (
      SELECT event_type,
             sec - lag(sec) OVER (PARTITION BY event_type
                                  ORDER BY sec, event_id) AS gap_s
      FROM es
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap_s, 0.5) AS p50_s,
           quantile_cont(gap_s, 0.9) AS p90_s,
           quantile_cont(gap_s, 0.99) AS p99_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)


def _dgappct(spark, sf_dir):
    """Inter-arrival-time percentiles per event_type: one partitioned
    lag window (shuffle by type), one exact-percentile aggregate. The
    p99 gap is the metric behind dead-feed alerting; exact percentile
    (not approx) because the oracle must match bit-for-bit."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("sec", "event_id")
    gaps = ev.select(
        "event_type", "event_id", F.unix_timestamp("ts").alias("sec")
    ).select(
        "event_type", (F.col("sec") - F.lag("sec").over(w)).alias("gap_s")
    )
    return (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.percentile("gap_s", F.lit(0.5)).alias("p50_s"),
            F.percentile("gap_s", F.lit(0.9)).alias("p90_s"),
            F.percentile("gap_s", F.lit(0.99)).alias("p99_s"),
        )
        .orderBy("event_type")
    )


CATALOG["evt_gap_percentiles_by_type"].fn = _dgappct

register(
    "evt_peak_detection_hourly",
    # strict local maxima in the hourly series per event_type: a peak
    # beats both neighbors (boundary rows never qualify); prominence =
    # height above the taller neighbor. Everything is exact BIGINT
    # cents until the final /100 display division.
    oracle=f"""
    WITH {_HOURLY_TYPE_CENTS_CTE},
    nb AS (
      SELECT event_type, h, cents,
             lag(cents) OVER w AS prev_c, lead(cents) OVER w AS next_c
      FROM obs WINDOW w AS (PARTITION BY event_type ORDER BY h)
    )
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
           CAST(cents AS DOUBLE) / 100.0 AS peak_value,
           CAST(cents - greatest(prev_c, next_c) AS DOUBLE) / 100.0 AS prominence
    FROM nb
    WHERE cents > prev_c AND cents > next_c
    ORDER BY event_type, h
    """,
)


def _dpeaks(spark, sf_dir):
    """Local-maximum detection over hourly totals per event_type: one
    bucket aggregate + one lag/lead window — the O(n) peak finder that
    feeds spike triage. Strict inequalities drop plateaus and boundary
    buckets on both engines identically (NULL neighbors fail >)."""
    obs = _hourly_type_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("h")
    nb = obs.select(
        "event_type",
        "h",
        "cents",
        F.lag("cents").over(w).alias("prev_c"),
        F.lead("cents").over(w).alias("next_c"),
    )
    return (
        nb.filter((F.col("cents") > F.col("prev_c")) & (F.col("cents") > F.col("next_c")))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
            (F.col("cents").cast("double") / 100.0).alias("peak_value"),
            (
                (F.col("cents") - F.greatest("prev_c", "next_c")).cast("double")
                / 100.0
            ).alias("prominence"),
            "h",
        )
        .orderBy("event_type", "h")
        .drop("h")
    )


CATALOG["evt_peak_detection_hourly"].fn = _dpeaks

register(
    "evt_funnel_time_to_convert",
    # latency of the view->purchase conversion: per user, first view,
    # then the EARLIEST purchase strictly after it; durations in whole
    # seconds (second-truncated epochs) summarized by exact percentiles.
    oracle="""
    WITH v AS (
      SELECT user_id,
             MIN(CAST(epoch(date_trunc('second', ts)) AS BIGINT)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id,
             MIN(CAST(epoch(date_trunc('second', e.ts)) AS BIGINT)) - v.t_view
               AS wait_s
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase'
        AND CAST(epoch(date_trunc('second', e.ts)) AS BIGINT) > v.t_view
      GROUP BY e.user_id, v.t_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS converters,
           quantile_cont(wait_s, 0.5) AS median_wait_s,
           quantile_cont(wait_s, 0.9) AS p90_wait_s
    FROM conv
    """,
)


def _dtimetoconvert(spark, sf_dir):
    """Time-to-convert distribution for the view->purchase funnel: one
    per-user min (first view), an equi-join back onto purchases
    strictly after it, a per-user min wait, exact percentiles. The join
    key is user_id — co-partitioned with every other per-user shape."""
    ev = t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").alias("sec")
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", sec)
        .groupBy("user_id")
        .agg(F.min("sec").alias("t_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", sec)
        .join(v, "user_id")
        .filter(F.col("sec") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg((F.min("sec") - F.col("t_view")).alias("wait_s"))
    )
    return conv.agg(
        F.count("*").cast("long").alias("converters"),
        F.percentile("wait_s", F.lit(0.5)).alias("median_wait_s"),
        F.percentile("wait_s", F.lit(0.9)).alias("p90_wait_s"),
    )


CATALOG["evt_funnel_time_to_convert"].fn = _dtimetoconvert


