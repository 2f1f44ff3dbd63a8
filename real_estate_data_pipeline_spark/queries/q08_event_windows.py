"""Split from queries.py lines 1162-1300 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DataFrame, F, Window, dsum, register, t

# ===========================================================================
# Event-time windows (batch forms of the streaming ops; streaming variants
# live in streaming/ and are covered by tests)
# ===========================================================================

register(
    "evt_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
    bench=True,
)


def _tumbling(spark, sf_dir):
    """Tumbling event-time window aggregate (batch form; streaming variant
    in streaming/events.py uses the same expression + watermark)."""
    # r15 opt round: scan feeds the agg exchange through one projection —
    # fan-out parallelized nothing (A/B: 0.64 -> 0.31 s)
    e = t(spark, sf_dir, "events", fan_out=False)
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("events"), dsum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "events",
            "total_value",
        )
    )


CATALOG["evt_tumbling_hourly"].fn = _tumbling

register(
    "evt_sliding_halfhour",
    oracle="""
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS events
    FROM (
      SELECT *, unnest([ (FLOOR(epoch(ts))::BIGINT // 1800 - 1) * 1800,
                         (FLOOR(epoch(ts))::BIGINT // 1800) * 1800 ]) AS ws
      FROM events
    )
    GROUP BY 1, 2
    """,
)


def _sliding(spark, sf_dir):
    """Sliding windows (1h window, 30min slide) in batch — each event
    lands in exactly two windows; the oracle enumerates them
    arithmetically. Streaming twin: streaming/events.sliding_counts_stream."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "events",
        )
    )


CATALOG["evt_sliding_halfhour"].fn = _sliding


def _sess_cte(extra: str = "") -> str:
    """flagged+sess CTE pair for the engine-wide 30-minute-gap batch
    sessionization — the SINGLE source of the gap convention (the
    round-7 review found 4 drifting copies; a raw INTERVAL compare
    diverges from Spark's floored unix seconds when a gap is exactly
    1800s truncated but longer at microsecond precision, so the gap
    compares second-truncated epochs). ``extra`` carries additional
    event columns (e.g. ``", event_type"``) through to ``sess``."""
    return f"""flagged AS (
      SELECT user_id, ts, event_id{extra},
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                   OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id{extra},
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )"""


def _gap_sessions(e: DataFrame, *extra: str) -> DataFrame:
    """(user_id, ts, event_id, *extra, session_id) — the Spark twin of
    _sess_cte: floored-second gaps, (ts, event_id) tie order, running
    new-session flag sum. Every batch consumer of gap sessions
    (sessionization, path mining, attribution) goes through here."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    flagged = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn("session_id", F.sum("new_sess").over(wsum)).select(
        "user_id", "ts", "event_id", *extra, "session_id"
    )


register(
    "evt_sessionization",
    oracle=f"""
    WITH {_sess_cte()}
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
           CAST(FLOOR(epoch(MAX(ts))) - FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_secs
    FROM sess GROUP BY user_id, session_id
    """,
    bench=True,
)


def _sessions(spark, sf_dir):
    """Session windows via gaps-and-islands (30-min inactivity gap) —
    batch analogue of streaming session windows."""
    # r15 opt round: scan feeds the session-window exchange through one
    # projection — fan-out parallelized nothing (A/B: 0.77 -> 0.55 s)
    e = t(spark, sf_dir, "events", fan_out=False)
    sess = _gap_sessions(e)
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start_s"),
        (F.max("ts").cast("timestamp").cast("long") - F.min("ts").cast("timestamp").cast("long")).alias("duration_secs"),
    )


CATALOG["evt_sessionization"].fn = _sessions

