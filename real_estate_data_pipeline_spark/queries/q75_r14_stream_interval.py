"""Round-14 wave 8: the stream-stream interval join in the correctness
gate (the one streaming operator implemented and unit-tested since r5
but never catalog-checked — VERDICT r13 item 7), plus four exact
time-series statistics on the daily value series: the Foster-Stuart
records test, maximum drawdown, longest run above/below the exact
median, and the Parkinson high-low volatility estimator.

The streaming entry drives streaming/events.correlate_streams (two
watermarked file streams, event-time-bounded inner join) to completion
with availableNow into a memory sink, then aggregates the materialized
pairs; within one availableNow horizon the watermark drops nothing, so
the result equals the batch range join the oracle runs — the
one-definition-two-modes contract extended to binary stateful
operators.  Exactness elsewhere: record indicators and drawdowns are
pure integer cents; the records-test variance sum (2/t terms) and the
Parkinson squared-log-range terms quantize to picounits; ln(2) is a
Python constant at 9dp fed to both engines.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q15_curation_r3 import (
    _events_stream_schema,
    _run_stream_to_memory,
    _stream_file_source,
)
from .q59_r13_trend_changepoint import _DAILY_CENTS_CTE, _daily_cents
from ..streaming.events import correlate_streams

_LN2_9 = 0.693147181  # round(ln 2, 9), quantized once for both engines


register(
    "evt_stream_interval_join_now",
    # Stream-stream event-time interval join: every (click, purchase)
    # pair for the same user with the purchase inside [click, click +
    # 1 hour].  The oracle is the equivalent batch range join; the
    # Spark side runs the REAL watermarked streaming join and
    # aggregates the sink.  Gap moments are exact epoch-micro sums.
    oracle="""
    WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
    pairs AS (
      SELECT l.user_id,
             CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS gap_us
      FROM l JOIN r ON r.user_id = l.user_id
                   AND r.ts >= l.ts
                   AND r.ts <= l.ts + INTERVAL 1 HOUR
                   AND l.event_id <> r.event_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000, 6)
             AS mean_gap_s,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM pairs
    """,
)


def _dstreamival(spark, sf_dir):
    """correlate_streams in the gate: clicks x purchases within 1 hour,
    both sides watermarked (state eviction is the 100 TB contract; one
    availableNow horizon evicts nothing, so the sink equals the batch
    range join exactly)."""
    schema = _events_stream_schema(ts_ntz=False)
    clicks = _stream_file_source(spark, sf_dir, "events.parquet", schema).filter(
        F.col("event_type") == "click"
    )
    buys = _stream_file_source(spark, sf_dir, "events.parquet", schema).filter(
        F.col("event_type") == "purchase"
    )
    joined = correlate_streams(
        clicks, buys, key="user_id", within="1 hour", watermark="2 hours"
    )
    sink = _run_stream_to_memory(
        joined, "evt_stream_interval_join_sink", "append"
    )
    gap = F.unix_micros(F.col("right_ts")) - F.unix_micros(F.col("left_ts"))
    return sink.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(
            F.sum(gap).cast("double") / F.count("*") / F.lit(1000000), 6
        ).alias("mean_gap_s"),
        F.max(gap).cast("long").alias("max_gap_us"),
    )


CATALOG["evt_stream_interval_join_now"].fn = _dstreamival


register(
    "evt_records_foster_stuart",
    # Foster-Stuart records test for trend on the daily series: U/L =
    # counts of upper/lower records (strict, t >= 2), d = U - L; under
    # the iid null the record indicators are independent with
    # P(record) = 1/t and Var(d) = sum_{t=2..n} 2/t, so
    # z = d / sqrt(sum 2/t).  Record flags are integer comparisons
    # against running extrema; the variance terms quantize to picounits.
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    rec AS (
      SELECT k, cents,
             MAX(cents) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prevmax,
             MIN(cents) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prevmin
      FROM d
    ),
    flags AS (
      SELECT k,
             CASE WHEN prevmax IS NOT NULL AND cents > prevmax THEN 1 ELSE 0 END AS u,
             CASE WHEN prevmin IS NOT NULL AND cents < prevmin THEN 1 ELSE 0 END AS l,
             CASE WHEN k >= 2 THEN
               CAST(floor(2.0 / k * 1000000000000 + 0.5) AS BIGINT)
             ELSE 0 END AS v12
      FROM rec
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(u) AS BIGINT) AS upper_records,
           CAST(SUM(l) AS BIGINT) AS lower_records,
           CAST(SUM(u) - SUM(l) AS BIGINT) AS fs_d,
           round((CAST(SUM(u) AS DOUBLE) - SUM(l))
                 / sqrt(CAST(SUM(v12) AS DOUBLE) / 1000000000000.0), 6)
             AS z_records
    FROM flags
    """,
)


def _drecords(spark, sf_dir):
    """Foster-Stuart records off running extrema windows."""
    d = _daily_cents(spark, sf_dir)
    wprev = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    rec = d.select(
        "k",
        "cents",
        F.max("cents").over(wprev).alias("prevmax"),
        F.min("cents").over(wprev).alias("prevmin"),
    )
    flags = rec.select(
        "k",
        F.when(
            F.col("prevmax").isNotNull() & (F.col("cents") > F.col("prevmax")), 1
        )
        .otherwise(0)
        .alias("u"),
        F.when(
            F.col("prevmin").isNotNull() & (F.col("cents") < F.col("prevmin")), 1
        )
        .otherwise(0)
        .alias("l"),
        F.when(
            F.col("k") >= 2,
            F.floor(
                F.lit(2.0) / F.col("k") * F.lit(1000000000000) + F.lit(0.5)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("v12"),
    )
    return flags.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("u").cast("long").alias("upper_records"),
        F.sum("l").cast("long").alias("lower_records"),
        (F.sum("u") - F.sum("l")).cast("long").alias("fs_d"),
        F.round(
            (F.sum("u").cast("double") - F.sum("l"))
            / F.sqrt(F.sum("v12").cast("double") / F.lit(1000000000000.0)),
            6,
        ).alias("z_records"),
    )


CATALOG["evt_records_foster_stuart"].fn = _drecords


register(
    "evt_max_drawdown_daily",
    # Worst peak-to-trough decline of the daily value level: drawdown_t
    # = running_max - x_t, all exact integer cents; reports the maximum
    # drawdown, its relative depth, and the trough day (earliest on
    # ties).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    dd2 AS (
      SELECT off, cents,
             MAX(cents) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS runmax
      FROM d
    ),
    dd3 AS (
      SELECT off, cents, runmax, runmax - cents AS drawdown
      FROM dd2
    ),
    worst AS (
      SELECT off, cents, runmax, drawdown
      FROM dd3 ORDER BY drawdown DESC, off LIMIT 1
    )
    SELECT CAST(off AS BIGINT) AS trough_day_off,
           round(CAST(drawdown AS DOUBLE) / 100, 2) AS max_drawdown,
           round(CAST(drawdown AS DOUBLE) / runmax, 6) AS relative_depth,
           round(CAST(runmax AS DOUBLE) / 100, 2) AS peak_level,
           round(CAST(cents AS DOUBLE) / 100, 2) AS trough_level
    FROM worst
    """,
)


def _ddrawdown(spark, sf_dir):
    """Max drawdown via one running-max window over the daily frame."""
    d = _daily_cents(spark, sf_dir)
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dd3 = d.select(
        "off",
        "cents",
        F.max("cents").over(wcum).alias("runmax"),
    ).withColumn("drawdown", F.col("runmax") - F.col("cents"))
    worst = dd3.orderBy(F.desc("drawdown"), "off").limit(1)
    return worst.select(
        F.col("off").cast("long").alias("trough_day_off"),
        F.round(F.col("drawdown").cast("double") / 100, 2).alias("max_drawdown"),
        F.round(F.col("drawdown").cast("double") / F.col("runmax"), 6).alias(
            "relative_depth"
        ),
        F.round(F.col("runmax").cast("double") / 100, 2).alias("peak_level"),
        F.round(F.col("cents").cast("double") / 100, 2).alias("trough_level"),
    )


CATALOG["evt_max_drawdown_daily"].fn = _ddrawdown


register(
    "evt_longest_run_above_median",
    # Longest consecutive run of days above / not-above the exact
    # median of the daily series (2*median stays integer, the r13
    # doubled-median trick), plus the run count — the persistence
    # companion to the runs TEST queries (which score total run counts,
    # not extremes).
    oracle=f"""
    WITH {_DAILY_CENTS_CTE},
    med AS (SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM d),
    sgn AS (
      SELECT k, CASE WHEN 2 * cents > m2 THEN 1 ELSE 0 END AS above
      FROM d CROSS JOIN med
    ),
    isl AS (
      SELECT k, above,
             CAST(k AS BIGINT)
             - ROW_NUMBER() OVER (PARTITION BY above ORDER BY k) AS grp
      FROM sgn
    ),
    runs AS (
      SELECT above, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY above, grp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(CASE WHEN above = 1 THEN len ELSE 0 END) AS BIGINT)
             AS longest_above,
           CAST(MAX(CASE WHEN above = 0 THEN len ELSE 0 END) AS BIGINT)
             AS longest_not_above
    FROM runs
    """,
)


def _dlongrun(spark, sf_dir):
    """Longest runs vs the exact median — the gaps-and-islands trick."""
    d = _daily_cents(spark, sf_dir)
    med = d.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    sgn = d.crossJoin(F.broadcast(med)).select(
        "k",
        F.when(2 * F.col("cents") > F.col("m2"), 1).otherwise(0).alias("above"),
    )
    wgrp = Window.partitionBy("above").orderBy("k")
    isl = sgn.select(
        "above", (F.col("k") - F.row_number().over(wgrp)).cast("long").alias("grp")
    )
    runs = isl.groupBy("above", "grp").agg(F.count("*").cast("long").alias("len"))
    return runs.agg(
        F.count("*").cast("long").alias("n_runs"),
        F.max(F.when(F.col("above") == 1, F.col("len")).otherwise(0))
        .cast("long")
        .alias("longest_above"),
        F.max(F.when(F.col("above") == 0, F.col("len")).otherwise(0))
        .cast("long")
        .alias("longest_not_above"),
    )


CATALOG["evt_longest_run_above_median"].fn = _dlongrun


register(
    "evt_parkinson_volatility_daily",
    # Parkinson's high-low range volatility of the hourly value flow:
    # per day, H/L = max/min HOURLY cents total; sigma^2_P = (1 /
    # (4 n ln 2)) * sum_d ln(H_d/L_d)^2.  ln at 6dp, squared-log terms
    # in picounits, ln(2) a 9dp Python constant shared verbatim.
    oracle=f"""
    WITH hh AS (
      SELECT CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) AS hn,
             CAST(FLOOR(epoch(ts) / 86400.0) AS BIGINT) AS dn,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    day_hl AS (
      SELECT dn, CAST(MAX(cents) AS BIGINT) AS hi, CAST(MIN(cents) AS BIGINT) AS lo
      FROM hh GROUP BY dn
    ),
    terms AS (
      SELECT CAST(floor(round(ln(CAST(hi AS DOUBLE) / lo), 6)
               * round(ln(CAST(hi AS DOUBLE) / lo), 6)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM day_hl
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(SUM(t12) AS DOUBLE) / 1000000000000.0
                 / (4 * COUNT(*) * {_LN2_9!r}), 9) AS parkinson_var,
           round(sqrt(CAST(SUM(t12) AS DOUBLE) / 1000000000000.0
                      / (4 * COUNT(*) * {_LN2_9!r})), 9) AS parkinson_vol
    FROM terms
    """,
)


def _dparkinson(spark, sf_dir):
    """Parkinson volatility off the hourly-within-day high/low."""
    ev = t(spark, sf_dir, "events")
    hh = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / F.lit(3600.0)).alias("hn"),
        F.floor(F.unix_timestamp("ts") / F.lit(86400.0)).alias("dn"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long").alias("cents")
    )
    day_hl = hh.groupBy("dn").agg(
        F.max("cents").cast("long").alias("hi"),
        F.min("cents").cast("long").alias("lo"),
    )
    lr = F.round(F.log(F.col("hi").cast("double") / F.col("lo")), 6)
    terms = day_hl.select(
        F.floor(lr * lr * F.lit(1000000000000) + F.lit(0.5)).cast("long").alias("t12")
    )
    denom = 4 * F.count("*") * F.lit(_LN2_9)
    return terms.agg(
        F.count("*").cast("long").alias("n_days"),
        F.round(
            F.sum("t12").cast("double") / F.lit(1000000000000.0) / denom, 9
        ).alias("parkinson_var"),
        F.round(
            F.sqrt(F.sum("t12").cast("double") / F.lit(1000000000000.0) / denom), 9
        ).alias("parkinson_vol"),
    )


CATALOG["evt_parkinson_volatility_daily"].fn = _dparkinson
