"""Split from queries.py lines 3994-4124 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t

# ===========================================================================
# As-of join + range join (custom time-series operators)
# ===========================================================================

register(
    "asof_latest_event",
    oracle="""
    WITH l AS (SELECT o_orderkey, o_custkey % 20 AS k,
                      o_orderdate + INTERVAL 29 YEAR AS ts
               FROM orders),
         r AS (SELECT user_id % 20 AS k, ts, MAX(value) AS ev_value
               FROM events GROUP BY 1, 2)
    SELECT l.o_orderkey, l.k, r.ev_value AS ev_value_asof
    FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.ts <= l.ts
    """,
    bench=True,
)


def _asof(spark, sf_dir):
    """As-of join: each (shifted) order matched to the latest prior event
    value for its key — union trick, one shuffle (ops/asof.py). Oracle is
    DuckDB's native ASOF JOIN."""
    from ..ops.asof import asof_join

    o = t(spark, sf_dir, "orders", fan_out=False).select(
        "o_orderkey",
        (F.col("o_custkey") % 20).alias("k"),
        # orders live in 1995-2001, events in 2024: shift orders +29y so
        # the time ranges interleave
        (F.col("o_orderdate") + F.expr("INTERVAL 29 YEARS")).alias("ts"),
    )
    # r15 opt round: the max-per-(k, ts) pre-aggregation (a second
    # full shuffle of events that reduced nothing on near-unique
    # timestamps) folds into the as-of window sort via max_of_ties —
    # identical values, one events shuffle instead of two
    # fan_out=False: both union sides reach the as-of exchange through
    # trivial projections (A/B: 0.87 -> 0.59 s)
    e = t(spark, sf_dir, "events", fan_out=False).select(
        (F.col("user_id") % 20).alias("k"), "ts", F.col("value").alias("ev_value")
    )
    out = asof_join(
        o, e, on="k", left_ts="ts", right_ts="ts", value_cols=["ev_value"],
        max_of_ties=True,
    )
    return out.select("o_orderkey", "k", "ev_value_asof")


CATALOG["asof_latest_event"].fn = _asof

register(
    "asof_next_event_tolerance",
    # FORWARD as-of with a 72 h tolerance (pandas merge_asof
    # direction='forward'): DuckDB's native ASOF only looks backward,
    # so the oracle negates the time axis (epoch seconds * -1) — ASOF
    # "most recent nts' <= nts" on the negated axis IS "earliest
    # ts' >= ts" — then the tolerance nulls matches beyond the window
    # (match-then-null, the pandas semantics, NOT nearest-within-window).
    oracle="""
    WITH l AS (SELECT o_orderkey, o_custkey % 20 AS k,
                      o_orderdate + INTERVAL 29 YEAR AS ts
               FROM orders),
         r AS (SELECT user_id % 20 AS k, ts, MAX(value) AS ev_value
               FROM events GROUP BY 1, 2),
         ln AS (SELECT *, -epoch(ts) AS nts FROM l),
         rn AS (SELECT *, -epoch(ts) AS nts FROM r)
    SELECT ln.o_orderkey, ln.k,
           CASE WHEN epoch(rn.ts) - epoch(ln.ts) <= 72 * 3600
                THEN rn.ev_value END AS ev_value_next
    FROM ln ASOF LEFT JOIN rn ON ln.k = rn.k AND rn.nts <= ln.nts
    """,
)


def _asof_fwd(spark, sf_dir):
    """Forward as-of with tolerance (ops/asof.asof_join
    direction='forward', tolerance_seconds=72h): each shifted order
    matched to the NEXT event value for its key, nulled when the next
    event is more than 72 h out — the lead-time join behind
    time-to-conversion and next-reading features. Same union-trick
    shuffle as backward, descending window."""
    from ..ops.asof import asof_join

    o = t(spark, sf_dir, "orders", fan_out=False).select(
        "o_orderkey",
        (F.col("o_custkey") % 20).alias("k"),
        (F.col("o_orderdate") + F.expr("INTERVAL 29 YEARS")).alias("ts"),
    )
    # r15 opt round: the max-per-(k, ts) pre-aggregation (a second
    # full shuffle of events that reduced nothing on near-unique
    # timestamps) folds into the as-of window sort via max_of_ties —
    # identical values, one events shuffle instead of two
    # fan_out=False: both union sides reach the as-of exchange through
    # trivial projections (A/B: 0.87 -> 0.59 s)
    e = t(spark, sf_dir, "events", fan_out=False).select(
        (F.col("user_id") % 20).alias("k"), "ts", F.col("value").alias("ev_value")
    )
    out = asof_join(
        o, e, on="k", left_ts="ts", right_ts="ts", value_cols=["ev_value"],
        suffix="_next", direction="forward", tolerance_seconds=72 * 3600,
        max_of_ties=True,
    )
    return out.select("o_orderkey", "k", "ev_value_next")


CATALOG["asof_next_event_tolerance"].fn = _asof_fwd

register(
    "range_join_day_window",
    oracle="""
    WITH l AS (SELECT event_id AS probe_id, user_id % 10 AS k, ts AS start_ts,
                      ts + INTERVAL 2 HOUR AS end_ts
               FROM events WHERE event_type = 'signup'),
         r AS (SELECT event_id, user_id % 10 AS k, ts, value FROM events)
    SELECT l.probe_id, r.event_id, r.value
    FROM l JOIN r ON l.k = r.k AND r.ts >= l.start_ts AND r.ts < l.end_ts
    """,
    bench=True,
)


def _rangej(spark, sf_dir):
    """Interval containment join via time-bucket equi-join (ops/asof.py):
    events within 2h after each signup, same key — no nested-loop join
    (asserted in test_plans)."""
    from ..ops.asof import range_join_bucketed

    e = t(spark, sf_dir, "events")
    l = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("probe_id"),
        (F.col("user_id") % 10).alias("k"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    r = e.select("event_id", (F.col("user_id") % 10).alias("k"), "ts", "value")
    out = range_join_bucketed(l, r, on="k", left_start="start_ts", left_end="end_ts", right_ts="ts", bucket_secs=3600)
    return out.select("probe_id", "event_id", "value")


CATALOG["range_join_day_window"].fn = _rangej

