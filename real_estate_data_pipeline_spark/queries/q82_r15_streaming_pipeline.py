"""Round-15 wave 2 (post-rotation): the two streaming gate entries the
r14 verdict queued as item 7 — (a) the end-to-end bronze->silver->SCD2
streaming PIPELINE under availableNow (the reference's one flagship
shape, silver_etl_script.py:916-966: raw snapshot files stream in,
the silver cleanse/validate/derive transform runs ON the stream, and
foreachBatch lands each day through Scd2Table.merge), hash-matched
against a pure-SQL replica of transform+two-run-merge; and (b) a
custom applyInPandasWithState SESSIONIZER (explicit per-user state
machine emitting CLOSED sessions in append mode), hash-matched
against the batch gaps-and-islands oracle minus each user's final
(still-open) session.

Both entries complete the streaming family: 12 prior oracled runs
cover windowed aggs, dedup, stateful totals, stream-stream joins and
single-table SCD2 upserts; these add the full-pipeline composition
and the bespoke-state-machine shape that session_window can't
express (custom gap semantics + explicit closed-session emission).
"""

from __future__ import annotations

import os

from ._registry import CATALOG, F, _scratch, register, t
from .q15_curation_r3 import (
    _events_stream_schema,
    _run_stream_to_memory,
    _stream_file_source,
)

register(
    "pipe_stream_silver_scd2_now",
    # Bronze rows carry injected dirt (padded names for key%7=0,
    # lowercased segments for key%11=0) and invalid rows (acctbal <
    # -900 must be rejected by silver validation); the oracle works
    # from the CLEAN table because silver provably restores it —
    # trim/upper are exact inverses of the injected dirt — and applies
    # the same validation filter. Merge semantics and the two pinned
    # batch timestamps mirror scd2_stream_upsert; segment_code is the
    # silver-derived column, tracked alongside c_mktsegment.
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= -900
    ),
    d1 AS (SELECT * FROM c WHERE c_custkey % 3 <> 0),
    d2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM c WHERE c_custkey % 2 = 0
    )
    SELECT d1.c_custkey, d1.c_mktsegment,
           substr(d1.c_mktsegment, 1, 3) AS segment_code,
           FALSE AS is_current,
           '2024-01-01' AS valid_from_d, '2024-01-02' AS valid_to_d
    FROM d1 JOIN d2 USING (c_custkey) WHERE d1.c_mktsegment <> d2.c_mktsegment
    UNION ALL
    SELECT d2.c_custkey, d2.c_mktsegment, substr(d2.c_mktsegment, 1, 3),
           TRUE, '2024-01-02', NULL
    FROM d1 JOIN d2 USING (c_custkey) WHERE d1.c_mktsegment <> d2.c_mktsegment
    UNION ALL
    SELECT d1.c_custkey, d1.c_mktsegment, substr(d1.c_mktsegment, 1, 3),
           TRUE, '2024-01-01', NULL
    FROM d1 LEFT JOIN d2 USING (c_custkey)
    WHERE d2.c_custkey IS NULL OR d1.c_mktsegment = d2.c_mktsegment
    UNION ALL
    SELECT d2.c_custkey, d2.c_mktsegment, substr(d2.c_mktsegment, 1, 3),
           TRUE, '2024-01-02', NULL
    FROM d2 LEFT JOIN d1 USING (c_custkey) WHERE d1.c_custkey IS NULL
    """,
)


def _dpipestream(spark, sf_dir):
    """End-to-end streaming pipeline: dirty bronze snapshot files ->
    file stream -> silver transform on the STREAMING frame (trim/
    normalize, validation reject, derived column) -> foreachBatch
    SCD2 merge per planted day -> final version table."""
    import shutil
    import time as _time

    from pyspark.sql import types as T

    from ..io.scd2 import Scd2Table

    scratch = _scratch("redp_pipe_stream_silver_scd2")
    shutil.rmtree(scratch, ignore_errors=True)
    src_dir = os.path.join(scratch, "bronze")
    os.makedirs(src_dir)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    # bronze dirt: reversible noise silver must strip (validation
    # rejects — acctbal < -900 — are real data, not injected)
    dirty = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")),
        )
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 11 == 0, F.lower(F.col("c_mktsegment")))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_acctbal",
    )
    day1 = dirty.filter(F.col("c_custkey") % 3 != 0).withColumn("batch_day", F.lit(1))
    day2 = (
        dirty.filter(F.col("c_custkey") % 2 == 0)
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 5 == 0, F.lit("CHANGED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
        .withColumn("batch_day", F.lit(2))
    )
    for i, day in enumerate((day1, day2)):
        p = os.path.join(src_dir, f"day{i + 1}")
        day.coalesce(1).write.parquet(p)
        now = _time.time()
        for dp, _, fs in os.walk(p):
            for f in fs:
                os.utime(os.path.join(dp, f), (now + i * 10, now + i * 10))
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("batch_day", T.IntegerType()),
        ]
    )
    bronze = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir + "/day*")
    )
    # silver ON the stream: cleanse -> validate -> derive (the
    # SilverPipeline stage order, expressed stream-native)
    silver = (
        bronze.withColumn("c_name", F.trim(F.col("c_name")))
        .withColumn("c_mktsegment", F.upper(F.trim(F.col("c_mktsegment"))))
        .filter(F.col("c_acctbal") >= -900)
        .withColumn("segment_code", F.substring(F.col("c_mktsegment"), 1, 3))
    )
    tbl = Scd2Table(
        spark,
        os.path.join(scratch, "table"),
        key="c_custkey",
        tracked=["c_mktsegment", "segment_code"],
        order_col="c_acctbal",
    )

    def apply(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # one merge PER planted day, in day order (scd2_stream_upsert's
        # coalesced-trigger guard)
        days = sorted(
            r["batch_day"]
            for r in batch_df.select("batch_day").distinct().collect()
        )
        for day in days:
            tbl.merge(
                batch_df.filter(F.col("batch_day") == day).drop("batch_day"),
                batch_ts=F.to_timestamp(F.lit(f"2024-01-0{day} 00:00:00")),
            )

    q = (
        silver.writeStream.foreachBatch(apply)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("silver scd2 pipeline stream did not finish in 300s")
    return tbl.read().select(
        "c_custkey",
        "c_mktsegment",
        "segment_code",
        "is_current",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from_d"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to_d"),
    )


CATALOG["pipe_stream_silver_scd2_now"].fn = _dpipestream


register(
    "evt_stream_stateful_sessions_now",
    # Custom stateful sessionizer: strictly-greater 30-min gap (the
    # batch evt_sessionization convention, NOT session_window's >=),
    # emitting a session only when a later event CLOSES it — so the
    # sink equals batch gaps-and-islands minus each user's final
    # (still-open-at-end-of-stream) session, which the QUALIFY clause
    # drops from the oracle.
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), g AS (
      SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(ts) AS st, MAX(ts) AS en
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id, n_events,
           strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start_s,
           CAST(FLOOR(epoch(en)) - FLOOR(epoch(st)) AS BIGINT) AS duration_secs
    FROM g
    QUALIFY session_id < MAX(session_id) OVER (PARTITION BY user_id)
    """,
)


def _dstatefulsess(spark, sf_dir):
    """Per-user session state machine in applyInPandasWithState:
    state = (last_ts_ns, session_start_ns, n_events); each batch's
    rows sort by (ts, event_id) inside the pandas function, a gap
    > 30 min closes the running session (one appended output row),
    and the final open session stays in state unemitted. The
    single-file availableNow source yields one micro-batch, so
    in-function sorting makes the fold deterministic; a multi-batch
    production deployment would need event-time-ordered ingestion or
    the watermarked session_window sibling (evt_stream_sessions_now)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = _stream_file_source(
        spark, sf_dir, "events.parquet", _events_stream_schema(ts_ntz=True)
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("session_start_s", T.StringType()),
            T.StructField("duration_secs", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_ns", T.LongType()),
            T.StructField("start_ns", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    gap_ns = 30 * 60 * 10**9

    def update(key, pdfs, state: GroupState):
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return
        df = pd.concat(frames).sort_values(["ts", "event_id"])
        # explicit ns unit: pandas may carry datetime64[us] depending
        # on the Arrow path, and a bare astype(int64) would silently
        # yield micros (x1000 gap error)
        ts_ns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        last, start, n = state.get if state.exists else (None, None, 0)
        out = []
        for v in ts_ns:
            v = int(v)
            if last is None:
                start, n = v, 1
            elif v - last > gap_ns:
                out.append((start, last, n))
                start, n = v, 1
            else:
                n += 1
            last = v
        state.update((last, start, n))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "n_events": [n_ for _, _, n_ in out],
                    "session_start_s": [
                        pd.Timestamp(st, unit="ns").strftime("%Y-%m-%d %H:%M:%S")
                        for st, _, _ in out
                    ],
                    "duration_secs": [
                        en // 10**9 - st // 10**9 for st, en, _ in out
                    ],
                }
            )

    closed = src.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return _run_stream_to_memory(
        closed, "evt_stream_stateful_sessions_now_sink", "append"
    )


CATALOG["evt_stream_stateful_sessions_now"].fn = _dstatefulsess
