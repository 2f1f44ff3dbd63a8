"""Structured Streaming tests: watermarked windows, streaming dedup,
foreachBatch SCD2 — run with availableNow triggers over file sources so
they are deterministic and fast.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.io.scd2 import Scd2Table
from real_estate_data_pipeline_spark.streaming.events import (
    dedup_stream,
    read_event_stream,
    scd2_foreach_batch,
    session_windows_stream,
    tumbling_counts_stream,
)

EVENTS = [
    {"event_id": 1, "ts": "2024-01-01T00:05:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T00:20:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T00:20:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},  # dup
    {"event_id": 3, "ts": "2024-01-01T01:10:00", "user_id": 1, "event_type": "view", "value": 3.0, "props": "{}"},
    {"event_id": 4, "ts": "2024-01-01T00:30:00", "user_id": 2, "event_type": "click", "value": 4.0, "props": "{}"},
]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    with open(d / "part1.jsonl", "w") as fh:
        for e in EVENTS:
            fh.write(json.dumps(e) + "\n")
    return str(d)


def _run(stream_df, name, spark, mode):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_tumbling_stream(spark, stream_dir):
    src = read_event_stream(spark, stream_dir)
    out = _run(tumbling_counts_stream(src, "1 hour"), "t_tumble", spark, "complete")
    rows = {(str(r["window_start"]), r["event_type"]): r["events"] for r in out.collect()}
    assert rows[("2024-01-01 00:00:00", "click")] == 4  # includes the dup row
    assert rows[("2024-01-01 01:00:00", "view")] == 1


def test_session_stream(spark, stream_dir):
    src = read_event_stream(spark, stream_dir)
    out = _run(session_windows_stream(src, gap="30 minutes"), "t_sess", spark, "complete")
    u1 = [r for r in out.collect() if r["user_id"] == 1]
    # user 1: events at 00:05, 00:20 (x2), then 01:10 -> 2 sessions
    assert len(u1) == 2


def test_dedup_stream(spark, stream_dir):
    src = read_event_stream(spark, stream_dir)
    out = _run(dedup_stream(src), "t_dedup", spark, "append")
    assert out.count() == 4  # 5 rows, one exact dup dropped
    assert out.select("event_id").distinct().count() == 4


def test_foreach_batch_scd2(spark, stream_dir, tmp_path):
    t = Scd2Table(
        spark, str(tmp_path / "scd2s"), key="event_id",
        tracked=["value"], order_col="ts",
    )
    src = read_event_stream(spark, stream_dir)
    q = (
        src.writeStream.foreachBatch(scd2_foreach_batch(t))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    cur = t.read().filter("is_current")
    assert cur.count() == 4  # one row per distinct event_id


DOCS = [
    {"doc_id": 1, "ingested_at": "2024-01-01T00:01:00", "text": "the quick brown fox jumps over the lazy dog", "lang": "en", "source": "web"},
    {"doc_id": 2, "ingested_at": "2024-01-01T00:02:00", "text": "The QUICK brown fox jumps over the lazy dog!!", "lang": "en", "source": "crawl"},  # near-exact dup (same fingerprint)
    {"doc_id": 3, "ingested_at": "2024-01-01T00:03:00", "text": "une phrase en francais pour le test des documents", "lang": "fr", "source": "web"},
    {"doc_id": 4, "ingested_at": "2024-01-01T00:04:00", "text": "", "lang": "en", "source": "web"},  # invalid: empty
    {"doc_id": 5, "ingested_at": "2024-01-01T00:05:00", "text": "another english document entirely different content here", "lang": None, "source": "web"},  # invalid: no lang
]


@pytest.fixture(scope="module")
def docs_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    with open(d / "batch1.jsonl", "w") as fh:
        for doc in DOCS[:2]:
            fh.write(json.dumps(doc) + "\n")
    with open(d / "batch2.jsonl", "w") as fh:
        for doc in DOCS[2:]:
            fh.write(json.dumps(doc) + "\n")
    return str(d)


def test_document_stream_cleanse(spark, docs_stream_dir):
    """Streaming corpus cleanse: validation drops empty/lang-less rows,
    the fingerprint dedup drops the case/punct near-dup even though the
    two copies may land in different micro-batches, and quality/lang
    features ride along."""
    from real_estate_data_pipeline_spark.streaming.documents import (
        cleanse_document_stream,
        read_document_stream,
    )

    src = read_document_stream(spark, docs_stream_dir)
    out = _run(cleanse_document_stream(src), "t_docs", spark, "append").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 3} or set(by_id) == {2, 3}  # one of the dup pair survives
    assert len({r["fingerprint"] for r in out}) == len(out)
    surviving_en = by_id.get(1) or by_id.get(2)
    assert surviving_en["lang_pred"] == "en"
    assert surviving_en["n_tokens"] == 9
    assert 0.0 <= surviving_en["quality_score"] <= 1.0


def test_append_session_watermark_boundary(spark, tmp_path):
    """Pin the append-mode emission semantics the evt_stream_sessions_append
    oracle depends on: the watermark is the MILLISECOND-floored max event
    time minus the delay, and a session whose window end EQUALS the
    watermark is emitted (<=, not <). Three planted corpora: end == wm
    (emit), end == wm via a +999us max ts (ms floor makes them equal:
    emit), end 1 ms past wm (hold in state)."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    cases = [
        ("exact", datetime.timedelta(minutes=150), True),
        ("us_floor", datetime.timedelta(minutes=150, microseconds=999), True),
        ("short1ms", datetime.timedelta(minutes=150) - datetime.timedelta(milliseconds=1), False),
    ]
    for name, delta, expect_emitted in cases:
        d = str(tmp_path / name)
        rows = [(1, t0, 1, "a", 1.0, ""), (2, t0 + delta, 2, "a", 1.0, "")]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        src = spark.readStream.schema(schema).format("parquet").load(d)
        agg = (
            src.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
            .agg(F.count("*").alias("n"))
            .select("user_id")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(f"wmb_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        emitted = {r["user_id"] for r in spark.table(f"wmb_{name}").collect()}
        assert (1 in emitted) == expect_emitted, (name, emitted)


def test_streaming_observed_metrics(spark, stream_dir):
    """DQ metrics ride a STREAMING query too: observe() expressions
    surface per micro-batch in the progress events — monitoring without
    a second pass, the streaming twin of quality.checks.observed_metrics."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.streaming.events import (
        EVENT_SCHEMA,
        read_event_stream,
    )

    src = read_event_stream(spark, stream_dir)
    observed = src.observe(
        "dq", F.count(F.lit(1)).alias("rows"), F.sum("value").alias("total")
    )
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", stream_dir + "/_ckpt_obs")
        .start()
    )
    assert q.awaitTermination(120)
    rows = 0
    for p in q.recentProgress:
        m = p["observedMetrics"].get("dq") if p["observedMetrics"] else None
        if m:
            rows += m["rows"]
    assert rows == sum(1 for _ in open(f"{stream_dir}/part1.jsonl"))
