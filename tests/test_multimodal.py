"""Multimodal plumbing tests: binary payload columns, mapInPandas batch
feature extraction, frame sampling. The decode is a deterministic stub;
what's being tested is the Spark-side schema/batch/plan shape.
"""

from __future__ import annotations

from real_estate_data_pipeline_spark.ops.multimodal import (
    FEATURE_SCHEMA,
    attach_payload,
    decode_image_features,
    frame_sample,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, "hello world " * 10), (2, ""), (3, "xyz")], "doc_id long, text string"
    )
    return attach_payload(df, "text", "doc_id")


def test_attach_payload_schema(spark):
    m = _media(spark)
    assert dict((f.name, f.dataType.simpleString()) for f in m.schema.fields) == {
        "media_id": "bigint", "media_type": "string", "payload": "binary",
        "width": "int", "height": "int", "n_bytes": "bigint",
    }
    rows = {r["media_id"]: r for r in m.collect()}
    assert rows[1]["n_bytes"] == 120 and bytes(rows[1]["payload"])[:5] == b"hello"


def test_decode_features_batched(spark):
    feats = decode_image_features(_media(spark))
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[1]["feat_mean"] > 0 and rows[1]["phash"] != 0
    assert rows[2]["feat_mean"] == 0.0 and rows[2]["phash"] == 0  # empty payload
    # determinism
    rows2 = {r["media_id"]: r for r in decode_image_features(_media(spark)).collect()}
    assert rows2[1]["phash"] == rows[1]["phash"]


def test_frame_sample(spark):
    frames = frame_sample(_media(spark), every_n_bytes=32)
    by_id = {}
    for r in frames.collect():
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 3  # 120 bytes / 32 -> 3 frames
    assert all(len(bytes(f["frame_bytes"])) <= 32 for f in by_id[1])
