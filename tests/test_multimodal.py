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


def test_resize_image_bounds_and_schema(spark):
    from real_estate_data_pipeline_spark.ops.multimodal import resize_image

    small = resize_image(_media(spark), target_bytes=16)
    # same columns/types (nullability aside): flows through downstream ops
    assert [(f.name, f.dataType) for f in small.schema.fields] == [
        (f.name, f.dataType) for f in _media(spark).schema.fields
    ]
    rows = {r["media_id"]: r for r in small.collect()}
    assert all(r["n_bytes"] <= 16 for r in rows.values())
    assert rows[3]["n_bytes"] == 3  # already small: untouched
    assert bytes(rows[3]["payload"]) == b"xyz"
    # deterministic stride sample
    again = {r["media_id"]: bytes(r["payload"]) for r in
             resize_image(_media(spark), target_bytes=16).collect()}
    assert again[1] == bytes(rows[1]["payload"])


def test_embed_media_feeds_ann_ops(spark):
    """attach_payload -> embed_media -> embedding_dup_pairs: the
    multimodal dedup path end-to-end. Identical payloads embed
    identically (cosine 1), disjoint byte content does not collide."""
    from real_estate_data_pipeline_spark.ops.multimodal import embed_media
    from real_estate_data_pipeline_spark.ops.similarity import embedding_dup_pairs

    df = spark.createDataFrame(
        [(1, "aaa bbb ccc " * 8), (2, "aaa bbb ccc " * 8), (3, "zzz qqq 999 " * 8)],
        "doc_id long, text string",
    )
    emb = embed_media(attach_payload(df, "text", "doc_id"))
    rows = {r["media_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == 3 and all(len(v) == 64 for v in rows.values())
    assert abs(sum(x * x for x in rows[1]) - 1.0) < 1e-5  # L2-normalized
    pairs = embedding_dup_pairs(
        emb.withColumnRenamed("media_id", "vec_id"), threshold=0.95, bits=4, bands=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
