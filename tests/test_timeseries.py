"""resample_ffill: dense grid construction, forward fill, observed
flags, deterministic tie-breaks, and the runaway-span guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.timeseries import resample_ffill


def _events(spark):
    rows = [
        # key "a": events at 00:10, 00:20 (same bucket), 03:05 -> grid 00..03
        ("a", "2024-01-01 00:10:00", 1, 10.0),
        ("a", "2024-01-01 00:20:00", 2, 20.0),
        ("a", "2024-01-01 03:05:00", 3, 30.0),
        # key "b": single event -> one-bucket grid
        ("b", "2024-01-01 05:59:00", 4, 5.0),
    ]
    return spark.createDataFrame(
        rows, "k string, ts string, event_id int, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_grid_fill_and_observed_flags(spark):
    out = {
        (r["k"], r["bucket_ts"].strftime("%H")): (r["value"], r["observed"])
        for r in resample_ffill(
            _events(spark), "k", "ts", "value", 3600, tiebreaker_col="event_id"
        ).collect()
    }
    # a: 4 buckets 00-03; 00 takes the LAST in-bucket event (20.0);
    # 01/02 are filled copies; 03 observed again
    assert out[("a", "00")] == (20.0, True)
    assert out[("a", "01")] == (20.0, False)
    assert out[("a", "02")] == (20.0, False)
    assert out[("a", "03")] == (30.0, True)
    assert out[("b", "05")] == (5.0, True)
    assert len(out) == 5


def test_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 7, 70.0), ("a", "2024-01-01 00:00:00", 9, 90.0)],
        "k string, ts string, event_id int, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = resample_ffill(df, "k", "ts", "value", 3600, tiebreaker_col="event_id").first()
    assert row["value"] == 90.0  # higher event_id wins the tie


def test_runaway_span_guard(spark):
    df = spark.createDataFrame(
        [("a", "1970-01-01 00:00:00", 1, 1.0), ("a", "2024-01-01 00:00:00", 2, 2.0)],
        "k string, ts string, event_id int, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(Exception, match="max_buckets_per_key"):
        resample_ffill(df, "k", "ts", "value", 3600, max_buckets_per_key=1000).collect()
    # guard off: the giant grid is allowed (lazy count only)
    n = resample_ffill(
        df, "k", "ts", "value", 3600, max_buckets_per_key=None
    ).count()
    assert n > 400_000


# --- asof_join direction/tolerance (pandas merge_asof parity) ---------------


def _asof_frames(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1), ("a", "2024-01-01 12:00:00", 2),
         ("b", "2024-01-01 10:00:00", 3)],
        "k string, ts string, lid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 09:00:00", 9.0), ("a", "2024-01-01 11:30:00", 11.5),
         ("b", "2024-01-01 10:00:00", 10.0)],
        "k string, rts string, v double",
    ).withColumn("rts", F.to_timestamp("rts"))
    return left, right


def _collect(out):
    return {r["lid"]: r["v_asof"] for r in out.collect()}


def test_asof_directions(spark):
    from real_estate_data_pipeline_spark.ops.asof import asof_join

    left, right = _asof_frames(spark)
    back = _collect(asof_join(left, right, "k", "ts", "rts", ["v"]))
    # lid 1 @10:00 -> 09:00 (9.0); lid 2 @12:00 -> 11:30; lid 3 exact-ts match
    assert back == {1: 9.0, 2: 11.5, 3: 10.0}
    fwd = _collect(
        asof_join(left, right, "k", "ts", "rts", ["v"], direction="forward")
    )
    # lid 1 @10:00 -> next is 11:30; lid 2 @12:00 -> none ahead; lid 3 exact
    assert fwd == {1: 11.5, 2: None, 3: 10.0}
    near = _collect(
        asof_join(left, right, "k", "ts", "rts", ["v"], direction="nearest")
    )
    # lid 1: back 1h vs fwd 1.5h -> 9.0; lid 2: only back; lid 3 exact
    assert near == {1: 9.0, 2: 11.5, 3: 10.0}


def test_asof_tolerance_and_tie(spark):
    from real_estate_data_pipeline_spark.ops.asof import asof_join

    left, right = _asof_frames(spark)
    # 45 min tolerance: lid 1's backward match (1 h away) nulls out —
    # match-then-null, NOT nearest-within-window (pandas semantics)
    back = _collect(
        asof_join(left, right, "k", "ts", "rts", ["v"], tolerance_seconds=2700)
    )
    assert back == {1: None, 2: 11.5, 3: 10.0}
    # nearest tie breaks backward: a left row equidistant from both
    tie_left = spark.createDataFrame(
        [("a", "2024-01-01 10:15:00", 1)], "k string, ts string, lid int"
    ).withColumn("ts", F.to_timestamp("ts"))
    tie_right = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1.0), ("a", "2024-01-01 10:30:00", 2.0)],
        "k string, rts string, v double",
    ).withColumn("rts", F.to_timestamp("rts"))
    near = _collect(
        asof_join(tie_left, tie_right, "k", "ts", "rts", ["v"], direction="nearest")
    )
    assert near == {1: 1.0}


def test_asof_invalid_direction(spark):
    from real_estate_data_pipeline_spark.ops.asof import asof_join

    left, right = _asof_frames(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "ts", "rts", ["v"], direction="sideways")


def test_asof_max_of_ties_matches_preaggregation(spark):
    """max_of_ties folds the per-(key, ts) max into the window sort —
    must equal pre-aggregating max(value) for every direction, incl.
    tied groups whose max arrives first and mixed-null groups."""
    from real_estate_data_pipeline_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1), ("a", "2024-01-01 12:00:00", 2),
         ("b", "2024-01-01 11:00:00", 3)],
        "k string, ts string, lid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        # 09:00 group: max (9.5) listed BEFORE a smaller tie; 11:30
        # group: a NULL tie beside non-nulls; b: singleton
        [("a", "2024-01-01 09:00:00", 9.5), ("a", "2024-01-01 09:00:00", 2.0),
         ("a", "2024-01-01 11:30:00", None), ("a", "2024-01-01 11:30:00", 11.5),
         ("a", "2024-01-01 11:30:00", 4.0), ("b", "2024-01-01 10:00:00", 10.0)],
        "k string, rts string, v double",
    ).withColumn("rts", F.to_timestamp("rts"))
    agg = right.groupBy("k", "rts").agg(F.max("v").alias("v"))
    for direction in ("backward", "forward", "nearest"):
        got = _collect(
            asof_join(left, right, "k", "ts", "rts", ["v"],
                      direction=direction, max_of_ties=True)
        )
        want = _collect(
            asof_join(left, agg, "k", "ts", "rts", ["v"], direction=direction)
        )
        assert got == want, (direction, got, want)


def test_asof_max_of_ties_rejects_multiple_value_cols(spark):
    from real_estate_data_pipeline_spark.ops.asof import asof_join

    left, right = _asof_frames(spark)
    right = right.withColumn("v2", F.col("v") * 2)
    with pytest.raises(ValueError, match="max_of_ties"):
        asof_join(left, right, "k", "ts", "rts", ["v", "v2"], max_of_ties=True)
