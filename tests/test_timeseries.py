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
