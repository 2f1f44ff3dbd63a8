"""Tests: salted aggregation/join equivalence, applyInPandasWithState
running totals, SCD2 time travel.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.io.scd2 import Scd2Table
from real_estate_data_pipeline_spark.ops.skew import salted_aggregate, salted_join
from real_estate_data_pipeline_spark.streaming.events import (
    read_event_stream,
    user_running_totals_stream,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%) + tail
    hot = spark.range(0, 9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v"), F.col("id")
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
        (F.col("id") + 100000).alias("id"),
    )
    return hot.unionByName(tail)


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            skewed, ["k"],
            {"s": ("v", "sum"), "n": ("*", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8, salt_from="id",
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"t{i}", f"dim{i}") for i in range(50)], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = salted_join(skewed, dim, "k", n_salts=8, salt_from="id").groupBy("label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_aggregate_rejects_non_algebraic(spark, skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(skewed, ["k"], {"m": ("v", "median")})


def test_default_salt_spreads_hot_key(spark, skewed):
    """ADVICE r1: the old default salted on the key itself — every HOT
    row got ONE salt and the mitigation was a no-op. The new default
    hashes all columns; assert correctness AND actual spreading."""
    plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    got = {
        r["k"]: r["n"]
        for r in salted_aggregate(skewed, ["k"], {"n": ("*", "count")}, n_salts=8).collect()
    }
    assert plain == got
    from real_estate_data_pipeline_spark.ops.skew import _salt

    n_salts = (
        skewed.filter(F.col("k") == "HOT")
        .select(_salt(skewed, 8, None, ["k"]).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts > 1  # hot key really spans multiple reducers


def test_salting_on_group_key_rejected(spark, skewed):
    with pytest.raises(ValueError, match="group/join key"):
        salted_aggregate(skewed, ["k"], {"n": ("*", "count")}, salt_from="k")
    with pytest.raises(ValueError, match="group/join key"):
        salted_join(skewed, skewed.select("k").distinct(), "k", salt_from="k")


def test_apply_in_pandas_with_state(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    events = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "c", "value": 10.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "c", "value": 5.0, "props": "{}"},
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 2, "event_type": "c", "value": 7.0, "props": "{}"},
    ]
    with open(d / "p.jsonl", "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    src = read_event_stream(spark, str(d))
    out = user_running_totals_stream(src)
    q = (
        out.writeStream.format("memory").queryName("t_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {r["user_id"]: r for r in spark.table("t_state").collect()}
    assert rows[1]["n_events"] == 2 and rows[1]["total_value"] == pytest.approx(15.0)
    assert rows[2]["n_events"] == 1 and rows[2]["total_value"] == pytest.approx(7.0)


def test_scd2_time_travel(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "tt"), key="k", tracked=["v"], order_col="ts")
    for i, v in enumerate([1.0, 2.0, 3.0]):
        df = spark.createDataFrame([("a", v, f"2024-01-0{i+1}")], "k string, v double, ts string")
        t.merge(df, batch_ts=F.lit(f"2024-01-0{i+1} 12:00:00"))
    assert t.history() == [1, 2, 3]
    assert t.read(version=1).filter("is_current").first()["v"] == 1.0
    assert t.read().filter("is_current").first()["v"] == 3.0
    with pytest.raises(FileNotFoundError):
        t.read(version=99)


def test_salted_top_n_hot_key_exact(spark):
    """One key holds 90% of rows; the salted two-phase rank must return
    exactly the plain-window top-N (order_by is total via id)."""
    from pyspark.sql import Window

    from real_estate_data_pipeline_spark.ops.skew import salted_top_n

    rows = [(i, "hot" if i % 10 != 0 else f"cold{i}", float(i * 37 % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, k string, score double")
    got = salted_top_n(df, ["k"], [F.desc("score"), F.col("id")], n=5, n_salts=8,
                       salt_from="id").select("id", "k")
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.col("id"))
    want = (df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
            .select("id", "k"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
