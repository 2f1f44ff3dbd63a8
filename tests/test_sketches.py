"""Sketch error-bound tests (sketches are rows-only in the oracle gate;
here their error is bounded against exact answers) + streaming joins.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.sketches import (
    approx_quantiles,
    approx_top_k,
    cardinality_profile,
    cms_frequency,
    heavy_hitters,
    hll_merge_estimate,
    hll_partial_sketches,
)
from real_estate_data_pipeline_spark.queries import t
from real_estate_data_pipeline_spark.streaming.events import (
    correlate_streams,
    enrich_stream_with_dim,
    read_event_stream,
)


def test_approx_distinct_error_bound(spark, sf_oracle):
    li = t(spark, sf_oracle, "lineitem")
    prof = cardinality_profile(li, ["l_orderkey", "l_partkey"], rsd=0.02).first()
    exact_o = li.select("l_orderkey").distinct().count()
    exact_p = li.select("l_partkey").distinct().count()
    assert abs(prof["l_orderkey_approx_distinct"] - exact_o) / exact_o < 0.10
    assert abs(prof["l_partkey_approx_distinct"] - exact_p) / exact_p < 0.10
    assert prof["total_rows"] == li.count()


def test_approx_quantiles_error_bound(spark, sf_oracle):
    li = t(spark, sf_oracle, "lineitem")
    qs = approx_quantiles(li, "l_extendedprice", [0.5, 0.9], rel_err=0.01)
    exact_median = li.agg(F.median("l_extendedprice")).first()[0]
    assert abs(qs[0] - exact_median) / exact_median < 0.05


def test_heavy_hitters_exactness(spark, sf_oracle):
    e = t(spark, sf_oracle, "events")
    hh = {r["event_type"]: r["cnt"] for r in heavy_hitters(e, "event_type", 0.01).collect()}
    exact = {r["event_type"]: r["cnt"] for r in e.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert hh == exact  # all 5 types are above 1%
    assert not heavy_hitters(e, "event_type", 0.5).collect()  # none above 50%


# ---------------------------------------------------------------------------
# streaming joins
# ---------------------------------------------------------------------------

EVENTS = [
    {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "signup", "value": 0.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T00:30:00", "user_id": 1, "event_type": "purchase", "value": 9.0, "props": "{}"},
    {"event_id": 3, "ts": "2024-01-01T03:00:00", "user_id": 1, "event_type": "purchase", "value": 5.0, "props": "{}"},
    {"event_id": 4, "ts": "2024-01-01T00:10:00", "user_id": 2, "event_type": "signup", "value": 0.0, "props": "{}"},
]


@pytest.fixture()
def stream_src(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    with open(d / "p.jsonl", "w") as fh:
        for e in EVENTS:
            fh.write(json.dumps(e) + "\n")
    return read_event_stream(spark, str(d))


def _run(stream_df, name, spark):
    q = (
        stream_df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_hll_mergeable_union_bound(spark, sf_oracle):
    """Per-day sketches union-merged must estimate the GLOBAL distinct
    (not the sum of dailies — users appear on many days)."""
    e = t(spark, sf_oracle, "events").withColumn("__day", F.to_date("ts"))
    daily = hll_partial_sketches(e, "__day", "user_id")
    est = hll_merge_estimate(daily).first()["distinct_estimate"]
    exact = e.select("user_id").distinct().count()
    day_sum = daily.agg(F.sum("rows")).first()[0]
    assert abs(est - exact) / exact < 0.05
    assert est < day_sum  # merged, not summed


def test_cms_frequency_bounds(spark, sf_oracle):
    """CMS estimates never undercount, and overcount by at most eps*N."""
    e = t(spark, sf_oracle, "events")
    n = e.count()
    eps = 0.001
    cms = cms_frequency(e, "event_type", eps=eps)
    exact = {r["event_type"]: r["c"] for r in e.groupBy("event_type").agg(F.count("*").alias("c")).collect()}
    for item, true_cnt in exact.items():
        est = cms.estimateCount(item)
        assert est >= true_cnt
        assert est <= true_cnt + eps * n * 3  # 3x slack over the eps*N bound


def test_approx_top_k_exact_under_cap(spark, sf_oracle):
    o = t(spark, sf_oracle, "orders")
    got = {r["item"]: r["est_count"] for r in approx_top_k(o, "o_orderpriority", k=5).collect()}
    exact = {r["o_orderpriority"]: r["c"]
             for r in o.groupBy("o_orderpriority").agg(F.count("*").alias("c")).collect()}
    assert got == exact  # 5 distinct values < maxItemsTracked -> exact


def test_stream_static_join(spark, stream_src):
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id long, tier string")
    out = _run(enrich_stream_with_dim(stream_src, dim), "t_ss", spark)
    tiers = {r["event_id"]: r["tier"] for r in out.collect()}
    assert tiers[1] == "gold" and tiers[4] == "silver"


def test_stream_stream_join(spark, stream_src):
    signups = stream_src.filter(F.col("event_type") == "signup")
    purchases = stream_src.filter(F.col("event_type") == "purchase")
    out = _run(correlate_streams(signups, purchases, within="1 hour"), "t_ssj", spark)
    pairs = {(r["left_event"], r["right_event"]) for r in out.collect()}
    # purchase at 00:30 within 1h of signup at 00:00 -> matched;
    # purchase at 03:00 outside the bound -> dropped; user 2 has none
    assert pairs == {(1, 2)}


def test_kll_merged_quantiles_error_bound(spark, sf_oracle):
    """Per-group KLL partials folded into one sketch: the gate query now
    carries its own bounded-error contract — one row per quantile with
    the exact interpolated percentile and a within_bound boolean (the
    sketch estimate's empirical rank within 0.05 of q). All bounds must
    hold and the exact values must match an independent percentile()."""
    from real_estate_data_pipeline_spark.queries import CATALOG

    rows = {
        r["q"]: r
        for r in CATALOG["sketch_kll_price_quantiles"].fn(spark, sf_oracle).collect()
    }
    assert set(rows) == {0.50, 0.95, 0.99}
    assert all(r["within_bound"] for r in rows.values()), rows
    o = t(spark, sf_oracle, "orders")
    exact = o.agg(
        *[
            F.round(F.percentile(F.col("o_totalprice").cast("double"), q), 4).alias(str(q))
            for q in (0.5, 0.95, 0.99)
        ]
    ).first()
    for q in (0.5, 0.95, 0.99):
        assert rows[q]["exact_value"] == exact[str(q)]


def test_quarantine_split_first_match_priority(spark):
    """quarantine_split partitions the frame exactly; a row matching two
    rules carries the FIRST rule's reason (priority = list order)."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.quality.quarantine import (
        quarantine_report,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [(1, -5.0, "ok"), (2, 10.0, "bad"), (3, -1.0, "bad"), (4, 3.0, "ok")],
        "id long, bal double, tag string",
    )
    rules = [
        ("neg_bal", F.col("bal") < 0),
        ("bad_tag", F.col("tag") == "bad"),
    ]
    clean, quar = quarantine_split(df, rules)
    assert {r["id"] for r in clean.collect()} == {4}
    got = {r["id"]: r["quarantine_reason"] for r in quar.collect()}
    # id 3 matches BOTH rules -> first rule wins
    assert got == {1: "neg_bal", 2: "bad_tag", 3: "neg_bal"}
    rep = {r["quarantine_reason"]: r["n"] for r in quarantine_report(df, rules).collect()}
    assert rep == {"neg_bal": 2, "bad_tag": 1, "clean": 1}
    # empty rule list: everything clean
    c2, q2 = quarantine_split(df, [])
    assert c2.count() == 4 and q2.count() == 0


def test_observed_metrics_free_with_write(spark, tmp_path):
    """Observation metrics must equal a direct aggregate, and they ride
    the write action — no second scan job over the source."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.quality.checks import observed_metrics

    df = spark.range(0, 10_000).withColumn(
        "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2.0)
    )
    observed, obs = observed_metrics(
        df,
        {
            "rows": F.count(F.lit(1)),
            "nulls_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
            "max_v": F.max("v"),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["rows"] == 10_000
    assert got["nulls_v"] == 1_000
    assert got["max_v"] == 19_998.0


def test_merge_rollups_multi_batch_equals_full(spark):
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops.incremental import (
        merge_rollups,
        mergeable_rollup,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 13 % 997).alias("v")
    )
    aggs = {"n": ("*", "count"), "s": ("v", "sum"), "lo": ("v", "min"), "hi": ("v", "max")}
    parts = [
        mergeable_rollup(df.filter(F.col("id") % 3 == i), ["k"], aggs) for i in range(3)
    ]
    merged = {r["k"]: r for r in merge_rollups(parts, ["k"], aggs).collect()}
    full = {r["k"]: r for r in mergeable_rollup(df, ["k"], aggs).collect()}
    assert set(merged) == set(full)
    for k in full:
        for c in ("n", "s", "lo", "hi"):
            assert merged[k][c] == full[k][c], (k, c)


def test_table_diff_null_safe_compare(spark):
    from real_estate_data_pipeline_spark.ops.incremental import table_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "y")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, "z")], "id long, v string"
    )
    got = {r["id"]: r["diff_status"] for r in table_diff(old, new, "id").collect()}
    # null <=> null is UNCHANGED; 'x' -> null is CHANGED (not a silent match)
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    # NULL KEY rows are legal values under the null-safe key join: a
    # NULL-key row present on both sides is matched, not 'added'
    old2 = spark.createDataFrame([(None, "a"), (7, "b")], "id long, v string")
    new2 = spark.createDataFrame([(None, "a")], "id long, v string")
    got2 = {r["id"]: r["diff_status"] for r in table_diff(old2, new2, "id").collect()}
    assert got2 == {None: "unchanged", 7: "removed"}
