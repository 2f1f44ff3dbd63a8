"""Bucketed-table plan tests: the fact-fact join and the bucket-key
aggregation must plan WITHOUT a shuffle (Exchange) once both sides are
bucketed — the pre-shuffled-at-write-time scale strategy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.io.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory, sf_small):
    # warehouse dir is a static conf; the session default (./spark-warehouse,
    # gitignored) is fine for these managed test tables
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "key"), "b_orders", "key", 8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "key"), "b_lineitem", "key", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    # at test scale the planner prefers broadcast (also shuffle-free);
    # disable it to show the bucketed SortMergeJoin path that matters
    # when BOTH sides are 100 TB facts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, f"expected SMJ over buckets\n{plan}"
        assert "Exchange hashpartitioning" not in plan, f"bucketed join must not shuffle\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    agg = spark.table("b_lineitem").groupBy("key").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucket-key aggregation must not shuffle\n{plan}"
    assert agg.count() > 0


def test_bucketed_matches_plain_join(spark, bucketed_tables, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    bucketed = bucketed_join(spark, "b_orders", "b_lineitem", "key").count()
    assert plain == bucketed
