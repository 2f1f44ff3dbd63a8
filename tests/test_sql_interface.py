"""SQL-string interface tests: same answers as the DataFrame catalog,
same physical plans (pushdown through views)."""

from __future__ import annotations

from real_estate_data_pipeline_spark.queries import CATALOG
from real_estate_data_pipeline_spark.sql import register_tables, sql


def test_sql_matches_dataframe_catalog(spark, sf_small):
    out = sql(
        spark,
        sf_small,
        """
        SELECT o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY o_orderpriority ORDER BY cnt DESC, o_orderpriority
        """,
    )
    df_rows = [tuple(r) for r in CATALOG["a2_priority_counts"].fn(spark, sf_small).collect()]
    sql_rows = [tuple(r) for r in out.collect()]
    assert df_rows == sql_rows


def test_sql_view_pushdown(spark, sf_small):
    register_tables(spark, sf_small, ["lineitem"])
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity < 5")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters", 1)[1][:200]
