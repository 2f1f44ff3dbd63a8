"""SQL-string interface: register the testdata tables as temp views and
run ANSI SQL through Spark's parser — the engine is equally usable
SQL-first or DataFrame-first (both compile to the same Catalyst plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import t

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Create (or replace) temp views for the star-schema tables. Views
    are plan-level aliases: no data is copied, pushdown still reaches
    the parquet scans."""
    for name in tables or TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL string against the registered tables."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
