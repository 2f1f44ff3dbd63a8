"""Bucketed tables — co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of fact-fact joins (orders ⋈ lineitem) is
shuffling both sides on the key. Writing both tables bucketed by that
key with the same bucket count lets Spark's FileSourceScanExec report
a HashPartitioning output, so SortMergeJoin runs with NO Exchange on
either side — the join is pre-shuffled at write time, paid once,
amortized over every subsequent query. Same for groupBy on the bucket
key. (Verified by tests/test_bucketing.py asserting the Exchange-free
plan.)

Bucketing needs the table catalog (saveAsTable) — plain .parquet(path)
writes drop bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ optionally sorted) managed table.

    Overwrite reconciles catalog and warehouse first: with the default
    in-memory catalog, a table written by a PREVIOUS session leaves its
    warehouse directory behind while the new session's catalog has
    never heard of it — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS. DROP IF EXISTS handles the same-session
    case; the orphaned-directory sweep handles the cross-session one.
    (A Hive/Unity metastore persists the catalog and never hits this.)"""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import os
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        wh = wh.removeprefix("file:")
        # managed-table layout: <wh>/<table> for the default namespace,
        # <wh>/<db>.db/<table> for a qualified name — sweeping the bare
        # last segment for "db.t" would rmtree an unrelated default-
        # namespace table named "t"
        parts = table.lower().split(".")
        if len(parts) == 1:
            leftover = os.path.join(wh, parts[0])
        else:
            leftover = os.path.join(wh, f"{parts[-2]}.db", parts[-1])
        if wh and os.path.isdir(leftover):
            shutil.rmtree(leftover)
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans without
    an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
