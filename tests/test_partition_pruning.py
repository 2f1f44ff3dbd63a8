"""S2 — real partition pruning: a Hive-partitioned table + a partition-
column predicate prunes at plan time (PartitionFilters), replacing the
reference's manual year=/month= path-glob construction
(silver_etl_script.py:122-134).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.io.readers import with_incremental_filter


def test_partition_pruning(spark, tmp_path, sf_small):
    from real_estate_data_pipeline_spark.queries import t

    events = t(spark, sf_small, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_part")
    events.write.partitionBy("dt").parquet(path)

    part = spark.read.parquet(path)
    one_day = with_incremental_filter(part, "dt", "2024-01-05")

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "dt" in pf, f"partition predicate did not reach PartitionFilters: {pf}"

    # pruning actually happened: scan reads exactly one partition dir
    import re

    m = re.search(r"partition count[^\d]*(\d+)", plan, re.IGNORECASE)
    if m:  # Spark prints 'partition count' in some formats
        assert int(m.group(1)) == 1, plan
    # and the data is right
    days = one_day.select("dt").distinct().collect()
    assert [str(r["dt"]) for r in days] == ["2024-01-05"]  # partition col infers as DATE
    assert one_day.count() > 0
