"""End-to-end orchestrated run: the reference's daily-DAG shape
(ingest -> silver -> gold, with quarantine + run metadata) through
PipelineRunner + run_and_write.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.io.readers import read_bronze_json
from real_estate_data_pipeline_spark.io.scd2 import Scd2Table
from real_estate_data_pipeline_spark.pipeline import GoldPipeline, SilverPipeline
from real_estate_data_pipeline_spark.pipeline.runner import PipelineRunner

from fixtures import write_bronze


def test_orchestrated_daily_run(spark, tmp_path):
    bronze_dir = write_bronze(str(tmp_path / "bronze"))
    silver_store = str(tmp_path / "silver")
    gold_store = str(tmp_path / "gold")
    meta = str(tmp_path / "meta")

    runner = PipelineRunner(spark, metadata_path=meta)
    scd2 = Scd2Table(
        spark, silver_store, key="universal_id",
        tracked=["project_name", "min_selling_price", "city"],
        order_col="ingested_at_utc",
    )

    @runner.stage("ingest")
    def ingest(ctx):
        ctx["bronze"] = {
            n: read_bronze_json(spark, f"{bronze_dir}/{n}.jsonl")
            for n in ("chotot_api", "meeyproject_api", "onehousing_api")
        }
        return {"sources": 3}

    @runner.stage("silver", needs=["ingest"])
    def silver(ctx):
        res = SilverPipeline(spark).run_and_write(
            ctx["bronze"], scd2,
            quarantine_path=str(tmp_path / "quarantine"),
            batch_ts=F.lit("2024-01-10 12:00:00"),
        )
        ctx["silver"] = res
        return res.counters

    @runner.stage("gold", needs=["silver"])
    def gold(ctx):
        cur = scd2.read().filter("is_current")
        out = GoldPipeline(spark).run(cur)
        out.write.mode("overwrite").partitionBy("quality_tier").parquet(gold_store)
        return {"gold_rows": out.count()}

    results = runner.run(run_id="r1")
    assert [r.status for r in results] == ["ok", "ok", "ok"], [r.error for r in results]
    assert results[1].counters["scd2_inserted"] == 6
    assert results[1].counters["quarantined"] == 2

    # sinks exist and are partitioned
    q = spark.read.parquet(str(tmp_path / "quarantine"))
    assert q.count() == 2 and "spider_name" in q.columns
    g = spark.read.parquet(gold_store)
    assert g.count() == 6 and "quality_tier" in g.columns
    m = spark.read.parquet(meta)
    assert m.count() == 3 and set(m.select("status").toPandas()["status"]) == {"ok"}


def test_runner_failure_isolation(spark, tmp_path):
    runner = PipelineRunner(spark)

    @runner.stage("a")
    def a(ctx):
        raise RuntimeError("boom")

    @runner.stage("b", needs=["a"])
    def b(ctx):
        return {}

    @runner.stage("c")  # independent branch
    def c(ctx):
        return {"ran": 1}

    results = {r.name: r for r in runner.run()}
    assert results["a"].status == "failed" and "boom" in results["a"].error
    assert results["b"].status == "skipped"
    assert results["c"].status == "ok"
