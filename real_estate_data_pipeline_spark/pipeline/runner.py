"""Pipeline orchestration — the engine-level equivalent of the
reference's Airflow DAGs (dags/silver_property_standardization.py,
dags/gold_ml_features_dag.py): named stages with dependencies, run
metadata, and failure isolation, but in-process (scheduling stays with
whatever runs the job — cron, Airflow, Databricks workflows).

Also carries the reference's run-metadata sink (S8 +
silver_etl_script.py:1022-1041): one appended row per run with
counters.
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import SparkSession


@dataclass
class StageResult:
    name: str
    status: str  # ok | failed | skipped
    seconds: float
    error: str = ""
    counters: dict = field(default_factory=dict)


@dataclass
class PipelineRunner:
    """Minimal dependency-ordered stage runner.

    >>> r = PipelineRunner(spark)
    >>> r.stage("ingest")(lambda ctx: {...})
    >>> r.stage("silver", needs=["ingest"])(lambda ctx: {...})
    >>> results = r.run()

    Each stage fn receives a shared mutable ``ctx`` dict and may return
    a counters dict. A failed stage skips its dependents but not
    independent branches (ExternalTaskSensor semantics, minus the
    polling)."""

    spark: SparkSession
    metadata_path: str | None = None
    _stages: list[tuple[str, list[str], Callable]] = field(default_factory=list)

    def stage(self, name: str, needs: list[str] | None = None):
        def deco(fn):
            self._stages.append((name, needs or [], fn))
            return fn

        return deco

    def run(self, run_id: str | None = None) -> list[StageResult]:
        run_id = run_id or f"run_{int(time.time())}"
        ctx: dict = {"run_id": run_id, "spark": self.spark}
        done: dict[str, StageResult] = {}
        results: list[StageResult] = []
        for name, needs, fn in self._stages:  # declaration order is topo order
            bad = [n for n in needs if n not in done or done[n].status != "ok"]
            if bad:
                res = StageResult(name, "skipped", 0.0, error=f"needs failed: {bad}")
            else:
                t0 = time.perf_counter()
                try:
                    counters = fn(ctx) or {}
                    res = StageResult(name, "ok", round(time.perf_counter() - t0, 3), counters=dict(counters))
                except Exception:
                    res = StageResult(
                        name, "failed", round(time.perf_counter() - t0, 3),
                        error=traceback.format_exc(limit=3),
                    )
            done[name] = res
            results.append(res)
        if self.metadata_path:
            self._write_metadata(run_id, results)
        return results

    def _write_metadata(self, run_id: str, results: list[StageResult]) -> None:
        """Run-metadata sink — one row per stage per run.
        Ref: silver_etl_script.py:1022-1041."""
        rows = [
            (run_id, r.name, r.status, float(r.seconds), str(r.counters), r.error[:500])
            for r in results
        ]
        df = self.spark.createDataFrame(
            rows, "run_id string, stage string, status string, seconds double, counters string, error string"
        )
        df.coalesce(1).write.mode("append").parquet(self.metadata_path)
