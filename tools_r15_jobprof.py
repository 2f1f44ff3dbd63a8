#!/usr/bin/env python
"""Per-query job/stage-count profile over the bench set (guide §1.5).

Job+stage counts are robust to host load (unlike wall seconds on this
shared sandbox), and at sf0.1 the bench is dominated by per-job fixed
cost, so this ranks structural waste. Each query runs once (after a
catalog-wide warmup pass) under its own job group; job ids are collected
via the status tracker.

Usage: python tools_r15_jobprof.py [query ...]   (default: all bench)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_estate_data_pipeline_spark.queries import CATALOG  # noqa: E402
from real_estate_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or [n for n, q in CATALOG.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("jobprof-r15")
    sc = spark.sparkContext

    # warmup: codegen + parquet footers + page cache
    for name in names:
        try:
            CATALOG[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:
            print(f"warmup {name} FAILED: {e!r}", file=sys.stderr)

    tracker = sc.statusTracker()
    rows = []
    for name in names:
        group = f"prof:{name}"
        sc.setJobGroup(group, name)
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        sc.setJobGroup(None, None)
        jids = tracker.getJobIdsForGroup(group)
        nstages = 0
        ntasks = 0
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None and si.numCompletedTasks > 0:
                    nstages += 1
                    ntasks += si.numTasks
        rows.append((len(jids), nstages, ntasks, name))
    rows.sort(reverse=True)
    print(f"{'jobs':>5} {'stages':>6} {'tasks':>6}  query")
    for j, st, ta, name in rows:
        print(f"{j:>5} {st:>6} {ta:>6}  {name}")
    print(f"TOTAL jobs={sum(r[0] for r in rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
