#!/usr/bin/env python
"""Time individual bench queries in isolation (noop sink, best-of-N)
with the calibration job bracketing — the per-query measurement loop of
the r15 optimization round (guide §1.1/§1.4).

Usage: python tools_r15_timeq.py q1 [q2 ...] [--n 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_estate_data_pipeline_spark.queries import CATALOG  # noqa: E402
from real_estate_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n = 3
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("timeq-r15")

    def cal() -> float:
        s = time.perf_counter()
        spark.range(0, 100_000_000, 1, 32).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        return round(time.perf_counter() - s, 3)

    # warmup: sf0.001 pass (codegen) + one untimed target-SF pass
    for name in names:
        try:
            CATALOG[name].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as e:
            print(f"warmup {name} FAILED: {e!r}", file=sys.stderr)
    c0 = cal()
    for name in names:
        spark.sparkContext.setJobDescription(f"timeq:{name}")
        times = []
        for _ in range(n):
            s = time.perf_counter()
            CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - s, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"RESULT {name}: min={min(times)} all={times}")
    print(f"CAL before={c0} after={cal()}")
    spark.stop()


if __name__ == "__main__":
    main()
