#!/usr/bin/env python
"""Per-wave plan lint: the exact checks of
tests/test_plans.py::test_every_catalog_query_plans_clean, restricted
to the names given on the command line (fast newcomer loop; the FULL
test still runs before round close).

Usage: python tools_lint_subset.py name1 name2 ... [--sf DIR]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

from real_estate_data_pipeline_spark.queries import CATALOG  # noqa: E402
from real_estate_data_pipeline_spark.session import get_session  # noqa: E402
from test_plans import (  # noqa: E402
    _GLOBAL_WINDOW_AGG_BOUNDED_OK,
    _SCALAR_BROADCAST_OK,
    _unbounded_global_windows,
)


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if not args:
        sys.exit("usage: tools_lint_subset.py <query-name>... [--sf DIR]")
    spark = get_session("lint-subset")
    offenders = {}
    for name in args:
        df = CATALOG[name].fn(spark, sf)
        p = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in p and name not in _SCALAR_BROADCAST_OK:
            offenders[name] = "BroadcastNestedLoopJoin (not in scalar allowlist)"
        elif name not in _GLOBAL_WINDOW_AGG_BOUNDED_OK:
            gw = _unbounded_global_windows(df)
            if gw:
                offenders[name] = f"unbounded global window: {gw[0]}"
        print(f"{name}: {offenders.get(name, 'clean')}")
    if offenders:
        sys.exit(f"scale-unsafe plans: {offenders}")
    print("ALL CLEAN")


if __name__ == "__main__":
    main()
