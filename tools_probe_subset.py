#!/usr/bin/env python
"""Subset 10x scale probe: same derived corpus and measurement recipe
as tools_scale_probe, but only for the names given on the command line
(the per-wave newcomer probe of the round ritual).

Usage: python tools_probe_subset.py name1 name2 ...  (run EXCLUSIVELY —
timing-sensitive.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_estate_data_pipeline_spark.session import get_session  # noqa: E402
from tools_scale_probe import (  # noqa: E402
    _DERIVED_MARK,
    DST,
    SRC,
    _fn,
    build_derived,
)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: tools_probe_subset.py <query-name>...")
    if not os.path.exists(f"{DST}/{_DERIVED_MARK}"):
        build_derived()
        with open(f"{DST}/{_DERIVED_MARK}", "w") as fh:
            fh.write("orders sharded 10x, lineitem-aligned o_orderkey stride\n")
    spark = get_session("scale-probe-subset")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for n in names:  # warm codegen at the small sf
        mat(_fn(n)(spark, "/root/testdata/sf0.01"))
    res: dict[str, dict[str, float]] = {}
    for sf, label in ((SRC, "1x"), (DST, "10x")):
        for n in names:
            t0 = time.perf_counter()
            mat(_fn(n)(spark, sf))
            res.setdefault(n, {})[label] = time.perf_counter() - t0
    for n, v in res.items():
        print(
            f"{n:34s} 1x={v['1x']:6.2f}s 10x={v['10x']:7.2f}s "
            f"ratio={v['10x'] / v['1x']:5.1f}"
        )


if __name__ == "__main__":
    main()
