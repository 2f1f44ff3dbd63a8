"""Split from queries.py lines 11676-11697 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import DataFrame, F, SparkSession, dedup, dsum, t

# ===========================================================================
# entry() flagship
# ===========================================================================


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: keep-latest dedup per customer (W1) -> broadcast dim join
    (J1) -> grouped decimal-exact aggregate (A1) -> ordered result."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    latest = dedup.keep_latest(o, ["o_custkey"], "o_orderdate", tiebreakers=["o_orderkey"])
    return (
        latest.join(F.broadcast(c), latest.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("customers"),
            dsum("o_totalprice", "latest_order_value"),
        )
        .orderBy("c_mktsegment")
    )


