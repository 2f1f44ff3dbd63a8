"""Split from queries.py lines 364-474 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t

# ===========================================================================
# P* filters / projections
# ===========================================================================

register(
    "p1_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)


def _p1(spark, sf_dir):
    """P1 equality filter + P5 projection. Ref: silver_etl_script.py:167,
    490-499. Filter and projection both push into the parquet scan."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


CATALOG["p1_filter_project"].fn = _p1

register(
    "p3_range_filter",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE value BETWEEN 10 AND 100 AND user_id <> 0
    """,
)


def _p3(spark, sf_dir):
    """P3 range predicate. Ref: silver_etl_script.py:542-553."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("value").between(10, 100) & (F.col("user_id") != 0))
        .select("event_id", "user_id", "value")
    )


CATALOG["p3_range_filter"].fn = _p3

register(
    "p2_validation_split",
    oracle="""
    SELECT CASE WHEN o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
                 AND length(o_orderstatus) > 0 AND o_totalprice > 0
                THEN 'valid' ELSE 'invalid' END AS bucket,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
)


def _p2(spark, sf_dir):
    """P2 compound validation predicate -> valid/invalid split counts.
    Ref: silver_etl_script.py:533-539,567-568."""
    o = t(spark, sf_dir, "orders")
    valid = (
        F.col("o_custkey").isNotNull()
        & F.col("o_orderstatus").isNotNull()
        & (F.length("o_orderstatus") > 0)
        & (F.col("o_totalprice") > 0)
    )
    return (
        o.select(F.when(valid, "valid").otherwise("invalid").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


CATALOG["p2_validation_split"].fn = _p2

register(
    "p4_null_dispatch",
    oracle="""
    SELECT (c_acctbal IS NOT NULL OR c_name IS NOT NULL) AS has_any, COUNT(*) AS cnt
    FROM (SELECT CASE WHEN c_acctbal < 500 THEN NULL ELSE c_acctbal END AS c_acctbal,
                 CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name
          FROM customer)
    GROUP BY has_any ORDER BY has_any
    """,
)


def _p4(spark, sf_dir):
    """P4 null-dispatch predicate ('at least one value present' flag).
    Ref: silver_etl_script.py:556-565. Null synthesis is wide enough
    that BOTH has_any groups exist at sf0.01 (VERDICT r1: the old
    nullif on a single name produced a degenerate 1-group result)."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        F.when(F.col("c_acctbal") < 500, None).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_name")).alias("c_name"),
    )
    return (
        base.select(
            (F.col("c_acctbal").isNotNull() | F.col("c_name").isNotNull()).alias("has_any")
        )
        .groupBy("has_any")
        .agg(F.count("*").alias("cnt"))
        .orderBy("has_any")
    )


CATALOG["p4_null_dispatch"].fn = _p4

