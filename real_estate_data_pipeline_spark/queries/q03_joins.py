"""Split from queries.py lines 475-562 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, dsum, register, t

# ===========================================================================
# J* joins
# ===========================================================================

register(
    "j1_dim_join_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    bench=True,
)


def _j1(spark, sf_dir):
    """J1 broadcast dimension joins. Ref: gold_ml_etl.py:169-192.
    nation/region are tiny dims -> explicit broadcast(), no shuffle of
    the fact side beyond the final aggregation."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("customers"), dsum("c_acctbal", "total_acctbal"))
    )


CATALOG["j1_dim_join_rollup"].fn = _j1

register(
    "j2_stats_backjoin",
    oracle="""
    WITH stats AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS nation_avg_acctbal
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_acctbal, s.nation_avg_acctbal,
           c.c_acctbal > s.nation_avg_acctbal AS above_avg
    FROM customer c LEFT JOIN stats s ON c.c_nationkey = s.c_nationkey
    """,
)


def _j2(spark, sf_dir):
    """J2 aggregate -> broadcast -> back-join enrichment (the reference's
    imputation pattern). Ref: data_enhancement.py:70-80."""
    c = t(spark, sf_dir, "customer")
    stats = c.groupBy("c_nationkey").agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("*")).alias(
            "nation_avg_acctbal"
        )
    )
    return c.join(F.broadcast(stats), "c_nationkey", "left").select(
        "c_custkey",
        "c_acctbal",
        "nation_avg_acctbal",
        (F.col("c_acctbal") > F.col("nation_avg_acctbal")).alias("above_avg"),
    )


CATALOG["j2_stats_backjoin"].fn = _j2

register(
    "j3_anti_orphans",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_custkey IS NULL
    """,
)


def _j3(spark, sf_dir):
    """J3 left-anti referential-integrity probe.
    Ref: data_quality_checks.py:158-162."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


CATALOG["j3_anti_orphans"].fn = _j3

