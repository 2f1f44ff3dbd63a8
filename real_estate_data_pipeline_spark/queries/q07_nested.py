"""Split from queries.py lines 1036-1161 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, similarity, t

# ===========================================================================
# N* nested data
# ===========================================================================

register(
    "n9_json_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           event_type
    FROM events
    """,
)


def _n9(spark, sf_dir):
    """N9 JSON string parse. Ref: silver_etl_script.py:460-475."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        "event_type",
    )


CATALOG["n9_json_extract"].fn = _n9

register(
    "n12_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max
    FROM events GROUP BY event_type
    """,
)


def _n12(spark, sf_dir):
    """Semi-structured JSON via Spark 4's VARIANT type (parse_json +
    variant_get) instead of per-path get_json_object string re-parsing
    (n9): one parse per row, typed sub-field access, and on real tables
    the open-ended schema can be stored shredded. Rolled up per
    event_type so the extraction is value-verified end to end."""
    ev = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("__k").cast("bigint").alias("k_sum"),
            F.max("__k").cast("bigint").alias("k_max"),
        )
    )


CATALOG["n12_variant_extract"].fn = _n12

register(
    "f14_ansi_safe_parse",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS priority_no,
           TRY_CAST(o_orderstatus AS BIGINT) AS status_num,
           CAST(o_totalprice AS DOUBLE)
             / NULLIF(CAST(o_custkey % 100 AS DOUBLE), 0.0) AS price_ratio
    FROM orders
    """,
)


def _df14(spark, sf_dir):
    """ANSI-safe parsing family: Spark 4 runs in ANSI mode, where a bad
    CAST or a divide-by-zero THROWS mid-job instead of yielding NULL —
    the classic 100 TB footgun (one malformed row kills an 8-hour run).
    try_cast / try_divide are the engine's sanctioned escape hatches:
    priority numbers parse from '1-URGENT', a non-numeric column
    try_casts to NULL (never throws), and try_divide NULLs out on the
    zero-denominator rows (custkey %% 100 == 0) instead of aborting.
    Oracle: DuckDB's TRY_CAST / NULLIF equivalents."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.split(F.col("o_orderpriority"), "-")[0].try_cast("bigint").alias(
            "priority_no"
        ),
        F.col("o_orderstatus").try_cast("bigint").alias("status_num"),
        F.try_divide(
            F.col("o_totalprice").cast("double"),
            (F.col("o_custkey") % 100).cast("double"),
        ).alias("price_ratio"),
    )


CATALOG["f14_ansi_safe_parse"].fn = _df14

register(
    "n_array_access",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[-1] AS DOUBLE) AS last_val,
           list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm_sq
    FROM embeddings
    """,
)


def _narr(spark, sf_dir):
    """N4/N8 element access + size + higher-order fold.
    Ref: transformation_utils.py:605-630; silver_etl_script.py:226-240."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        similarity.l2_norm_sq(F.col("embedding")).alias("norm_sq"),
    )


CATALOG["n_array_access"].fn = _narr

