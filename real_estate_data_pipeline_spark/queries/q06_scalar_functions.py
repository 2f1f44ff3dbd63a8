"""Split from queries.py lines 731-1035 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, X, dsum, register, t

# ===========================================================================
# F*/D*/M* scalar-function queries
# ===========================================================================

register(
    "f_customer_normalize",
    oracle="""
    SELECT c_custkey,
           lower(trim(c_name)) AS name_norm,
           regexp_replace(c_name, '[^0-9]', '', 'g') AS digits,
           CAST(length(c_name) AS BIGINT) AS name_len,
           sha256(concat_ws('_', 'customer', CAST(c_custkey AS VARCHAR))) AS uid
    FROM customer
    """,
)


def _fcn(spark, sf_dir):
    """F2/F4/F5/F11/F13 string normalization + sha2 surrogate key.
    Ref: transformation_utils.py:52-76,200-217; silver_etl_script.py:762-765."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.trim("c_name")).alias("name_norm"),
        F.regexp_replace("c_name", r"[^0-9]", "").alias("digits"),
        F.length("c_name").cast("long").alias("name_len"),
        X.hash_id(F.lit("customer"), F.col("c_custkey")).alias("uid"),
    )


CATALOG["f_customer_normalize"].fn = _fcn

register(
    "f_segment_recode_bucket",
    oracle="""
    SELECT c_custkey,
           CASE trim(c_mktsegment)
                WHEN 'BUILDING' THEN 'construction'
                WHEN 'AUTOMOBILE' THEN 'auto'
                WHEN 'MACHINERY' THEN 'industrial'
                ELSE trim(c_mktsegment) END AS segment_recode,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid'
                ELSE 'high' END AS balance_tier
    FROM customer
    """,
)


def _fseg(spark, sf_dir):
    """F6 dictionary recode + M8 bucketing.
    Ref: transformation_utils.py:220-254,434-456; gold_ml_etl.py:334-355."""
    c = t(spark, sf_dir, "customer")
    recode = X.recode_map(
        F.col("c_mktsegment"),
        {"BUILDING": "construction", "AUTOMOBILE": "auto", "MACHINERY": "industrial"},
        default=F.trim(F.col("c_mktsegment")),
    )
    tier = X.bucketize(F.col("c_acctbal"), [0.0, 3000.0, 7000.0], ["negative", "low", "mid", "high"])
    return c.select("c_custkey", recode.alias("segment_recode"), tier.alias("balance_tier"))


CATALOG["f_segment_recode_bucket"].fn = _fseg

register(
    "d_calendar_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           COUNT(*) AS orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
    FROM orders GROUP BY 1, 2, 3
    """,
)


def _dcal(spark, sf_dir):
    """D4/D5 calendar decomposition rollup. Ref: gold_ml_etl.py:314-321."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mon"),
    ).agg(F.count("*").alias("orders"), dsum("o_totalprice", "total_sales"))


CATALOG["d_calendar_rollup"].fn = _dcal

register(
    "d_epoch_and_format",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           strftime(ts, '%Y-%m-%d %H') AS hour_s
    FROM events
    """,
)


def _depoch(spark, sf_dir):
    """D2/D6 epoch-millis + formatting round-trip.
    Ref: silver_etl_script.py:364-389 (unix-millis parse path)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_s"),
    )


CATALOG["d_epoch_and_format"].fn = _depoch

register(
    "d7_freshness",
    oracle="""
    SELECT COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN (1706659200 - FLOOR(epoch(ts))) / 3600.0 > 240 THEN 1 ELSE 0 END) AS BIGINT) AS stale_rows
    FROM events
    """,
)


def _d7(spark, sf_dir):
    """D7 freshness-hours check against a fixed 'now' (2024-01-31 UTC).
    Ref: data_quality_checks.py:106-140."""
    e = t(spark, sf_dir, "events")
    age_h = (F.lit(1706659200) - F.col("ts").cast("timestamp").cast("long")) / F.lit(3600.0)
    return e.agg(
        F.count("*").alias("total_rows"),
        F.sum(F.when(age_h > 240, 1).otherwise(0)).alias("stale_rows"),
    )


CATALOG["d7_freshness"].fn = _d7

register(
    "m1_log_features",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_retailprice > 0 THEN ROUND(ln(p_retailprice), 6) END AS log_price,
           p_size * 10000.0 AS size_scaled
    FROM part
    """,
)


def _m1(spark, sf_dir):
    """M1 guarded log transform + M7 unit scale.
    Ref: gold_ml_etl.py:209-222; silver_etl_script.py:214-219.
    ln() is libm-dependent -> rounded to 6dp on both sides."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(X.log_guarded(F.col("p_retailprice")), 6).alias("log_price"),
        (F.col("p_size") * F.lit(10000.0)).alias("size_scaled"),
    )


CATALOG["m1_log_features"].fn = _m1

register(
    "m2_zscore_outliers",
    oracle="""
    WITH s AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             COUNT(*) AS n
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           (l_extendedprice - s.s1 / s.n) /
           SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS zscore
    FROM lineitem, s
    WHERE ABS((l_extendedprice - s.s1 / s.n) /
              SQRT((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))) > 2.5
    """,
)


def _m2(spark, sf_dir):
    """M2 z-score outlier detection, stats from exact decimal sums (no
    driver collect, unlike the reference's collect()-loop,
    silver_etl_script.py:668-693)."""
    li = t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast(DEC)
    s = li.agg(
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
        F.count("*").alias("n"),
    )
    j = li.crossJoin(F.broadcast(s))
    mean = F.col("s1") / F.col("n")
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("l_extendedprice") - mean) / std
    return (
        j.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 2.5)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "zscore")
    )


CATALOG["m2_zscore_outliers"].fn = _m2

register(
    "m3_order_price_spread",
    oracle="""
    SELECT l_orderkey,
           MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
           (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2.0 AS mid_price,
           MAX(l_extendedprice) - MIN(l_extendedprice) AS price_range,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)


def _m3(spark, sf_dir):
    """M3 midpoint + M4 range per group.
    Ref: silver_etl_script.py:771-828."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("n_lines"),
    )
    return g.select(
        "l_orderkey",
        "min_price",
        "max_price",
        ((F.col("min_price") + F.col("max_price")) / 2.0).alias("mid_price"),
        (F.col("max_price") - F.col("min_price")).alias("price_range"),
        "n_lines",
    )


CATALOG["m3_order_price_spread"].fn = _m3

register(
    "m6_completeness_score",
    oracle="""
    SELECT c_custkey,
           (CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN CASE WHEN c_acctbal >= 0 THEN c_acctbal END IS NOT NULL THEN 1 ELSE 0 END
           ) / 3.0 AS completeness
    FROM customer
    """,
)


def _m6(spark, sf_dir):
    """M6 completeness-score expression (nulls synthesized via nullif so
    the score varies). Ref: silver_etl_script.py:854-875."""
    c = t(spark, sf_dir, "customer")
    score = X.completeness_score(
        [
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
            F.col("c_name"),
            F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")),
        ]
    )
    return c.select("c_custkey", score.alias("completeness"))


CATALOG["m6_completeness_score"].fn = _m6

register(
    "m9_impute_cascade",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    ), med AS (
      SELECT c_nationkey, MEDIAN(bal) AS nation_median FROM base GROUP BY c_nationkey
    )
    SELECT b.c_custkey,
           COALESCE(b.bal, m.nation_median, 0.0) AS bal_imputed,
           b.bal IS NULL AS was_imputed
    FROM base b LEFT JOIN med m ON b.c_nationkey = m.c_nationkey
    """,
)


def _m9(spark, sf_dir):
    """M9 imputation cascade: group median -> broadcast back-join ->
    coalesce + flag. Ref: data_enhancement.py:86-143."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
    )
    med = base.groupBy("c_nationkey").agg(F.median("bal").alias("nation_median"))
    imputed, flag = X.impute_cascade(F.col("bal"), F.col("nation_median"), F.lit(0.0))
    return (
        base.join(F.broadcast(med), "c_nationkey", "left")
        .select("c_custkey", imputed.alias("bal_imputed"), F.col("bal").isNull().alias("was_imputed"))
    )


CATALOG["m9_impute_cascade"].fn = _m9

