"""Sketch aggregates — sublinear-memory approximations for 100 TB
cardinalities where exact answers need a full shuffle of distinct keys:

- approx distinct (HyperLogLog++, Spark built-in, tunable rsd);
- approx quantiles (Greenwald-Khanna / percentile_approx);
- re-aggregatable DataSketches HLL (per-group binary sketches +
  union-merge estimate — incremental distinct maintenance);
- Count-Min frequency sketch (point-frequency overestimates within
  eps*N);
- approx_top_k (DataSketches frequent-items, exact below the tracking
  cap);
- heavy hitters (approximate top-k via count-min-style sampling:
  we use the exact grouped count at a capped support threshold, which
  at scale becomes a two-level partial aggregation).

These are deliberately NOT oracle-checked value-for-value (every engine
implements different sketch internals); tests bound their error against
exact answers instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(c: str | Column, rsd: float = 0.02) -> Column:
    """HLL++ distinct count; rsd = target relative standard deviation.
    Memory is O(1/rsd^2) regardless of cardinality."""
    return F.approx_count_distinct(c, rsd)


def approx_quantiles(df: DataFrame, col: str, probs: list[float], rel_err: float = 0.01) -> list[float]:
    """Greenwald-Khanna approximate quantiles (single pass, mergeable)."""
    return df.approxQuantile(col, probs, rel_err)


def cardinality_profile(df: DataFrame, cols: list[str], rsd: float = 0.02) -> DataFrame:
    """One pass, one row: approx distinct count per column — the scan
    you run FIRST on an unknown 100 TB table (exact countDistinct on
    every column would be |cols| shuffles)."""
    aggs = [approx_distinct(c, rsd).alias(f"{c}_approx_distinct") for c in cols]
    aggs.append(F.count(F.lit(1)).alias("total_rows"))
    return df.agg(*aggs)


def hll_partial_sketches(df: DataFrame, group_col: str, value_col: str, lg_k: int = 12) -> DataFrame:
    """Per-group DataSketches HLL binaries (``hll_sketch_agg``). The
    re-aggregatable form of distinct counting: build once per partition/
    day/source, store the bytes, merge later — the pattern that turns a
    100 TB global distinct into incremental maintenance instead of a
    full rescan."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), lg_k).alias("hll_sketch"),
        F.count(F.lit(1)).alias("rows"),
    )


def hll_merge_estimate(sketches: DataFrame, sketch_col: str = "hll_sketch") -> DataFrame:
    """Union partial HLL sketches and estimate the merged distinct
    count. Composes with :func:`hll_partial_sketches`: the union is an
    aggregate over tiny binaries, never over raw values."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("distinct_estimate")
    )


def cms_frequency(df: DataFrame, col: str, eps: float = 0.001, confidence: float = 0.99, seed: int = 42):
    """Count-Min frequency sketch of a column via the ``count_min_sketch``
    JVM aggregate (one distributed pass, O(1/eps) memory). The binary
    sketch is tiny, so deserializing it on the driver is the intended
    usage (PySpark 4 dropped the ``df.stat.countMinSketch`` wrapper;
    the underlying ``org.apache.spark.util.sketch.CountMinSketch`` is
    still the execution engine). ``estimateCount(item)`` overestimates
    the true count by at most eps*N with the given confidence."""
    spark = df.sparkSession
    raw = df.agg(
        F.expr(
            f"count_min_sketch({col}, {eps!r}d, {confidence!r}d, {seed})"
        ).alias("__cms")
    ).first()["__cms"]
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(raw))


def approx_top_k(df: DataFrame, col: str, k: int = 5, max_tracked: int = 10000) -> DataFrame:
    """Approximate top-k frequent items (Spark 4 ``approx_top_k``
    DataSketches aggregate): one pass, bounded memory, no full
    group-by shuffle. Output: one row per item with its estimated
    count, ordered like the sketch reports them."""
    top = df.agg(F.expr(f"approx_top_k({col}, {k}, {max_tracked})").alias("__tk"))
    return top.select(F.explode("__tk").alias("__e")).select(
        F.col("__e.item").alias("item"), F.col("__e.count").alias("est_count")
    )


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.01) -> DataFrame:
    """Values appearing in at least ``min_share`` of rows. Two-level
    aggregation (partial counts map-side) keeps the shuffle at
    O(distinct), and the share filter prunes the long tail."""
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("__n") * min_share)
        .select(col, "cnt", (F.col("cnt") / F.col("__n")).alias("share"))
        .orderBy(F.desc("cnt"), col)
    )
