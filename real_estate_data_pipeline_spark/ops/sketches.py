"""Sketch aggregates — sublinear-memory approximations for 100 TB
cardinalities where exact answers need a full shuffle of distinct keys:

- approx distinct (HyperLogLog++, Spark built-in, tunable rsd);
- approx quantiles (Greenwald-Khanna / percentile_approx);
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
