"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single map + top-k, no shuffle of
the corpus. Scale path: deterministic sign-LSH bucketing (hyperplanes =
coordinate axes of leading dims), which prunes candidates with one
equi-join; and an IVF-style variant that clusters on coarse buckets.

All dot products are built-in higher-order functions (zip_with +
aggregate) folding left-to-right in double precision — deterministic and
reproducible in any engine that folds sequentially.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: concatenated signs of the first ``bits``
    dimensions. A degenerate-but-deterministic random-hyperplane LSH
    (planes = coordinate axes); replace with seeded Gaussian planes for
    production recall."""
    parts = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def brute_force_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of the corpus against one query vector.

    Plan shape: corpus scan -> per-row cosine (map) -> global top-k via
    orderBy+limit (Spark runs TakeOrderedAndProject: per-partition heaps,
    no full sort/shuffle). Scales linearly in corpus size."""
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), query_vec).alias("cosine_sim"),
    )
    return scored.orderBy(F.desc("cosine_sim"), F.col(id_col)).limit(k)


def lsh_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's sign-LSH
    bucket. At 100 TB the bucket filter is a partition-prunable predicate
    when the corpus is written partitioned/bucketed by sign_bucket."""
    qb = sign_bucket(query_vec, bits)
    bucketed = df.withColumn("__bkt", sign_bucket(F.col(vec_col), bits)).filter(
        F.col("__bkt") == qb
    )
    return brute_force_topk(bucketed, query_vec, k, id_col, vec_col)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
) -> DataFrame:
    """Bucketed approximate kNN join: pairs within the same sign bucket,
    ranked by cosine per left id. One equi-join shuffle on the bucket key
    instead of a full cross join."""
    # norms precomputed per side: the pair stage then does one dot
    # product per pair instead of dot + two norm folds
    lb = left.select(
        F.col(left_id).alias("left_id"),
        F.col(vec_col).alias("__lv"),
        sign_bucket(F.col(vec_col), bits).alias("__bkt"),
    ).withColumn("__ln", F.sqrt(l2_norm_sq(F.col("__lv"))))
    rb = right.select(
        F.col(right_id).alias("right_id"),
        F.col(vec_col).alias("__rv"),
        sign_bucket(F.col(vec_col), bits).alias("__bkt"),
    ).withColumn("__rn", F.sqrt(l2_norm_sq(F.col("__rv"))))
    pairs = lb.join(rb, "__bkt").filter(F.col("left_id") != F.col("right_id"))
    scored = pairs.select(
        "left_id",
        "right_id",
        (dot(F.col("__lv"), F.col("__rv")) / (F.col("__ln") * F.col("__rn"))).alias("cosine_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("left_id").orderBy(F.desc("cosine_sim"), F.col("right_id"))
    return scored.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k).drop("__rk")
