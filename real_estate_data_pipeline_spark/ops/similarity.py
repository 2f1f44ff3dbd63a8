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


def l2_dist_sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared euclidean distance."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """IVF-flat index build with deterministic seeding: centroids are the
    ``n_cells`` lowest-id vectors (k-means iterations would refine them;
    seeding keeps the index reproducible with zero RNG). Returns
    (centroids, assignments) where each vector is assigned to its nearest
    centroid.

    Plan shape: centroid table is tiny -> broadcast; assignment is a map
    over the corpus + a per-row argmin (window row_number over n_cells
    candidates). At 100 TB the corpus would be *written partitioned by
    cell id*, making probes partition-prunable scans."""
    from pyspark.sql import Window

    cent = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    pairs = df.select(id_col, vec_col).crossJoin(F.broadcast(cent))
    scored = pairs.withColumn("__d", l2_dist_sq(F.col(vec_col), F.col("cvec")))
    w = Window.partitionBy(id_col).orderBy("__d", "cid")
    assign = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cid")
    )
    return cent, assign


def ivf_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` cells whose
    centroids are nearest the query, brute-force inside them. The
    scale path complement to sign-LSH (ivf prunes by density cells,
    LSH by hyperplane signs)."""
    cent, assign = ivf_assign(df, id_col, vec_col, n_cells)
    probe_cells = (
        cent.withColumn("__d", l2_dist_sq(F.col("cvec"), query_vec))
        .orderBy("__d", "cid")
        .limit(nprobe)
        .select("cid")
    )
    cand = df.join(assign, id_col).join(F.broadcast(probe_cells), "cid")
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share a sign-LSH
    bucket, verified by exact cosine >= threshold. The embedding-space
    member of the dedup family (exact / minhash / simhash / jaccard /
    embedding)."""
    b = df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("__bkt")
    ).withColumn("__n", F.sqrt(l2_norm_sq(F.col(vec_col))))
    l, r = b.alias("a"), b.alias("b")
    pairs = l.join(
        r, (F.col("a.__bkt") == F.col("b.__bkt")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        (dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (F.col("a.__n") * F.col("b.__n"))).alias(
            "cosine_sim"
        ),
    )
    return pairs.filter(F.col("cosine_sim") >= threshold)


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
