"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single map + top-k, no shuffle of
the corpus. Scale path: seeded random-hyperplane sign-LSH bucketing,
which prunes candidates with one equi-join; and an IVF-style variant
that clusters on coarse buckets.

All dot products are built-in higher-order functions (zip_with +
aggregate) folding left-to-right in double precision — deterministic and
reproducible in any engine that folds sequentially.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pairs import DEFAULT_MAX_BLOCK, pairs_within_groups

# Deterministic hyperplane family: both the Spark expression and the
# DuckDB oracle SQL are generated from THESE literals, so the two
# engines bucket identically (sign flips would need |dot| ~ 1e-15).
_PLANE_SEED = 42
_PLANE_DIM = 64


def gaussian_planes(bits: int, dim: int = _PLANE_DIM, seed: int = _PLANE_SEED) -> list[list[float]]:
    """``bits`` seeded standard-normal hyperplanes of ``dim`` dims.
    NumPy's Generator is stable across platforms for a fixed seed, and
    the planes are embedded as literals in the plan — executors never
    run numpy."""
    rng = np.random.default_rng(seed)
    return [[float(v) for v in row] for row in rng.standard_normal((bits, dim))]


def local_model_df(spark, rows, schema):
    """Model-frame ``createDataFrame`` pinned to ONE partition: the
    default parallelizes a handful of rows across defaultParallelism,
    so every broadcast build / collect of the frame schedules 32
    near-empty tasks (same rows, same types either way)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _rows_one_row_df(model_df: DataFrame, col_name: str):
    """Collect a small model frame into a ONE-ROW frame whose single
    column holds every row as an array of structs — the broadcast shape
    for map-side argmin/top-k over the model (r15 opt round): the model
    stays DATA in the build side, never plan literals, and per-row
    selection becomes an array expression instead of a crossJoin +
    window that shuffled the corpus to rank map-local candidates."""
    from pyspark.sql import types as T

    rows = model_df.collect()
    return local_model_df(
        model_df.sparkSession,
        [([tuple(r) for r in rows],)],
        T.StructType(
            [T.StructField(col_name, T.ArrayType(T.StructType(list(model_df.schema))))]
        ),
    )


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


def safe_norm(a: Column) -> Column:
    """L2 norm with zero mapped to 1, so a zero vector scores cosine 0
    against everything instead of NaN (0/0) — matching the numpy-side
    ``xn[xn == 0] = 1`` convention in the Arrow variants."""
    n = F.sqrt(l2_norm_sq(a))
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def _bucket_from_planes(vec: Column, planes: list[list[float]]) -> Column:
    parts = []
    for p in planes:
        plane = F.array(*[F.lit(v) for v in p])
        prods = F.zip_with(vec, plane, lambda x, y: x.cast("double") * y)
        d = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + F.coalesce(v, F.lit(0.0)))
        parts.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def _bucket_sql_from_planes(col: str, planes: list[list[float]], dim: int = _PLANE_DIM) -> str:
    cases = []
    for p in planes:
        arr = "[" + ", ".join(repr(v) for v in p) + "]"
        dotp = (
            f"list_sum(list_transform(range(1, {dim + 1}), i -> "
            f"CAST({col}[i] AS DOUBLE) * ({arr})[i]))"
        )
        cases.append(f"CASE WHEN {dotp} >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(cases) + ")"


def sign_bucket(
    vec: Column, bits: int = 8, dim: int = _PLANE_DIM, seed: int = _PLANE_SEED
) -> Column:
    """Random-hyperplane LSH bucket: bit j is the sign of <vec, g_j> for
    seeded Gaussian planes g_j (Charikar SimHash for real vectors —
    collision probability 1 - theta/pi per bit). Replaces the r1
    coordinate-axis planes, whose recall collapsed whenever the data's
    leading dimensions were uninformative (e.g. any rotation putting
    cluster structure outside the first ``bits`` coords)."""
    return _bucket_from_planes(vec, gaussian_planes(bits, dim, seed))


def sign_bucket_sql(col: str, bits: int = 8, dim: int = _PLANE_DIM, seed: int = _PLANE_SEED) -> str:
    """DuckDB expression computing the SAME bucket as :func:`sign_bucket`
    (identical float64 literals, same >= 0 threshold) — lets oracle SQL
    replicate LSH-bucketed queries exactly."""
    return _bucket_sql_from_planes(col, gaussian_planes(bits, dim, seed), dim)


def band_planes(
    bits: int, bands: int, dim: int = _PLANE_DIM, seed: int = _PLANE_SEED
) -> list[list[list[float]]]:
    """``bands`` disjoint plane families of ``bits`` planes each, carved
    from one seeded draw (band t gets planes [t*bits, (t+1)*bits))."""
    all_planes = gaussian_planes(bits * bands, dim, seed)
    return [all_planes[t * bits : (t + 1) * bits] for t in range(bands)]


def banded_bucket_sql(
    col: str, bits: int, bands: int, dim: int = _PLANE_DIM, seed: int = _PLANE_SEED
) -> list[str]:
    """Per-band DuckDB bucket expressions matching the Spark banded LSH."""
    return [_bucket_sql_from_planes(col, p, dim) for p in band_planes(bits, bands, dim, seed)]


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


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the 4x memory/shuffle
    cut a 100 TB embedding corpus takes before ANN: scale =
    max|x| / 127 (1.0 for the zero vector), q_i = floor(x_i/scale +
    0.5) clamped to [-127, 127], stored as array<tinyint>. Dequantize
    as q*scale; for COSINE the per-vector scale cancels entirely, so
    scoring runs directly on the int8 arrays with no dequantization
    pass, and the only quality loss is the <= 0.4% rounding error of
    8-bit lattice points.

    ``floor(x + 0.5)`` rather than round(): HALF_UP vs banker's
    rounding differs across engines; floor(+0.5) is identical
    everywhere, which is what lets a SQL oracle reproduce the
    quantized lattice bit-for-bit. Returns (id, q8 array<tinyint>,
    scale double)."""
    ax = F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    mx = F.array_max(ax)
    scale = F.when(mx == 0.0, F.lit(1.0)).otherwise(mx / F.lit(127.0))
    df = df.withColumn("__scale", scale)
    q8 = F.transform(
        F.col(vec_col),
        lambda x: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127),
                F.floor(x.cast("double") / F.col("__scale") + F.lit(0.5)).cast("int"),
            ),
        ).cast("byte"),
    )
    return df.select(
        F.col(id_col), q8.alias("q8"), F.col("__scale").alias("scale")
    )


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

    Plan shape (r15 opt round): the collected centroid table rides ONE
    broadcast row as an array and the per-row argmin is an array_min
    over per-centroid (distance, cid) structs — assignment is a pure
    map over the corpus. The previous shape (crossJoin + row_number
    window partitioned by id) shuffled the corpus n_cells-wide to rank
    candidates that were already map-local; same distance evaluations,
    identical picks (min over struct(__d, cid) == the window's
    orderBy(__d, cid) rn=1). At 100 TB the corpus would be *written
    partitioned by cell id*, making probes partition-prunable scans."""
    spark = df.sparkSession
    lazy_cent = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    cent = local_model_df(spark, lazy_cent.collect(), lazy_cent.schema)
    one = _rows_one_row_df(cent, "cents")
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                l2_dist_sq(F.col(vec_col), c["cvec"]).alias("__d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    assign = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(one))
        .select(id_col, best["cid"].alias("cid"))
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
    bands: int = 3,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded sign-LSH candidates
    (a pair is a candidate when ANY of the ``bands`` disjoint plane
    families agrees on all ``bits`` signs — same amplification trick as
    the MinHash banding), verified by exact cosine >= threshold. The
    embedding-space member of the dedup family (exact / minhash /
    simhash / jaccard / embedding).

    Single-bucket LSH loses recall whenever one member of a tight
    cluster sits near one hyperplane (one flipped bit breaks all its
    pairs); with p = per-bit collision probability the banded miss rate
    is (1 - p^bits)^bands instead of 1 - p^bits.

    Plan shape: posexplode to (band, bucket) rows — bands is small, so
    the 3x row blow-up is cheap — then intra-bucket pair expansion (see
    ops/pairs.py: computes buckets+norms once, where a self-join would
    compute them twice), cosine filter inside the expansion, and a
    dedup shuffle on the surviving pairs only."""
    fams = band_planes(bits, bands)
    bucket_arr = F.array(*[_bucket_from_planes(F.col(vec_col), p) for p in fams])
    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(l2_norm_sq(F.col(vec_col))).alias("__n"),
        F.posexplode(bucket_arr).alias("__band", "__bkt"),
    )
    pairs = pairs_within_groups(
        b,
        ["__band", "__bkt"],
        F.struct(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col("__n").alias("n")
        ),
        lambda x, y: F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            (dot(x["v"], y["v"]) / (x["n"] * y["n"])).alias("cosine_sim"),
        ),
        keep=lambda p: p["cosine_sim"] >= F.lit(threshold),
        max_block=max_block,
    )
    # a pair matching in several bands appears once per band; cosine is
    # identical in each, so dropDuplicates is value-deterministic
    return pairs.dropDuplicates(["id_a", "id_b"])


def knn_self_join(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    bands: int = 3,
    score_dp: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Self-kNN over one corpus: banded-LSH candidates expanded
    intra-bucket (buckets+norms computed ONCE — ``knn_join(df, df)``
    computes them twice, once per join side). Cosine is symmetric, so
    each unordered pair's dot product computes ONCE; both kNN-edge
    orientations then come from a cheap two-struct explode after the
    cross-band dedup has already halved the row count.

    ``score_dp``: round cosine to this many decimals BEFORE ranking.
    With rounding, the (score, right_id) ranking key is identical across
    engines/BLAS paths whose raw cosines differ by ~1e-15 — what makes
    the catalog entry value-verifiable against a SQL oracle."""
    fams = band_planes(bits, bands)
    bucket_arr = F.array(*[_bucket_from_planes(F.col(vec_col), p) for p in fams])
    # zero vectors have no direction: every plane dot is 0, so they ALL
    # land in the same bucket of every band (a degenerate hot bucket)
    # while their cosine to anything is 0 — exclude them from the ANN
    b = df.filter(l2_norm_sq(F.col(vec_col)) > 0).select(
        F.col(id_col),
        F.col(vec_col),
        safe_norm(F.col(vec_col)).alias("__n"),
        F.posexplode(bucket_arr).alias("__band", "__bkt"),
    )
    und = _scored_pairs_within(
        b, ["__band", "__bkt"], id_col, vec_col, score_dp, max_block, dedup=False
    )
    return _orient_and_rank(und, k)


def _scored_pairs_within(
    b: DataFrame,
    group_cols: list[str],
    id_col: str,
    vec_col: str,
    score_dp: int | None = None,
    max_block: int | None = None,
    dedup: bool = True,
) -> DataFrame:
    """Unordered cosine-scored candidate pairs within each group.
    least/greatest ids, not positional (x, y): collect_list order
    differs per group, so the same pair could surface as (x, y) in one
    group and (y, x) in another and survive the dedup twice — duplicate
    edges would then occupy two of the k ranks. Expects a ``__n``
    precomputed-norm column. Pass ``dedup=False`` when the consumer
    collapses duplicates itself (e.g. :func:`_dedup_and_rank`'s
    single-exchange tail) — the duplicate scores are identical, so the
    collapse point is a plan choice, not a semantic one.

    ``max_block`` defaults to NONE here (unlike the dedup ops): kNN
    answers are silently WRONG if a bucket/cell truncates its members
    — a capped cell drops true neighbors with no signal — so the
    caller must opt into capping explicitly (and should instead raise
    n_cells / bits so buckets stay small, per ivf_knn_self_join's
    scale note)."""

    def _score(x, y):
        c = dot(x["v"], y["v"]) / (x["n"] * y["n"])
        return F.round(c, score_dp) if score_dp is not None else c

    out = pairs_within_groups(
        b,
        group_cols,
        F.struct(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col("__n").alias("n")
        ),
        lambda x, y: F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            _score(x, y).alias("cosine_sim"),
        ),
        max_block=max_block,
    )
    return out.dropDuplicates(["id_a", "id_b"]) if dedup else out


def _dedup_and_rank(edges: DataFrame, k: int) -> DataFrame:
    """Duplicate-edge collapse + per-left-id top-k in ONE exchange
    (r15 opt round). The old tail was dropDuplicates(left_id, right_id)
    followed by a row_number window over left_id — TWO exchanges, one
    hashed on the pair and one on left_id. Partitioning once by left_id
    alone satisfies BOTH: hash partitioning on a subset of the grouping
    key clusters the (left_id, right_id) aggregate correctly, and the
    aggregate preserves that partitioning for the window, which then
    only sorts. A duplicate edge carries the same (rounded) score in
    every group that emits it, so max() returns exactly the value
    dropDuplicates kept."""
    from pyspark.sql import Window

    w = Window.partitionBy("left_id").orderBy(F.desc("cosine_sim"), F.col("right_id"))
    return (
        edges.repartition("left_id")
        .groupBy("left_id", "right_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def _orient_and_rank(und: DataFrame, k: int) -> DataFrame:
    """Each unordered pair (dot computed ONCE — cosine is symmetric)
    becomes both kNN-edge orientations via a cheap two-struct explode,
    then the one-exchange dedup + per-left-id top-k rank."""
    oriented = und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("left_id"),
                    F.col("id_b").alias("right_id"),
                    F.col("cosine_sim"),
                ),
                F.struct(
                    F.col("id_b").alias("left_id"),
                    F.col("id_a").alias("right_id"),
                    F.col("cosine_sim"),
                ),
            )
        ).alias("__p")
    ).select("__p.*")
    return _dedup_and_rank(oriented, k)


def ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    refine: int = 1,
    round_dp: int | None = None,
    arrow: bool = False,
) -> DataFrame:
    """Deterministic IVF centroids: seeded from the ``n_cells``
    lowest-id vectors, then ``refine`` Lloyd iterations (assign to
    nearest centroid by cosine, recenter on the elementwise mean).
    Returns (cid, cvec, cn) with the norm precomputed.

    ``arrow=True`` replaces each iteration's broadcast crossJoin +
    argmax window (n_cells x row blow-up, one shuffle for the window)
    with a pandas_udf doing ONE matmul per Arrow batch against the
    collected centroid matrix (n_cells rows — the spark.ml
    model-broadcast pattern). Same assignments (ties by cid asc, and
    with ``round_dp`` the recentered output is bit-identical), ~2x the
    refinement throughput; combine with ``round_dp`` when the result
    must stay oracle-reproducible.

    ``round_dp``: round each recentered component to this many decimals.
    A float mean depends on aggregation ORDER (Spark's partial-agg tree
    vs a SQL engine's sequential sum differ at ~1e-15); rounding makes
    the refined centroids bit-identical across engines so downstream
    assignments are oracle-reproducible.

    Each iteration is fully distributed: one broadcast of the tiny
    centroid table against the corpus, a per-row argmax window, and the
    recenter as a (cid, position) hash aggregate over posexploded
    components — n_cells x dim rows, trivial at any corpus size."""
    cent = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    from pyspark.sql import Window

    for _ in range(refine):
        if arrow:
            cent_rows = cent.select("cid", "cvec").collect()
            C = np.array([r["cvec"] for r in cent_rows], dtype=np.float64)
            cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
            cn_np = np.linalg.norm(C, axis=1)
            cn_np[cn_np == 0.0] = 1.0
            Cn = C / cn_np[:, None]

            @F.pandas_udf("bigint")
            def _best_cell(v: pd.Series) -> pd.Series:
                X = np.stack(v.values).astype(np.float64)
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0.0] = 1.0
                sims = (X / xn[:, None]) @ Cn.T
                order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)
                return pd.Series(cids[order[:, 0]])

            assign = df.select(id_col, vec_col).withColumn(
                "cid", _best_cell(F.col(vec_col))
            )
        else:
            # r15 opt round: the old crossJoin + row_number window
            # shuffled the corpus n_cells-wide to rank candidates that
            # were already map-local; the collected (cid, cvec, cn)
            # table rides one broadcast row and the argmax is an
            # array_min over (-cos, cid) structs — identical picks
            # (desc(__cos), cid == min struct(-__cos, cid); negation is
            # IEEE-exact), zero corpus exchanges per round.
            c = cent.withColumn("cn", F.sqrt(l2_norm_sq(F.col("cvec"))))
            one = _rows_one_row_df(c, "cents")
            v = df.select(id_col, vec_col, safe_norm(F.col(vec_col)).alias("__n"))
            # NULL guard (r16, ADVICE): the old desc(__cos) window
            # ranked NULL cosines LAST, but a struct whose first field
            # is NULL sorts FIRST in array_min — a single NULL vector
            # element would win every argmin. coalesce to +inf restores
            # NULLS-LAST; value-identical whenever no cosine is NULL.
            best = F.array_min(
                F.transform(
                    F.col("cents"),
                    lambda cc: F.struct(
                        F.coalesce(
                            -(dot(F.col(vec_col), cc["cvec"]) / (F.col("__n") * cc["cn"])),
                            F.lit(float("inf")),
                        ).alias("__nc"),
                        cc["cid"].alias("cid"),
                    ),
                )
            )
            assign = (
                v.crossJoin(F.broadcast(one))
                .select(vec_col, best["cid"].alias("cid"))
            )
        mean = F.avg("__x")
        if round_dp is not None:
            mean = F.round(mean, round_dp)
        # Recenter = ONE hash aggregate + collect; the (cid, pos, mean)
        # rows — n_cells x dim, bounded by the model, never by the
        # corpus — are assembled into centroid arrays DRIVER-side (r15
        # opt round: the old shape ran a second collect_list shuffle
        # stage per round purely to regroup rows the driver was about
        # to collect anyway; same values, one stage fewer). The collect
        # is the round's bounded model-broadcast materialization (same
        # pattern as ops/pq.pq_refine): the round's corpus scan runs
        # exactly once here instead of replaying inside every downstream
        # plan that references the centroid lineage (cell assignment,
        # nprobe routing, the next round). Starved cells drop out of the
        # aggregate exactly as they dropped out of the old groupBy.
        means_df = (
            assign.select("cid", F.posexplode(vec_col).alias("__pos", "__x"))
            .groupBy("cid", "__pos")
            .agg(mean.alias("__mx"))
        )
        by_c: dict = {}
        for r in means_df.collect():
            by_c.setdefault(r["cid"], {})[r["__pos"]] = r["__mx"]
        from pyspark.sql import types as T

        cent_schema = T.StructType(
            [
                means_df.schema["cid"],
                T.StructField("cvec", T.ArrayType(T.DoubleType()), True),
            ]
        )
        cent_local_rows = [
            (cid, [mm[p] for p in range(len(mm))]) for cid, mm in sorted(by_c.items())
        ]
        cent = local_model_df(df.sparkSession, cent_local_rows, cent_schema)
    out = cent.withColumn("cn", F.sqrt(l2_norm_sq(F.col("cvec"))))
    if refine >= 1:
        # r16 opt round (VERDICT #6): after >=1 Lloyd round the centroid
        # values are ALREADY driver-side (the means collect assembled
        # them) — re-collecting the 1-slice model frame costs a whole
        # job per consumer. Ride the (cid, cvec) rows on the returned
        # frame so collect-side consumers (the Arrow kNN paths, which
        # recompute norms in numpy anyway) can skip that job; the frame
        # itself is unchanged for everyone else.
        from pyspark.sql import Row

        out._redp_centroid_rows = [
            Row(cid=cid, cvec=vec) for cid, vec in cent_local_rows
        ]
    return out


def ivf_knn_self_join(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    nprobe: int = 2,
    refine: int = 1,
    score_dp: int | None = None,
    centroid_dp: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Self-kNN via IVF cells instead of sign-LSH buckets: every vector
    multi-assigns to its ``nprobe`` nearest centroids, candidates are
    the intra-cell pairs. Because cells follow the DATA's density (and
    Lloyd refinement sharpens them), mid-cosine true neighbors co-occur
    in a cell far more often than they agree on random hyperplane
    signs — measured recall@3 on the driver embeddings: ~0.47 at
    nprobe=2 / ~0.63 at nprobe=3 vs ~0.18 for banded sign-LSH at the
    same candidate budget. nprobe/n_cells is the recall<->cost dial
    (fraction of the corpus each vector is compared against).

    Scale note: candidate work per cell is O(|cell|^2); a pathologically
    dense region concentrates in one cell, so at very large scale raise
    n_cells with corpus size (cells ~ sqrt(n) keeps expected pair work
    linear) — the recenter aggregate and broadcast stay tiny either way.
    """
    cent = ivf_centroids(df, id_col, vec_col, n_cells, refine, round_dp=centroid_dp)
    v = df.select(id_col, vec_col, safe_norm(F.col(vec_col)).alias("__n"))
    # r15 opt round: per-row top-nprobe cells as a map-side array sort
    # over the broadcast centroid row — the old crossJoin + row_number
    # window shuffled the corpus n_cells-wide to rank map-local
    # candidates. array_sort on struct(-cos, cid) == the window's
    # orderBy(desc(__cos), cid); negation is IEEE-exact, slice keeps the
    # same nprobe rows.
    one = _rows_one_row_df(cent, "cents")
    # NULL guard (r16, ADVICE): coalesce to +inf so a NULL cosine ranks
    # LAST (the old desc window's NULLS-LAST), not first as a bare NULL
    # struct field would in array_sort; value-identical without NULLs.
    ranked = F.array_sort(
        F.transform(
            F.col("cents"),
            lambda cc: F.struct(
                F.coalesce(
                    -(dot(F.col(vec_col), cc["cvec"]) / (F.col("__n") * cc["cn"])),
                    F.lit(float("inf")),
                ).alias("__nc"),
                cc["cid"].alias("cid"),
            ),
        )
    )
    assign = (
        v.crossJoin(F.broadcast(one))
        .select(
            id_col,
            vec_col,
            "__n",
            F.explode(F.slice(ranked, 1, nprobe)).alias("__p"),
        )
        .select(id_col, vec_col, "__n", F.col("__p.cid").alias("cid"))
    )
    und = _scored_pairs_within(
        assign, ["cid"], id_col, vec_col, score_dp, max_block, dedup=False
    )
    return _orient_and_rank(und, k)


def ivf_knn_self_join_arrow(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    nprobe: int = 2,
    refine: int = 1,
    score_dp: int | None = None,
    centroid_dp: int | None = None,
) -> DataFrame:
    """``ivf_knn_self_join`` with the two dot-product hot loops moved
    to Arrow-batched numpy (same candidates, same edges — verified
    equal at sf0.1):

    - centroid probing is ONE matrix multiply per Arrow batch in a
      ``pandas_udf`` (replacing a 32-way broadcast crossJoin + argmax
      window: no row blow-up, no shuffle);
    - per-cell scoring is a BLAS gram matrix in ``applyInPandas``
      (replacing ~|cell|^2/2 interpreted higher-order dot folds), with
      the per-row top-k taken INSIDE the cell — sound because a global
      top-k neighbor ranks top-k in every cell containing both rows —
      so only O(n * k * nprobe) slim edges leave the Python workers.

    ~2x the end-to-end throughput of the JVM-expression variant at
    sf0.1 and the gap grows with cell size; the JVM variant remains for
    environments where Arrow/pandas workers are unavailable. The only
    driver-side collect is the n_cells x dim centroid table (a few KB —
    the same \"model broadcast\" pattern spark.ml uses)."""
    from pyspark.sql.functions import pandas_udf

    cent_df = ivf_centroids(
        df, id_col, vec_col, n_cells, refine, round_dp=centroid_dp, arrow=True
    )
    # after a refine round the centroid rows ride the frame (see
    # ivf_centroids) — skip the 1-slice collect job; norms are
    # recomputed in numpy below either way
    cent_rows = getattr(cent_df, "_redp_centroid_rows", None) or cent_df.collect()
    C = np.array([r["cvec"] for r in cent_rows], dtype=np.float64)
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0
    Cn = C / cn[:, None]

    @pandas_udf("array<bigint>")
    def _probe_cells(v: pd.Series) -> pd.Series:
        X = np.stack(v.values).astype(np.float64)
        xn = np.linalg.norm(X, axis=1)
        xn[xn == 0.0] = 1.0
        sims = (X / xn[:, None]) @ Cn.T
        # ties broken by cid asc, matching the JVM variant's window order
        order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)[:, :nprobe]
        return pd.Series([cids[row].tolist() for row in order])

    assign = df.select(id_col, vec_col).withColumn(
        "cid", F.explode(_probe_cells(F.col(vec_col)))
    )

    def _cell_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        kk = min(k, m - 1)
        if kk <= 0:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine_sim": []})
        X = np.stack(pdf[vec_col].values).astype(np.float64)
        xn = np.linalg.norm(X, axis=1)
        xn[xn == 0.0] = 1.0
        Xn = X / xn[:, None]
        G = Xn @ Xn.T
        if score_dp is not None:
            # rounded scores make the (score, right_id) ranking key
            # BLAS-blocking- and engine-independent (oracle-matchable)
            G = np.round(G, score_dp)
        np.fill_diagonal(G, -np.inf)
        # deterministic per-row top-kk: (-cos, right_id) lexicographic
        order = np.lexsort((np.broadcast_to(ids, G.shape), -G), axis=1)[:, :kk]
        left = np.repeat(ids, kk)
        right = ids[order.ravel()]
        cos = np.take_along_axis(G, order, axis=1).ravel()
        return pd.DataFrame({"left_id": left, "right_id": right, "cosine_sim": cos})

    per_cell = assign.groupBy("cid").applyInPandas(
        _cell_knn, "left_id long, right_id long, cosine_sim double"
    )
    return _dedup_and_rank(per_cell, k)


def knn_self_join_arrow(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    bands: int = 3,
    score_dp: int | None = None,
) -> DataFrame:
    """``knn_self_join`` with both hot loops moved to Arrow-batched
    numpy (same banding scheme, same edge semantics):

    - all ``bands x bits`` plane products compute as ONE matrix
      multiply per Arrow batch (replacing 18 interpreted zip_with/
      aggregate folds per row — the plan's largest expression);
    - per-bucket scoring is a BLAS gram matrix in ``applyInPandas``
      with the per-row top-k taken INSIDE the bucket — sound for the
      same reason as the IVF Arrow variant: bucket candidates are a
      subset of a row's global candidates, so a globally top-k edge
      ranks top-k in every bucket containing both endpoints — and only
      O(n * k * bands) slim edges leave the Python workers.

    Bucket values are bit-packed ints rather than '0'/'1' strings
    (identity is all a bucket key needs). A sign that numpy's pairwise
    summation rounds differently from the sequential JVM fold would
    need |dot| ~ 1e-15; the recall test tolerates it, the catalog
    entry is rows-only checked."""
    fams = band_planes(bits, bands)
    P = np.array([p for fam in fams for p in fam], dtype=np.float64)  # (bands*bits, dim)
    pw = 1 << np.arange(bits, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def _band_buckets(v: pd.Series) -> pd.Series:
        X = np.stack(v.values).astype(np.float64)
        S = (X @ P.T) >= 0.0  # (n, bands*bits)
        out = np.empty((len(X), len(fams)), dtype=np.int64)
        for t in range(len(fams)):
            out[:, t] = S[:, t * bits : (t + 1) * bits] @ pw
        # zero vectors have no direction and would all collide into one
        # degenerate hot bucket per band: emit NO buckets for them (the
        # posexplode below then drops the row) — same exclusion as
        # knn_self_join, but free here since the batch is already in hand
        nz = np.linalg.norm(X, axis=1) > 0.0
        return pd.Series([row.tolist() if keep else [] for row, keep in zip(out, nz)])

    b = df.select(id_col, vec_col).withColumn(
        "__bb", _band_buckets(F.col(vec_col))
    ).select(id_col, vec_col, F.posexplode("__bb").alias("__band", "__bkt"))

    def _bucket_knn(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        m = len(ids)
        kk = min(k, m - 1)
        if kk <= 0:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine_sim": []})
        X = np.stack(pdf[vec_col].values).astype(np.float64)
        xn = np.linalg.norm(X, axis=1)
        xn[xn == 0.0] = 1.0
        Xn = X / xn[:, None]
        G = Xn @ Xn.T
        if score_dp is not None:
            G = np.round(G, score_dp)
        np.fill_diagonal(G, -np.inf)
        order = np.lexsort((np.broadcast_to(ids, G.shape), -G), axis=1)[:, :kk]
        left = np.repeat(ids, kk)
        right = ids[order.ravel()]
        cos = np.take_along_axis(G, order, axis=1).ravel()
        return pd.DataFrame({"left_id": left, "right_id": right, "cosine_sim": cos})

    per_bucket = b.groupBy("__band", "__bkt").applyInPandas(
        _bucket_knn, "left_id long, right_id long, cosine_sim double"
    )
    return _dedup_and_rank(per_bucket, k)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    bands: int = 3,
    score_dp: int | None = None,
) -> DataFrame:
    """Banded-LSH approximate kNN join: a pair is a candidate when ANY
    of the ``bands`` disjoint plane families agrees on all ``bits``
    signs; candidates rank by cosine per left id. One equi-join shuffle
    on (band, bucket) instead of a full cross join; banding recovers
    the recall a single bucket loses when a vector sits near one
    hyperplane (same amplification as embedding_dup_pairs)."""

    def _sides(df, id_in, id_out, v_alias, n_alias):
        fams = band_planes(bits, bands)
        barr = F.array(*[_bucket_from_planes(F.col(vec_col), p) for p in fams])
        return df.select(
            F.col(id_in).alias(id_out),
            F.col(vec_col).alias(v_alias),
            safe_norm(F.col(vec_col)).alias(n_alias),
            F.posexplode(barr).alias("__band", "__bkt"),
        )

    # norms precomputed per side: the pair stage then does one dot
    # product per pair instead of dot + two norm folds
    lb = _sides(left, left_id, "left_id", "__lv", "__ln")
    rb = _sides(right, right_id, "right_id", "__rv", "__rn")
    pairs = lb.join(rb, ["__band", "__bkt"]).filter(F.col("left_id") != F.col("right_id"))
    cos = dot(F.col("__lv"), F.col("__rv")) / (F.col("__ln") * F.col("__rn"))
    if score_dp is not None:
        # rounded ranking key -> engine-exact edges (see knn_self_join)
        cos = F.round(cos, score_dp)
    scored = pairs.select("left_id", "right_id", cos.alias("cosine_sim"))
    return _dedup_and_rank(scored, k)


def ivf_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 5,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
    nprobe: int = 2,
    refine: int = 1,
) -> DataFrame:
    """Two-corpus IVF kNN join: queries (``left``) against an indexed
    base corpus (``right``). Centroids come from the BASE side (that is
    the distribution that matters for cell quality); each base vector
    lands in exactly its nearest cell, each query probes its ``nprobe``
    nearest cells, and candidates meet in ONE equi-join on cid — the
    classic IVF index-probe pattern as a shuffle join.

    At 100 TB the base side would be *written partitioned by cid* (see
    ``ivf_assign``), turning each probe into a partition-pruned scan and
    leaving only the query side to shuffle."""
    cent = ivf_centroids(right, right_id, vec_col, n_cells, refine)
    # r15 opt round: both sides' cell routing is a map-side array sort
    # over the broadcast centroid row (see ivf_knn_self_join) — the old
    # crossJoin + row_number window shuffled each corpus n_cells-wide
    # to rank map-local candidates.
    one = _rows_one_row_df(cent, "cents")

    def _assigned(df, id_in, id_out, probes):
        v_col, n_col = f"__{id_out}_v", f"__{id_out}_n"
        v = df.select(
            F.col(id_in).alias(id_out),
            F.col(vec_col).alias(v_col),
            F.sqrt(l2_norm_sq(F.col(vec_col))).alias(n_col),
        )
        # NULL guard (r16, ADVICE): same NULLS-LAST coalesce as
        # ivf_knn_self_join's routing sort.
        ranked = F.array_sort(
            F.transform(
                F.col("cents"),
                lambda cc: F.struct(
                    F.coalesce(
                        -(dot(F.col(v_col), cc["cvec"]) / (F.col(n_col) * cc["cn"])),
                        F.lit(float("inf")),
                    ).alias("__nc"),
                    cc["cid"].alias("cid"),
                ),
            )
        )
        return (
            v.crossJoin(F.broadcast(one))
            .select(
                id_out,
                v_col,
                n_col,
                F.explode(F.slice(ranked, 1, probes)).alias("__p"),
            )
            .select(id_out, v_col, n_col, F.col("__p.cid").alias("cid"))
        )

    lb = _assigned(left, left_id, "left_id", nprobe)
    rb = _assigned(right, right_id, "right_id", 1)
    pairs = lb.join(rb, "cid").filter(F.col("left_id") != F.col("right_id"))
    scored = pairs.select(
        "left_id",
        "right_id",
        (
            dot(F.col("__left_id_v"), F.col("__right_id_v"))
            / (F.col("__left_id_n") * F.col("__right_id_n"))
        ).alias("cosine_sim"),
    )
    return _dedup_and_rank(scored, k)


def hard_negative_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    score_dp: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``k`` most cosine-similar corpus vectors whose label
    DIFFERS from the query's — the near-misses a contrastive loss learns
    the most from (easy negatives are already far away).

    ``queries`` is a small frame (qid, qvec, qlabel) — broadcast, so the
    corpus is scored in one shuffle-free map pass (corpus x Q rows,
    map-side) and the only shuffle is the per-query top-k window over
    ~Q*k survivors... strictly the window shuffles all scored rows, but
    keyed by qid, and Q is small by construction. NULL-labeled rows are
    excluded on both sides (SQL ``<>`` three-valued logic, kept
    deliberately: an unlabeled vector is not a *known* negative).

    Scores round to ``score_dp`` before ranking (ties -> lowest id) so the
    edge set is engine-exact. Output: (qid, id, rank, cosine_sim)."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__qv"),
        F.col(label_col).alias("__ql"),
        safe_norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        df.select(
            F.col(id_col),
            F.col(vec_col).alias("__v"),
            F.col(label_col).alias("__l"),
            safe_norm(F.col(vec_col)).alias("__n"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("__l") != F.col("__ql"))
        .select(
            "qid",
            id_col,
            F.round(
                dot(F.col("__v"), F.col("__qv")) / (F.col("__n") * F.col("__qn")),
                score_dp,
            ).alias("cosine_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "rank", "cosine_sim")
    )
