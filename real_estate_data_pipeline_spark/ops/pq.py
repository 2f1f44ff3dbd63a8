"""Product quantization (PQ) + asymmetric distance computation (ADC).

The third ANN compression path next to sign-LSH (``similarity.sign_bucket``)
and int8 lattice quantization (``similarity.quantize_embeddings``): split the
``dim``-d embedding into ``m`` subspaces, learn a tiny per-subspace codebook,
and store each vector as ``m`` small codes (m=8, k=16 -> 4 bits/code = 4
bytes/vector instead of 256 — a 64x memory/shuffle cut). Queries score
against codes via an ADC lookup table (one distance per (subspace, code)),
never touching the original vectors.

Determinism contract (what makes the gate oracle exact):

- **Zero-RNG codebooks.** Per subspace, the codebook is the subvectors of
  the ``k`` lowest-id corpus vectors (the same seeding rule as
  ``similarity.ivf_assign``); code ids are the 0..k-1 rank of the seed's id.
  A k-means refinement would improve quality but the seeding keeps both
  engines' codebooks identical with zero randomness.
- **6-dp code selection.** Sub-distances round to 6 dp before the argmin
  (ties -> lowest code id), so a last-ulp fold difference between engines
  cannot flip a code assignment.
- **Integer micro-unit ADC sums.** Each ADC table cell is converted to
  integer micro-units (``floor(d*1e6 + 0.5)``) and the per-vector approximate
  distance is an exact BIGINT sum of m cells — order-independent, so the
  final ranking is engine-exact (the bigram-LM micro-nat trick).

Scale shape: the codebook is k*m rows (tiny -> broadcast both for encode and
for the ADC table join); encode is a map + partial-aggregated argmin whose
shuffle carries N*m slim rows (id, sub, code), not vectors; ADC scoring is a
broadcast join + one groupBy(id) sum. Nothing ever shuffles raw embeddings.

Ref parity note: the reference has no ANN at all (its similarity needs are
exact joins, data_enhancement.py); PQ is part of the LLM-curation extension
surface, alongside ops/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import l2_dist_sq


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Per-subspace codebooks from the ``k`` lowest-id vectors.

    Returns (sub int, code int, cvec array<double>) with ``m*k`` rows:
    ``cvec`` is the seed vector's slice for subspace ``sub`` and ``code``
    is the seed's 0-based rank by id (stable across engines)."""
    d = dim // m
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("code"),
            F.col(vec_col).alias("__v"),
        )
    )
    subs = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
    return seeds.select(subs, "code", "__v").select(
        "sub",
        "code",
        F.transform(
            F.slice(F.col("__v"), F.col("sub") * d + 1, d), lambda x: x.cast("double")
        ).alias("cvec"),
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Encode each vector as ``m`` codes: per subspace, the 6-dp-rounded-
    argmin-L2 codebook entry (ties -> lowest code).

    Plan: corpus x broadcast(codebook) map -> per-(id, sub) argmin via a
    partial-aggregating ``min(struct(d6, code))`` — the shuffle carries one
    slim row per (id, sub), never the vectors. Returns (id, sub, code)."""
    d = dim // m
    sub_slice = F.transform(
        F.slice(F.col(vec_col), F.col("sub") * d + 1, d), lambda x: x.cast("double")
    )
    scored = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(codebooks))
        .select(
            id_col,
            "sub",
            "code",
            F.round(l2_dist_sq(sub_slice, F.col("cvec")), 6).alias("__d6"),
        )
    )
    best = scored.groupBy(id_col, "sub").agg(F.min(F.struct("__d6", "code")).alias("__b"))
    return best.select(id_col, "sub", F.col("__b.code").alias("code"))


def pq_adc_topk(
    df: DataFrame,
    query_df: DataFrame,
    k_top: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> DataFrame:
    """ADC top-``k_top``: smallest approximate L2 distance to the (single-
    row) ``query_df`` vector, computed entirely from PQ codes.

    The ADC table (one 6-dp sub-distance per (sub, code), ``m*k`` rows) is
    built once and broadcast; each corpus vector's approximate distance is
    the exact BIGINT sum of its ``m`` micro-unit cells. Output:
    (id, approx_dist double) ascending, ties -> lowest id."""
    cb = pq_codebooks(df, id_col, vec_col, m, k, dim)
    codes = pq_encode(df, cb, id_col, vec_col, m, dim)
    d = dim // m
    qsub = F.transform(
        F.slice(F.col("__q"), F.col("sub") * d + 1, d), lambda x: x.cast("double")
    )
    q = query_df.select(F.col(vec_col).alias("__q"))
    adc = (
        cb.crossJoin(F.broadcast(q))
        .select(
            "sub",
            "code",
            F.floor(F.round(l2_dist_sq(qsub, F.col("cvec")), 6) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("__micro"),
        )
    )
    summed = (
        codes.join(F.broadcast(adc), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("__micro").alias("__am"))
    )
    return (
        summed.select(id_col, (F.col("__am").cast("double") / 1e6).alias("approx_dist"))
        .orderBy(F.col("approx_dist"), id_col)
        .limit(k_top)
    )
