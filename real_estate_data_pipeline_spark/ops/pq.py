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
  ``pq_refine`` then runs Lloyd rounds whose 6-dp-rounded means stay
  engine-identical (the IVF kNN join's recentering trick) — refinement
  without randomness.
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

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import l2_dist_sq, local_model_df as _local_df


def _round6(v: float) -> float:
    """Spark's ``F.round(double, 6)`` reproduced exactly: Spark rounds
    via ``BigDecimal.valueOf(d)`` (shortest round-trip decimal form,
    same digits as Python ``repr``) with HALF_UP.

    JDK caveat (r16, ADVICE): ``Double.toString`` is only guaranteed
    shortest-round-trip from JDK 19 (JDK-4511638); on older JDKs it can
    emit a longer decimal, which could in principle straddle a .0000005
    HALF_UP boundary the shortest form does not. This environment runs
    JDK 17, where the equality is NOT guaranteed a priori — it is
    instead verified empirically: the PQ oracle parities compare every
    driver-side ADC cell against the engine on every suite run (and the
    r15 A/B checked all 128 cells bit-for-bit). If a cell ever
    diverges on some runtime, compute the ADC table through one tiny
    Spark expression evaluation instead of this Python reproduction."""
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _subdim(dim: int, m: int) -> int:
    """Subspace width ``dim // m``, rejecting non-divisible shapes that
    would silently drop the trailing dimensions from every code and
    distance (shared by codebooks/encode/refine so no entry point skips
    the check)."""
    if dim % m:
        raise ValueError(
            f"dim={dim} not divisible by m={m}: trailing {dim % m} dimensions "
            "would be silently dropped from every code and distance"
        )
    return dim // m


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
    d = _subdim(dim, m)
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            # k-row frame — bounded by the limit above (the plan lint in
            # tests/test_plans.py proves the GlobalLimit sits under this
            # window)
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


def _entries_by_sub(spark, cb_rows, m: int):
    """Regroup collected codebook rows into an ``m``-row (sub, entries)
    frame — entries sorted by code so ties resolve identically
    everywhere. The rows are DATA in a LocalRelation (broadcast-join
    build side), never plan literals: embedding the codebook as literal
    expression nodes was A/B-measured in the r15 opt round and rejected
    (driver-side plan construction/analysis cost seconds per query)."""
    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code"]), list(r["cvec"]))
        )
    rows = [(s, sorted(by_sub[s])) for s in sorted(by_sub)]
    if len(rows) != m:
        raise ValueError(f"codebook covers {len(rows)} subspaces, expected {m}")
    return _local_df(
        spark, rows, "sub int, entries array<struct<code:int,cvec:array<double>>>"
    )


def _sub_slice(vec, sub, d: int):
    """Subvector ``sub`` of ``vec`` as doubles (``sub`` may be a lambda
    variable or a column)."""
    return F.transform(F.slice(vec, sub * d + 1, d), lambda x: x.cast("double"))


def _argmin_entry(entries, sv):
    """Min over struct(6-dp L2, code) — the same (distance, lowest-code)
    argmin the old ``groupBy.min(struct)`` computed, as a per-row array
    expression: after a broadcast codebook join every (id, sub) group is
    map-local, so aggregating it through an exchange shuffled the corpus
    for groups that never span partitions."""
    return F.array_min(
        F.transform(
            entries,
            lambda e: F.struct(
                F.round(l2_dist_sq(sv, e["cvec"]), 6).alias("__d6"),
                e["code"].alias("code"),
            ),
        )
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

    Plan (r15 opt round): the ``m``-row (sub, entries) codebook
    broadcast-joins on ``sub`` and the argmin is a per-row array
    expression — encode is a pure map over the corpus, ZERO exchanges.
    The previous shape (corpus x broadcast(codebook) crossJoin ->
    ``groupBy(id, sub).min(struct)``) shuffled one slim row per
    (id, sub) to aggregate groups that were already map-local; same
    number of L2 evaluations either way (the fold is interpreted in
    both), so dropping the exchange and the k-times row materialization
    is a strict win."""
    d = _subdim(dim, m)
    cb_rows = getattr(codebooks, "_redp_cb_rows", None) or codebooks.collect()
    cbs = _entries_by_sub(df.sparkSession, cb_rows, m)
    enc = (
        df.select(id_col, vec_col)
        .select(
            id_col,
            vec_col,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        )
        .join(F.broadcast(cbs), "sub")
    )
    best = _argmin_entry(F.col("entries"), _sub_slice(F.col(vec_col), F.col("sub"), d))
    return enc.select(id_col, "sub", best["code"].alias("code"))


def pq_refine(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """One Lloyd refinement of the codebooks: each (sub, code) centroid
    moves to the per-dimension mean of its assigned subvectors, rounded
    to 6 dp (the engine-independent recentering the IVF kNN join
    established — AVG order differences die under the rounding).
    Starved codes keep their seed centroid, so code ids never shift.

    r15 opt round — the refinement is ONE corpus pass and one collect,
    with ZERO corpus-sized exchanges: the per-(id, sub) argmin is a
    map-side array expression over the broadcast (sub, entries) codebook
    (see :func:`_argmin_entry` — the old ``groupBy(id, sub)`` shuffled
    every subvector to aggregate groups that were already map-local),
    so the only shuffle carries the partial-aggregated per-(sub, code,
    pos) sums (m*k*d rows, bounded by the codebook, never by the
    corpus); those means are collected and the refined codebook is
    assembled driver-side against the seed rows (the same bounded
    model-broadcast pattern as the per-round collect the training loop
    already did). Returns a LITERAL-backed DataFrame, so downstream
    encode/ADC plans embed the refined codebook without replaying the
    refinement lineage. Values are unchanged: same slices, same fold,
    same 6-dp-rounded means (AVG partial-order differences die under
    the rounding exactly as they always did across engines)."""
    d = _subdim(dim, m)
    spark = df.sparkSession
    cb_rows = getattr(codebooks, "_redp_cb_rows", None) or codebooks.collect()
    cbs = _entries_by_sub(spark, cb_rows, m)
    sub_slice = _sub_slice(F.col(vec_col), F.col("sub"), d)
    enc = (
        df.select(vec_col)
        .select(
            vec_col, F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub")
        )
        .join(F.broadcast(cbs), "sub")
        .select(
            "sub",
            _argmin_entry(F.col("entries"), sub_slice)["code"].alias("code"),
            sub_slice.alias("__sv"),
        )
    )
    els = enc.select(
        "sub",
        "code",
        F.posexplode("__sv").alias("pos", "el"),
    )
    means = els.groupBy("sub", "code", "pos").agg(F.round(F.avg("el"), 6).alias("m"))
    by_sc: dict[tuple[int, int], dict[int, float]] = {}
    for r in means.collect():
        by_sc.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["m"]
    out = []
    for r in cb_rows:
        mm = by_sc.get((r["sub"], r["code"]))
        cvec = [mm[p] for p in range(d)] if mm else list(r["cvec"])
        out.append((r["sub"], r["code"], cvec))
    refined = _local_df(spark, out, codebooks.schema)
    # r16 opt round (same trick as ivf_centroids): the refined rows are
    # already driver-side — ride them on the frame so collect-side
    # consumers (pq_adc_topk, pq_encode) skip a whole re-collect job.
    from pyspark.sql import Row

    refined._redp_cb_rows = [Row(sub=s, code=c, cvec=v) for s, c, v in out]
    return refined


def pq_adc_topk(
    df: DataFrame,
    query_df: DataFrame,
    k_top: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    refine: int = 0,
) -> DataFrame:
    """ADC top-``k_top``: smallest approximate L2 distance to the (single-
    row) ``query_df`` vector, computed entirely from PQ codes.

    The ADC table (one 6-dp sub-distance per (sub, code), ``m*k`` rows) is
    built once and broadcast; each corpus vector's approximate distance is
    the exact BIGINT sum of its ``m`` micro-unit cells. Output:
    (id, approx_dist double) ascending, ties -> lowest id."""
    # validate the query side BEFORE the refine loop: each Lloyd round
    # below is an eager corpus-wide job, and the guard depends only on
    # query_df. r15 opt round: the guard COLLECTS (limit 2) instead of
    # counting, so the single validated row doubles as the ADC build's
    # query literal — the old shape paid one job for the count and then
    # re-evaluated the query subtree inside the ADC broadcast build.
    qdf = query_df.select(F.col(vec_col).alias("__q"))
    qrows = qdf.limit(2).collect()
    if len(qrows) != 1:
        raise ValueError(
            f"pq_adc_topk requires a single-row query_df, got "
            f"{'>=2' if len(qrows) > 1 else 0} "
            "rows: a multi-row query would silently cross-join into a duplicated "
            "ADC table and sum distances across queries"
        )
    cb = pq_codebooks(df, id_col, vec_col, m, k, dim)
    for _ in range(refine):
        # pq_refine returns a LITERAL-backed codebook (its means collect
        # is the round's one corpus pass), so downstream encode/ADC
        # plans embed the refined rows instead of replaying the lineage.
        cb = pq_refine(df, cb, id_col, vec_col, m, dim)
    d = _subdim(dim, m)
    spark = df.sparkSession
    # refined codebooks carry their rows (pq_refine) — skip the re-collect
    cb_rows = getattr(cb, "_redp_cb_rows", None) or cb.collect()
    # ADC table computed driver-side in pure Python — bit-identical to
    # the former Spark expression (the L2 fold is the same sequential
    # left-to-right double accumulation, and _round6 reproduces Spark's
    # F.round on doubles exactly: BigDecimal.valueOf(d).setScale(6,
    # HALF_UP) == Decimal(repr(d)).quantize(1e-6, HALF_UP), both on the
    # shortest round-trip decimal form). The m*k cells are model-sized;
    # evaluating them as a collect cost one Spark job per query.
    qv = [float(x) for x in qrows[0]["__q"]]
    micro_by_sub: dict[int, dict[int, int]] = {}
    for r in cb_rows:
        s = int(r["sub"])
        acc = 0.0
        for x, y in zip(qv[s * d : (s + 1) * d], r["cvec"]):
            acc = acc + (float(x) - float(y)) * (float(x) - float(y))
        micro_by_sub.setdefault(s, {})[int(r["code"])] = int(
            math.floor(_round6(acc) * 1e6 + 0.5)
        )
    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(int(r["sub"]), []).append((int(r["code"]), list(r["cvec"])))
    # coverage check (r16, ADVICE): a codebook lacking a subspace used
    # to surface as a bare KeyError below, unlike pq_encode/pq_refine
    # whose _entries_by_sub raises the intended diagnostic
    if set(by_sub) != set(range(m)):
        raise ValueError(
            f"codebook must cover every subspace 0..{m - 1}; "
            f"missing {sorted(set(range(m)) - set(by_sub))}, "
            f"unexpected {sorted(set(by_sub) - set(range(m)))}"
        )
    subs_data = []
    for s in range(m):
        entries = sorted(by_sub[s])
        if [c for c, _ in entries] != list(range(len(entries))):
            raise ValueError("PQ codes must be dense 0..k-1 per subspace")
        subs_data.append((entries, [micro_by_sub[s][c] for c, _ in entries]))
    # r15 opt round: encode + ADC lookup + distance sum FUSE into one
    # per-row expression over a single broadcast row holding the
    # codebook entries and micro cells as DATA (never plan literals —
    # the literal-codebook variant was measured and rejected: plan
    # construction/analysis cost seconds per query). The old shape
    # (pq_encode's per-(id, sub) exchange, then join + groupBy(id))
    # shuffled the corpus twice to aggregate rows that originate from
    # the same input row; this one is a pure map -> the whole scoring
    # chain is ONE corpus scan feeding TakeOrdered.
    bdf = _local_df(
        spark,
        [(subs_data,)],
        "subs array<struct<entries:array<struct<code:int,cvec:array<double>>>,"
        "micro:array<bigint>>>",
    )

    def _micro_of(s):
        sb = F.element_at(F.col("subs"), s + 1)
        best = _argmin_entry(sb["entries"], _sub_slice(F.col(vec_col), s, d))
        return F.element_at(sb["micro"], best["code"] + 1)

    am = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc + _micro_of(s),
    )
    summed = (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(bdf))
        .select(id_col, am.alias("__am"))
    )
    return (
        summed.select(id_col, (F.col("__am").cast("double") / 1e6).alias("approx_dist"))
        .orderBy(F.col("approx_dist"), id_col)
        .limit(k_top)
    )


def pq_adc_rerank_topk(
    df: DataFrame,
    query_df: DataFrame,
    k_top: int = 10,
    cand_depth: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    refine: int = 1,
) -> DataFrame:
    """The production PQ pattern: codes generate CANDIDATES, exact
    distances pick winners. ADC ranks the whole corpus from 4-bit codes
    (cheap, compressed-domain), the top ``cand_depth`` survivors are
    joined back to their full vectors, and exact L2 reranks them to
    ``k_top``. Quantization error then only hurts if a true neighbor
    falls outside the candidate set — recall@10 goes 0.3 -> 1.0 on the
    gate corpus at depth 100 (sim_pq_recall_report measures both).

    At scale the exact side of the rerank touches only ``cand_depth``
    rows — the full-vector corpus is probed with an id equi-join, never
    scanned. Output: (id, exact_dist) ascending."""
    cand = pq_adc_topk(
        df, query_df, k_top=cand_depth, id_col=id_col, vec_col=vec_col,
        m=m, k=k, dim=dim, refine=refine,
    ).select(id_col)
    q = query_df.select(F.col(vec_col).alias("__q"))
    return (
        df.join(cand, id_col)
        .crossJoin(F.broadcast(q))
        .select(id_col, l2_dist_sq(F.col(vec_col), F.col("__q")).alias("exact_dist"))
        .orderBy("exact_dist", id_col)
        .limit(k_top)
    )
