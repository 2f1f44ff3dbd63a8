"""Recall of the seeded Gaussian sign-LSH (VERDICT r1: the old
coordinate-axis planes lost all recall whenever the first ``bits``
dimensions were uninformative). The fixture makes exactly that hostile
case: cluster structure lives only in dims 9..64, dims 1..8 are pure
noise — axis-sign bucketing scatters each cluster across 2^8 buckets,
hyperplane bucketing keeps clusters together.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.similarity import (
    embedding_dup_pairs,
    gaussian_planes,
    sign_bucket,
)


def _hostile_corpus(spark, members=5):
    rng = np.random.default_rng(7)
    rows = []
    for c in range(2):
        u = rng.standard_normal(64)
        u[:8] = 0.0  # cluster direction invisible to axis-sign buckets
        u /= np.linalg.norm(u)
        for m in range(members):
            v = u + 0.01 * rng.standard_normal(64)
            v[:8] = 0.01 * rng.standard_normal(8)  # first dims: noise only
            rows.append((c * members + m, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gaussian_lsh_full_recall_on_rotated_clusters(spark):
    df = _hostile_corpus(spark)
    pairs = embedding_dup_pairs(df, threshold=0.9, bits=6).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(a, b) for c in range(2) for a in range(c * 5, c * 5 + 5)
            for b in range(a + 1, c * 5 + 5)}
    # single-table LSH: a member sitting near one plane can still flip a
    # bit, so demand high recall rather than perfection — the axis-plane
    # version finds ~0 of these pairs (cluster signal is outside dims 1-8)
    assert not (got - want)  # no false cross-cluster pairs
    assert len(got & want) >= 0.7 * len(want)


def test_axis_signs_would_have_scattered_this_corpus(spark):
    """Documents why the change matters: the old axis-sign bucketing
    splits each cluster into several buckets on this corpus."""
    df = _hostile_corpus(spark)
    axis = df.select(
        "vec_id",
        F.concat(*[
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(6)
        ]).alias("bkt"),
    ).collect()
    cluster0 = {r["bkt"] for r in axis if r["vec_id"] < 5}
    assert len(cluster0) > 1  # axis buckets disagree within a cluster


def test_knn_join_recall_on_rotated_clusters(spark):
    """Banded kNN join finds same-cluster neighbors even when cluster
    structure is invisible to the leading dimensions."""
    from real_estate_data_pipeline_spark.ops.similarity import knn_join

    df = _hostile_corpus(spark)
    nn = knn_join(df, df, k=4, bits=6, bands=3).collect()
    _assert_knn_quality(nn)


def test_knn_self_join_matches_two_sided(spark):
    """The single-scan self path must produce the same edges as
    knn_join(df, df)."""
    from real_estate_data_pipeline_spark.ops.similarity import knn_join, knn_self_join

    df = _hostile_corpus(spark)
    self_nn = knn_self_join(df, k=4, bits=6, bands=3).collect()
    _assert_knn_quality(self_nn)
    two_sided = {
        (r["left_id"], r["right_id"]) for r in knn_join(df, df, k=4, bits=6, bands=3).collect()
    }
    assert {(r["left_id"], r["right_id"]) for r in self_nn} == two_sided


def _assert_knn_quality(nn):
    same_cluster = sum(1 for r in nn if r["left_id"] // 5 == r["right_id"] // 5)
    assert same_cluster >= 0.8 * len(nn)  # neighbors mostly intra-cluster
    per_left = {}
    for r in nn:
        per_left.setdefault(r["left_id"], []).append(r["right_id"])
    # every member should see at least 2 of its 4 cluster-mates
    assert all(
        sum(1 for b in v if b // 5 == a // 5) >= 2 for a, v in per_left.items()
    )


def test_ivf_knn_self_join_quality_and_determinism(spark):
    """IVF cells adapt to the data, so the hostile corpus (cluster
    signal invisible to leading dims) is easy: with enough cells each
    cluster gets its own cell and every neighbor list is intra-cluster."""
    from real_estate_data_pipeline_spark.ops.similarity import ivf_knn_self_join

    df = _hostile_corpus(spark)
    nn = ivf_knn_self_join(df, k=4, n_cells=4, nprobe=2, refine=1).collect()
    _assert_knn_quality(nn)
    assert all(r["left_id"] != r["right_id"] for r in nn)
    again = ivf_knn_self_join(df, k=4, n_cells=4, nprobe=2, refine=1).collect()
    assert {(r["left_id"], r["right_id"]) for r in nn} == {
        (r["left_id"], r["right_id"]) for r in again
    }


def test_ivf_arrow_matches_jvm_variant(spark):
    """The Arrow (applyInPandas gram-matrix) variant must produce the
    same edge set as the JVM-expression variant — same centroids, same
    probes, same tie-breaks."""
    from real_estate_data_pipeline_spark.ops.similarity import (
        ivf_knn_self_join,
        ivf_knn_self_join_arrow,
    )

    df = _hostile_corpus(spark)
    jvm = {(r["left_id"], r["right_id"])
           for r in ivf_knn_self_join(df, k=4, n_cells=4, nprobe=2, refine=1).collect()}
    arrow = {(r["left_id"], r["right_id"])
             for r in ivf_knn_self_join_arrow(df, k=4, n_cells=4, nprobe=2, refine=1).collect()}
    assert arrow == jvm


def test_banded_knn_arrow_matches_jvm_variant(spark):
    """The Arrow banded-LSH kNN (matmul buckets + per-bucket gram
    top-k) must produce the same edge set as the JVM-expression
    self-join: identical planes/threshold give identical buckets, and
    per-bucket top-k provably retains every globally top-k edge."""
    from real_estate_data_pipeline_spark.ops.similarity import (
        knn_self_join,
        knn_self_join_arrow,
    )

    df = _hostile_corpus(spark)
    jvm_rows = knn_self_join(df, k=4, bits=6, bands=3).collect()
    arrow_rows = knn_self_join_arrow(df, k=4, bits=6, bands=3).collect()
    jvm = {(r["left_id"], r["right_id"]): r["cosine_sim"] for r in jvm_rows}
    arrow = {(r["left_id"], r["right_id"]): r["cosine_sim"] for r in arrow_rows}
    # The two variants compute cosine differently (sequential fold vs
    # normalized BLAS gram), so scores can diverge by ~1e-15; an edge
    # disagreement is acceptable ONLY as a near-tie at the k boundary
    # (the swapped-in edge's score within FP tolerance of the k-th
    # score for that left_id). Everything else must match exactly.
    kth_jvm = {}
    for (left, _), s in jvm.items():
        kth_jvm[left] = min(s, kth_jvm.get(left, float("inf")))
    for edge in set(jvm) ^ set(arrow):
        score = jvm.get(edge, arrow.get(edge))
        assert abs(score - kth_jvm[edge[0]]) < 1e-9, (
            f"edge {edge} differs between variants and is not a k-boundary tie"
        )
    # Shared edges must agree on score to FP tolerance.
    for edge in set(jvm) & set(arrow):
        assert abs(jvm[edge] - arrow[edge]) < 1e-9


def test_ivf_knn_join_two_corpus(spark):
    """Query-vs-base IVF join: queries find their own cluster in the
    base corpus; no self-pairs (ids overlap across the two frames)."""
    from real_estate_data_pipeline_spark.ops.similarity import ivf_knn_join

    base = _hostile_corpus(spark)
    queries = base.limit(4)  # members of both clusters as queries
    # 2 cells converge onto the 2 clusters (see the recenter test), so
    # probing the single nearest cell must surface exactly the query's
    # own cluster-mates — deterministic even at this toy scale.
    nn = ivf_knn_join(queries, base, k=3, n_cells=2, nprobe=1, refine=2).collect()
    assert all(r["left_id"] != r["right_id"] for r in nn)
    per_left = {}
    for r in nn:
        per_left.setdefault(r["left_id"], []).append(r["right_id"])
    assert len(per_left) == 4
    for a, v in per_left.items():
        assert len(v) == 3
        assert all(b // 5 == a // 5 for b in v)  # own cluster only


def test_ivf_centroids_refinement_recenter(spark):
    """Lloyd iterations recenter each cell on its members' mean: with
    two tight clusters and 2 cells, refined centroids converge onto the
    cluster means even though BOTH seeds start inside cluster 0 (one
    iteration splits the mixed cell, the second recenters exactly)."""
    import numpy as np

    from real_estate_data_pipeline_spark.ops.similarity import ivf_centroids

    df = _hostile_corpus(spark)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    means = [np.mean([vecs[i] for i in range(c * 5, c * 5 + 5)], axis=0) for c in range(2)]
    cents = [np.array(r["cvec"]) for r in ivf_centroids(df, n_cells=2, refine=2).collect()]
    for c in cents:
        best = min(np.linalg.norm(c - m) for m in means)
        assert best < 0.05  # recentered onto a cluster mean
    # and each mean is claimed by a DIFFERENT centroid
    claimed = {int(np.argmin([np.linalg.norm(c - m) for m in means])) for c in cents}
    assert claimed == {0, 1}


def test_bucket_deterministic_across_calls(spark):
    df = _hostile_corpus(spark)
    b1 = {r["vec_id"]: r["b"] for r in df.select("vec_id", sign_bucket(F.col("embedding"), 8).alias("b")).collect()}
    b2 = {r["vec_id"]: r["b"] for r in df.select("vec_id", sign_bucket(F.col("embedding"), 8).alias("b")).collect()}
    assert b1 == b2
    assert gaussian_planes(4) == gaussian_planes(4)  # seeded, stable


def test_zero_vectors_survive_featurizer_but_skip_ann(spark):
    """Token-less docs featurize to zero vectors (not dropped), and the
    banded kNN excludes zero vectors from bucketing — they have no
    direction, and a zero-vector population would otherwise collide
    into one degenerate hot bucket in every band."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops.similarity import knn_self_join
    from real_estate_data_pipeline_spark.ops.text import hashing_trick_embedding

    docs = spark.createDataFrame(
        # docs 1 and 2 identical -> identical embeddings -> guaranteed
        # same bucket in every band (the pairing must not depend on
        # random-plane luck at tiny scale)
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "   "), (4, "")],
        "doc_id long, text string",
    )
    # dim=64: the banded plane family is generated at the engine's
    # fixed 64-dim (the Arrow variant matmuls against it strictly)
    emb = hashing_trick_embedding(docs, "doc_id", "text", dim=64)
    rows = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    assert set(rows) == {1, 2, 3, 4}          # nothing silently dropped
    assert all(v == 0.0 for v in rows[3]) and all(v == 0.0 for v in rows[4])
    from real_estate_data_pipeline_spark.ops.similarity import knn_self_join_arrow

    for fn in (knn_self_join, knn_self_join_arrow):
        edges = fn(emb, k=2, id_col="doc_id", vec_col="embedding",
                   bits=4, bands=2).collect()
        ids_in_edges = {r["left_id"] for r in edges} | {r["right_id"] for r in edges}
        assert 3 not in ids_in_edges and 4 not in ids_in_edges, fn.__name__
        assert {1, 2} <= ids_in_edges, fn.__name__


def test_int8_quantization_recall_and_invariants(spark, sf_oracle):
    """int8 quantization: (a) cosine over the int arrays tracks float
    cosine within the 8-bit lattice error, (b) float top-10 and q8
    top-10 overlap on >= 8 ids, (c) the zero vector quantizes to the
    zero lattice point with scale 1."""
    from real_estate_data_pipeline_spark.ops.similarity import (
        brute_force_topk,
        cosine,
        quantize_embeddings,
    )

    e = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    qz = quantize_embeddings(e, "vec_id", "embedding")
    # (a) score drift bounded by lattice error
    drift = (
        e.join(qz, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            F.abs(
                cosine(F.col("embedding"), F.col("qv"))
                - cosine(F.col("q8"), F.col("qv"))
            ).alias("d")
        )
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert drift < 0.01, drift
    # (b) top-10 overlap
    qvec = F.first(F.col("embedding"))
    qrow = e.filter(F.col("vec_id") == 0).agg(qvec.alias("qv"))
    top_f = {
        r["vec_id"]
        for r in e.crossJoin(F.broadcast(qrow))
        .select("vec_id", cosine(F.col("embedding"), F.col("qv")).alias("s"))
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    }
    top_q = {
        r["vec_id"]
        for r in qz.crossJoin(F.broadcast(qrow))
        .select("vec_id", cosine(F.col("q8"), F.col("qv")).alias("s"))
        .orderBy(F.desc("s"), "vec_id")
        .limit(10)
        .collect()
    }
    assert len(top_f & top_q) >= 8, (top_f, top_q)
    # (c) zero vector
    z = spark.createDataFrame([(1, [0.0] * 64)], "vec_id long, embedding array<float>")
    row = quantize_embeddings(z).collect()[0]
    assert row["scale"] == 1.0 and all(v == 0 for v in row["q8"])


def _clustered_corpus(spark, n_clusters=6, members=8, seed=11):
    """Well-separated unit clusters with labels — PQ should keep cluster
    members closer than non-members, and labels drive hard negatives."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        u = rng.standard_normal(64)
        u /= np.linalg.norm(u)
        for m in range(members):
            v = u + 0.05 * rng.standard_normal(64)
            rows.append((c * members + m, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_pq_adc_recall_vs_bruteforce(spark):
    """PQ-ADC top-k (4-bit codes) must recover most of the exact top-k:
    on separated clusters the quantization noise is far below the
    inter-cluster margin, so the query's own cluster dominates both."""
    from real_estate_data_pipeline_spark.ops import pq
    from real_estate_data_pipeline_spark.ops.similarity import brute_force_topk

    df = _clustered_corpus(spark)
    q = df.filter(F.col("vec_id") == 0)
    approx = {r["vec_id"] for r in pq.pq_adc_topk(df, q, k_top=8).collect()}
    qvec = F.array(*[F.lit(x) for x in q.collect()[0]["embedding"]])
    exact = {r["vec_id"] for r in brute_force_topk(df, qvec, k=8).collect()}
    assert len(approx & exact) >= 6  # >= 75% recall@8


def test_pq_codes_shape_and_range(spark):
    """Every vector gets exactly m codes, each in [0, k)."""
    from real_estate_data_pipeline_spark.ops import pq

    df = _clustered_corpus(spark)
    cb = pq.pq_codebooks(df, m=8, k=16)
    codes = pq.pq_encode(df, cb, m=8).collect()
    n = df.count()
    assert len(codes) == n * 8
    assert all(0 <= r["code"] < 16 for r in codes)
    per_vec = {}
    for r in codes:
        per_vec.setdefault(r["vec_id"], set()).add(r["sub"])
    assert all(subs == set(range(8)) for subs in per_vec.values())


def test_pq_seed_vector_zero_distance(spark):
    """A codebook seed vector encodes to itself, so its ADC distance to a
    query equals the query's table distance — in particular vec_id=0
    (seed 0) queried against itself has approx_dist exactly 0."""
    from real_estate_data_pipeline_spark.ops import pq

    df = _clustered_corpus(spark)
    q = df.filter(F.col("vec_id") == 0)
    top = pq.pq_adc_topk(df, q, k_top=1).collect()
    assert top[0]["vec_id"] == 0 and top[0]["approx_dist"] == 0.0


def test_hard_negatives_exclude_own_label(spark):
    """Every mined negative has a different label than its query, ranks
    are 1..k dense per query, and the top negative really is the most
    similar other-label vector (checked against a numpy replica)."""
    from real_estate_data_pipeline_spark.ops.similarity import hard_negative_topk

    df = _clustered_corpus(spark)
    queries = df.filter(F.col("vec_id") < 4)
    out = hard_negative_topk(df, queries, k=5).collect()
    labels = {r["vec_id"]: r["label"] for r in df.select("vec_id", "label").collect()}
    by_q = {}
    for r in out:
        assert labels[r["vec_id"]] != labels[r["qid"]]
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in df.select("vec_id", "embedding").collect()}
    for qid, rows in by_q.items():
        qv = vecs[qid]
        best = max(
            ((i, float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))))
             for i, v in vecs.items() if labels[i] != labels[qid]),
            key=lambda t: (round(t[1], 6), -t[0]),
        )
        top = min(rows, key=lambda r: r["rank"])
        assert top["vec_id"] == best[0]


def test_pq_rerank_full_depth_is_exact(spark):
    """With cand_depth = corpus size the rerank stage IS brute-force L2:
    the PQ candidate stage can't drop anyone, so the output must equal
    the exact L2 top-k regardless of quantization quality."""
    import numpy as np

    from real_estate_data_pipeline_spark.ops import pq

    df = _clustered_corpus(spark)
    n = df.count()
    q = df.filter(F.col("vec_id") == 7)
    got = [r["vec_id"] for r in pq.pq_adc_rerank_topk(df, q, k_top=5, cand_depth=n).collect()]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in df.select("vec_id", "embedding").collect()}
    qv = vecs[7]
    exact = sorted(vecs, key=lambda i: (((vecs[i] - qv) ** 2).sum(), i))[:5]
    assert got == exact


def test_ivf_null_cosine_ranks_last(spark):
    """r16 ADVICE guard: a NULL cosine (NULL vector element) must rank
    LAST in the map-side argmin — as the pre-r15 desc window did — not
    win every row's assignment as a bare NULL struct field would.
    Seed 0 carries a NULL element, so every row's cosine against it is
    NULL; rows 1-3 must still assign to the real centroid (cid 1) and
    its refined mean must be exactly their rounded component means."""
    from real_estate_data_pipeline_spark.ops.similarity import ivf_centroids

    rows = [
        (0, [1.0, None]),
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = {
        r["cid"]: r["cvec"]
        for r in ivf_centroids(df, n_cells=2, refine=1, round_dp=6).collect()
    }
    assert cent.get(1) == [
        round((1.0 + 0.9 + 0.8) / 3, 6),
        round((0.0 + 0.1 + 0.2) / 3, 6),
    ], cent
