"""Split from queries.py lines 13436-13963 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q09_llm_dedup_text_sim import _DIST_SQL, _EMB_BAND_SQL, _EN_NORM_SQL, _HASH01_SQL, _cos6_sql

# ===========================================================================
# round-7 additions: retrieval quality / embedding diagnostics
# ===========================================================================

register(
    "sim_ivf_recall_nprobe_sweep",
    # the tuning curve an IVF index ships with: recall@10 vs nprobe in
    # {1,2,4} for a 4-query panel, ground truth = exact cosine top-10.
    # Same fixed centroid set as sim_ivf_topk; ranking keys are
    # 6-dp-rounded cosines with vec_id tie-break, so the top-10 SETS
    # are engine-identical and recall is a ratio of exact integers.
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      ORDER BY vec_id LIMIT 16
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_DIST_SQL('e.embedding', 'c.cvec')}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    nrm AS (
      SELECT vec_id, embedding,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, n AS qn FROM nrm WHERE vec_id < 4),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {_cos6_sql('e.embedding', 'q.qv', 'e.n', 'q.qn')} DESC,
                                           e.vec_id) AS rn
        FROM nrm e CROSS JOIN q WHERE e.vec_id <> q.qid
      ) WHERE rn <= 10
    ),
    probe AS (
      SELECT qid, cid, rnk FROM (
        SELECT q.qid, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.qid
                                  ORDER BY {_DIST_SQL('c.cvec', 'q.qv')}, c.cid) AS rnk
        FROM cent c CROSS JOIN q
      ) WHERE rnk <= 4
    ),
    np AS (SELECT unnest([1, 2, 4]) AS nprobe),
    cand AS (
      SELECT np.nprobe, p.qid, a.vec_id
      FROM np JOIN probe p ON p.rnk <= np.nprobe
      JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.qid
    ),
    ivf AS (
      SELECT nprobe, qid, vec_id FROM (
        SELECT c.nprobe, c.qid, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY c.nprobe, c.qid
                                  ORDER BY {_cos6_sql('e.embedding', 'q.qv', 'e.n', 'q.qn')} DESC,
                                           c.vec_id) AS rn
        FROM cand c JOIN nrm e ON e.vec_id = c.vec_id JOIN q ON q.qid = c.qid
      ) WHERE rn <= 10
    ),
    hit AS (
      SELECT i.nprobe, i.qid, CAST(COUNT(*) AS BIGINT) AS hits
      FROM ivf i JOIN exact x ON x.qid = i.qid AND x.vec_id = i.vec_id
      GROUP BY 1, 2
    ),
    grid AS (SELECT np.nprobe, q.qid FROM np CROSS JOIN q)
    SELECT CAST(g.nprobe AS BIGINT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(CAST(SUM(COALESCE(h.hits, 0)) AS BIGINT) AS DOUBLE)
                 / (10.0 * COUNT(*)), 6) AS mean_recall_at10
    FROM grid g LEFT JOIN hit h ON h.nprobe = g.nprobe AND h.qid = g.qid
    GROUP BY g.nprobe ORDER BY g.nprobe
    """,
)


def _divfrecallsweep(spark, sf_dir):
    """Recall@10 vs nprobe for the IVF index — the accuracy/cost curve
    that decides the production probe count. The 4-query panel and the
    16-row centroid table ride as broadcasts; candidates meet the
    corpus through the cell-id equi-join (index-probe pattern), the
    exact baseline through the broadcast panel. Every ranking uses
    rounded-cosine + id tie-breaks so both engines pick identical
    top-10 sets."""
    from ..ops.similarity import cosine, ivf_assign, l2_dist_sq

    e = t(spark, sf_dir, "embeddings")
    cent, assign = ivf_assign(e, "vec_id", "embedding", 16)
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    wq = Window.partitionBy("qid")
    exact = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("__c"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(wq.orderBy(F.desc("__c"), "vec_id")),
        )
        .filter(F.col("__rn") <= 10)
        .select("qid", "vec_id")
    )
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select(
            "qid", "cid", l2_dist_sq(F.col("cvec"), F.col("qv")).alias("__d")
        )
        .withColumn("rnk", F.row_number().over(wq.orderBy("__d", "cid")))
        .filter(F.col("rnk") <= 4)
        .select("qid", "cid", "rnk")
    )
    np_df = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(1), F.lit(2), F.lit(4)), (F.col("id") + 1).cast("int"))
        .cast("long")
        .alias("nprobe")
    )
    cand = (
        F.broadcast(np_df)
        .join(F.broadcast(probe), F.col("rnk") <= F.col("nprobe"))
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("nprobe", "qid", "vec_id")
    )
    wnq = Window.partitionBy("nprobe", "qid")
    ivf = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q.withColumnsRenamed({"qv": "__qv"})), "qid")
        .select(
            "nprobe",
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("__qv")), 6).alias("__c"),
        )
        .withColumn(
            "__rn", F.row_number().over(wnq.orderBy(F.desc("__c"), "vec_id"))
        )
        .filter(F.col("__rn") <= 10)
        .select("nprobe", "qid", "vec_id")
    )
    hit = ivf.join(exact, ["qid", "vec_id"]).groupBy("nprobe", "qid").agg(
        F.count("*").cast("long").alias("hits")
    )
    grid = F.broadcast(np_df).crossJoin(F.broadcast(q.select("qid")))
    return (
        grid.join(hit, ["nprobe", "qid"], "left")
        .groupBy("nprobe")
        .agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(
                F.sum(F.coalesce(F.col("hits"), F.lit(0)))
                .cast("long")
                .cast("double")
                / (F.lit(10.0) * F.count("*")),
                6,
            ).alias("mean_recall_at10"),
        )
        .orderBy("nprobe")
    )


CATALOG["sim_ivf_recall_nprobe_sweep"].fn = _divfrecallsweep

register(
    "sim_mips_topk",
    # maximum-inner-product top-10 (the retrieval scoring when
    # embedding magnitude carries information — recommendation and
    # reranker shapes): plain dot against query vec 0, rounded to 6 dp
    # before ranking, id tie-break.
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_sum(list_transform(range(1, 65), i ->
               CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))), 6)
             AS inner_product
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY inner_product DESC, e.vec_id
    LIMIT 10
    """,
)


def _dmips(spark, sf_dir):
    """Brute-force MIPS top-10: one broadcast of the query vector, one
    ordered-fold dot per row (index order on both engines), distributed
    TakeOrdered. The unnormalized twin of sim_bruteforce_topk — at
    100 TB the same plan runs per query batch with the corpus scan
    shared."""
    from ..ops.similarity import dot

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(dot(F.col("embedding"), F.col("qv")), 6).alias("inner_product"),
        )
        .orderBy(F.desc("inner_product"), "vec_id")
        .limit(10)
    )


CATALOG["sim_mips_topk"].fn = _dmips

register(
    "sim_range_search_count",
    # cosine range search (radius query): for each of the 8 panel
    # queries, how many corpus vectors sit within cosine >= 0.2, plus
    # the mean similarity of the matches (micro-unit summed rounded
    # cosines, order-independent). The density probe that sizes
    # radius-based dedup thresholds.
    oracle=f"""
    WITH nrm AS (
      SELECT vec_id, embedding, {_EN_NORM_SQL} AS n FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qv, n AS qn FROM nrm WHERE vec_id < 8),
    scored AS (
      SELECT q.qid,
             {_cos6_sql('e.embedding', 'q.qv', 'e.n', 'q.qn')} AS c
      FROM nrm e CROSS JOIN q WHERE e.vec_id <> q.qid
    )
    SELECT qid,
           CAST(COUNT(CASE WHEN c >= 0.2 THEN 1 END) AS BIGINT) AS n_in_range,
           round(CAST(SUM(CASE WHEN c >= 0.2
                                THEN CAST(round(c * 1000000) AS BIGINT) END) AS DOUBLE)
                 / 1000000.0
                 / COUNT(CASE WHEN c >= 0.2 THEN 1 END), 6) AS mean_sim_in_range
    FROM scored GROUP BY qid ORDER BY qid
    """,
)


def _drangesearch(spark, sf_dir):
    """Cosine range search over an 8-query broadcast panel: one corpus
    scan, one fold per (row, query), a grouped conditional count — the
    radius-query building block (candidate counting for
    threshold-based dedup). The broadcast keeps it a map-side job; at
    100 TB the banded-LSH prefilter composes in front exactly as in
    knn_join."""
    from ..ops.similarity import cosine

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("c")
        )
    )
    in_range = F.when(F.col("c") >= 0.2, 1)
    return (
        scored.groupBy("qid")
        .agg(
            F.count(in_range).cast("long").alias("n_in_range"),
            F.round(
                F.sum(
                    F.when(
                        F.col("c") >= 0.2,
                        F.round(F.col("c") * 1000000, 0).cast("long"),
                    )
                )
                .cast("double")
                / 1000000.0
                / F.count(in_range),
                6,
            ).alias("mean_sim_in_range"),
        )
        .orderBy("qid")
    )


CATALOG["sim_range_search_count"].fn = _drangesearch

register(
    "emb_dim_variance_topk",
    # per-dimension variance screening (dead / dominant dimension
    # detection before PCA or quantization): elements quantize to
    # micro-unit BIGINTs, so sum and sum-of-squares are exact integers
    # and the variance assembly is engine-identical.
    oracle="""
    WITH el AS (
      SELECT g.i AS pos,
             CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
    ),
    m AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xm) AS BIGINT) AS sx,
             CAST(SUM(xm * xm) AS BIGINT) AS sxx
      FROM el GROUP BY pos
    )
    SELECT CAST(pos AS BIGINT) AS pos, n,
           round(CAST(sx AS DOUBLE) / 1000000.0 / n, 6) AS mean_val,
           round((CAST(sxx AS DOUBLE) / 1e12
                  - (CAST(sx AS DOUBLE) / 1000000.0)
                    * (CAST(sx AS DOUBLE) / 1000000.0) / n) / (n - 1), 6)
             AS variance
    FROM m
    ORDER BY variance DESC, pos
    LIMIT 10
    """,
)


def _ddimvar(spark, sf_dir):
    """Top-variance embedding dimensions: posexplode to (dim, element)
    — a 64x fan-out of a numeric column, not of text — then one
    64-group aggregate of exact micro-unit moments. The screening pass
    that picks quantization-hostile dimensions."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(F.posexplode("embedding").alias("p", "x")).select(
        (F.col("p") + 1).cast("long").alias("pos"),
        F.floor(F.col("x").cast("double") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("xm"),
    )
    m = el.groupBy("pos").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xm").cast("long").alias("sx"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sxx"),
    )
    sx, sxx, n = F.col("sx").cast("double"), F.col("sxx").cast("double"), F.col("n")
    return (
        m.select(
            "pos",
            "n",
            F.round(sx / 1000000.0 / n, 6).alias("mean_val"),
            F.round(
                (sxx / F.lit(1e12) - (sx / 1000000.0) * (sx / 1000000.0) / n)
                / (n - 1),
                6,
            ).alias("variance"),
        )
        .orderBy(F.desc("variance"), "pos")
        .limit(10)
    )


CATALOG["emb_dim_variance_topk"].fn = _ddimvar

register(
    "emb_quantization_error_report",
    # int8 symmetric quantization audit per dimension: scale =
    # max|x|/127 (exact — max of floats has no order sensitivity),
    # per-element reconstruction error micro-unit-quantized before the
    # MSE sum, worst dims first. The report that decides which dims
    # need higher-precision codes.
    oracle="""
    WITH el AS (
      SELECT g.i AS pos, CAST(embedding[g.i] AS DOUBLE) AS x
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
    ),
    sc AS (
      SELECT pos, MAX(abs(x)) / 127.0 AS scale FROM el GROUP BY pos
    ),
    err AS (
      SELECT el.pos,
             CAST(floor(round(
                 (el.x - round(el.x / sc.scale) * sc.scale)
                 * (el.x - round(el.x / sc.scale) * sc.scale), 12) * 1e12 + 0.5)
               AS BIGINT) AS e2p
      FROM el JOIN sc ON sc.pos = el.pos
    )
    SELECT CAST(e.pos AS BIGINT) AS pos,
           round(sc.scale, 6) AS scale,
           round(CAST(CAST(SUM(e.e2p) AS BIGINT) AS DOUBLE) / 1e12 / COUNT(*), 9)
             AS mse
    FROM err e JOIN sc ON sc.pos = e.pos
    GROUP BY e.pos, sc.scale
    ORDER BY mse DESC, pos
    LIMIT 10
    """,
)


def _dquanterr(spark, sf_dir):
    """Per-dimension int8 quantization error: one explode, a per-dim
    max (the scale), an equi-join back, exact pico-unit error sums.
    Codes in [-127,127] are implicit (x <= max|x| so round(x/scale)
    caps at 127); the join key is the 64-value dim id, so the 'join'
    is a broadcast of a 64-row table."""
    e = t(spark, sf_dir, "embeddings")
    el = e.select(F.posexplode("embedding").alias("p", "xf")).select(
        (F.col("p") + 1).cast("long").alias("pos"),
        F.col("xf").cast("double").alias("x"),
    )
    sc = el.groupBy("pos").agg((F.max(F.abs("x")) / 127.0).alias("scale"))
    err = el.join(F.broadcast(sc), "pos").select(
        "pos",
        F.floor(
            F.round(
                (F.col("x") - F.round(F.col("x") / F.col("scale"), 0) * F.col("scale"))
                * (
                    F.col("x")
                    - F.round(F.col("x") / F.col("scale"), 0) * F.col("scale")
                ),
                12,
            )
            * F.lit(1e12)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("e2p"),
    )
    return (
        err.join(F.broadcast(sc), "pos")
        .groupBy("pos", "scale")
        .agg(
            F.round(
                F.sum("e2p").cast("long").cast("double") / F.lit(1e12) / F.count("*"),
                9,
            ).alias("mse")
        )
        .select("pos", F.round("scale", 6).alias("scale"), "mse")
        .orderBy(F.desc("mse"), "pos")
        .limit(10)
    )


CATALOG["emb_quantization_error_report"].fn = _dquanterr

register(
    "ml_knn_classifier_eval",
    # k-NN classification by embedding (k=5, banded-LSH candidates,
    # majority vote with smallest-label tie-break) evaluated as a
    # confusion matrix on the u>=0.8 held-out split — the
    # label-propagation quality check a curation pipeline runs before
    # trusting pseudo-labels. Ranking keys are rounded cosines +
    # id tie-breaks; votes and the matrix are exact integers.
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n,
             {_HASH01_SQL.format(key="vec_id || 'knn'")} AS u
      FROM embeddings
    ),
    tr AS (SELECT * FROM b WHERE u < 0.8),
    te AS (SELECT * FROM b WHERE u >= 0.8),
    top AS (
      SELECT qid, nl FROM (
        SELECT te.vec_id AS qid, tr.label AS nl,
               ROW_NUMBER() OVER (PARTITION BY te.vec_id
                                  ORDER BY {_cos6_sql('tr.embedding', 'te.embedding', 'tr.n', 'te.n')} DESC,
                                           tr.vec_id) AS rn
        FROM te JOIN tr
          ON (te.bkt0 = tr.bkt0 OR te.bkt1 = tr.bkt1 OR te.bkt2 = tr.bkt2)
      ) WHERE rn <= 5
    ),
    votes AS (SELECT qid, nl, COUNT(*) AS v FROM top GROUP BY 1, 2),
    pred AS (
      SELECT qid, nl AS pred_label FROM (
        SELECT votes.*, ROW_NUMBER() OVER (PARTITION BY qid
                                           ORDER BY v DESC, nl) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT CAST(te.label AS BIGINT) AS true_label,
           CAST(p.pred_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN te ON te.vec_id = p.qid
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)


def _dknnclassifier(spark, sf_dir):
    """k-NN classifier evaluation: the banded-LSH knn_join supplies
    top-5 train neighbors per held-out vector (candidates meet in an
    equi-join on (band, bucket) — never a cross join), majority vote
    with deterministic tie-break, confusion matrix. Composes knn_join
    + hash split + two count aggregates; the eval is itself a
    relational plan that scales with the index join."""
    from ..ops.sampling import hash_uniform01
    from ..ops.similarity import knn_join

    e = t(spark, sf_dir, "embeddings")
    u = hash_uniform01(F.concat(F.col("vec_id").cast("string"), F.lit("knn")))
    b = e.withColumn("__u", u)
    tr = b.filter(F.col("__u") < 0.8).select("vec_id", "label", "embedding")
    te = b.filter(F.col("__u") >= 0.8).select("vec_id", "label", "embedding")
    top = knn_join(
        te.select("vec_id", "embedding"),
        tr.select("vec_id", "embedding"),
        k=5,
        score_dp=6,
    ).select(F.col("left_id").alias("qid"), F.col("right_id").alias("tid"))
    votes = (
        top.join(tr.select(F.col("vec_id").alias("tid"), F.col("label").alias("nl")), "tid")
        .groupBy("qid", "nl")
        .agg(F.count("*").alias("v"))
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("v"), "nl")
    pred = (
        votes.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .select("qid", F.col("nl").alias("pred_label"))
    )
    return (
        pred.join(te.select(F.col("vec_id").alias("qid"), "label"), "qid")
        .groupBy(
            F.col("label").cast("long").alias("true_label"),
            F.col("pred_label").cast("long").alias("pred_label"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("true_label", "pred_label")
    )


CATALOG["ml_knn_classifier_eval"].fn = _dknnclassifier


