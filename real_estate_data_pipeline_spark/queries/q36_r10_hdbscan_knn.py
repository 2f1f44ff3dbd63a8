"""Split from queries.py lines 25181-25516 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, register, similarity, t
from .q09_llm_dedup_text_sim import _EMB_BAND_SQL, _EN_NORM_SQL, _cos6_sql
from .q15_curation_r3 import _KLL_QS, _kll_gate, _kll_oracle_sql
from .q26_r8_mixed import (
    _BM25_SQL_CHAIN,
    _BM25_TERMS,
    _QL_SQL_CHAIN,
    _TOK_SQL_CTES,
    _bm25_score_frame,
    _ql_score_frame,
    _retrieval_wide,
)

# ===========================================================================
# round-10 wave 5: HDBSCAN mutual-reachability core edges (the density
# step on the kNN graph), ranker concordance (Kendall's W), the exact
# 2x2 odds ratio, and the KLL merge-AGGREGATE gate.
# ===========================================================================

register(
    "sim_hdbscan_core_edges",
    # the density-aware first step of HDBSCAN on the banded-LSH kNN
    # graph: core distance = a vector's 3rd-NN cosine distance among
    # its kNN edges, mutual reachability of an edge (a,b) =
    # max(core_a, core_b, d_ab). The smallest mutual-reachability edges
    # are the first edges HDBSCAN's MST would take — the pairs that are
    # close AND sit in dense neighborhoods. All distances derive from
    # the 6dp-rounded cosine, so ordering and values are engine-exact.
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    und AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             {_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')} AS cosine_sim
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
    ),
    o AS (
      SELECT id_a AS left_id, id_b AS right_id, cosine_sim FROM und
      UNION ALL
      SELECT id_b AS left_id, id_a AS right_id, cosine_sim FROM und
    ),
    topk AS MATERIALIZED (
      SELECT left_id, right_id, cosine_sim FROM (
        SELECT o.*, ROW_NUMBER() OVER (PARTITION BY left_id
                                       ORDER BY cosine_sim DESC, right_id) AS rn
        FROM o
      ) WHERE rn <= 3
    ),
    core AS MATERIALIZED (
      SELECT left_id AS id, round(1.0 - MIN(cosine_sim), 6) AS cd
      FROM topk GROUP BY left_id HAVING COUNT(*) = 3
    ),
    edges AS (
      SELECT LEAST(left_id, right_id) AS id_a,
             GREATEST(left_id, right_id) AS id_b,
             MAX(cosine_sim) AS cosine_sim
      FROM topk GROUP BY 1, 2
    )
    SELECT e.id_a, e.id_b,
           round(1.0 - e.cosine_sim, 6) AS edge_dist,
           GREATEST(ca.cd, cb.cd, round(1.0 - e.cosine_sim, 6)) AS mutual_reach
    FROM edges e
    JOIN core ca ON ca.id = e.id_a
    JOIN core cb ON cb.id = e.id_b
    ORDER BY mutual_reach, e.id_a, e.id_b
    LIMIT 20
    """,
)


def _dhdbscancore(spark, sf_dir):
    """HDBSCAN core-distance edges: the kNN graph comes from the
    engine's Arrow banded-LSH self-join (never a full pairwise pass),
    core distances are one grouped min over each vector's 3 edges, and
    mutual reachability is two broadcast-joined lookups per edge — the
    density transform that makes single-linkage robust to noise, at
    kNN cost."""
    e = t(spark, sf_dir, "embeddings")
    kn = similarity.knn_self_join_arrow(
        e, k=3, bits=6, bands=3, score_dp=6
    ).localCheckpoint(eager=False)
    core = (
        kn.groupBy("left_id")
        .agg(F.min("cosine_sim").alias("__s3"), F.count("*").alias("__c"))
        .filter(F.col("__c") == 3)
        .select(F.col("left_id").alias("id"), F.round(1.0 - F.col("__s3"), 6).alias("cd"))
        .localCheckpoint(eager=False)
    )
    edges = (
        kn.groupBy(
            F.least("left_id", "right_id").alias("id_a"),
            F.greatest("left_id", "right_id").alias("id_b"),
        )
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    ca = core.withColumnsRenamed({"id": "id_a", "cd": "__ca"})
    cb = core.withColumnsRenamed({"id": "id_b", "cd": "__cb"})
    return (
        edges.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(1.0 - F.col("cosine_sim"), 6).alias("edge_dist"),
            F.greatest(
                F.col("__ca"), F.col("__cb"), F.round(1.0 - F.col("cosine_sim"), 6)
            ).alias("mutual_reach"),
        )
        .orderBy("mutual_reach", "id_a", "id_b")
        .limit(20)
    )


CATALOG["sim_hdbscan_core_edges"].fn = _dhdbscancore

register(
    "doc_ranker_kendalls_w",
    # do the three lexical rankers (BM25, query likelihood, raw term
    # frequency) agree? Kendall's coefficient of concordance over the
    # BM25 top-10 candidate set: each ranker ranks the same 10 docs
    # (deterministic ties by doc_id), rank sums R_i give
    # W = sum(2R_i - m(n+1))^2 / (m^2 (n^3 - n)) — all integers until
    # the one division. W = 1 is perfect agreement.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    {_QL_SQL_CHAIN},
    cand AS MATERIALIZED (
      SELECT doc_id, b6 FROM bscore ORDER BY b6 DESC, doc_id LIMIT 10
    ),
    rb AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b6 DESC, doc_id) AS r FROM cand
    ),
    rq AS (
      SELECT c.doc_id,
             ROW_NUMBER() OVER (ORDER BY q.q6 DESC, c.doc_id) AS r
      FROM cand c JOIN qscore q USING (doc_id)
    ),
    tfs AS (
      SELECT c.doc_id, CAST(SUM(qtf.tf) AS BIGINT) AS tft
      FROM cand c JOIN qtf USING (doc_id) GROUP BY c.doc_id
    ),
    rt AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tft DESC, doc_id) AS r FROM tfs
    ),
    rs AS (
      SELECT rb.doc_id, CAST(rb.r + rq.r + rt.r AS BIGINT) AS ri
      FROM rb JOIN rq USING (doc_id) JOIN rt USING (doc_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(3 AS BIGINT) AS m_rankers,
           round(CAST(SUM(CAST(2 * ri - 33 AS HUGEINT) * (2 * ri - 33)) AS DOUBLE)
                 / 4.0 / (9.0 * 990.0 / 12.0), 6) AS kendalls_w
    FROM rs
    """,
)


def _dkendallsw(spark, sf_dir):
    """Kendall's W over the shared retrieval scorers: the candidate
    set is one TakeOrdered top-10, all three rankings are windows over
    that 10-row frame, and W is one closing aggregate — multi-ranker
    agreement measured for the cost of the scorers themselves."""
    wide = _retrieval_wide(spark, sf_dir)
    cand = (
        _bm25_score_frame(wide)
        .select("doc_id", "b6")
        .orderBy(F.desc("b6"), "doc_id")
        .limit(10)
        .localCheckpoint(eager=False)
    )
    rb = cand.select(
        "doc_id", F.row_number().over(Window.orderBy(F.desc("b6"), "doc_id")).alias("r")
    )
    ql = _ql_score_frame(wide).select("doc_id", "q6")
    rq = (
        cand.join(ql, "doc_id")
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("q6"), "doc_id"))
            .alias("r"),
        )
    )
    # total matched tf per doc, columnar (zeros contribute nothing, so
    # the sum equals the old matched-rows-only aggregate; every cand
    # has >= 1 match by the bm25 frame's n_terms filter)
    tft_expr = F.col("__tf0")
    for _i in range(1, len(_BM25_TERMS)):
        tft_expr = tft_expr + F.col(f"__tf{_i}")
    tfs = cand.join(
        wide.select("doc_id", tft_expr.cast("long").alias("tft")), "doc_id"
    )
    rt = tfs.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("tft"), "doc_id")).alias("r"),
    )
    rs = (
        rb.join(rq.withColumnsRenamed({"r": "rq"}), "doc_id")
        .join(rt.withColumnsRenamed({"r": "rt"}), "doc_id")
        .select((F.col("r") + F.col("rq") + F.col("rt")).cast("long").alias("ri"))
    )
    d = 2 * F.col("ri") - 33
    return rs.agg(
        F.count("*").cast("long").alias("n_items"),
        F.lit(3).cast("long").alias("m_rankers"),
        F.round(
            F.sum(d.cast("decimal(18,0)") * d).cast("double")
            / 4.0
            / (9.0 * 990.0 / 12.0),
            6,
        ).alias("kendalls_w"),
    )


CATALOG["doc_ranker_kendalls_w"].fn = _dkendallsw

register(
    "ml_odds_ratio_2x2",
    # the 2x2 effect size the chi-square family doesn't report: the
    # odds ratio of 'order is urgent' vs 'order value above the global
    # median', with Haldane-Anscombe +0.5 correction only when a cell
    # is empty (here cells are large; the raw ratio is exact), plus the
    # Yates continuity-corrected chi-square — every term a wide-int.
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    med AS (
      SELECT CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS m2 FROM x
    ),
    cells AS (
      SELECT CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN urgent = 1 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents > m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN urgent = 0 AND 2 * cents <= m2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM x CROSS JOIN med
    )
    SELECT a AS n_urgent_high, b AS n_urgent_low,
           c AS n_other_high, d AS n_other_low,
           round(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE), 6) AS odds_ratio,
           round((a + b + c + d)
                 * POWER(GREATEST(abs(CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                                      - CAST(CAST(b AS HUGEINT) * c AS DOUBLE))
                                  - (a + b + c + d) / 2.0, 0.0), 2)
                 / CAST(a + b AS DOUBLE) / (c + d) / (a + c) / (b + d), 6)
               AS yates_chi2
    FROM cells
    """,
)


def _doddsratio(spark, sf_dir):
    """2x2 odds ratio + Yates chi-square: one exact-median pass, one
    conditional aggregate pivoting all four cells into a single row,
    wide-int cross products — the effect-size snapshot for any pair of
    binary flags at two corpus passes."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("urgent"),
        (F.col("o_totalprice").cast(DEC) * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = x.agg((2 * F.percentile("cents", 0.5)).cast("long").alias("m2"))
    hi = 2 * F.col("cents") > F.col("m2")
    lo = 2 * F.col("cents") <= F.col("m2")
    cells = x.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when((F.col("urgent") == 1) & hi, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("urgent") == 1) & lo, 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("urgent") == 0) & hi, 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("urgent") == 0) & lo, 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    ad = (F.col("a").cast("decimal(19,0)") * F.col("d")).cast("double")
    bc = (F.col("b").cast("decimal(19,0)") * F.col("c")).cast("double")
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    return cells.select(
        F.col("a").alias("n_urgent_high"),
        F.col("b").alias("n_urgent_low"),
        F.col("c").alias("n_other_high"),
        F.col("d").alias("n_other_low"),
        F.round(ad / bc, 6).alias("odds_ratio"),
        F.round(
            n
            * F.pow(F.greatest(F.abs(ad - bc) - n / 2.0, F.lit(0.0)), 2)
            / (F.col("a") + F.col("b")).cast("double")
            / (F.col("c") + F.col("d"))
            / (F.col("a") + F.col("c"))
            / (F.col("b") + F.col("d")),
            6,
        ).alias("yates_chi2"),
    )


CATALOG["ml_odds_ratio_2x2"].fn = _doddsratio

register(
    "sketch_kll_merge_agg_daily",
    # the merge-AGGREGATE path of the KLL sketch (kll_merge_agg_double
    # — a different code path than the binary merge fold the priority-
    # partials query exercises): one bounded sketch per calendar day,
    # merged by the aggregate into a single sketch, gated by the shared
    # rank-space bound against the exact percentiles. Mergeability is
    # the property that makes per-partition percentile state reusable —
    # this proves it for the daily-rollup shape.
    oracle=_kll_oracle_sql("events", "value"),
)


def _dkllmergeagg(spark, sf_dir):
    """Daily KLL partials merged by kll_merge_agg_double: the shape a
    warehouse actually stores (one tiny sketch per day partition,
    merged at query time for any date range) — and the merged sketch
    still honors the rank-error bound, which the shared gate verifies
    against one exact pass."""
    ev = t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast("double").alias("__v"),
    )
    partial = ev.groupBy("day").agg(F.kll_sketch_agg_double("__v").alias("__kll"))
    merged = partial.agg(F.kll_merge_agg_double("__kll").alias("__m"))
    ests = merged.select(
        *[
            F.kll_sketch_get_quantile_double("__m", F.lit(q)).alias(f"__est{i}")
            for i, q in enumerate(_KLL_QS)
        ]
    )
    v = ev.select("__v")
    return _kll_gate(v, ests)


CATALOG["sketch_kll_merge_agg_daily"].fn = _dkllmergeagg


