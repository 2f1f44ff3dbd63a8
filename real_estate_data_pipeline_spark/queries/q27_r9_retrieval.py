"""Split from queries.py lines 20228-20634 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q26_r8_mixed import (
    _BM25_SQL_CHAIN,
    _BM25_TERMS,
    _QL_SQL_CHAIN,
    _TOK_SQL_CTES,
    _all_terms_pred,
    _bm25_score_frame,
    _ql_score_frame,
    _rel_from_wide,
    _retrieval_wide,
)

# ===========================================================================
# round-9 retrieval family: Dirichlet QL, ranker A/B diagnostics, eval
# ===========================================================================

register(
    "doc_dirichlet_query_likelihood",
    # the language-modeling counterpart to BM25: Dirichlet-smoothed
    # query likelihood (mu=2000), ln p(q|d) = sum over query terms of
    # ln((tf + mu*cf/Nc)/(dl + mu)). EVERY document gets a score (the
    # background mass covers missing terms), per-(doc, term) micro-nats
    # make the per-doc sum an exact integer, top-15 by score.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_QL_SQL_CHAIN}
    SELECT doc_id, n_hits,
           round(CAST(q6 AS DOUBLE) / 1000000.0, 6) AS ql
    FROM qscore
    ORDER BY ql DESC, doc_id LIMIT 15
    """,
    bench=True,
)


def _ddirichletql(spark, sf_dir):
    """Dirichlet query likelihood top-k: the score frame is |docs| x
    |query terms| rows built by broadcasting the 3-row collection-
    frequency table and 1-row collection size onto the length table —
    linear in the corpus with no shuffle beyond the shared tf
    aggregate; ranking is TakeOrdered."""
    wide = _retrieval_wide(spark, sf_dir)
    return (
        _ql_score_frame(wide)
        .select(
            "doc_id",
            "n_hits",
            F.round(F.col("q6").cast("double") / 1e6, 6).alias("ql"),
        )
        .orderBy(F.desc("ql"), "doc_id")
        .limit(15)
    )


CATALOG["doc_dirichlet_query_likelihood"].fn = _ddirichletql


def _ranked_top(scores, score_col: str, n: int):
    """Top-n by (score desc, doc_id) with the 1-based rank attached.
    The row_number window runs over the already-LIMITed frame, so the
    global window in the plan is bounded (the catalog lint's rule)."""
    top = scores.orderBy(F.desc(score_col), "doc_id").limit(n)
    w = Window.orderBy(F.desc(score_col), "doc_id")
    return top.withColumn("r", F.row_number().over(w).cast("long"))


register(
    "doc_ranker_rrf_fusion",
    # reciprocal-rank fusion (k=60) of the two lexical rankers — BM25
    # and Dirichlet QL — over their top-20 lists: rrf = sum over
    # rankers of 1/(60+rank), absent docs contribute 0. Ranks are
    # deterministic (integer scores, doc_id tiebreak) and each 1/(60+r)
    # is one IEEE division, so the fused score is bit-identical across
    # engines. Top-10 fused.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    {_QL_SQL_CHAIN},
    ra AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b6 DESC, doc_id) AS r
      FROM bscore ORDER BY b6 DESC, doc_id LIMIT 20
    ),
    rb AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY q6 DESC, doc_id) AS r
      FROM qscore ORDER BY q6 DESC, doc_id LIMIT 20
    ),
    fused AS (
      SELECT doc_id,
             COALESCE(ra.r, 0) AS rank_bm25,
             COALESCE(rb.r, 0) AS rank_ql,
             COALESCE(1.0 / (60 + ra.r), 0.0)
               + COALESCE(1.0 / (60 + rb.r), 0.0) AS rrf
      FROM ra FULL OUTER JOIN rb USING (doc_id)
    )
    SELECT doc_id, rank_bm25, rank_ql, round(rrf, 9) AS rrf
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)


def _drrf(spark, sf_dir):
    """RRF fusion: both scorers share ONE tokenize pass and ONE
    (doc, term) tf aggregate; the rank lists are 20-row TakeOrdered
    frames, so the fusion join touches at most 40 rows no matter the
    corpus size — the classic cheap ensemble over heterogeneous
    retrievers."""
    wide = _retrieval_wide(spark, sf_dir)
    ra = _ranked_top(_bm25_score_frame(wide), "b6", 20).select(
        "doc_id", F.col("r").alias("ra")
    )
    rb = _ranked_top(_ql_score_frame(wide), "q6", 20).select(
        "doc_id", F.col("r").alias("rb")
    )
    fused = ra.join(rb, "doc_id", "full").select(
        "doc_id",
        F.coalesce(F.col("ra"), F.lit(0)).cast("long").alias("rank_bm25"),
        F.coalesce(F.col("rb"), F.lit(0)).cast("long").alias("rank_ql"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rb")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    return (
        fused.select("doc_id", "rank_bm25", "rank_ql", F.round("rrf_raw", 9).alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )


CATALOG["doc_ranker_rrf_fusion"].fn = _drrf

register(
    "doc_ranker_kendall_tau",
    # ranker A/B agreement: Kendall's tau between the BM25 and QL
    # orderings of the BM25 top-20. Both ranks are tie-free
    # row_numbers, so tau = (concordant - discordant) / C(20,2) from
    # pure integer pair counts — the rank-correlation A/B test for
    # retrieval changes.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    {_QL_SQL_CHAIN},
    top AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b6 DESC, doc_id) AS ra
      FROM bscore ORDER BY b6 DESC, doc_id LIMIT 20
    ),
    j AS MATERIALIZED (
      SELECT top.doc_id, top.ra,
             ROW_NUMBER() OVER (ORDER BY q.q6 DESC, top.doc_id) AS rb
      FROM top JOIN qscore q ON q.doc_id = top.doc_id
    ),
    pairs AS (
      SELECT CASE WHEN p2.rb > p1.rb THEN 1 ELSE 0 END AS conc
      FROM j p1 JOIN j p2 ON p1.ra < p2.ra
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(conc) AS BIGINT) AS n_concordant
      FROM pairs
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM j)
    SELECT nd.n_docs, agg.n_pairs, agg.n_concordant,
           CAST(agg.n_pairs - agg.n_concordant AS BIGINT) AS n_discordant,
           round((agg.n_concordant - (agg.n_pairs - agg.n_concordant))
                 / CAST(agg.n_pairs AS DOUBLE), 6) AS kendall_tau
    FROM agg CROSS JOIN nd
    """,
)


def _dkendalltau(spark, sf_dir):
    """Kendall tau over the BM25 top-20 re-ranked by QL: the pair space
    is C(20,2)=190 rows from a self-join of a 20-row frame (a bounded
    BNLJ — the k of top-k caps it regardless of corpus size); the only
    corpus-scale work is the shared scorer pipeline."""
    wide = _retrieval_wide(spark, sf_dir)
    top = _ranked_top(_bm25_score_frame(wide), "b6", 20).select(
        "doc_id", F.col("r").alias("ra")
    )
    q = _ql_score_frame(wide)
    wb = Window.orderBy(F.desc("q6"), "doc_id")
    j = (
        top.join(q, "doc_id")
        .withColumn("rb", F.row_number().over(wb).cast("long"))
        .select("ra", "rb")
        .localCheckpoint(eager=False)
    )
    p1 = j.select(F.col("ra").alias("ra1"), F.col("rb").alias("rb1"))
    p2 = j.select(F.col("ra").alias("ra2"), F.col("rb").alias("rb2"))
    agg = (
        p1.join(F.broadcast(p2), F.col("ra1") < F.col("ra2"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.when(F.col("rb2") > F.col("rb1"), 1).otherwise(0))
            .cast("long")
            .alias("n_concordant"),
        )
    )
    nd = j.agg(F.count("*").cast("long").alias("n_docs"))
    disc = F.col("n_pairs") - F.col("n_concordant")
    return agg.crossJoin(F.broadcast(nd)).select(
        "n_docs",
        "n_pairs",
        "n_concordant",
        disc.cast("long").alias("n_discordant"),
        F.round(
            (F.col("n_concordant") - disc) / F.col("n_pairs").cast("double"), 6
        ).alias("kendall_tau"),
    )


CATALOG["doc_ranker_kendall_tau"].fn = _dkendalltau

# suffix sums of 2520/d for d = m..10 (2520 = lcm(1..10)), so the
# average-overlap accumulation is pure integer arithmetic: a doc ranked
# (ra, rb) enters the depth-d overlap for every d >= max(ra, rb) and
# contributes sum_{d>=m} 2520/d exact 2520ths.
_AO_W = {1: 7381, 2: 4861, 3: 3601, 4: 2761, 5: 2131, 6: 1627, 7: 1207, 8: 847, 9: 532, 10: 252}

register(
    "doc_ranker_average_overlap",
    # the prefix-overlap ranker-agreement curve collapsed to one
    # number: average overlap AO@10 = (1/10) * sum over depths d=1..10
    # of |topd(BM25)∩topd(QL)|/d — the RBO family's exact-arithmetic
    # member (RBO's geometric p^d weights are transcendental-adjacent;
    # AO's 1/d weights times lcm(1..10)=2520 are integers).
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    {_QL_SQL_CHAIN},
    ra AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY b6 DESC, doc_id) AS r
      FROM bscore ORDER BY b6 DESC, doc_id LIMIT 10
    ),
    rb AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY q6 DESC, doc_id) AS r
      FROM qscore ORDER BY q6 DESC, doc_id LIMIT 10
    ),
    j AS (
      SELECT GREATEST(ra.r, rb.r) AS m
      FROM ra JOIN rb USING (doc_id)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(COALESCE(SUM(CASE m
             {' '.join(f'WHEN {k} THEN {v}' for k, v in _AO_W.items())}
           END), 0) AS BIGINT) AS ao_num,
           round(COALESCE(SUM(CASE m
             {' '.join(f'WHEN {k} THEN {v}' for k, v in _AO_W.items())}
           END), 0) / 25200.0, 6) AS average_overlap
    FROM j
    """,
)


def _daveoverlap(spark, sf_dir):
    """Average overlap AO@10 between the BM25 and QL rankings: the two
    10-row rank lists join on doc_id, each common doc contributes the
    integer suffix-weight of max(rank_a, rank_b), one aggregate — the
    work is bounded by k, not the corpus."""
    wide = _retrieval_wide(spark, sf_dir)
    ra = _ranked_top(_bm25_score_frame(wide), "b6", 10).select(
        "doc_id", F.col("r").alias("ra")
    )
    rb = _ranked_top(_ql_score_frame(wide), "q6", 10).select(
        "doc_id", F.col("r").alias("rb")
    )
    m = F.greatest("ra", "rb")
    w = None
    for k, v in _AO_W.items():
        w = F.when(m == k, v) if w is None else w.when(m == k, v)
    j = ra.join(rb, "doc_id").select(w.alias("w"))
    return j.agg(
        F.count("*").cast("long").alias("n_common"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("ao_num"),
        F.round(
            F.coalesce(F.sum("w"), F.lit(0)) / F.lit(25200.0), 6
        ).alias("average_overlap"),
    )


CATALOG["doc_ranker_average_overlap"].fn = _daveoverlap

register(
    "doc_boolean_retrieval_and",
    # inverted-index boolean retrieval: docs matching ALL query terms
    # (AND = grouped term count equals the query arity — a pure
    # equi-join shape, no per-term intersection loop), with the per-term
    # tf pivot and total term mass, top-20 by mass.
    oracle=f"""
    WITH {_TOK_SQL_CTES}
    SELECT doc_id,
           {", ".join(f"CAST(MAX(CASE WHEN tok = '{t}' THEN tf END) AS BIGINT) AS tf_{t}" for t in _BM25_TERMS)},
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM qtf GROUP BY doc_id HAVING COUNT(*) = {len(_BM25_TERMS)}
    ORDER BY total_tf DESC, doc_id LIMIT 20
    """,
)


def _dbooland(spark, sf_dir):
    """Boolean AND retrieval over the inverted index: the (doc, term)
    tf table groups by doc and keeps groups whose term count equals the
    query arity — set intersection as one aggregate, which is how a
    distributed boolean index evaluates conjunctions without N-way
    joins."""
    wide = _retrieval_wide(spark, sf_dir)
    total = F.col("__tf0")
    for i in range(1, len(_BM25_TERMS)):
        total = total + F.col(f"__tf{i}")
    return (
        wide.filter(_all_terms_pred())
        .select(
            "doc_id",
            *[
                F.col(f"__tf{i}").cast("long").alias(f"tf_{term}")
                for i, term in enumerate(_BM25_TERMS)
            ],
            total.cast("long").alias("total_tf"),
        )
        .orderBy(F.desc("total_tf"), "doc_id")
        .limit(20)
    )


CATALOG["doc_boolean_retrieval_and"].fn = _dbooland

register(
    "doc_retrieval_mrr_eval",
    # retrieval quality eval: the BM25 top-20 scored against a
    # deterministic relevance set (docs containing ALL query terms —
    # the boolean-AND oracle set): precision@5/@10, recall@20, and MRR
    # (1/rank of the first relevant hit). Integer hit counts; each
    # metric is one IEEE division.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    rel AS MATERIALIZED (
      SELECT doc_id FROM qtf GROUP BY doc_id HAVING COUNT(*) = {len(_BM25_TERMS)}
    ),
    nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant FROM rel),
    ranked AS (
      SELECT b.doc_id, ROW_NUMBER() OVER (ORDER BY b.b6 DESC, b.doc_id) AS r,
             CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS flag
      FROM (SELECT doc_id, b6 FROM bscore ORDER BY b6 DESC, doc_id LIMIT 20) b
      LEFT JOIN rel ON rel.doc_id = b.doc_id
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN flag = 1 AND r <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_5,
             CAST(SUM(CASE WHEN flag = 1 AND r <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
             CAST(SUM(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_20,
             MIN(CASE WHEN flag = 1 THEN r END) AS frr
      FROM ranked
    )
    SELECT nrel.n_relevant, agg.hits_at_5,
           round(agg.hits_at_5 / 5.0, 6) AS p_at_5,
           agg.hits_at_10,
           round(agg.hits_at_10 / 10.0, 6) AS p_at_10,
           agg.hits_at_20,
           round(COALESCE(CAST(agg.hits_at_20 AS DOUBLE)
                          / NULLIF(nrel.n_relevant, 0), 0.0), 6) AS recall_at_20,
           CAST(COALESCE(agg.frr, 0) AS BIGINT) AS first_rel_rank,
           round(COALESCE(1.0 / agg.frr, 0.0), 6) AS mrr
    FROM agg CROSS JOIN nrel
    """,
)


def _dmrreval(spark, sf_dir):
    """MRR / precision@k eval of the BM25 ranking against the exact
    boolean-AND relevance set: the relevance flag joins onto the 20-row
    ranked frame, one aggregate computes every hit count, the scalar
    relevance total broadcasts — eval cost is k plus one grouped count,
    never a corpus re-scan (the tf table is shared and checkpointed)."""
    wide = _retrieval_wide(spark, sf_dir)
    rel = _rel_from_wide(wide)
    nrel = rel.agg(F.count("*").cast("long").alias("n_relevant"))
    ranked = _ranked_top(_bm25_score_frame(wide), "b6", 20).join(
        rel, "doc_id", "left"
    )
    agg = ranked.agg(
        F.sum(F.when((F.col("flag") == 1) & (F.col("r") <= 5), 1).otherwise(0))
        .cast("long")
        .alias("hits_at_5"),
        F.sum(F.when((F.col("flag") == 1) & (F.col("r") <= 10), 1).otherwise(0))
        .cast("long")
        .alias("hits_at_10"),
        F.sum(F.when(F.col("flag") == 1, 1).otherwise(0)).cast("long").alias("hits_at_20"),
        F.min(F.when(F.col("flag") == 1, F.col("r"))).alias("frr"),
    )
    return agg.crossJoin(F.broadcast(nrel)).select(
        "n_relevant",
        "hits_at_5",
        F.round(F.col("hits_at_5") / 5.0, 6).alias("p_at_5"),
        "hits_at_10",
        F.round(F.col("hits_at_10") / 10.0, 6).alias("p_at_10"),
        "hits_at_20",
        F.round(
            F.coalesce(
                F.col("hits_at_20").cast("double")
                / F.nullif(F.col("n_relevant"), F.lit(0)),
                F.lit(0.0),
            ),
            6,
        ).alias("recall_at_20"),
        F.coalesce(F.col("frr"), F.lit(0)).cast("long").alias("first_rel_rank"),
        F.round(F.coalesce(F.lit(1.0) / F.col("frr"), F.lit(0.0)), 6).alias("mrr"),
    )


CATALOG["doc_retrieval_mrr_eval"].fn = _dmrreval


