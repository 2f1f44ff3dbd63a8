"""Round-14 wave 3: graded ranker-evaluation metrics over the shared
lexical-retrieval chains — nDCG@10/@20 with exact histogram-derived
ideal gains, a power-of-two-gain ERR@20 (every stopping probability is
dyadic, so the cascade product is exact), rank-biased overlap between
the BM25 and QL top-20 lists with Python-pre-quantized p-power
coefficients, truncated MAP@20, and the P@k / R-precision sweep.

All five reuse q26's single tokenize pass + (doc, term) tf table; the
eval frames are the 20-row top-k lists, so evaluation cost is O(k)
past the shared scoring scan regardless of corpus size.  Exactness:
graded gain = #distinct matched query terms (an integer join count);
log2 is rounded at 6dp and each per-rank term micro-quantized to
picounits before the cross-rank sum (the q38 recipe); ERR uses
R_r = 1 - 2^-g so the cascade continuation product is an exact power
of two (a shifted integer, never libm pow); the RBO p^d coefficients
are quantized ONCE in Python at 12dp and embedded verbatim in both
engines (the r13 constant-table rule).
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, t
from .q26_r8_mixed import (
    _BM25_SQL_CHAIN,
    _BM25_TERMS,
    _QL_SQL_CHAIN,
    _TOK_SQL_CTES,
    _bm25_score_frame,
    _ql_score_frame,
    _rel_from_wide,
    _retrieval_wide,
)
from .q27_r9_retrieval import _ranked_top

_RBO_P = 0.9
# p^d for d = 1..20, quantized once here and fed to both engines.
_RBO_POWS = {d: round(_RBO_P**d, 12) for d in range(1, 21)}

# Deliberately-weak retriever under evaluation: top-20 by the tf of
# the FIRST query term only.  A full-strength scorer (BM25/QL) ranks
# conjunctive matches on top and saturates every metric at 1.0 on this
# corpus; the single-term ranker vs the richer graded truth
# (g = #distinct matched query terms) is the realistic cheap-retriever
# eval and keeps every metric discriminative.
_RANKED_GAIN_SQL = """ra AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS r
      FROM (SELECT doc_id, tf FROM qtf WHERE tok = {first!r})
      ORDER BY tf DESC, doc_id LIMIT 20
    ),
    gm AS MATERIALIZED (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS g FROM qtf GROUP BY doc_id
    ),
    rg AS (
      SELECT ra.doc_id, ra.r, COALESCE(gm.g, 0) AS g
      FROM ra LEFT JOIN gm USING (doc_id)
    )""".format(first=_BM25_TERMS[0])


def _ranked_gain_frames(spark, sf_dir):
    """(rg, gm): the 20-row weak-ranker (first-term tf) ranking with
    graded gains, and the per-doc gain table (shared by the
    ideal-ranking histogram)."""
    wide = _retrieval_wide(spark, sf_dir)
    # g = #distinct matched terms and the weak first-term ranking, both
    # columnar over the wide frame (= the old qtf aggregate/filter rows)
    g_expr = (F.col("__tf0") > 0).cast("long")
    for _i in range(1, len(_BM25_TERMS)):
        g_expr = g_expr + (F.col(f"__tf{_i}") > 0).cast("long")
    gm = (
        wide.select("doc_id", g_expr.cast("long").alias("g"))
        .filter(F.col("g") > 0)
    )
    weak = (
        wide.filter(F.col("__tf0") > 0)
        .select("doc_id", F.col("__tf0").alias("tf"))
    )
    rg = (
        _ranked_top(weak, "tf", 20)
        .join(gm, "doc_id", "left")
        .select("doc_id", "r", F.coalesce(F.col("g"), F.lit(0)).alias("g"))
    )
    return rg, gm


register(
    "doc_ranker_ndcg_at_k",
    # nDCG@10/@20 of the weak single-term ranking with graded gains
    # (2^g - 1), g = #distinct matched query terms.
    # The ideal ranking never sorts the corpus: the gain histogram's
    # top-down cumulative counts assign each ideal rank its gain (rank
    # r takes the largest g whose >=g cumulative count covers r), a
    # #distinct-gains-sized join.  log2 at 6dp; per-rank terms in
    # picounits before the sums.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_RANKED_GAIN_SQL},
    dt AS (
      SELECT r, g,
             CAST(floor(round(((1::BIGINT << g) - 1)
               / round(ln(CAST(r AS DOUBLE) + 1) / ln(2.0), 6), 12)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM rg
    ),
    hg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM gm GROUP BY g),
    chg AS (SELECT g, CAST(SUM(cnt) OVER (ORDER BY g DESC) AS BIGINT) AS ch FROM hg),
    ds AS (SELECT CAST(d AS BIGINT) AS d FROM range(1, 21) t(d)),
    ig AS (
      SELECT ds.d, MAX(chg.g) AS g
      FROM ds JOIN chg ON ds.d <= chg.ch GROUP BY ds.d
    ),
    it AS (
      SELECT d,
             CAST(floor(round(((1::BIGINT << g) - 1)
               / round(ln(CAST(d AS DOUBLE) + 1) / ln(2.0), 6), 12)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM ig
    ),
    agg AS (
      SELECT (SELECT CAST(SUM(CASE WHEN r <= 10 THEN t12 ELSE 0 END) AS BIGINT)
                FROM dt) AS dcg10,
             (SELECT CAST(SUM(t12) AS BIGINT) FROM dt) AS dcg20,
             (SELECT CAST(SUM(CASE WHEN d <= 10 THEN t12 ELSE 0 END) AS BIGINT)
                FROM it) AS idcg10,
             (SELECT CAST(SUM(t12) AS BIGINT) FROM it) AS idcg20
    )
    SELECT round(dcg10 / 1000000000000.0, 6) AS dcg_at_10,
           round(dcg20 / 1000000000000.0, 6) AS dcg_at_20,
           round(CAST(dcg10 AS DOUBLE) / idcg10, 6) AS ndcg_at_10,
           round(CAST(dcg20 AS DOUBLE) / idcg20, 6) AS ndcg_at_20
    FROM agg
    """,
)


def _dndcg(spark, sf_dir):
    """nDCG@k: 20-row realized list vs the histogram-derived ideal."""
    rg, gm = _ranked_gain_frames(spark, sf_dir)

    def _t12(rank_col, g_col):
        pow2g = F.expr(f"shiftleft(1L, CAST({g_col} AS INT))")
        return F.floor(
            F.round(
                (pow2g - 1)
                / F.round(
                    F.log(F.col(rank_col).cast("double") + 1) / F.log(F.lit(2.0)), 6
                ),
                12,
            )
            * F.lit(1000000000000)
            + F.lit(0.5)
        ).cast("long")

    dt = rg.select("r", _t12("r", "g").alias("t12"))
    hg = gm.groupBy("g").agg(F.count("*").cast("long").alias("cnt"))
    wdesc = Window.orderBy(F.desc("g")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    chg = hg.select("g", F.sum("cnt").over(wdesc).cast("long").alias("ch"))
    ds = spark.range(1, 21).select(F.col("id").alias("d"))
    ig = (
        ds.join(F.broadcast(chg), F.col("d") <= F.col("ch"))
        .groupBy("d")
        .agg(F.max("g").alias("g"))
    )
    it = ig.select("d", _t12("d", "g").alias("t12"))
    da = dt.agg(
        F.sum(F.when(F.col("r") <= 10, F.col("t12")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dcg10"),
        F.sum("t12").cast("long").alias("dcg20"),
    )
    ia = it.agg(
        F.sum(F.when(F.col("d") <= 10, F.col("t12")).otherwise(F.lit(0)))
        .cast("long")
        .alias("idcg10"),
        F.sum("t12").cast("long").alias("idcg20"),
    )
    r = da.crossJoin(F.broadcast(ia))
    return r.select(
        F.round(F.col("dcg10") / F.lit(1000000000000.0), 6).alias("dcg_at_10"),
        F.round(F.col("dcg20") / F.lit(1000000000000.0), 6).alias("dcg_at_20"),
        F.round(F.col("dcg10").cast("double") / F.col("idcg10"), 6).alias("ndcg_at_10"),
        F.round(F.col("dcg20").cast("double") / F.col("idcg20"), 6).alias("ndcg_at_20"),
    )


CATALOG["doc_ranker_ndcg_at_k"].fn = _dndcg


register(
    "doc_ranker_err_pow2",
    # Expected reciprocal rank with the power-of-two gain mapping
    # R_r = 1 - 2^-g (g = 0 -> stop prob 0, 1 -> 1/2, 2 -> 3/4, ...).
    # The cascade continuation product PROD(1 - R_i) collapses to
    # 2^-(sum of prior gains) — an exact shifted integer, no pow() and
    # no product aggregate.  Per-rank term (1/r)*R_r*cont quantizes to
    # picounits before the sum.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_RANKED_GAIN_SQL},
    casc AS (
      SELECT r, g,
             CAST(COALESCE(SUM(g) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cumg
      FROM rg
    ),
    terms AS (
      SELECT CAST(floor(round(
               (CAST((1::BIGINT << g) - 1 AS DOUBLE) / (1::BIGINT << g))
               * (1.0 / (1::BIGINT << cumg)) / r, 12)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM casc
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           round(CAST(SUM(t12) AS BIGINT) / 1000000000000.0, 6) AS err_at_20
    FROM terms
    """,
)


def _derr(spark, sf_dir):
    """ERR@20 with dyadic stopping probabilities."""
    rg, _ = _ranked_gain_frames(spark, sf_dir)
    wprev = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, -1)
    casc = rg.select(
        "r",
        "g",
        F.coalesce(F.sum("g").over(wprev), F.lit(0)).cast("long").alias("cumg"),
    )
    pow2g = F.expr("shiftleft(1L, CAST(g AS INT))")
    pow2cum = F.expr("shiftleft(1L, CAST(cumg AS INT))")
    terms = casc.select(
        F.floor(
            F.round(
                ((pow2g - 1).cast("double") / pow2g)
                * (F.lit(1.0) / pow2cum)
                / F.col("r"),
                12,
            )
            * F.lit(1000000000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t12")
    )
    return terms.agg(
        F.count("*").cast("long").alias("k"),
        F.round(F.sum("t12").cast("long") / F.lit(1000000000000.0), 6).alias(
            "err_at_20"
        ),
    )


CATALOG["doc_ranker_err_pow2"].fn = _derr


register(
    "doc_ranker_rbo_bm25_ql",
    # Rank-biased overlap (p = 0.9) between the BM25 and QL top-20
    # lists: X_d = |S_a[1..d] n S_b[1..d]| comes from the cumulative
    # histogram of max(rank_a, rank_b) over the common docs — never a
    # depth x depth join; the p^d weights are pre-quantized constants.
    # Reports the truncated prefix sum and Webber's RBO_ext.
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
    com AS (
      SELECT GREATEST(ra.r, rb.r) AS m
      FROM ra JOIN rb USING (doc_id)
    ),
    hist AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM com GROUP BY m),
    ds AS (SELECT CAST(d AS BIGINT) AS d FROM range(1, 21) t(d)),
    xd AS (
      SELECT ds.d,
             CAST(COALESCE(SUM(hist.cnt) OVER (ORDER BY ds.d), 0) AS BIGINT) AS x
      FROM ds LEFT JOIN hist ON hist.m = ds.d
    ),
    pw(d, c) AS (VALUES {", ".join(f"({d}, {_RBO_POWS[d]!r})" for d in range(1, 21))}),
    terms AS (
      SELECT xd.d, xd.x,
             CAST(floor(round((CAST(xd.x AS DOUBLE) / xd.d) * pw.c, 12)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM xd JOIN pw ON pw.d = xd.d
    )
    SELECT MAX(CASE WHEN d = 20 THEN x END) AS overlap_at_20,
           round(MAX(CASE WHEN d = 20 THEN x END) / 20.0, 6) AS agreement_at_20,
           round((1 - {_RBO_P!r}) / {_RBO_P!r}
                 * (CAST(SUM(t12) AS BIGINT) / 1000000000000.0), 6) AS rbo_prefix,
           round((1 - {_RBO_P!r}) / {_RBO_P!r}
                 * (CAST(SUM(t12) AS BIGINT) / 1000000000000.0)
                 + MAX(CASE WHEN d = 20 THEN x END) / 20.0
                   * {_RBO_POWS[20]!r}, 6) AS rbo_ext
    FROM terms
    """,
)


def _drbo(spark, sf_dir):
    """RBO via the cumulative overlap histogram + constant p-powers."""
    wide = _retrieval_wide(spark, sf_dir)
    ra = _ranked_top(_bm25_score_frame(wide), "b6", 20).select(
        "doc_id", F.col("r").alias("ra")
    )
    rb = _ranked_top(_ql_score_frame(wide), "q6", 20).select(
        "doc_id", F.col("r").alias("rb")
    )
    com = ra.join(rb, "doc_id").select(
        F.greatest(F.col("ra"), F.col("rb")).alias("m")
    )
    hist = com.groupBy("m").agg(F.count("*").cast("long").alias("cnt"))
    ds = spark.range(1, 21).select(F.col("id").alias("d"))
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    xd = (
        ds.join(F.broadcast(hist), F.col("m") == F.col("d"), "left")
        .select("d", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .select("d", F.sum("cnt").over(wd).cast("long").alias("x"))
    )
    pw = spark.createDataFrame(
        [(d, _RBO_POWS[d]) for d in range(1, 21)], "d long, c double"
    )
    terms = xd.join(F.broadcast(pw), "d").select(
        "d",
        "x",
        F.floor(
            F.round((F.col("x").cast("double") / F.col("d")) * F.col("c"), 12)
            * F.lit(1000000000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t12"),
    )
    x20 = F.max(F.when(F.col("d") == 20, F.col("x")))
    prefix = (F.lit(1) - F.lit(_RBO_P)) / F.lit(_RBO_P) * (
        F.sum("t12").cast("long") / F.lit(1000000000000.0)
    )
    return terms.agg(
        x20.alias("overlap_at_20"),
        F.round(x20 / F.lit(20.0), 6).alias("agreement_at_20"),
        F.round(prefix, 6).alias("rbo_prefix"),
        F.round(prefix + x20 / F.lit(20.0) * F.lit(_RBO_POWS[20]), 6).alias("rbo_ext"),
    )


CATALOG["doc_ranker_rbo_bm25_ql"].fn = _drbo


register(
    "doc_ranker_map_at_20",
    # Truncated average precision of the weak-ranker top-20 against the
    # boolean-AND relevance set: AP@20 = sum_r rel_r * P@r /
    # min(|rel|, 20).  Cumulative hit counts are exact integers; each
    # rel-weighted precision quantizes to picounits before the sum.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    rel AS MATERIALIZED (
      SELECT doc_id FROM qtf GROUP BY doc_id HAVING COUNT(*) = {len(_BM25_TERMS)}
    ),
    nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_relevant FROM rel),
    ranked AS (
      SELECT b.doc_id, ROW_NUMBER() OVER (ORDER BY b.tf DESC, b.doc_id) AS r,
             CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS flag
      FROM (SELECT doc_id, tf FROM qtf WHERE tok = {_BM25_TERMS[0]!r}
            ORDER BY tf DESC, doc_id LIMIT 20) b
      LEFT JOIN rel ON rel.doc_id = b.doc_id
    ),
    cum AS (
      SELECT r, flag,
             CAST(SUM(flag) OVER (ORDER BY r) AS BIGINT) AS hits
      FROM ranked
    ),
    terms AS (
      SELECT hits, flag,
             CAST(floor(round(flag * (CAST(hits AS DOUBLE) / r), 12)
               * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM cum
    )
    SELECT (SELECT n_relevant FROM nrel) AS n_relevant,
           MAX(hits) AS hits_at_20,
           round(CAST(SUM(t12) AS BIGINT) / 1000000000000.0
                 / LEAST((SELECT n_relevant FROM nrel), 20), 6) AS map_at_20
    FROM terms
    """,
)


def _dmap(spark, sf_dir):
    """MAP@20 off the shared ranked+flag frame."""
    wide = _retrieval_wide(spark, sf_dir)
    rel = _rel_from_wide(wide)
    nrel = rel.agg(F.count("*").cast("long").alias("n_relevant"))
    weak = (
        wide.filter(F.col("__tf0") > 0)
        .select("doc_id", F.col("__tf0").alias("tf"))
    )
    ranked = (
        _ranked_top(weak, "tf", 20)
        .join(rel, "doc_id", "left")
        .select("r", F.coalesce(F.col("flag"), F.lit(0)).alias("flag"))
    )
    wc = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = ranked.select(
        "r", "flag", F.sum("flag").over(wc).cast("long").alias("hits")
    )
    terms = cum.select(
        "hits",
        F.floor(
            F.round(F.col("flag") * (F.col("hits").cast("double") / F.col("r")), 12)
            * F.lit(1000000000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("t12"),
    )
    agg = terms.agg(
        F.max("hits").alias("hits_at_20"), F.sum("t12").cast("long").alias("s12")
    )
    return agg.crossJoin(F.broadcast(nrel)).select(
        "n_relevant",
        "hits_at_20",
        F.round(
            F.col("s12")
            / F.lit(1000000000000.0)
            / F.least(F.col("n_relevant"), F.lit(20)),
            6,
        ).alias("map_at_20"),
    )


CATALOG["doc_ranker_map_at_20"].fn = _dmap


register(
    "doc_ranker_rprec_sweep",
    # Precision@{1,5,10,20} and R-precision (hits among the top
    # min(|rel|, 20), normalized by the same cutoff) for the weak
    # single-term ranking vs the boolean-AND relevance set — pure integer counting
    # and one IEEE division per metric.
    oracle=f"""
    WITH {_TOK_SQL_CTES},
    {_BM25_SQL_CHAIN},
    rel AS MATERIALIZED (
      SELECT doc_id FROM qtf GROUP BY doc_id HAVING COUNT(*) = {len(_BM25_TERMS)}
    ),
    nrel AS (SELECT CAST(LEAST(COUNT(*), 20) AS BIGINT) AS rr FROM rel),
    ranked AS (
      SELECT b.doc_id, ROW_NUMBER() OVER (ORDER BY b.tf DESC, b.doc_id) AS r,
             CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS flag
      FROM (SELECT doc_id, tf FROM qtf WHERE tok = {_BM25_TERMS[0]!r}
            ORDER BY tf DESC, doc_id LIMIT 20) b
      LEFT JOIN rel ON rel.doc_id = b.doc_id
    ),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN r <= 1 THEN flag ELSE 0 END) AS BIGINT) AS h1,
        CAST(SUM(CASE WHEN r <= 5 THEN flag ELSE 0 END) AS BIGINT) AS h5,
        CAST(SUM(CASE WHEN r <= 10 THEN flag ELSE 0 END) AS BIGINT) AS h10,
        CAST(SUM(flag) AS BIGINT) AS h20,
        CAST(SUM(CASE WHEN r <= (SELECT rr FROM nrel) THEN flag ELSE 0 END)
          AS BIGINT) AS hr
      FROM ranked
    )
    SELECT (SELECT rr FROM nrel) AS r_cutoff,
           round(h1 / 1.0, 6) AS p_at_1,
           round(h5 / 5.0, 6) AS p_at_5,
           round(h10 / 10.0, 6) AS p_at_10,
           round(h20 / 20.0, 6) AS p_at_20,
           round(CAST(hr AS DOUBLE) / (SELECT rr FROM nrel), 6) AS r_precision
    FROM agg
    """,
)


def _drprec(spark, sf_dir):
    """P@k sweep + R-precision — one 20-row aggregate."""
    wide = _retrieval_wide(spark, sf_dir)
    rel = _rel_from_wide(wide)
    nrel = rel.agg(F.least(F.count("*"), F.lit(20)).cast("long").alias("rr"))
    weak = (
        wide.filter(F.col("__tf0") > 0)
        .select("doc_id", F.col("__tf0").alias("tf"))
    )
    ranked = (
        _ranked_top(weak, "tf", 20)
        .join(rel, "doc_id", "left")
        .select("r", F.coalesce(F.col("flag"), F.lit(0)).alias("flag"))
        .crossJoin(F.broadcast(nrel))
    )
    agg = ranked.agg(
        F.max("rr").alias("rr"),
        F.sum(F.when(F.col("r") <= 1, F.col("flag")).otherwise(0))
        .cast("long")
        .alias("h1"),
        F.sum(F.when(F.col("r") <= 5, F.col("flag")).otherwise(0))
        .cast("long")
        .alias("h5"),
        F.sum(F.when(F.col("r") <= 10, F.col("flag")).otherwise(0))
        .cast("long")
        .alias("h10"),
        F.sum("flag").cast("long").alias("h20"),
        F.sum(F.when(F.col("r") <= F.col("rr"), F.col("flag")).otherwise(0))
        .cast("long")
        .alias("hr"),
    )
    return agg.select(
        F.col("rr").alias("r_cutoff"),
        F.round(F.col("h1") / F.lit(1.0), 6).alias("p_at_1"),
        F.round(F.col("h5") / F.lit(5.0), 6).alias("p_at_5"),
        F.round(F.col("h10") / F.lit(10.0), 6).alias("p_at_10"),
        F.round(F.col("h20") / F.lit(20.0), 6).alias("p_at_20"),
        F.round(F.col("hr").cast("double") / F.col("rr"), 6).alias("r_precision"),
    )


CATALOG["doc_ranker_rprec_sweep"].fn = _drprec
