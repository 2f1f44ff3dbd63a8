"""Split from queries.py lines 25859-26520 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, Window, register, similarity, t, tok_arr
from .q09_llm_dedup_text_sim import _EMB_BAND_SQL, _EN_NORM_SQL, _HASH01_SQL, _cos6_sql

# ===========================================================================
# round-10 wave 7: Wilcoxon signed-rank, lognormal moment fit, MI
# between a dimension and name tokens, LM interpolation grid, TwoNN
# intrinsic dimension, cosine components.
# ===========================================================================

register(
    "ml_wilcoxon_signed_rank_monthly",
    # the paired nonparametric test the Mann-Whitney can't do: Wilcoxon
    # signed-rank on the monthly (returned - delivered) mean-quantity
    # differences. Differences snap to 6dp (exact means of integer
    # quantities), zero differences drop per the standard procedure,
    # |d| ranks are doubled average ranks over the ~80-month frame, and
    # the tie-corrected variance divides exact integers.
    oracle="""
    WITH m AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS blk,
             round(CAST(SUM(CASE WHEN l_returnflag = 'R'
                                 THEN CAST(l_quantity AS BIGINT) END) AS DOUBLE)
                   / NULLIF(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END), 0), 6)
                 AS mr,
             round(CAST(SUM(CASE WHEN l_returnflag = 'N'
                                 THEN CAST(l_quantity AS BIGINT) END) AS DOUBLE)
                   / NULLIF(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END), 0), 6)
                 AS mn
      FROM lineitem GROUP BY 1
    ),
    d AS (
      SELECT CAST(floor(round(mr - mn, 6) * 1000000 + 0.5) AS BIGINT) AS d6
      FROM m WHERE mr IS NOT NULL AND mn IS NOT NULL
    ),
    nz AS MATERIALIZED (SELECT d6, abs(d6) AS a6 FROM d WHERE d6 <> 0),
    rk AS (
      SELECT d6,
             2 * RANK() OVER (ORDER BY a6)
               + COUNT(*) OVER (PARTITION BY a6) - 1 AS r2
      FROM nz
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d6 > 0 THEN r2 ELSE 0 END) AS BIGINT) AS w2p
      FROM rk
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0) AS BIGINT)
                 AS tsum
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM nz GROUP BY a6
            HAVING COUNT(*) > 1)
    )
    SELECT agg.n AS n_pairs,
           agg.w2p / 2.0 AS w_plus,
           round(CAST(agg.n AS DOUBLE) * (agg.n + 1) * (2 * agg.n + 1) / 24.0
                 - ties.tsum / 48.0, 6) AS var_w,
           round((agg.w2p / 2.0 - CAST(agg.n AS DOUBLE) * (agg.n + 1) / 4.0)
                 / sqrt(CAST(agg.n AS DOUBLE) * (agg.n + 1) * (2 * agg.n + 1) / 24.0
                        - ties.tsum / 48.0), 6) AS z
    FROM agg CROSS JOIN ties
    """,
)


def _dwilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank: the corpus reduces to one per-month
    conditional aggregate, the rank machinery runs entirely on the
    ~80-row difference frame, and W+, the tie correction and z close
    in two tiny aggregates — the paired-design test at GROUP BY
    cost."""
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("blk")).agg(
        F.round(
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_quantity").cast("long"))
            ).cast("double")
            / F.nullif(
                F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)), F.lit(0)
            ),
            6,
        ).alias("mr"),
        F.round(
            F.sum(
                F.when(F.col("l_returnflag") == "N", F.col("l_quantity").cast("long"))
            ).cast("double")
            / F.nullif(
                F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)), F.lit(0)
            ),
            6,
        ).alias("mn"),
    )
    d = (
        m.filter(F.col("mr").isNotNull() & F.col("mn").isNotNull())
        .select(
            F.floor(F.round(F.col("mr") - F.col("mn"), 6) * 1e6 + 0.5)
            .cast("long")
            .alias("d6")
        )
    )
    nz = d.filter(F.col("d6") != 0).select(
        "d6", F.abs(F.col("d6")).alias("a6")
    ).localCheckpoint(eager=False)
    rk = nz.select(
        "d6",
        (
            2 * F.rank().over(Window.orderBy("a6"))
            + F.count("*").over(Window.partitionBy("a6"))
            - 1
        ).alias("r2"),
    )
    agg = rk.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("d6") > 0, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("w2p"),
    )
    t3 = F.col("t").cast("decimal(12,0)")
    ties = (
        nz.groupBy("a6")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(F.sum(t3 * t3 * t3 - F.col("t")), F.lit(0))
            .cast("long")
            .alias("tsum")
        )
    )
    nn = F.col("n")
    var_w = nn.cast("double") * (nn + 1) * (2 * nn + 1) / 24.0 - F.col("tsum") / 48.0
    return agg.crossJoin(F.broadcast(ties)).select(
        nn.alias("n_pairs"),
        (F.col("w2p") / 2.0).alias("w_plus"),
        F.round(var_w, 6).alias("var_w"),
        F.round(
            (F.col("w2p") / 2.0 - nn.cast("double") * (nn + 1) / 4.0)
            / F.sqrt(var_w),
            6,
        ).alias("z"),
    )


CATALOG["ml_wilcoxon_signed_rank_monthly"].fn = _dwilcoxon

register(
    "doc_length_lognormal_moments",
    # document-length distribution fit: lengths are classically
    # lognormal, so fit by the method of moments IN LOG SPACE —
    # per-doc ln(n_chars) rounds to micro-nats, all three moment sums
    # are exact wide integers, and mu/sigma/skewness close in one
    # shared-order expression. |skew_log| near 0 = the lognormal
    # assumption holds; large = mixture (multiple length regimes).
    oracle="""
    WITH x AS (
      SELECT CAST(round(round(ln(CAST(n_chars AS DOUBLE)), 6) * 1000000)
                  AS BIGINT) AS l6
      FROM documents WHERE n_chars >= 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l6) AS BIGINT) AS s1,
             CAST(SUM(CAST(l6 AS HUGEINT) * l6) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l6 AS HUGEINT) * l6 * l6) AS DOUBLE) AS s3
      FROM x
    )
    SELECT n AS n_docs,
           round(CAST(s1 AS DOUBLE) / n / 1000000.0, 6) AS mu_log,
           round(sqrt((s2 / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                      * (CAST(n AS DOUBLE) / (n - 1))) / 1000000.0, 6) AS sigma_log,
           round((s3 / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (s2 / n)
                  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                 / POWER(s2 / n - (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n), 1.5), 6) AS skew_log
    FROM agg
    """,
)


def _dlognormal(spark, sf_dir):
    """Lognormal length fit: ONE aggregate over per-row micro-nat
    logs carries all three moments (no second pass, no sort) — the
    distributional sanity check run before any length-based quality
    threshold is chosen."""
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 1)
    l6 = (
        F.round(F.round(F.log(F.col("n_chars").cast("double")), 6) * 1e6)
        .cast("long")
        .alias("l6")
    )
    x = d.select(l6)
    ld = F.col("l6").cast("decimal(12,0)")
    agg = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("l6").cast("long").alias("s1"),
        F.sum(ld * ld).cast("double").alias("s2"),
        F.sum(ld * ld * ld).cast("double").alias("s3"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3.0 * mean * (F.col("s2") / n) + 2.0 * mean * mean * mean
    return agg.select(
        n.alias("n_docs"),
        F.round(mean / 1e6, 6).alias("mu_log"),
        F.round(F.sqrt(m2 * (n.cast("double") / (n - 1))) / 1e6, 6).alias(
            "sigma_log"
        ),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skew_log"),
    )


CATALOG["doc_length_lognormal_moments"].fn = _dlognormal

register(
    "part_name_brand_mi",
    # does the brand determine the vocabulary of part names? Mutual
    # information between p_brand and name tokens: each (brand, token)
    # cell's ln(c*N/(rb*ct)) takes a ratio of exact wide integers, the
    # cell term (c/N)*ln(...) quantizes to picounits before the
    # cells-sized sum, and the brand-marginal entropy comes from the
    # same recipe so the normalized MI is a ratio of two exact
    # micro-sums.
    oracle="""
    WITH tk AS (
      SELECT p_brand AS brand,
             unnest(list_filter(regexp_split_to_array(lower(trim(p_name)), '\\s+'),
                                x -> x <> '')) AS tok
      FROM part
    ),
    cells AS MATERIALIZED (
      SELECT brand, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2
    ),
    rb AS (SELECT brand, CAST(SUM(c) AS BIGINT) AS nb FROM cells GROUP BY 1),
    ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS nt FROM cells GROUP BY 1),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(CAST(floor(round((CAST(cells.c AS DOUBLE) / nn.n)
               * round(ln(CAST(CAST(cells.c AS HUGEINT) * nn.n AS DOUBLE)
                          / (CAST(rb.nb AS HUGEINT) * ct.nt)), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi12
      FROM cells
      JOIN rb USING (brand) JOIN ct USING (tok) CROSS JOIN nn
    ),
    hb AS (
      SELECT CAST(SUM(CAST(floor(round((CAST(rb.nb AS DOUBLE) / nn.n)
               * round(ln(CAST(nn.n AS DOUBLE) / rb.nb), 6),
               12) * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS h12
      FROM rb CROSS JOIN nn
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rb) AS n_brands,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_tokens,
           mi.n_cells,
           round(mi.mi12 / 1000000000000.0, 6) AS mi_nats,
           round(hb.h12 / 1000000000000.0, 6) AS h_brand,
           round(CAST(mi.mi12 AS DOUBLE) / hb.h12, 6) AS mi_over_h_brand
    FROM mi CROSS JOIN hb
    """,
)


def _dbrandmi(spark, sf_dir):
    """Brand-token mutual information: one token-count pass, marginals
    from the cells frame, picounit term sums — the feature-leakage /
    naming-consistency audit for any (dimension, text) pair, at
    GROUP BY cost."""
    p = t(spark, sf_dir, "part")
    tk = p.select(
        F.col("p_brand").alias("brand"),
        F.explode(tok_arr(F.col("p_name"))).alias("tok"),
    )
    cells = (
        tk.groupBy("brand", "tok")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    rb = cells.groupBy("brand").agg(F.sum("c").cast("long").alias("nb")).localCheckpoint(
        eager=False
    )
    ct = cells.groupBy("tok").agg(F.sum("c").cast("long").alias("nt")).localCheckpoint(
        eager=False
    )
    nn = cells.agg(F.sum("c").cast("long").alias("n"))
    num = (F.col("c").cast("decimal(19,0)") * F.col("n")).cast("double")
    den = (F.col("nb").cast("decimal(19,0)") * F.col("nt")).cast("double")
    term = F.floor(
        F.round(
            (F.col("c").cast("double") / F.col("n")) * F.round(F.log(num / den), 6),
            12,
        )
        * 1e12
        + 0.5
    ).cast("long")
    mi = (
        cells.join(F.broadcast(rb), "brand")
        .join(ct, "tok")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(term).cast("long").alias("mi12"),
        )
    )
    hterm = F.floor(
        F.round(
            (F.col("nb").cast("double") / F.col("n"))
            * F.round(F.log(F.col("n").cast("double") / F.col("nb")), 6),
            12,
        )
        * 1e12
        + 0.5
    ).cast("long")
    hb = rb.crossJoin(F.broadcast(nn)).agg(F.sum(hterm).cast("long").alias("h12"))
    nb_cnt = rb.agg(F.count("*").cast("long").alias("n_brands"))
    nt_cnt = ct.agg(F.count("*").cast("long").alias("n_tokens"))
    return (
        nb_cnt.crossJoin(F.broadcast(nt_cnt))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hb))
        .select(
            "n_brands",
            "n_tokens",
            "n_cells",
            F.round(F.col("mi12") / 1e12, 6).alias("mi_nats"),
            F.round(F.col("h12") / 1e12, 6).alias("h_brand"),
            F.round(F.col("mi12").cast("double") / F.col("h12"), 6).alias(
                "mi_over_h_brand"
            ),
        )
    )


CATALOG["part_name_brand_mi"].fn = _dbrandmi

register(
    "doc_lm_interpolation_grid",
    # source-mix optimization by held-out perplexity: interpolate the
    # Laplace-smoothed unigram LMs of the two largest sources at
    # eleven mixture weights and score source A's held-out docs. Each
    # pA/pB is a ratio of exact integers, the mixture is one shared-
    # order double expression, ln rounds to 6dp, per-token terms
    # quantize to picounits — so the whole 11-point NLL curve and its
    # argmin flag are engine-exact. The DSIR-adjacent 'how much of B
    # helps A' knob, answered with counts.
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source,
             {_HASH01_SQL.format(key="doc_id || 'lmmix'")} AS u,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                x -> x <> '')) AS tk
      FROM documents
    ),
    srcs AS (
      -- filter on rnk, never LIMIT without ORDER BY: post-window row
      -- order is not contractually guaranteed (review finding)
      SELECT source, rnk FROM (
        SELECT source, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS rnk
        FROM tok GROUP BY source
      ) WHERE rnk <= 2
    ),
    sa AS (SELECT source FROM srcs WHERE rnk = 1),
    sb AS (SELECT source FROM srcs WHERE rnk = 2),
    train_a AS MATERIALIZED (
      SELECT tk FROM tok JOIN sa USING (source) WHERE u < 0.8
    ),
    held AS MATERIALIZED (
      SELECT tk FROM tok JOIN sa USING (source) WHERE u >= 0.8
    ),
    train_b AS MATERIALIZED (SELECT tk FROM tok JOIN sb USING (source)),
    ca AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM train_a GROUP BY tk),
    cb AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM train_b GROUP BY tk),
    na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train_a),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train_b),
    v AS (
      SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
      FROM (SELECT tk FROM train_a UNION ALL SELECT tk FROM train_b)
    ),
    grid AS (SELECT unnest(generate_series(0, 10)) AS k),
    terms AS (
      SELECT g.k,
             CAST(floor(round(round(ln((g.k / 10.0)
                 * ((COALESCE(ca.c, 0) + 1.0) / (na.n + v.v))
                 + (1.0 - g.k / 10.0)
                 * ((COALESCE(cb.c, 0) + 1.0) / (nb.n + v.v))), 6),
               12) * 1000000000000 + 0.5) AS BIGINT) AS t12
      FROM held h
      CROSS JOIN grid g
      LEFT JOIN ca ON ca.tk = h.tk
      LEFT JOIN cb ON cb.tk = h.tk
      CROSS JOIN na CROSS JOIN nb CROSS JOIN v
    ),
    nll AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(-SUM(t12) AS BIGINT) AS nll12
      FROM terms GROUP BY k
    )
    SELECT round(k / 10.0, 1) AS mix_w, n_tokens,
           round(nll12 / 1000000000000.0, 6) AS total_nll,
           nll12 = MIN(nll12) OVER () AS is_best
    FROM nll ORDER BY mix_w
    """,
)


def _dlmmixgrid(spark, sf_dir):
    """LM interpolation grid: the two LMs are token-count frames, the
    held-out explode joins them once, and the 11-weight grid rides a
    tiny crossJoin so all eleven NLLs come out of ONE aggregate — the
    mixture sweep costs one corpus pass, not eleven."""
    from ..ops.sampling import hash_uniform01

    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        hash_uniform01(F.concat(F.col("doc_id").cast("string"), F.lit("lmmix"))).alias(
            "u"
        ),
        F.explode(tok_arr(F.col("text"))).alias("tk"),
    ).localCheckpoint(eager=False)
    srcs = (
        tok.groupBy("source")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.desc("__c"), "source")
        .limit(2)
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy(F.desc("__c"), "source"))
            .alias("rnk"),
        )
        .localCheckpoint(eager=False)
    )
    sa = srcs.filter(F.col("rnk") == 1).select("source")
    sb = srcs.filter(F.col("rnk") == 2).select("source")
    train_a = tok.join(F.broadcast(sa), "source").filter(F.col("u") < 0.8).select(
        "tk"
    ).localCheckpoint(eager=False)
    held = tok.join(F.broadcast(sa), "source").filter(F.col("u") >= 0.8).select("tk")
    train_b = tok.join(F.broadcast(sb), "source").select("tk").localCheckpoint(
        eager=False
    )
    ca = train_a.groupBy("tk").agg(F.count("*").cast("long").alias("ca"))
    cb = train_b.groupBy("tk").agg(F.count("*").cast("long").alias("cb"))
    na = train_a.agg(F.count("*").cast("long").alias("na"))
    nb = train_b.agg(F.count("*").cast("long").alias("nb"))
    v = (
        train_a.unionByName(train_b)
        .agg(F.countDistinct("tk").cast("long").alias("v"))
    )
    grid = spark.range(0, 11).select(F.col("id").cast("int").alias("k"))
    mix = (F.col("k") / 10.0) * (
        (F.coalesce(F.col("ca"), F.lit(0)) + 1.0) / (F.col("na") + F.col("v"))
    ) + (1.0 - F.col("k") / 10.0) * (
        (F.coalesce(F.col("cb"), F.lit(0)) + 1.0) / (F.col("nb") + F.col("v"))
    )
    t12 = F.floor(F.round(F.round(F.log(mix), 6), 12) * 1e12 + 0.5).cast("long")
    terms = (
        held.crossJoin(F.broadcast(grid))
        .join(ca, "tk", "left")
        .join(cb, "tk", "left")
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(v))
        .select("k", t12.alias("t12"))
    )
    nll = terms.groupBy("k").agg(
        F.count("*").cast("long").alias("n_tokens"),
        (-F.sum("t12")).cast("long").alias("nll12"),
    )
    return nll.select(
        F.round(F.col("k") / 10.0, 1).alias("mix_w"),
        "n_tokens",
        F.round(F.col("nll12") / 1e12, 6).alias("total_nll"),
        (F.col("nll12") == F.min("nll12").over(Window.partitionBy())).alias(
            "is_best"
        ),
    ).orderBy("mix_w")


CATALOG["doc_lm_interpolation_grid"].fn = _dlmmixgrid

register(
    "emb_twonn_intrinsic_dim",
    # how many dimensions do the embeddings REALLY use? The TwoNN
    # intrinsic-dimension estimator (Facco et al.): per vector, the
    # ratio mu = d2/d1 of its two nearest cosine distances among the
    # banded-LSH candidates; ID = n / sum(ln mu). Distances derive from
    # 6dp-rounded cosines, ln terms round to 6dp micro-nats, vectors
    # with a zero first distance (exact duplicates) or fewer than two
    # candidate neighbors drop out per the estimator's definition.
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
      SELECT id_b, id_a, cosine_sim FROM und
    ),
    r AS (
      SELECT left_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY left_id
                                ORDER BY cosine_sim DESC, right_id) AS rn
      FROM o
    ),
    nn2 AS (
      SELECT left_id,
             round(1.0 - MAX(CASE WHEN rn = 1 THEN cosine_sim END), 6) AS d1,
             round(1.0 - MAX(CASE WHEN rn = 2 THEN cosine_sim END), 6) AS d2
      FROM r WHERE rn <= 2 GROUP BY left_id HAVING COUNT(*) = 2
    ),
    mu AS (
      SELECT CAST(round(round(ln(d2 / d1), 6) * 1000000) AS BIGINT) AS m6
      FROM nn2 WHERE d1 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors_used,
           round(CAST(SUM(m6) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS mean_ln_mu,
           round(CAST(COUNT(*) AS DOUBLE)
                 / (CAST(SUM(m6) AS DOUBLE) / 1000000.0), 6) AS twonn_id
    FROM mu
    """,
)


def _dtwonn(spark, sf_dir):
    """TwoNN intrinsic dimension over the banded-LSH candidate graph:
    the two nearest distances come from one partitioned rank over the
    candidate pairs (never a full pairwise pass), the estimator is one
    micro-nat sum — the dimensionality audit run before choosing IVF
    cell counts or PQ codebook sizes."""
    e = t(spark, sf_dir, "embeddings")
    und = similarity.embedding_dup_pairs(e, threshold=-1.0, bits=6, bands=3).select(
        "id_a", "id_b", "cosine_sim"
    )
    o = und.select(
        F.col("id_a").alias("left_id"), F.col("id_b").alias("right_id"), "cosine_sim"
    ).unionByName(
        und.select(
            F.col("id_b").alias("left_id"),
            F.col("id_a").alias("right_id"),
            "cosine_sim",
        )
    )
    r = o.select(
        "left_id",
        "cosine_sim",
        F.row_number()
        .over(
            Window.partitionBy("left_id").orderBy(F.desc("cosine_sim"), "right_id")
        )
        .alias("rn"),
    ).filter(F.col("rn") <= 2)
    nn2 = (
        r.groupBy("left_id")
        .agg(
            F.round(
                1.0 - F.max(F.when(F.col("rn") == 1, F.col("cosine_sim"))), 6
            ).alias("d1"),
            F.round(
                1.0 - F.max(F.when(F.col("rn") == 2, F.col("cosine_sim"))), 6
            ).alias("d2"),
            F.count("*").alias("__c"),
        )
        .filter(F.col("__c") == 2)
    )
    mu = nn2.filter(F.col("d1") > 0).select(
        F.round(F.round(F.log(F.col("d2") / F.col("d1")), 6) * 1e6)
        .cast("long")
        .alias("m6")
    )
    return mu.agg(
        F.count("*").cast("long").alias("n_vectors_used"),
        F.round(F.sum("m6").cast("double") / F.count("*") / 1e6, 6).alias(
            "mean_ln_mu"
        ),
        F.round(
            F.count("*").cast("double") / (F.sum("m6").cast("double") / 1e6), 6
        ).alias("twonn_id"),
    )


CATALOG["emb_twonn_intrinsic_dim"].fn = _dtwonn

register(
    "emb_cosine_components",
    # connected components of the embedding-similarity graph (cosine
    # >= 0.35 over the banded-LSH verified pairs): the semantic
    # equivalent of near-dup clustering, checked exactly against
    # DuckDB's recursive-CTE min-label closure of the same edges —
    # the distributed pointer-jumping CC op against a from-first-
    # principles transitive closure.
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    und AS (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
      WHERE {_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')} >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM und
      UNION ALL SELECT id_b, id_a FROM und
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.id
    ),
    lab AS (SELECT id, MIN(lab) AS cluster FROM walk GROUP BY id)
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM lab GROUP BY cluster
    ORDER BY n_members DESC, cluster
    LIMIT 20
    """,
)


def _dembcc(spark, sf_dir):
    """Cosine-similarity components: the verified pair set feeds the
    engine's pointer-jumping connected_components (O(log diameter)
    rounds), rolled up to cluster sizes — semantic grouping at LSH
    cost with a provably-exact closure."""
    from ..ops import graph

    e = t(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_dup_pairs(e, threshold=0.35, bits=6, bands=3)
    # max_iter=40: the duplicate-heavy 10x probe corpus (10 shards of
    # identical vectors -> ~230x the edges, long thin cross-shard
    # chains) empirically needs 23 propagate+jump rounds — the same
    # adversarial class as the decon/triangle probes. Labels are
    # monotone decreasing so convergence is guaranteed; extra rounds
    # past the fixpoint never execute, so headroom is free.
    cc = graph.connected_components(pairs.select("id_a", "id_b"), max_iter=40)
    return (
        cc.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "cluster")
        .limit(20)
    )


CATALOG["emb_cosine_components"].fn = _dembcc


