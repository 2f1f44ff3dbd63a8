"""Split from queries.py lines 33426-33939 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, dedup, register, t, tok_arr
from .q09_llm_dedup_text_sim import (
    _ER_PAIRS_SQL,
    _ER_TWIN_BASE_SQL,
    _HASH01_SQL,
    _twin_base,
    _twin_fuzzy_pairs,
)
from .q45_r11_sketch_composition import _bloom_cell, _bloom_cell_sql

# ===========================================================================
# Round-12 wave 4: sketch sizing / portable-estimator audits and the
# entity-resolution scoring tier. The Bloom sweep and KMV estimator are
# fully deterministic (portable sha2 hashing), so they hash-match their
# oracles with NO gate; the ER scorer composes the shared twin-base
# candidate pairs with Fellegi-Sunter ln(m/u) weights.
# ===========================================================================

register(
    "sketch_bloom_sizing_sweep",
    # the capacity-planning sweep behind sketch_bloom_join_prefilter:
    # the SAME dim keys and probe keys pushed through 3-hash Blooms of
    # 1024 / 4096 / 16384 cells (shared _bloom_cell hashing). For each
    # size: set-cell count, fill ratio, realized non-member FPR, and
    # the expected FPR = fill^3 via explicit multiplication (exp/pow
    # are oracle poison) — how big a filter the 100 TB semi-join
    # actually needs.
    oracle=f"""
    WITH grid AS (SELECT unnest([1024, 4096, 16384]) AS m),
    dim AS MATERIALIZED (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT g.m, {_bloom_cell_sql("d.c_custkey", "bsz", "g.m")} AS cell
      FROM dim d CROSS JOIN grid g
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r
    ),
    nb AS MATERIALIZED (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_set FROM bits GROUP BY m
    ),
    probe AS MATERIALIZED (SELECT DISTINCT o_custkey FROM orders),
    hits AS (
      SELECT g.m, p.o_custkey,
             CAST(SUM(CASE WHEN b.cell IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS nbits
      FROM probe p CROSS JOIN grid g
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r
      LEFT JOIN bits b
        ON b.m = g.m AND b.cell = {_bloom_cell_sql("p.o_custkey", "bsz", "g.m")}
      GROUP BY g.m, p.o_custkey
    ),
    scored AS MATERIALIZED (
      SELECT h.m, (h.nbits = 3) AS candidate, (d.c_custkey IS NOT NULL) AS member
      FROM hits h LEFT JOIN dim d ON d.c_custkey = h.o_custkey
    )
    SELECT CAST(s.m AS BIGINT) AS m_cells, nb.n_set AS n_set_cells,
           round(CAST(nb.n_set AS DOUBLE) / s.m, 6) AS fill_ratio,
           CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(SUM(CASE WHEN candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positives,
           round(CAST(SUM(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END), 0), 6)
               AS fpr_realized,
           round((CAST(nb.n_set AS DOUBLE) / s.m) * (CAST(nb.n_set AS DOUBLE) / s.m)
                 * (CAST(nb.n_set AS DOUBLE) / s.m), 6) AS fpr_expected
    FROM scored s JOIN nb USING (m)
    GROUP BY s.m, nb.n_set ORDER BY s.m
    """,
)


def _dbloomsweep(spark, sf_dir):
    """Bloom sizing sweep: the bit sets for all three sizes are ONE
    bounded DISTINCT aggregate (<= 21504 rows total, broadcastable);
    the probe side tests 9 (size, hash) cells per key in one equi-join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    dim = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .localCheckpoint(eager=False)
    )
    grid = F.explode(F.array(F.lit(1024), F.lit(4096), F.lit(16384))).alias("m")
    rr = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r")
    bits = (
        dim.select("c_custkey", grid)
        .select("c_custkey", "m", rr)
        .select("m", _bloom_cell(F.col("c_custkey"), "bsz", F.col("m")).alias("cell"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nb = bits.groupBy("m").agg(F.count("*").cast("long").alias("n_set"))
    probe = o.select("o_custkey").distinct().localCheckpoint(eager=False)
    hits = (
        probe.select("o_custkey", grid)
        .select("o_custkey", "m", rr)
        .select(
            "o_custkey", "m", _bloom_cell(F.col("o_custkey"), "bsz", F.col("m")).alias("cell")
        )
        .join(F.broadcast(bits.withColumn("__hit", F.lit(1))), ["m", "cell"], "left")
        .groupBy("m", "o_custkey")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("nbits"))
    )
    scored = hits.join(
        dim.withColumn("__m", F.lit(1)), hits.o_custkey == dim.c_custkey, "left"
    ).select(
        "m",
        (F.col("nbits") == 3).alias("candidate"),
        F.col("__m").isNotNull().alias("member"),
    )
    rep = scored.groupBy("m").agg(
        F.count("*").cast("long").alias("n_probe_keys"),
        F.sum(F.when(F.col("candidate"), 1).otherwise(0)).cast("long").alias("n_candidates"),
        F.sum(F.when(F.col("candidate") & ~F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.sum(F.when(~F.col("member"), 1).otherwise(0)).cast("long").alias("__nonmem"),
    )
    fill = F.col("n_set").cast("double") / F.col("m")
    return (
        rep.join(F.broadcast(nb), "m")
        .select(
            F.col("m").cast("long").alias("m_cells"),
            F.col("n_set").alias("n_set_cells"),
            F.round(fill, 6).alias("fill_ratio"),
            "n_probe_keys",
            "n_candidates",
            "n_false_positives",
            F.round(
                F.col("n_false_positives").cast("double") / F.nullif(F.col("__nonmem"), F.lit(0)),
                6,
            ).alias("fpr_realized"),
            F.round(fill * fill * fill, 6).alias("fpr_expected"),
            F.col("m"),
        )
        .orderBy("m")
        .drop("m")
    )


CATALOG["sketch_bloom_sizing_sweep"].fn = _dbloomsweep


register(
    "sketch_kmv_distinct_estimate",
    # the k-minimum-values distinct-count estimator over the portable
    # sha2 uniform draw: est = (k-1)/u_k from the 256 smallest hashes
    # of the distinct order custkeys. Both engines compute the SAME
    # hashes, so estimate and relative error hash-match exactly (no
    # gate), and the mergeability audit — bottom-k of (bottom-k(A) u
    # bottom-k(B)) == bottom-k(A u B) for the even/odd key split —
    # must report 0 differing cells, the property that makes KMV a
    # one-pass combinable aggregate at 100 TB.
    oracle=f"""
    WITH keys AS MATERIALIZED (SELECT DISTINCT o_custkey AS k FROM orders),
    h AS MATERIALIZED (
      SELECT k, {_HASH01_SQL.format(key="CAST(k AS VARCHAR) || 'kmv'")} AS u FROM keys
    ),
    bot AS MATERIALIZED (SELECT u FROM h ORDER BY u LIMIT 256),
    est AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk, MAX(u) AS uk FROM bot),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM keys),
    bota AS (SELECT u FROM h WHERE k % 2 = 0 ORDER BY u LIMIT 256),
    botb AS (SELECT u FROM h WHERE k % 2 = 1 ORDER BY u LIMIT 256),
    merged AS (
      SELECT u FROM (SELECT u FROM bota UNION ALL SELECT u FROM botb)
      ORDER BY u LIMIT 256
    ),
    diff AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_diff FROM (
        (SELECT u FROM merged EXCEPT ALL SELECT u FROM bot)
        UNION ALL
        (SELECT u FROM bot EXCEPT ALL SELECT u FROM merged)
      )
    )
    SELECT ex.n_exact, est.kk AS k,
           round((est.kk - 1) / est.uk, 6) AS kmv_estimate,
           round(abs((est.kk - 1) / est.uk - ex.n_exact) / ex.n_exact, 6) AS rel_err,
           diff.n_diff AS merge_diff_cells
    FROM ex CROSS JOIN est CROSS JOIN diff
    """,
)


def _dkmv(spark, sf_dir):
    """KMV estimator + merge-equivalence audit over the shared
    hash_uniform01 draw; the bottom-k frames are 256-row TakeOrdereds."""
    from ..ops.sampling import hash_uniform01

    o = t(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("k")).distinct().localCheckpoint(eager=False)
    h = keys.select(
        "k", hash_uniform01(F.concat(F.col("k").cast("string"), F.lit("kmv"))).alias("u")
    ).localCheckpoint(eager=False)
    bot = h.select("u").orderBy("u").limit(256).localCheckpoint(eager=False)
    est = bot.agg(F.count("*").cast("long").alias("kk"), F.max("u").alias("uk"))
    ex = keys.agg(F.count("*").cast("long").alias("n_exact"))
    bota = h.filter(F.col("k") % 2 == 0).select("u").orderBy("u").limit(256)
    botb = h.filter(F.col("k") % 2 == 1).select("u").orderBy("u").limit(256)
    merged = bota.unionAll(botb).orderBy("u").limit(256)
    diff = (
        merged.exceptAll(bot)
        .unionAll(bot.exceptAll(merged))
        .agg(F.count("*").cast("long").alias("n_diff"))
    )
    kmv = (F.col("kk") - 1) / F.col("uk")
    return (
        ex.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(diff))
        .select(
            "n_exact",
            F.col("kk").alias("k"),
            F.round(kmv, 6).alias("kmv_estimate"),
            F.round(F.abs(kmv - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
            F.col("n_diff").alias("merge_diff_cells"),
        )
    )


CATALOG["sketch_kmv_distinct_estimate"].fn = _dkmv


register(
    "dedup_edit_distance_audit",
    # character-level near-duplicate audit: blocked Levenshtein over
    # 120-char document prefixes (blocks = (lang, n_chars//100), the
    # dup-cluster blocking), distance <= 12 — the edit-distance
    # complement of the token-set n-gram Jaccard pairs, catching
    # near-dups that token reordering hides from set measures. Both
    # engines ship the same unit-cost levenshtein built-in; the oracle
    # mirrors ops/pairs' hot-block cap member-for-member.
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, lang, n_chars // 100 AS bkt, substr(text, 1, 120) AS pfx
      FROM documents WHERE text IS NOT NULL
    ),
    capped AS (
      SELECT * FROM (
        SELECT doc_id, lang, bkt, pfx,
               ROW_NUMBER() OVER (PARTITION BY lang, bkt ORDER BY doc_id) AS rn
        FROM d
      ) WHERE rn <= {dedup.DEFAULT_MAX_BLOCK}
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.pfx, b.pfx) AS INT) AS distance
      FROM capped a JOIN capped b
        ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
      WHERE levenshtein(a.pfx, b.pfx) <= 12
    )
    SELECT id_a, id_b, distance,
           round(1.0 - distance / 120.0, 6) AS similarity
    FROM pairs ORDER BY id_a, id_b
    """,
)


def _deditdist(spark, sf_dir):
    """Blocked prefix edit-distance pairs via the shared
    fuzzy_string_pairs skeleton (hot-block cap included)."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") / 100).cast("long").alias("bkt"),
            F.substring("text", 1, 120).alias("__pfx"),
        )
    )
    pairs = dedup.fuzzy_string_pairs(d, "doc_id", "__pfx", ["lang", "bkt"], max_distance=12)
    return pairs.select(
        "id_a",
        "id_b",
        F.col("distance").cast("int").alias("distance"),
        F.round(1.0 - F.col("distance") / 120.0, 6).alias("similarity"),
    ).orderBy("id_a", "id_b")


CATALOG["dedup_edit_distance_audit"].fn = _deditdist


register(
    "dedup_prefix_fingerprint_audit",
    # boilerplate / template detection: documents fingerprinted by the
    # sha256 of their first 8 tokens (the shared tokenizer), then the
    # group-size histogram — how much of the corpus opens with an
    # identical 8-token head. One shuffle on a fixed-width 64-char
    # key; all counts exact.
    oracle="""
    WITH d AS (
      SELECT sha256(array_to_string(
               (list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> ''))[1:8], ' ')) AS fp
      FROM documents WHERE text IS NOT NULL
    ),
    g AS MATERIALIZED (
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS sz FROM d GROUP BY fp
    )
    SELECT sz AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM g GROUP BY sz ORDER BY sz
    """,
)


def _dprefixfp(spark, sf_dir):
    """Prefix-fingerprint dup audit: two bounded GROUP BYs."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = F.sha2(F.concat_ws(" ", F.slice(tok_arr(F.col("text")), 1, 8)), 256)
    g = d.select(fp.alias("fp")).groupBy("fp").agg(F.count("*").cast("long").alias("sz"))
    return (
        g.groupBy(F.col("sz").alias("group_size"))
        .agg(
            F.count("*").cast("long").alias("n_groups"),
            F.sum("sz").cast("long").alias("n_docs"),
        )
        .orderBy("group_size")
    )


CATALOG["dedup_prefix_fingerprint_audit"].fn = _dprefixfp


register(
    "er_fellegi_sunter_scores",
    # Fellegi-Sunter probabilistic record-linkage scoring over the
    # shared typo-twin candidate pairs (_ER_TWIN_BASE_SQL /
    # _ER_PAIRS_SQL): three agreement fields (exact name, size,
    # price), m/u probabilities estimated against the PLANTED truth
    # (id_b = id_a + 1000000) with Laplace smoothing so degenerate
    # all-agree fields never hit ln(0), per-field weights ln(m/u)
    # rounded at 6 dp, and the pair score as a FIXED 3-term sum —
    # reported as the 8-cell agreement-pattern scoreboard.
    oracle=f"""
    WITH {_ER_TWIN_BASE_SQL},
    {_ER_PAIRS_SQL.format(max_block=dedup.DEFAULT_MAX_BLOCK)},
    flags AS MATERIALIZED (
      SELECT CASE WHEN p.distance = 0 THEN 1 ELSE 0 END AS f_name,
             CASE WHEN a.p_size = b2.p_size THEN 1 ELSE 0 END AS f_size,
             CASE WHEN a.price_cents = b2.price_cents THEN 1 ELSE 0 END AS f_price,
             CASE WHEN p.id_b = p.id_a + 1000000 THEN 1 ELSE 0 END AS is_true
      FROM pairs p JOIN base a ON a.pid = p.id_a JOIN base b2 ON b2.pid = p.id_b
    ),
    st AS MATERIALIZED (
      SELECT CAST(SUM(is_true) AS BIGINT) AS nt,
             CAST(COUNT(*) - SUM(is_true) AS BIGINT) AS nf,
             CAST(SUM(CASE WHEN is_true = 1 THEN f_name ELSE 0 END) AS BIGINT) AS at_name,
             CAST(SUM(CASE WHEN is_true = 0 THEN f_name ELSE 0 END) AS BIGINT) AS af_name,
             CAST(SUM(CASE WHEN is_true = 1 THEN f_size ELSE 0 END) AS BIGINT) AS at_size,
             CAST(SUM(CASE WHEN is_true = 0 THEN f_size ELSE 0 END) AS BIGINT) AS af_size,
             CAST(SUM(CASE WHEN is_true = 1 THEN f_price ELSE 0 END) AS BIGINT) AS at_price,
             CAST(SUM(CASE WHEN is_true = 0 THEN f_price ELSE 0 END) AS BIGINT) AS af_price
      FROM flags
    ),
    wt AS MATERIALIZED (
      SELECT
        round(ln(((at_name + 1) / CAST(nt + 2 AS DOUBLE)) / ((af_name + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wa_name,
        round(ln(((nt - at_name + 1) / CAST(nt + 2 AS DOUBLE)) / ((nf - af_name + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wd_name,
        round(ln(((at_size + 1) / CAST(nt + 2 AS DOUBLE)) / ((af_size + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wa_size,
        round(ln(((nt - at_size + 1) / CAST(nt + 2 AS DOUBLE)) / ((nf - af_size + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wd_size,
        round(ln(((at_price + 1) / CAST(nt + 2 AS DOUBLE)) / ((af_price + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wa_price,
        round(ln(((nt - at_price + 1) / CAST(nt + 2 AS DOUBLE)) / ((nf - af_price + 1) / CAST(nf + 2 AS DOUBLE))), 6) AS wd_price
      FROM st
    ),
    cells AS (
      SELECT f_name, f_size, f_price,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(is_true) AS BIGINT) AS n_true
      FROM flags GROUP BY 1, 2, 3
    )
    SELECT CAST(f_name AS BIGINT) AS f_name, CAST(f_size AS BIGINT) AS f_size,
           CAST(f_price AS BIGINT) AS f_price, n_pairs, n_true,
           round((CASE WHEN f_name = 1 THEN wa_name ELSE wd_name END)
                 + (CASE WHEN f_size = 1 THEN wa_size ELSE wd_size END)
                 + (CASE WHEN f_price = 1 THEN wa_price ELSE wd_price END), 6) AS fs_score
    FROM cells CROSS JOIN wt
    ORDER BY f_name, f_size, f_price
    """,
)


def _dfellegi(spark, sf_dir):
    """Fellegi-Sunter scoreboard over the shared twin-base pairs."""
    base = _twin_base(spark, sf_dir).localCheckpoint(eager=False)
    pairs = _twin_fuzzy_pairs(base.select("pid", "p_name", "p_brand"))
    a = base.select(
        F.col("pid").alias("id_a"), F.col("p_size").alias("size_a"), F.col("price_cents").alias("price_a")
    )
    b2 = base.select(
        F.col("pid").alias("id_b"), F.col("p_size").alias("size_b"), F.col("price_cents").alias("price_b")
    )
    flags = (
        pairs.join(a, "id_a")
        .join(b2, "id_b")
        .select(
            F.when(F.col("distance") == 0, 1).otherwise(0).alias("f_name"),
            F.when(F.col("size_a") == F.col("size_b"), 1).otherwise(0).alias("f_size"),
            F.when(F.col("price_a") == F.col("price_b"), 1).otherwise(0).alias("f_price"),
            F.when(F.col("id_b") == F.col("id_a") + 1000000, 1).otherwise(0).alias("is_true"),
        )
        .localCheckpoint(eager=False)
    )
    aggs = [
        F.sum("is_true").cast("long").alias("nt"),
        (F.count("*") - F.sum("is_true")).cast("long").alias("nf"),
    ]
    for f in ("name", "size", "price"):
        aggs.append(
            F.sum(F.when(F.col("is_true") == 1, F.col(f"f_{f}")).otherwise(0))
            .cast("long")
            .alias(f"at_{f}")
        )
        aggs.append(
            F.sum(F.when(F.col("is_true") == 0, F.col(f"f_{f}")).otherwise(0))
            .cast("long")
            .alias(f"af_{f}")
        )
    st = flags.agg(*aggs)

    def _wa(f):
        return F.round(
            F.log(
                ((F.col(f"at_{f}") + 1) / (F.col("nt") + 2).cast("double"))
                / ((F.col(f"af_{f}") + 1) / (F.col("nf") + 2).cast("double"))
            ),
            6,
        )

    def _wd(f):
        return F.round(
            F.log(
                ((F.col("nt") - F.col(f"at_{f}") + 1) / (F.col("nt") + 2).cast("double"))
                / ((F.col("nf") - F.col(f"af_{f}") + 1) / (F.col("nf") + 2).cast("double"))
            ),
            6,
        )

    wt = st.select(
        _wa("name").alias("wa_name"),
        _wd("name").alias("wd_name"),
        _wa("size").alias("wa_size"),
        _wd("size").alias("wd_size"),
        _wa("price").alias("wa_price"),
        _wd("price").alias("wd_price"),
    )
    cells = flags.groupBy("f_name", "f_size", "f_price").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("is_true").cast("long").alias("n_true"),
    )

    def _pick(f):
        return F.when(F.col(f"f_{f}") == 1, F.col(f"wa_{f}")).otherwise(F.col(f"wd_{f}"))

    return (
        cells.crossJoin(F.broadcast(wt))
        .select(
            F.col("f_name").cast("long").alias("f_name"),
            F.col("f_size").cast("long").alias("f_size"),
            F.col("f_price").cast("long").alias("f_price"),
            "n_pairs",
            "n_true",
            F.round(_pick("name") + _pick("size") + _pick("price"), 6).alias("fs_score"),
        )
        .orderBy("f_name", "f_size", "f_price")
    )


CATALOG["er_fellegi_sunter_scores"].fn = _dfellegi


register(
    "doc_yule_k_richness",
    # Yule's K vocabulary-richness characteristic per source:
    # K = 1e4 * (sum_types c^2 - N) / N^2 (the freq-of-freq identity
    # sum m^2 V_m == sum_types c^2 collapses the second histogram).
    # One token-count shuffle, exact integer masses, one division —
    # the repetitiveness score that, unlike TTR, is length-invariant.
    oracle="""
    WITH tf AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL
      ) GROUP BY source, tok
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 6) AS ttr,
           round(10000.0 * (CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) - CAST(SUM(c) AS BIGINT))
                 / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) * CAST(SUM(c) AS BIGINT)), 6) AS yule_k
    FROM tf GROUP BY source ORDER BY source
    """,
)


def _dyulek(spark, sf_dir):
    """Yule's K per source from the (source, token) count frame."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d19 = "decimal(19,0)"
    tf = d.select("source", F.explode(tok_arr(F.col("text"))).alias("tok")).groupBy(
        "source", "tok"
    ).agg(F.count("*").cast("long").alias("c"))
    n_types = F.count("*").cast("long")
    n_tokens = F.sum("c").cast("long")
    s2 = F.sum(F.col("c").cast(d19) * F.col("c").cast(d19)).cast("long")
    return (
        tf.groupBy("source")
        .agg(
            n_types.alias("n_types"),
            n_tokens.alias("n_tokens"),
            F.round(n_types.cast("double") / n_tokens, 6).alias("ttr"),
            F.round(
                10000.0 * (s2 - n_tokens) / (n_tokens.cast("double") * n_tokens), 6
            ).alias("yule_k"),
        )
        .orderBy("source")
    )


CATALOG["doc_yule_k_richness"].fn = _dyulek


