"""Split from queries.py lines 14789-15121 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, similarity, t
from .q09_llm_dedup_text_sim import _EMB_BAND_SQL, _EN_NORM_SQL, _cos6_sql
from .q15_curation_r3 import _simhash_portable_oracle

# ===========================================================================
# round-7 additions, second wave: distribution diagnostics
# ===========================================================================

register(
    "simhash_hamming_histogram",
    # the distance DISTRIBUTION behind the simhash threshold choice:
    # pigeonhole-blocked candidate pairs (max_hamming=8 -> 9 segments)
    # bucketed by exact Hamming distance. Same portable 60-bit
    # signatures as simhash_dup_pairs_portable; counts are exact.
    oracle=f"""
    WITH p AS ({_simhash_portable_oracle(8)})
    SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY hamming ORDER BY hamming
    """,
)


def _dshh(spark, sf_dir):
    """SimHash Hamming-distance histogram over blocked candidates —
    the calibration curve that turns 'pick max_hamming=3' from folklore
    into a measured elbow. One signature pass, one segment-blocked
    equi-join, one 9-bucket count."""
    d = t(spark, sf_dir, "documents")
    p = dedup.simhash_dup_pairs_portable(d, "doc_id", "text", max_hamming=8)
    return (
        p.groupBy(F.col("hamming").cast("bigint").alias("hamming"))
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .orderBy("hamming")
    )


CATALOG["simhash_hamming_histogram"].fn = _dshh

register(
    "doc_token_burstiness",
    # burstiness (variance-to-mean ratio of per-document counts) for
    # the 20 most frequent tokens: VMR ~ 1 is Poisson scatter,
    # VMR >> 1 marks topical/bursty terms — the feature behind
    # stopword-vs-content weighting. All moments are exact integers
    # over the full doc grid (absent doc => count 0 contributes
    # nothing to sums but belongs in N).
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok WHERE w <> '' GROUP BY w, doc_id),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
    m AS (
      SELECT w, CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS docs_with
      FROM cnt GROUP BY w
    )
    SELECT w AS token, s AS total_count, docs_with,
           round((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
                 / (CAST(s AS DOUBLE) / n), 6) AS burstiness_vmr
    FROM m, nd
    ORDER BY total_count DESC, token
    LIMIT 20
    """,
)


def _dburstiness(spark, sf_dir):
    """Token burstiness (VMR over per-doc counts, zeros included via
    the algebraic identity — no doc x vocab grid is ever materialized):
    one (token, doc) count, one per-token moment rollup, a 1-row
    doc-count broadcast."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    cnt = tok.groupBy("w", "doc_id").agg(F.count("*").cast("long").alias("c"))
    nd = d.agg(F.countDistinct("doc_id").cast("long").alias("__n"))
    m = cnt.groupBy("w").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sq"),
        F.count("*").cast("long").alias("docs_with"),
    )
    s, sq, n = F.col("s").cast("double"), F.col("sq").cast("double"), F.col("__n")
    return (
        m.crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("token"),
            F.col("s").alias("total_count"),
            "docs_with",
            F.round(
                ((sq - s * F.col("s") / n) / (n - 1)) / (s / n), 6
            ).alias("burstiness_vmr"),
        )
        .orderBy(F.desc("total_count"), "token")
        .limit(20)
    )


CATALOG["doc_token_burstiness"].fn = _dburstiness

register(
    "doc_sentence_dedup_ratio",
    # sentence-level duplication per source (the WITHIN-corpus
    # boilerplate pressure gauge — complement of the cross-doc segment
    # rewrite op): sentences split on terminal punctuation, trimmed,
    # non-empty; dup ratio = 1 - distinct/total. Exact integers.
    oracle="""
    WITH s AS (
      SELECT source,
             trim(unnest(regexp_split_to_array(lower(trim(text)), '[.!?]+'))) AS sent
      FROM documents
    ),
    ns AS (SELECT source, sent FROM s WHERE sent <> '')
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(COUNT(DISTINCT sent) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(COUNT(DISTINCT sent) AS DOUBLE) / COUNT(*), 6)
             AS dup_ratio
    FROM ns GROUP BY source ORDER BY source
    """,
)


def _dsentdup(spark, sf_dir):
    """Per-source sentence duplication ratio: explode on terminal
    punctuation, one grouped exact-distinct aggregate. High dup ratio
    flags template-generated sources before any pairwise dedup runs —
    the cheap triage that decides where the expensive near-dup passes
    are even needed."""
    d = t(spark, sf_dir, "documents")
    s = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim("text")), r"[.!?]+")).alias("__raw"),
        )
        .select("source", F.trim("__raw").alias("sent"))
        .filter(F.col("sent") != "")
    )
    return (
        s.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_sentences"),
            F.countDistinct("sent").cast("long").alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.countDistinct("sent").cast("double") / F.count("*"),
                6,
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


CATALOG["doc_sentence_dedup_ratio"].fn = _dsentdup

register(
    "emb_cosine_histogram",
    # the pairwise-similarity distribution over banded-LSH candidates
    # (the curve that justifies emb_dup_pairs' 0.35 threshold): rounded
    # cosine bucketed to 0.1 bands. Candidates only — the histogram an
    # index can actually afford at scale, with the LSH bias understood.
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    pc AS (
      SELECT CAST(floor({_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')}
                        * 10) AS BIGINT) AS bucket
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
    )
    SELECT bucket, CAST(bucket AS DOUBLE) / 10.0 AS bucket_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pc GROUP BY bucket ORDER BY bucket
    """,
)


def _dcoshist(spark, sf_dir):
    """Candidate-pair cosine histogram: the banded-LSH pair expansion
    (threshold -1: keep every candidate) bucketed at 0.1 — one
    signature pass, intra-bucket pair expansion, a dozen-row count."""
    e = t(spark, sf_dir, "embeddings")
    p = similarity.embedding_dup_pairs(e, threshold=-1.0, bits=6, bands=3)
    return (
        p.select(
            F.floor(F.round(F.col("cosine_sim"), 6) * 10)
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select(
            "bucket",
            (F.col("bucket").cast("double") / 10.0).alias("bucket_lo"),
            "n_pairs",
        )
        .orderBy("bucket")
    )


CATALOG["emb_cosine_histogram"].fn = _dcoshist

register(
    "evt_user_ltv_deciles",
    # lifetime-value concentration: per-user purchase totals (exact
    # cents) cut into ntile(10) deciles, each decile's share of total
    # — the 'whales' curve every monetization analysis starts with.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM u),
    d AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents DESC, user_id) AS decile
      FROM u
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_value,
           round(CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / tot.t, 6) AS share
    FROM d, tot GROUP BY decile, tot.t ORDER BY decile
    """,
)


def _dltv(spark, sf_dir):
    """User LTV deciles: per-user exact-cents purchase totals
    (user-cardinality aggregate), one global ntile over that aggregate
    (agg-bounded), a 1-row total broadcast for shares."""
    ev = t(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
    )
    tot = u.agg(F.sum("cents").cast("long").alias("__t"))
    d = u.select(
        "cents",
        F.ntile(10).over(Window.orderBy(F.desc("cents"), "user_id")).alias("decile"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy(F.col("decile").cast("long").alias("decile"), "__t")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            (F.sum("cents").cast("long").cast("double") / 100.0).alias(
                "total_value"
            ),
            F.round(
                F.sum("cents").cast("long").cast("double") / F.col("__t"), 6
            ).alias("share"),
        )
        .drop("__t")
        .orderBy("decile")
    )


CATALOG["evt_user_ltv_deciles"].fn = _dltv

register(
    "w7_positional_window_bundle",
    # the positional window family w2-w6 left out: first_value /
    # last_value (full frame) / nth_value(2) per customer's order
    # timeline, reduced to one row per customer. Exact cents.
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             ROW_NUMBER() OVER w AS rn,
             first_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER w AS first_c,
             last_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_c,
             nth_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 2)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_c,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(first_c AS DOUBLE) / 100.0 AS first_order_value,
           CAST(last_c AS DOUBLE) / 100.0 AS last_order_value,
           CAST(second_c AS DOUBLE) / 100.0 AS second_order_value
    FROM o WHERE rn = 1
    ORDER BY o_custkey
    """,
)


def _dw7(spark, sf_dir):
    """first/last/nth_value positional windows per customer timeline,
    one row per customer (rn=1 projection): one shuffle by custkey
    serves all five window expressions. o_totalprice is 2-dp, so
    *100 as BIGINT is exact on both engines."""
    o = t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cents = (F.col("o_totalprice").cast(DEC) * 100).cast("long")
    rows = o.select(
        "o_custkey",
        F.row_number().over(wp).alias("rn"),
        F.first(cents).over(wp).alias("first_c"),
        F.last(cents).over(wf).alias("last_c"),
        F.nth_value(cents, 2).over(wf).alias("second_c"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n_orders"),
    )
    return (
        rows.filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            (F.col("first_c").cast("double") / 100.0).alias("first_order_value"),
            (F.col("last_c").cast("double") / 100.0).alias("last_order_value"),
            (F.col("second_c").cast("double") / 100.0).alias("second_order_value"),
        )
        .orderBy("o_custkey")
    )


CATALOG["w7_positional_window_bundle"].fn = _dw7


