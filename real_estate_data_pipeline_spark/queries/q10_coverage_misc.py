"""Split from queries.py lines 2535-3644 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, dsum_expr, register, similarity, t, text
from .q09_llm_dedup_text_sim import _PQ_CTES

# ===========================================================================
# Additional coverage: Q6 pushdown showcase, global stats, summary,
# multi-format dates, fillna, vocabulary
# ===========================================================================

register(
    "q6_banded_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    bench=True,
)


def _q6(spark, sf_dir):
    """TPC-H Q6 shape: every predicate pushes into the parquet scan
    (date range, discount band, quantity) — the pure-pushdown showcase;
    verified by tests/test_plans.py."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    li = t(spark, sf_dir, "lineitem", fan_out=False)
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return f.agg(dsum_expr(rev, "revenue"), F.count("*").alias("n_rows"))


CATALOG["q6_banded_revenue"].fn = _q6

register(
    "a3_global_stats",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_price,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders
    """,
)


def _a3(spark, sf_dir):
    """A3 global single-row aggregate (one multi-column agg, no driver
    loop). Ref: silver_etl_script.py:676-679,1102."""
    o = t(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast(DEC)
    return o.agg(
        F.count("*").alias("n"),
        F.sum(p).cast("double").alias("total"),
        (F.sum(p).cast("double") / F.count("*")).alias("mean_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


CATALOG["a3_global_stats"].fn = _a3

register(
    "a7_summary_stats",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(l_quantity) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS mean,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v, MEDIAN(l_quantity) AS median_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(l_extendedprice),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice), MEDIAN(l_extendedprice)
    FROM lineitem
    """,
)


def _a7(spark, sf_dir):
    """A7 df.summary() semantics, engine-exact (one pass per column set,
    deterministic mean/median). Ref: gold_ml_etl.py:501-503."""
    li = t(spark, sf_dir, "lineitem")

    def stats(col: str):
        c = F.col(col).cast(DEC)
        return li.agg(
            F.lit(col).alias("col"),
            F.count(col).alias("cnt"),
            (F.sum(c).cast("double") / F.count(col)).alias("mean"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
            F.median(col).alias("median_v"),
        )

    return stats("l_quantity").unionByName(stats("l_extendedprice"))


CATALOG["a7_summary_stats"].fn = _a7

register(
    "a8_fillna_defaults",
    oracle="""
    SELECT c_custkey,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_filled,
           COALESCE(nullif(c_mktsegment, 'MACHINERY'), 'UNKNOWN') AS seg_filled
    FROM customer
    """,
)


def _a8(spark, sf_dir):
    """A8 na.fill defaults (nulls synthesized). Ref: silver_etl_script.py:662-664."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal_filled"),
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_filled"),
    )
    return base.na.fill({"bal_filled": 0.0, "seg_filled": "UNKNOWN"})


CATALOG["a8_fillna_defaults"].fn = _a8

register(
    "d1_multiformat_roundtrip",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS parsed_s
    FROM orders
    """,
)


def _d1(spark, sf_dir):
    """D1 multi-format timestamp parse: format each date into a different
    format by key, run through the coalesce-of-formats parser, then emit a
    canonical string (the oracle computes it directly — equivalence proves
    the parser inverted every format). Ref: transformation_utils.py:381-409."""
    from ..ops.functions import parse_timestamp_multi

    o = t(spark, sf_dir, "orders")
    fmt = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy/MM/dd HH:mm:ss"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )
    parsed = parse_timestamp_multi(fmt)
    return o.select(
        "o_orderkey", F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed_s")
    )


CATALOG["d1_multiformat_roundtrip"].fn = _d1

register(
    "doc_top_tokens",
    oracle="""
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50
    """,
    bench=True,
)


def _dtop(spark, sf_dir):
    """Corpus vocabulary: tokenize -> explode -> count -> top-k. The
    explode is a map; the count is one shuffle on token; top-k is a
    TakeOrdered — the canonical scalable wordcount."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    d = t(spark, sf_dir, "documents", fan_out=False)
    toks = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok").agg(F.count("*").alias("cnt")).orderBy(F.desc("cnt"), "tok").limit(50)
    )


CATALOG["doc_top_tokens"].fn = _dtop

register(
    "doc_bpe_tokenize",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '([a-z0-9]+|[^\sa-z0-9])', 1)) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
    """,
)


def _dbpe(spark, sf_dir):
    """BPE-ish pre-tokenizer count (GPT-2-style regex: letter/digit runs
    or single non-space symbols)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.size(text.word_tokens(F.col("text"))).cast("long").alias("n_bpe_tokens")
    )


CATALOG["doc_bpe_tokenize"].fn = _dbpe

register(
    "doc_token_doc_freq",
    oracle="""
    SELECT tok,
           COUNT(*) AS doc_freq,
           CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS doc_frac
    FROM (SELECT DISTINCT doc_id,
                 unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY tok HAVING COUNT(*) >= 5
    ORDER BY doc_freq DESC, tok
    """,
    bench=True,
)


def _ddf(spark, sf_dir):
    """Document frequency (IDF numerator): distinct token per doc ->
    count docs per token. Map-side distinct inside the array keeps the
    explode output at O(distinct tokens per doc)."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    d = t(spark, sf_dir, "documents", fan_out=False)
    total = d.agg(F.count("*").alias("__n"))  # stays lazy: broadcast scalar
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 5)
        .crossJoin(F.broadcast(total))
        .select(
            "tok",
            "doc_freq",
            (F.col("doc_freq").cast("double") / F.col("__n")).alias("doc_frac"),
        )
        .orderBy(F.desc("doc_freq"), "tok")
    )


CATALOG["doc_token_doc_freq"].fn = _ddf

register(
    "doc_bpe_merge_pairs",
    # The first step of BPE tokenizer TRAINING (Sennrich et al. 2016):
    # census of adjacent token pairs across the corpus, most frequent
    # first — the pair a BPE learner would merge next. One map (explode
    # of zipped array slices, O(tokens) rows) + one partial-aggregated
    # groupBy; top-20 via TakeOrdered.
    oracle=r"""
    WITH toks AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents
    ),
    pairs AS (
      SELECT t[i] AS tok_a, t[i + 1] AS tok_b
      FROM toks, unnest(range(1, len(t))) AS u(i)
    )
    SELECT tok_a, tok_b, COUNT(*) AS pair_count
    FROM pairs
    WHERE tok_a <> '' AND tok_b <> ''
    GROUP BY tok_a, tok_b
    ORDER BY pair_count DESC, tok_a, tok_b
    LIMIT 20
    """,
)


def _dbmp(spark, sf_dir):
    """Top-20 adjacent-token bigram pairs (the next BPE merge candidates).
    Pairs come from zip_with over two shifted slices of the token array —
    no posexplode self-join, one row per adjacent pair."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = F.zip_with(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("tok_a"), y.alias("tok_b")),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .filter((F.col("tok_a") != "") & (F.col("tok_b") != ""))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "tok_a", "tok_b")
        .limit(20)
    )


CATALOG["doc_bpe_merge_pairs"].fn = _dbmp

register(
    "doc_vocab_coverage",
    # Tokenizer-vocabulary sizing: how much of the corpus token mass the
    # top-N vocabulary entries cover. Token census (one groupBy), rank by
    # frequency, running-total window over the RANKED AGGREGATE (tiny:
    # |vocab| rows, not |tokens|), probe the coverage curve at standard
    # vocab budgets. Exact integer token counts -> exact ratios.
    oracle=r"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tk
      FROM documents
    ),
    freq AS (
      SELECT tk, COUNT(*) AS c FROM tok WHERE tk <> '' GROUP BY tk
    ),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c DESC, tk) AS rnk,
             SUM(c) OVER (ORDER BY c DESC, tk
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER () AS total
      FROM freq
    )
    SELECT CAST(rnk AS BIGINT) AS vocab_size,
           CAST(cum AS BIGINT) AS tokens_covered,
           CAST(cum AS DOUBLE) / total AS coverage
    FROM ranked
    WHERE rnk IN (1, 8, 16, 32)
    ORDER BY vocab_size
    """,
)


def _dvc(spark, sf_dir):
    """Coverage curve of a frequency-ranked vocabulary at budgets
    1/8/16/32 (the corpus fixture has a small vocab; real corpora probe
    1e3..1e5). Scale shape: only the top max-budget tokens can appear in
    the output, so the rank comes from a distributed TakeOrdered
    (``orderBy().limit(32)`` — per-partition top-k, k-row merge on the
    driver side of the exchange), NEVER a global window over the full
    vocab table (web-scale corpora have 1e8+ distinct tokens — a
    single-task sort). The running-total window then runs over the
    32-row limit — bounded by construction, with the GlobalLimit under
    the window provable in the plan (the test_plans.py lint checks it) —
    and the corpus total is a separate scalar aggregate broadcast back."""
    from pyspark.sql import Window

    max_budget = 32
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tk")
    ).filter(F.col("tk") != "")
    freq = toks.groupBy("tk").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("__total"))
    topb = freq.orderBy(F.desc("c"), "tk").limit(max_budget)
    w = Window.orderBy(F.desc("c"), "tk")
    ranked = topb.select(
        F.row_number().over(w).cast("long").alias("vocab_size"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("tokens_covered"),
    )
    return (
        ranked.filter(F.col("vocab_size").isin(1, 8, 16, 32))
        .crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "tokens_covered",
            (F.col("tokens_covered").cast("double") / F.col("__total")).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


CATALOG["doc_vocab_coverage"].fn = _dvc

register(
    "doc_segment_dedup_rewrite",
    # Substring-level exact dedup WITH document reconstruction (the
    # "Deduplicating Training Data" / RefinedWeb shape, approximated at
    # fixed 10-token windows): a segment that already occurred anywhere
    # in the corpus (lower doc_id, or earlier in the same doc) is
    # dropped, and each document is rewritten from its surviving
    # segments in order. One shuffle, keyed on segment text (first-
    # occurrence window); reassembly is a sort_array over collected
    # (idx, text) structs — deterministic, no driver loops.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS seg_idx,
             array_to_string(t[u.i * 10 + 1 : u.i * 10 + 10], ' ') AS seg_text
      FROM toks, unnest(range(0, CAST(ceil(len(t) / 10.0) AS INT))) AS u(i)
    ),
    keep AS (
      SELECT doc_id, seg_idx, seg_text,
             ROW_NUMBER() OVER (PARTITION BY seg_text
                                ORDER BY doc_id, seg_idx) AS rn
      FROM segs WHERE seg_text <> ''
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
                               ORDER BY seg_idx), '') AS cleaned_text
    FROM keep
    GROUP BY doc_id
    """,
    bench=True,
)


def _dsegdd(spark, sf_dir):
    """Fixed-window segment dedup + rewrite: global first-occurrence
    window on segment text, per-doc reassembly of survivors. The only
    wide op is the segment-key shuffle (inherent to corpus-global exact
    dedup); reconstruction is a groupBy(doc_id) with sorted structs."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_seg = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    segs = (
        d.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(F.slice(tk, i * 10 + 1, 10), " "),
                )
            ).alias("seg_idx", "seg_text"),
        )
        .filter(F.col("seg_text") != "")
        .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"), "seg_text")
    )
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    marked = segs.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("seg_idx"), F.col("seg_text"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(kept_struct)),
                    lambda s: s["seg_text"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


CATALOG["doc_segment_dedup_rewrite"].fn = _dsegdd

register(
    "doc_boilerplate_strip",
    # CCNet-style boilerplate removal, the complement of first-occurrence
    # dedup: a segment appearing in >= 3 DISTINCT documents of the same
    # source is template noise (headers, nav, disclaimers) and is dropped
    # from EVERY document. Census is one partial-aggregated groupBy on
    # (source, segment); the rewrite joins the census back on the same
    # key — both shuffles are keyed, nothing fans out.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    segs AS (
      SELECT doc_id, source, CAST(u.i AS BIGINT) AS seg_idx,
             array_to_string(t[u.i * 10 + 1 : u.i * 10 + 10], ' ') AS seg_text
      FROM toks, unnest(range(0, CAST(ceil(len(t) / 10.0) AS INT))) AS u(i)
    ),
    nonempty AS (SELECT * FROM segs WHERE seg_text <> ''),
    census AS (
      SELECT source, seg_text, COUNT(DISTINCT doc_id) AS n_docs
      FROM nonempty GROUP BY source, seg_text
    ),
    marked AS (
      SELECT s.doc_id, s.source, s.seg_idx, s.seg_text,
             CASE WHEN c.n_docs >= 3 THEN 1 ELSE 0 END AS boiler
      FROM nonempty s JOIN census c
        ON s.source = c.source AND s.seg_text = c.seg_text
    )
    SELECT doc_id, source,
           COUNT(*) AS n_segments,
           CAST(SUM(boiler) AS BIGINT) AS n_boiler,
           COALESCE(string_agg(CASE WHEN boiler = 0 THEN seg_text END, ' '
                               ORDER BY seg_idx), '') AS cleaned_text
    FROM marked
    GROUP BY doc_id, source
    """,
)


def _dboiler(spark, sf_dir):
    """Per-source boilerplate strip: segments shared by >= 3 distinct docs
    of a source are removed from all of them; every doc survives (possibly
    empty) with its kept segments rejoined in order."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_seg = F.ceil(F.size(tk) / F.lit(10.0)).cast("int")
    segs = (
        d.select(
            "doc_id",
            "source",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_seg - 1),
                    lambda i: F.array_join(F.slice(tk, i * 10 + 1, 10), " "),
                )
            ).alias("seg_idx", "seg_text"),
        )
        .filter(F.col("seg_text") != "")
        .select("doc_id", "source", F.col("seg_idx").cast("long").alias("seg_idx"), "seg_text")
    )
    census = segs.groupBy("source", "seg_text").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    marked = segs.join(census, ["source", "seg_text"]).withColumn(
        "boiler", F.when(F.col("n_docs") >= 3, F.lit(1)).otherwise(F.lit(0))
    )
    kept_struct = F.when(
        F.col("boiler") == 0, F.struct(F.col("seg_idx"), F.col("seg_text"))
    )
    return marked.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_segments"),
        F.sum("boiler").alias("n_boiler"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list(kept_struct)), lambda s: s["seg_text"]),
            " ",
        ).alias("cleaned_text"),
    )


CATALOG["doc_boilerplate_strip"].fn = _dboiler

register(
    "doc_span_corruption",
    # T5 span-corruption example construction: deterministic per-(doc,
    # position) hash draws mask ~15% of tokens, consecutive masked
    # tokens collapse to one <extra_id_k> sentinel in the input, and the
    # target lists each sentinel's hidden tokens. Fully derandomized
    # (sha256 draws, the corpus sampling convention) -> the exact same
    # training examples on any engine, any partitioning, any epoch.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS idx, t[u.i] AS tok
      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
            FROM documents) s,
           unnest(range(1, len(t) + 1)) AS u(i)
      WHERE t[u.i] <> ''
    ),
    drawn AS (
      SELECT doc_id, idx, tok,
             CASE WHEN ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(idx AS VARCHAR) || 'span'), 1, 8))::UBIGINT
                        / 4294967296.0 < 0.15
                  THEN 1 ELSE 0 END AS masked
      FROM toks
    ),
    runs AS (
      SELECT drawn.*,
             CASE WHEN masked = 1
                   AND COALESCE(LAG(masked) OVER (PARTITION BY doc_id ORDER BY idx), 0) = 0
                  THEN 1 ELSE 0 END AS run_start
      FROM drawn
    ),
    sids AS (
      SELECT runs.*,
             SUM(run_start) OVER (PARTITION BY doc_id ORDER BY idx
                                  ROWS UNBOUNDED PRECEDING) - 1 AS sid
      FROM runs
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(masked) AS BIGINT) AS n_masked,
           COALESCE(string_agg(CASE WHEN masked = 0 THEN tok
                                    WHEN run_start = 1
                                    THEN '<extra_id_' || CAST(sid AS VARCHAR) || '>'
                               END, ' ' ORDER BY idx), '') AS input_text,
           COALESCE(string_agg(CASE WHEN masked = 1 THEN
                                      CASE WHEN run_start = 1
                                           THEN '<extra_id_' || CAST(sid AS VARCHAR)
                                                || '> ' || tok
                                           ELSE tok END
                               END, ' ' ORDER BY idx), '') AS target_text
    FROM sids
    GROUP BY doc_id
    """,
    bench=True,
)


def _dspan(spark, sf_dir):
    """Span-corruption (input, target) pairs over the documents corpus
    (ops/packing.span_corruption): epoch-stable hash masking, per-doc
    window for sentinel runs, ordered reassembly — no RNG, no UDF."""
    from ..ops import packing

    d = t(spark, sf_dir, "documents")
    return packing.span_corruption(d, mask_rate=0.15, salt="span")


CATALOG["doc_span_corruption"].fn = _dspan

register(
    "doc_source_overlap_matrix",
    # Provenance diagnostic: how much PHRASING each pair of sources
    # shares (the "is source B re-crawling source A" question), measured
    # as distinct 5-token shingles present in both — the same gram
    # currency as decontamination. Distinct (shingle, source) pairs,
    # then a self-join WITHIN shingle groups — group fan-out is bounded
    # by the number of sources, never by corpus size, so the pair
    # expansion is safe at any scale.
    oracle=r"""
    WITH tk AS (
      SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT source,
             unnest(list_filter(list_distinct(list_transform(
                 range(1, greatest(len(tk) - 4, 1) + 1),
                 i -> array_to_string(tk[i:i+4], ' '))), g -> g <> '')) AS g
      FROM tk
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_shingles
    FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)


def _dsom(spark, sf_dir):
    """Pairwise source-overlap matrix on distinct 5-gram shingles
    (ops/dedup.shingles_from_tokens): one distinct, one shingle-keyed
    self-join (fan-out <= n_sources per group), one groupBy."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sh = (
        d.select("source", tk.alias("__tk"))
        .select("source", F.explode(dedup.shingles_from_tokens(F.col("__tk"), 5)).alias("g"))
        .distinct()
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("shared_shingles"))
    )


CATALOG["doc_source_overlap_matrix"].fn = _dsom

register(
    "export_range_partition_stats",
    # Deterministic range-partitioner derivation (the exact-boundary twin
    # of io/writers.write_range_sorted, whose sampled boundaries can't
    # hash-match): decile boundaries come from a HISTOGRAM of the sort
    # key (groupBy value + running sum over |distinct values| rows —
    # never a global row_number over the corpus, the single-task-sort
    # shape), docs are assigned bucket = #boundaries strictly below
    # their key via a 9-row broadcast, and the output is per-bucket
    # (count, min, max) — non-overlapping, monotone ranges.
    oracle="""
    WITH hist AS (
      SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY n_chars
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
    cum AS (
      SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc FROM hist
    ),
    bounds AS (
      SELECT u.i, MIN(cum.v) AS b
      FROM cum, tot, unnest(range(1, 10)) AS u(i)
      WHERE cum.cc >= ceil(u.i * tot.n / 10.0)
      GROUP BY u.i
    ),
    assigned AS (
      SELECT d.doc_id, d.n_chars,
             CAST(COALESCE(SUM(CASE WHEN b.b < d.n_chars THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS bucket
      FROM documents d CROSS JOIN bounds b
      GROUP BY d.doc_id, d.n_chars
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM assigned GROUP BY bucket
    """,
)


def _derps(spark, sf_dir):
    """Exact decile range-partitioning of documents on n_chars: histogram
    -> running-sum boundaries (window over the value domain, not the
    corpus) -> 9-row broadcast bucket assignment -> per-bucket stats."""
    d = t(spark, sf_dir, "documents")
    hist = d.groupBy(F.col("n_chars").alias("v")).agg(F.count("*").alias("c"))
    tot = hist.agg(F.sum("c").cast("long").alias("n"))
    # value-domain frame (one row per distinct n_chars — bounded by the
    # value domain, not the corpus; allowlisted in the plan lint)
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("v", F.sum("c").over(wv).alias("cc"))
    bounds = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(spark.range(1, 10).select(F.col("id").alias("i"))))
        .filter(F.col("cc") >= F.ceil(F.col("i") * F.col("n") / F.lit(10.0)))
        .groupBy("i")
        .agg(F.min("v").alias("b"))
    )
    assigned = (
        d.select("doc_id", "n_chars")
        .crossJoin(F.broadcast(bounds))
        .groupBy("doc_id", "n_chars")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("b") < F.col("n_chars"), 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("bucket")
        )
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


CATALOG["export_range_partition_stats"].fn = _derps

register(
    "sim_pq_recall_report",
    # In-gate quality quantification of the PQ compression: both the
    # exact cosine top-10 and the PQ-ADC top-10 are fully deterministic,
    # so their overlap is a VALUE both engines must agree on — recall is
    # hash-checked, not waved at. (The sketch entries need within_bound
    # booleans because their estimates are engine-specific; PQ doesn't.)
    oracle=f"""
    WITH {_PQ_CTES},
    pq_top AS (
      SELECT enc1.vec_id
      FROM enc1 JOIN adc USING (sub, code)
      GROUP BY enc1.vec_id
      ORDER BY CAST(SUM(adc.micro) AS DOUBLE) / 1e6, enc1.vec_id
      LIMIT 10
    ),
    exact_top AS (
      SELECT e.vec_id
      FROM embeddings e, q
      ORDER BY list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
               / (SQRT(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * SQRT(list_sum(list_transform(q.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
               e.vec_id
      LIMIT 10
    ),
    cand AS (
      SELECT enc1.vec_id
      FROM enc1 JOIN adc USING (sub, code)
      GROUP BY enc1.vec_id
      ORDER BY CAST(SUM(adc.micro) AS DOUBLE) / 1e6, enc1.vec_id
      LIMIT 100
    ),
    rerank_top AS (
      SELECT e.vec_id
      FROM embeddings e JOIN cand USING (vec_id), q
      ORDER BY list_sum(list_transform(range(1, 65), i ->
                 (CAST(e.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
                 * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE)))),
               e.vec_id
      LIMIT 10
    ),
    a1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_adc
      FROM pq_top JOIN exact_top USING (vec_id)
    ),
    a2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_rerank
      FROM rerank_top JOIN exact_top USING (vec_id)
    )
    SELECT n_overlap_adc,
           CAST(n_overlap_adc AS DOUBLE) / 10 AS recall_adc_at_10,
           n_overlap_rerank,
           CAST(n_overlap_rerank AS DOUBLE) / 10 AS recall_rerank_at_10
    FROM a1, a2
    """,
)


def _simpqr(spark, sf_dir):
    """PQ quality as hash-checked VALUES, both regimes: raw ADC top-10
    (codes only — recall 0.3 on this corpus, the honest compressed-
    domain number) and ADC-candidates + exact rerank at depth 100 (the
    production pattern — recall 1.0 here). Exact top-10 is the cosine
    brute force; unit-norm corpus makes L2 and cosine rankings agree."""
    from ..ops import pq

    e = t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0)
    pq_top = pq.pq_adc_topk(e, qrow, k_top=10, refine=1).select("vec_id")
    rr_top = pq.pq_adc_rerank_topk(e, qrow, k_top=10, cand_depth=100, refine=1).select(
        "vec_id"
    )
    qv = qrow.agg(F.first("embedding").alias("qv"))
    exact_top = (
        e.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            similarity.cosine(F.col("embedding"), F.col("qv")).alias("__c"),
        )
        .orderBy(F.desc("__c"), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    a1 = pq_top.join(exact_top, "vec_id").agg(
        F.count("*").alias("n_overlap_adc"),
        (F.count("*").cast("double") / F.lit(10.0)).alias("recall_adc_at_10"),
    )
    a2 = rr_top.join(exact_top, "vec_id").agg(
        F.count("*").alias("n_overlap_rerank"),
        (F.count("*").cast("double") / F.lit(10.0)).alias("recall_rerank_at_10"),
    )
    return a1.crossJoin(a2).select(
        "n_overlap_adc", "recall_adc_at_10", "n_overlap_rerank", "recall_rerank_at_10"
    )


CATALOG["sim_pq_recall_report"].fn = _simpqr


register(
    "sketch_cardinality_profile",
    # Bounded-error contract instead of rows-only: sketch internals are
    # engine-specific so the ESTIMATE can never hash-match, but the
    # exact distinct count can, and "estimate within 5x rsd of exact"
    # is a hard boolean both engines agree on. The oracle asserts the
    # exact values AND within_bound = TRUE — a red row now means the
    # sketch actually broke its bound, not that sketches are sketches.
    oracle="""
    SELECT col_name, exact_distinct, TRUE AS within_bound FROM (
      SELECT 'l_orderkey' AS col_name,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem
      UNION ALL
      SELECT 'l_partkey', CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem
    ) ORDER BY col_name
    """,
)


def _sketch(spark, sf_dir):
    """HLL++ cardinality profile as a bounded-error gate query: one agg
    pass computes the approx (rsd=0.02) AND exact distinct per column,
    then each column becomes a row (col_name, exact_distinct,
    within_bound) with within_bound = relative error <= 0.10 (5x rsd —
    HLL++ lives within 3 sigma in practice, so the slack never flakes
    while still catching a broken sketch). At 100 TB you run ONLY the
    approx side (ops/sketches.cardinality_profile); the exact twin here
    is what makes the sketch's error claim driver-verifiable."""
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"]
    li = t(spark, sf_dir, "lineitem")
    row = li.agg(
        *[F.approx_count_distinct(c, 0.02).alias(f"a_{c}") for c in cols],
        *[F.count_distinct(F.col(c)).alias(f"e_{c}") for c in cols],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"e_{c}").cast("bigint").alias("exact_distinct"),
                (
                    F.abs(F.col(f"a_{c}") - F.col(f"e_{c}"))
                    / F.col(f"e_{c}")
                    <= F.lit(0.10)
                ).alias("within_bound"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.explode(pairs).alias("r")).select("r.*").orderBy("col_name")
    )


CATALOG["sketch_cardinality_profile"].fn = _sketch

register(
    "sketch_topk_priorities",
    oracle="""
    SELECT o_orderpriority AS item, COUNT(*) AS est_count
    FROM orders GROUP BY o_orderpriority
    ORDER BY est_count DESC, item
    """,
)


def _sketch_topk(spark, sf_dir):
    """DataSketches approx_top_k over order priorities. Oracle-EXACT
    here: the frequent-items sketch is provably exact while distinct
    items (5) stay under maxItemsTracked (10k) — at 100 TB the same
    one-pass aggregate degrades gracefully to approximate instead of
    shuffling every distinct value."""
    from ..ops.sketches import approx_top_k

    o = t(spark, sf_dir, "orders")
    return approx_top_k(o, "o_orderpriority", k=5).orderBy(
        F.desc("est_count"), "item"
    )


CATALOG["sketch_topk_priorities"].fn = _sketch_topk

register(
    "sketch_hll_mergeable_daily",
    # bounded-error contract (see sketch_cardinality_profile): the
    # merged-sketch ESTIMATE is engine-specific, the exact count and
    # the error-bound boolean are not
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
           TRUE AS within_bound
    FROM events
    """,
)


def _sketch_hll(spark, sf_dir):
    """Re-aggregatable distinct users, driver-verifiable: per-day
    DataSketches HLL binaries (lgK=12, rsd ~1.6%) union-merge into one
    estimate; the gate row carries the EXACT distinct count plus
    within_bound = |est - exact|/exact <= 0.08 (5x rsd). The two-level
    shape — store per-partition sketch bytes, merge on demand — is what
    replaces full-table COUNT(DISTINCT) rescans at 100 TB; the exact
    twin exists only to make the sketch's error claim checkable."""
    from ..ops.sketches import hll_merge_estimate, hll_partial_sketches

    e = t(spark, sf_dir, "events").withColumn("__day", F.to_date("ts"))
    daily = hll_partial_sketches(e, "__day", "user_id")
    est = hll_merge_estimate(daily)  # 1 row
    exact = e.agg(F.count_distinct("user_id").alias("__exact"))  # 1 row
    return exact.crossJoin(F.broadcast(est)).select(
        F.col("__exact").cast("bigint").alias("exact_distinct_users"),
        (
            F.abs(F.col("distinct_estimate") - F.col("__exact")) / F.col("__exact")
            <= F.lit(0.08)
        ).alias("within_bound"),
    )


CATALOG["sketch_hll_mergeable_daily"].fn = _sketch_hll

register(
    "heavy_hitters_event_types",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT event_type, COUNT(*) AS cnt,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS share
    FROM events GROUP BY event_type
    HAVING COUNT(*) >= (SELECT n FROM tot) * 0.01
    ORDER BY cnt DESC, event_type
    """,
)


def _hh(spark, sf_dir):
    """Heavy hitters (values with >= 1% share), two-level aggregation."""
    from ..ops.sketches import heavy_hitters

    e = t(spark, sf_dir, "events")
    return heavy_hitters(e, "event_type", min_share=0.01)


CATALOG["heavy_hitters_event_types"].fn = _hh

register(
    "j4_null_safe_join",
    oracle="""
    WITH a AS (SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg FROM customer),
         b AS (SELECT DISTINCT nullif(c_mktsegment, 'MACHINERY') AS seg,
                      CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NULL
                           THEN 'unsegmented' ELSE 'segmented' END AS label
               FROM customer)
    SELECT a.c_custkey, b.label
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)


def _j4(spark, sf_dir):
    """Null-safe equi-join (<=>): null keys match null keys — the
    semantics the reference's != comparisons get wrong (SURVEY §7.4.1)."""
    c = t(spark, sf_dir, "customer")
    a = c.select("c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"))
    b = (
        c.select(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"))
        .distinct()
        .withColumn(
            "label", F.when(F.col("seg").isNull(), "unsegmented").otherwise("segmented")
        )
    )
    return a.alias("a").join(
        F.broadcast(b).alias("b"), F.col("a.seg").eqNullSafe(F.col("b.seg"))
    ).select("a.c_custkey", "b.label")


CATALOG["j4_null_safe_join"].fn = _j4

register(
    "q4_semi_join_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


def _q4(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS -> left_semi join (no row duplication, the
    probe side short-circuits per key)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


CATALOG["q4_semi_join_priority"].fn = _q4

register(
    "q14_conditional_ratio",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                       (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)


def _q14(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation ratio over a broadcast
    part join, decimal-exact numerator and denominator."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast(DEC) * (one - F.col("l_discount").cast(DEC))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast(DEC))
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
            "promo_revenue_pct"
        )
    )


CATALOG["q14_conditional_ratio"].fn = _q14

register(
    "q18_having_large_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY total_qty DESC, o.o_orderkey LIMIT 100
    """,
)


def _q18(spark, sf_dir):
    """TPC-H Q18 shape: aggregate + HAVING (post-aggregation filter) +
    top-k."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    g = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__q"))
        .filter(F.col("__q") > 150)
    )
    return (
        g.select("o_orderkey", "o_custkey", F.col("__q").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


CATALOG["q18_having_large_orders"].fn = _q18

