"""Split from queries.py lines 1301-2534 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, F, dedup, register, similarity, t, text

# ===========================================================================
# LLM-data-pipeline operators: dedup / text / similarity
# ===========================================================================

register(
    "dedup_exact_docs",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY text
    """,
    bench=True,
)


def _dexact(spark, sf_dir):
    """Exact dedup by content hash; one shuffle on the hashed text."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    d = t(spark, sf_dir, "documents", fan_out=False)
    return dedup.exact_dedup(d, ["text"], "doc_id")


CATALOG["dedup_exact_docs"].fn = _dexact

register(
    "doc_fingerprint_dedup",
    oracle="""
    SELECT sha256(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                      ' +', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)


def _dfp(spark, sf_dir):
    """Normalized-text fingerprint dedup (case/punct-insensitive)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(text.fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_count"))
    )


CATALOG["doc_fingerprint_dedup"].fn = _dfp

register(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)


def _dtok(spark, sf_dir):
    """Token counting + punctuation profile (text-analysis family)."""
    d = t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        text.token_count(c).cast("long").alias("n_tokens"),
        F.regexp_count(c, F.lit(r"[.,;:!?]")).cast("long").alias("n_punct"),
        F.length(c).cast("long").alias("n_chars_measured"),
    )


CATALOG["doc_token_stats"].fn = _dtok

_LANG_CASE_SQL = """
    WITH scored AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is)\\b')) AS s_en,
             len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|los|es)\\b')) AS s_es,
             len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ein|ist|nicht)\\b')) AS s_de,
             len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des|un|est)\\b')) AS s_fr
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
                WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
"""

register("doc_lang_id", oracle=_LANG_CASE_SQL)


def _dlang(spark, sf_dir):
    """Stopword-heuristic language ID with deterministic tie-break."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.lang_id(F.col("text")).alias("lang_pred"))


CATALOG["doc_lang_id"].fn = _dlang

register(
    "doc_quality_score",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS punct,
             CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is)\\b')) AS BIGINT) AS stop,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           LEAST(CAST(toks AS DOUBLE) / 50.0, 1.0) * 0.4
           + LEAST((CAST(stop AS DOUBLE) / toks) * 5.0, 1.0) * 0.3
           + GREATEST(1.0 - (CAST(punct AS DOUBLE) / n_chars) * 10.0, 0.0) * 0.3
               AS quality_score
    FROM f
    """,
)


def _dqual(spark, sf_dir):
    """Composite document quality score (deterministic arithmetic)."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", text.quality_score(F.col("text")).alias("quality_score"))


CATALOG["doc_quality_score"].fn = _dqual

register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, lang, n_chars // 100 AS len_bucket,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
             / len(list_distinct(list_concat(a.tk, b.tk))) AS jaccard
    FROM toks a JOIN toks b
      ON a.source = b.source AND a.lang = b.lang
         AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
             / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.2
    """,
    bench=True,
)


def _djac(spark, sf_dir):
    """Token-set Jaccard near-dup pairs within (source, lang, length-
    bucket) blocks — the length bucket is standard near-dup blocking
    (near-dups have similar length) and bounds the pair space."""
    d = t(spark, sf_dir, "documents").withColumn("len_bucket", F.expr("n_chars div 100"))
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", ["source", "lang", "len_bucket"], threshold=0.2
    )


CATALOG["ngram_jaccard_pairs"].fn = _djac

register(
    "ngram_containment_pairs",
    # containment = |A∩B| / min(|A|,|B|): the asymmetric near-dup
    # measure that catches SUBSET duplication (a short doc quoted whole
    # inside a longer one scores ~1 here, low on Jaccard). Blocks drop
    # the length bucket deliberately — containment pairs docs of very
    # different lengths, which is exactly what length-blocking assumes
    # away for Jaccard.
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, lang,
             list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
             / least(len(a.tk), len(b.tk)) AS containment
    FROM toks a JOIN toks b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
             / least(len(a.tk), len(b.tk)) >= 0.6
    """,
)


def _dcont(spark, sf_dir):
    """Token-set containment near-dup pairs (ops/dedup.
    ngram_containment_pairs) within (source, lang) blocks at >= 0.6 —
    quote/boilerplate/partial-scrape detection, the asymmetric
    complement to the Jaccard entry (NO length-bucket blocking: subset
    duplication pairs short docs with long ones)."""
    d = t(spark, sf_dir, "documents")
    return dedup.ngram_containment_pairs(
        d, "doc_id", "text", ["source", "lang"], threshold=0.6
    )


CATALOG["ngram_containment_pairs"].fn = _dcont

# Shared ER fixture + blocked-pair skeleton: parts + planted typo twins
# (pid+1000000, first char -> 'z' for partkey%7==0) and the capped
# (brand, name-length) pair join — single-sourced for the fuzzy-pair
# query AND the golden-record pipeline so the planted recipe and the
# blocking can never drift between copies. The cap mirrors
# ops/pairs.pairs_within_groups' hot-block guard EXACTLY (blocks over
# DEFAULT_MAX_BLOCK keep only their smallest-id members), so the oracle
# stays engine-exact at every scale instead of silently diverging the
# first time a block outgrows the cap.
_ER_TWIN_BASE_SQL = """base AS MATERIALIZED (
      SELECT p_partkey AS pid, p_name, p_brand, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM part
      UNION ALL
      SELECT p_partkey + 1000000, 'z' || substr(p_name, 2), p_brand, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
      FROM part WHERE p_partkey % 7 = 0
    )"""

_ER_PAIRS_SQL = f"""capped AS (
      SELECT * FROM (
        SELECT pid, p_name, p_brand,
               ROW_NUMBER() OVER (PARTITION BY p_brand, len(p_name)
                                  ORDER BY pid) AS __rn
        FROM base
      ) WHERE __rn <= {{max_block}}
    ),
    pairs AS MATERIALIZED (
      SELECT a.pid AS id_a, b.pid AS id_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
      FROM capped a JOIN capped b
        ON a.p_brand = b.p_brand AND len(a.p_name) = len(b.p_name)
       AND a.pid < b.pid
      WHERE levenshtein(a.p_name, b.p_name) <= 1
    )"""


def _twin_base(spark, sf_dir):
    """Spark twin of _ER_TWIN_BASE_SQL: parts + planted typo twins with
    exact cents — shared by fuzzy_part_name_pairs and
    er_part_golden_records."""
    p = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        "p_name",
        "p_brand",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("price_cents"),
    )
    twins = p.filter(F.col("pid") % 7 == 0).select(
        (F.col("pid") + 1000000).alias("pid"),
        F.concat(F.lit("z"), F.substring("p_name", 2, 1000)).alias("p_name"),
        "p_brand",
        "p_size",
        "price_cents",
    )
    return p.unionByName(twins)


def _twin_fuzzy_pairs(base):
    """Spark twin of _ER_PAIRS_SQL: blocked Levenshtein <= 1 pairs over
    the twin base, with ops/pairs' default hot-block cap (which the SQL
    mirrors member-for-member)."""
    return dedup.fuzzy_string_pairs(
        base.select("pid", "p_name", "p_brand").withColumn("__len", F.length("p_name")),
        "pid",
        "p_name",
        ["p_brand", "__len"],
        max_distance=1,
    )


register(
    "fuzzy_part_name_pairs",
    # entity-resolution fuzzy match: parts + planted one-character typo
    # twins (first char -> 'z' for partkey%7==0), blocked on (brand,
    # name length) — a substitution typo preserves both — and paired at
    # Levenshtein <= 1. Both engines ship the same unit-cost
    # levenshtein built-in, so distances hash-match exactly; the oracle
    # carries the SAME hot-block cap as ops/pairs, so parity holds at
    # any scale.
    oracle=f"""
    WITH {_ER_TWIN_BASE_SQL},
    {_ER_PAIRS_SQL.format(max_block=dedup.DEFAULT_MAX_BLOCK)}
    SELECT id_a, id_b, distance FROM pairs
    """,
)


def _dfuzzy(spark, sf_dir):
    """Blocked Levenshtein fuzzy-match pairs (ops/dedup.
    fuzzy_string_pairs): the entity-resolution dedup for names/titles
    where token-set measures are too coarse. Typo twins are planted
    (first char swapped) so distance-1 recovery is actually exercised,
    not just distance-0 duplicates; blocking on (brand, length) keeps
    the pair space bounded while guaranteeing the planted pairs stay
    co-blocked. Base and pair skeleton shared with the golden-record
    pipeline (_twin_base/_twin_fuzzy_pairs)."""
    out = _twin_fuzzy_pairs(_twin_base(spark, sf_dir))
    return out.select("id_a", "id_b", F.col("distance").cast("int").alias("distance"))


CATALOG["fuzzy_part_name_pairs"].fn = _dfuzzy

register(
    "dup_clusters_ngram",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, lang, n_chars // 100 AS len_bucket,
               list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
        FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b
        ON a.source = b.source AND a.lang = b.lang
           AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
               / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.2
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster FROM walk GROUP BY id
    """,
)


def _dclust(spark, sf_dir):
    """Duplicate CLUSTERS from the oracle-able jaccard pair set: an
    iterative distributed algorithm (label propagation to the component
    min, lineage-truncated per round — ops/graph.py) checked EXACTLY
    against DuckDB's recursive-CTE transitive closure. The step between
    pairwise near-dup output and 'keep one representative per cluster'."""
    from ..ops import graph

    d = t(spark, sf_dir, "documents").withColumn("len_bucket", F.expr("n_chars div 100"))
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", ["source", "lang", "len_bucket"], threshold=0.2
    )
    return graph.connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("cluster")
    )


CATALOG["dup_clusters_ngram"].fn = _dclust

register(
    "docs_dedup_representatives",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, source, lang, n_chars // 100 AS len_bucket,
               list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tk
        FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM toks a JOIN toks b
        ON a.source = b.source AND a.lang = b.lang
           AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
               / len(list_distinct(list_concat(a.tk, b.tk))) >= 0.2
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    walk(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.src, w.lab FROM edges e JOIN walk w ON e.dst = w.id
    ),
    clusters AS (SELECT id, MIN(lab) AS cluster FROM walk GROUP BY id)
    SELECT d.doc_id, d.source, d.lang
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.id
    WHERE c.id IS NULL OR d.doc_id = c.cluster
    """,
)


def _dreps(spark, sf_dir):
    """Near-dup REMOVAL end-to-end: jaccard pairs -> connected
    components -> keep the min-id representative per cluster plus all
    untouched documents. The full 'dedup a training corpus' flow as one
    oracle-checked query."""
    from ..ops import graph

    d = t(spark, sf_dir, "documents").withColumn("len_bucket", F.expr("n_chars div 100"))
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", ["source", "lang", "len_bucket"], threshold=0.2
    )
    return graph.keep_cluster_representative(d, pairs, "doc_id").select(
        "doc_id", "source", "lang"
    )


CATALOG["docs_dedup_representatives"].fn = _dreps

_HASH01_SQL = (
    "('0x' || substr(sha256(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT / 4294967296.0"
)

register(
    "sample_docs_stratified",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_HASH01_SQL.format(key="doc_id")}
          < CASE WHEN lang = 'en' THEN 0.3 WHEN lang = 'zh' THEN 1.0 ELSE 0.5 END
    """,
)


def _dsample(spark, sf_dir):
    """Deterministic stratified corpus sampling (downsample the
    overrepresented language): membership is a pure function of the row
    key, so the sample is bit-identical across engines, partitionings
    and re-runs — which is what makes it auditable training data. The
    DuckDB oracle recomputes the same sha2-based draw."""
    from ..ops import sampling

    d = t(spark, sf_dir, "documents")
    return sampling.stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.3, "zh": 1.0}, default=0.5
    ).select("doc_id", "lang", "source")


CATALOG["sample_docs_stratified"].fn = _dsample

register(
    "sample_orders_split",
    oracle=f"""
    SELECT CASE WHEN {_HASH01_SQL.format(key="o_orderkey")} < 0.8 THEN 'train'
                WHEN {_HASH01_SQL.format(key="o_orderkey")} < 0.9 THEN 'eval'
                ELSE 'test' END AS split,
           COUNT(*) AS n
    FROM orders GROUP BY split ORDER BY split
    """,
)


def _dsplit(spark, sf_dir):
    """Train/eval/test carving from ONE hash draw: disjoint, exhaustive,
    stable under re-partitioning (randomSplit is none of these)."""
    from ..ops import sampling

    o = t(spark, sf_dir, "orders")
    parts = sampling.hash_split(o, "o_orderkey", [0.8, 0.1, 0.1])
    labeled = [
        p.select(F.lit(name).alias("split"))
        for p, name in zip(parts, ["train", "eval", "test"])
    ]
    out = labeled[0]
    for p in labeled[1:]:
        out = out.unionByName(p)
    return out.groupBy("split").agg(F.count("*").alias("n")).orderBy("split")


CATALOG["sample_orders_split"].fn = _dsplit

register(
    "doc_chunk_windows",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
      WHERE length(trim(text)) > 0
    ),
    ch AS (
      SELECT doc_id, tk,
             CAST(unnest(range(CAST(GREATEST(ceil((len(tk) - 8) / 24.0), 1) AS BIGINT))) AS INT)
                 AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id,
           array_to_string(list_slice(tk, chunk_id * 24 + 1, chunk_id * 24 + 32), ' ')
               AS chunk_text,
           CAST(len(list_slice(tk, chunk_id * 24 + 1, chunk_id * 24 + 32)) AS BIGINT)
               AS n_tokens
    FROM ch
    """,
)


def _dchunk(spark, sf_dir):
    """Context-window chunking: 32-token windows with 8 tokens of
    overlap (stride 24); the trainer-facing split of long documents.
    One narrow explode, no shuffle, exact SQL oracle."""
    from ..ops import packing

    d = t(spark, sf_dir, "documents")
    return packing.chunk_documents(d, "doc_id", "text", chunk_tokens=32, overlap=8)


CATALOG["doc_chunk_windows"].fn = _dchunk

register(
    "doc_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
             CAST(floor(({_HASH01_SQL.format(key="doc_id")}) * 8) AS INT) AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           bucket * 1000000 + CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0) AS BIGINT)
               AS seq_id,
           n_tokens
    FROM d
    """,
)


def _dpack(spark, sf_dir):
    """Sequence packing: bucket-parallel running-total layout of
    documents into 256-token training sequences. The whole layout is a
    deterministic function of (id, token count), so DuckDB reproduces
    it bit-for-bit — auditability a sampled/greedy packer can't give."""
    from ..ops import packing, text as _text

    d = t(spark, sf_dir, "documents").select(
        "doc_id", _text.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return packing.pack_sequences(d, "doc_id", "n_tokens", budget=256, n_buckets=8)


CATALOG["doc_pack_sequences"].fn = _dpack

register(
    "doc_pii_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, 'https?://[^\\s]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d .-]{7,}\\d', '<PHONE>', 'g') AS redacted
    FROM documents WHERE text IS NOT NULL
    """,
)


def _dpii(spark, sf_dir):
    """Corpus-safety pass: URL/email/IP/phone scrubbing as a chain of
    JVM regexp_replace calls (RE2-compatible patterns, so DuckDB runs
    the identical regexes). The unit tests exercise each PII class; the
    oracle proves cross-engine regex parity on the whole corpus."""
    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", text.redact_pii(F.col("text")).alias("redacted"))


CATALOG["doc_pii_redact"].fn = _dpii

register(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
      WHERE length(trim(text)) > 0
        AND len(regexp_split_to_array(lower(trim(text)), '\\s+')) > 1
    ),
    bg AS (
      SELECT doc_id, len(tk) AS n_tok, len(list_distinct(tk)) AS n_distinct,
             unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS bg
      FROM toks
    ),
    cnt AS (
      SELECT doc_id, bg, COUNT(*) AS c, FIRST(n_tok) AS n_tok,
             FIRST(n_distinct) AS n_distinct
      FROM bg GROUP BY doc_id, bg
    )
    SELECT doc_id,
           CAST(MAX(c) AS DOUBLE) / CAST(FIRST(n_tok) - 1 AS DOUBLE) AS top_bigram_frac,
           CAST(FIRST(n_distinct) AS DOUBLE) / CAST(FIRST(n_tok) AS DOUBLE)
               AS distinct_token_frac
    FROM cnt GROUP BY doc_id
    """,
)


def _drep(spark, sf_dir):
    """Gopher/Dolma-style repetition filter inputs: top-bigram share and
    distinct-token share per document, two partial-aggregated shuffles."""
    d = t(spark, sf_dir, "documents")
    return text.repetition_stats(d, "doc_id", "text")


CATALOG["doc_repetition_stats"].fn = _drep

# Non-SQL-reproducible dedups (xxhash64-based) -> rows-only checks.
register("minhash_dup_pairs", oracle=None, bench=True)


def _dmh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (deterministic seeds, no oracle —
    xxhash64 has no DuckDB equivalent)."""
    d = t(spark, sf_dir, "documents")
    return dedup.minhash_dup_pairs(d, "doc_id", "text", num_perm=32, bands=8, jaccard_threshold=0.5)


CATALOG["minhash_dup_pairs"].fn = _dmh

register("simhash_dup_pairs", oracle=None, bench=True)


def _dsh(spark, sf_dir):
    """SimHash near-dup pairs (rows-only check; murmur/xxhash not portable)."""
    d = t(spark, sf_dir, "documents")
    return dedup.simhash_dup_pairs(d, "doc_id", "text", max_hamming=3)


CATALOG["simhash_dup_pairs"].fn = _dsh

# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_DOT_SQL = """list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"""
_NORM_SQL_E = "list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
_NORM_SQL_Q = "list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           {_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})) AS cosine_sim
    FROM embeddings e, q
    ORDER BY cosine_sim DESC, e.vec_id LIMIT 10
    """,
    bench=True,
)


def _simbf(spark, sf_dir):
    """Brute-force cosine top-k against the vec_id=0 query vector."""
    # r15 opt round: pre-exchange work here is pushed filters /
    # trivial projections — the local fan-out exchange parallelized
    # nothing and cost a stage-job + a full serialization round (A/B)
    e = t(spark, sf_dir, "embeddings", fan_out=False)
    qvec = F.first(F.col("embedding"))
    q = e.filter(F.col("vec_id") == 0).agg(qvec.alias("qv"))
    joined = e.crossJoin(F.broadcast(q))
    scored = joined.select(
        "vec_id", similarity.cosine(F.col("embedding"), F.col("qv")).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(10)


CATALOG["sim_bruteforce_topk"].fn = _simbf

register(
    "sim_quantized_topk",
    # int8-quantized ANN: the corpus quantizes to 8-bit lattice points
    # (floor(x/scale + 0.5), clamped — floor(+0.5) because HALF_UP vs
    # banker's round() differs across engines) and cosine runs directly
    # on the int arrays (per-vector scale cancels in cosine). The
    # oracle reproduces the exact lattice, so this is value-checked,
    # not recall-checked — the recall-vs-float comparison lives in
    # tests/test_similarity_recall.py.
    oracle="""
    WITH qz AS (
      SELECT vec_id, embedding,
             CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) = 0
                  THEN 1.0
                  ELSE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127
             END AS scale
      FROM embeddings
    ),
    qi AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> LEAST(127, GREATEST(-127,
                      CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)))) AS q8
      FROM qz
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           list_sum(list_transform(range(1, 65),
               i -> CAST(e.q8[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
           / (CASE WHEN list_sum(list_transform(e.q8, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
                   THEN 1.0
                   ELSE SQRT(list_sum(list_transform(e.q8, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              END
              * SQRT(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
           AS cosine_sim_q8
    FROM qi e, q
    ORDER BY cosine_sim_q8 DESC, e.vec_id LIMIT 10
    """,
)


def _simq8(spark, sf_dir):
    """Cosine top-k over the int8-QUANTIZED corpus (ops/similarity.
    quantize_embeddings): 4x smaller vectors in storage and shuffle,
    cosine scored directly on the int arrays (scale cancels), exact
    same TakeOrdered plan as the float baseline. The oracle reproduces
    the quantized lattice bit-for-bit; recall vs float is bounded in
    tests (int8 on 64-dim unit vectors costs <1 of the top-10)."""
    e = t(spark, sf_dir, "embeddings")
    qz = similarity.quantize_embeddings(e, "vec_id", "embedding")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    joined = qz.crossJoin(F.broadcast(q))
    scored = joined.select(
        "vec_id",
        similarity.cosine(F.col("q8"), F.col("qv")).alias("cosine_sim_q8"),
    )
    return scored.orderBy(F.desc("cosine_sim_q8"), "vec_id").limit(10)


CATALOG["sim_quantized_topk"].fn = _simq8

_SAFE_NORM_SQL = lambda col: (  # noqa: E731
    f"CASE WHEN SQRT(list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0"
    f" THEN 1.0"
    f" ELSE SQRT(list_sum(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END"
)

register(
    "sim_hard_negatives",
    # Contrastive-training hard-negative mining: per query vector, the
    # top-5 most-similar vectors with a DIFFERENT label. Broadcast query
    # side, one map pass over the corpus, per-qid rank window; scores
    # round to 6 dp before ranking so the edge set is engine-exact.
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe, label AS qlabel,
             {_SAFE_NORM_SQL('embedding')} AS qn
      FROM embeddings WHERE vec_id < 8
    ),
    cand AS (
      SELECT q.qid, e.vec_id,
             round(list_sum(list_transform(range(1, 65), i ->
                 CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
               / ({_SAFE_NORM_SQL('e.embedding')} * q.qn), 6) AS cosine_sim
      FROM embeddings e, q
      WHERE e.label <> q.qlabel
    )
    SELECT qid, vec_id, neg_rank, cosine_sim FROM (
      SELECT cand.*,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine_sim DESC, vec_id) AS neg_rank
      FROM cand
    ) WHERE neg_rank <= 5
    """,
)


def _simhn(spark, sf_dir):
    """Hard-negative mining (ops/similarity.hard_negative_topk): for each
    of the 8 lowest-id query vectors, the 5 nearest corpus vectors whose
    label differs — the near-miss negatives a contrastive loss learns
    from. NULL labels are excluded by <> on both engines."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = similarity.hard_negative_topk(e, q, k=5, score_dp=6)
    return out.select(
        "qid", "vec_id", F.col("rank").cast("long").alias("neg_rank"), "cosine_sim"
    )


CATALOG["sim_hard_negatives"].fn = _simhn

def _pq_enc_pair_sql(cb: str, encd: str, enc: str) -> str:
    """encd/enc CTE pair: 6-dp sub-distances to every ``cb`` entry, then
    the per-(vec, sub) argmin code (ties -> lowest code)."""
    return f"""{encd} AS (
      SELECT e.vec_id, {cb}.sub, {cb}.code,
             round(list_sum(list_transform(range(1, 9), i ->
               (CAST(e.embedding[{cb}.sub * 8 + i] AS DOUBLE) - {cb}.cvec[i])
               * (CAST(e.embedding[{cb}.sub * 8 + i] AS DOUBLE) - {cb}.cvec[i]))), 6) AS d6
      FROM embeddings e CROSS JOIN {cb}
    ),
    {enc} AS (
      SELECT vec_id, sub, code FROM (
        SELECT {encd}.*,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d6, code) AS rn
        FROM {encd}
      ) WHERE rn = 1
    )"""


# Shared PQ chain (ops/pq.py twin): zero-RNG seed codebooks -> round-0
# codes -> ONE Lloyd refinement (per-dim 6-dp-rounded means, starved
# codes keep their seed) -> round-1 codes + integer micro-unit ADC table.
_PQ_CTES = f"""seeds AS (
      SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    cb0 AS (
      SELECT s.sub, seeds.code,
             list_transform(range(1, 9),
                            i -> CAST(seeds.embedding[s.sub * 8 + i] AS DOUBLE)) AS cvec
      FROM seeds, range(0, 8) AS s(sub)
    ),
    {_pq_enc_pair_sql("cb0", "encd0", "enc0")},
    cent1 AS (
      SELECT enc0.sub, enc0.code, p.pos,
             round(AVG(CAST(e.embedding[enc0.sub * 8 + p.pos] AS DOUBLE)), 6) AS mval
      FROM enc0 JOIN embeddings e USING (vec_id)
      CROSS JOIN (SELECT unnest(range(1, 9)) AS pos) p
      GROUP BY enc0.sub, enc0.code, p.pos
    ),
    cb1v AS (
      SELECT sub, code, list(mval ORDER BY pos) AS cvec FROM cent1 GROUP BY sub, code
    ),
    cb1 AS (
      SELECT cb0.sub, cb0.code, COALESCE(cb1v.cvec, cb0.cvec) AS cvec
      FROM cb0 LEFT JOIN cb1v USING (sub, code)
    ),
    {_pq_enc_pair_sql("cb1", "encd1", "enc1")},
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    adc AS (
      SELECT cb1.sub, cb1.code,
             CAST(floor(round(list_sum(list_transform(range(1, 9), i ->
               (CAST(q.embedding[cb1.sub * 8 + i] AS DOUBLE) - cb1.cvec[i])
               * (CAST(q.embedding[cb1.sub * 8 + i] AS DOUBLE) - cb1.cvec[i]))), 6)
               * 1e6 + 0.5) AS BIGINT) AS micro
      FROM cb1, q
    )"""

register(
    "sim_pq_adc_topk",
    # Product quantization + asymmetric distance: 4-bit codes (m=8
    # subspaces x k=16 entries) instead of 256-byte vectors, queries
    # scored via an ADC lookup table. Zero-RNG codebooks (subvectors of
    # the 16 lowest-id vectors) + ONE Lloyd refinement, 6-dp code
    # selection, integer micro-unit ADC sums — the full chain incl. the
    # k-means step is engine-exact, so this is value-checked
    # compression, not a rows-only sketch. See ops/pq.py.
    oracle=f"""
    WITH {_PQ_CTES}
    SELECT enc1.vec_id, CAST(SUM(adc.micro) AS DOUBLE) / 1e6 AS approx_dist
    FROM enc1 JOIN adc USING (sub, code)
    GROUP BY enc1.vec_id
    ORDER BY approx_dist, enc1.vec_id
    LIMIT 10
    """,
    bench=True,
)


def _simpq(spark, sf_dir):
    """PQ-ADC approximate top-10 nearest to the vec_id=0 query: corpus
    stored as 8 x 4-bit codes (64x compression), one Lloyd-refined
    codebook, distances summed from a broadcast ADC table in exact
    integer micro-units (ops/pq.py)."""
    from ..ops import pq

    e = t(spark, sf_dir, "embeddings")
    # the one-row query broadcasts: a separate non-fan-out read keeps
    # the vec_id=0 filter at the scan instead of above an exchange
    q = t(spark, sf_dir, "embeddings", fan_out=False).filter(F.col("vec_id") == 0)
    return pq.pq_adc_topk(e, q, k_top=10, refine=1)


CATALOG["sim_pq_adc_topk"].fn = _simpq

# generated from the SAME seeded Gaussian plane literals as the Spark
# expression (ops/similarity.sign_bucket), so both engines bucket alike
_BUCKET_SQL_E = similarity.sign_bucket_sql("e.embedding", 8)
_BUCKET_SQL_Q = similarity.sign_bucket_sql("q.embedding", 8)

register(
    "sim_lsh_topk",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           {_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})) AS cosine_sim
    FROM embeddings e, q
    WHERE {_BUCKET_SQL_E} = {_BUCKET_SQL_Q}
    ORDER BY cosine_sim DESC, e.vec_id LIMIT 10
    """,
)


def _simlsh(spark, sf_dir):
    """Sign-LSH bucketed approximate top-k (scale path: bucket is a
    partition-prunable key)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    joined = e.crossJoin(F.broadcast(q))
    filtered = joined.filter(
        similarity.sign_bucket(F.col("embedding"), 8) == similarity.sign_bucket(F.col("qv"), 8)
    )
    scored = filtered.select(
        "vec_id", similarity.cosine(F.col("embedding"), F.col("qv")).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(10)


CATALOG["sim_lsh_topk"].fn = _simlsh

_DIST_SQL = lambda a, b: (  # noqa: E731
    f"list_sum(list_transform(range(1, 65), i -> "
    f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)

register(
    "sim_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_DIST_SQL('e.embedding', 'c.cvec')}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ), q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    probe AS (
      SELECT cid FROM cent, q
      ORDER BY {_DIST_SQL('cent.cvec', 'q.embedding')}, cid LIMIT 4
    )
    SELECT e.vec_id,
           {_DOT_SQL} / (SQRT({_NORM_SQL_E}) * SQRT({_NORM_SQL_Q})) AS cosine_sim
    FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
                      JOIN probe p ON a.cid = p.cid, q
    ORDER BY cosine_sim DESC, e.vec_id LIMIT 10
    """,
)


def _simivf(spark, sf_dir):
    """IVF-flat approximate top-k: deterministic seeded centroids, probe
    the 4 nearest cells, brute-force inside (ops/similarity.ivf_topk)."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).agg(F.first("embedding").alias("qv"))
    joined = e.crossJoin(F.broadcast(q))
    # rebuild with the query vec as a correlated column for exact parity
    from ..ops.similarity import brute_force_topk, ivf_assign, l2_dist_sq

    cent, assign = ivf_assign(e, "vec_id", "embedding", 16)
    probe = (
        cent.crossJoin(F.broadcast(q))
        .withColumn("__d", l2_dist_sq(F.col("cvec"), F.col("qv")))
        .orderBy("__d", "cid")
        .limit(4)
        .select("cid")
    )
    cand = joined.join(assign, "vec_id").join(F.broadcast(probe), "cid")
    scored = cand.select(
        "vec_id", similarity.cosine(F.col("embedding"), F.col("qv")).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), "vec_id").limit(10)


CATALOG["sim_ivf_topk"].fn = _simivf

_EMB_BAND_SQL = similarity.banded_bucket_sql("embedding", bits=6, bands=3)

register(
    "emb_dup_pairs",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             list_sum(list_transform(range(1, 65), i ->
                 CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (a.n * c.n) AS cosine_sim
      FROM b a JOIN b c
        ON a.vec_id < c.vec_id
       AND (a.bkt0 = c.bkt0 OR a.bkt1 = c.bkt1 OR a.bkt2 = c.bkt2)
    ) WHERE cosine_sim >= 0.35
    """,
)


def _embdup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (banded sign-LSH candidates +
    exact verify; OR-of-bands in the oracle matches the Spark union of
    per-band equi-joins). Threshold 0.35 because the synthetic
    embeddings are isotropic (max pairwise cosine ~0.5)."""
    e = t(spark, sf_dir, "embeddings")
    return similarity.embedding_dup_pairs(e, threshold=0.35, bits=6, bands=3)


CATALOG["emb_dup_pairs"].fn = _embdup

# Generic 6-dp cosine between two aliased embedding rows with
# precomputed norms — the rounding is what makes BLAS-computed Spark
# scores and fold-computed DuckDB scores hash-identical (raw doubles
# differ at ~1e-15 between summation orders).
def _cos6_sql(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"round(list_sum(list_transform(range(1, 65), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / ({na} * {nb}), 6)"
    )


_EN_NORM_SQL = (
    "SQRT(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)

register(
    "sim_knn_join",
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
    )
    SELECT left_id, right_id, cosine_sim FROM (
      SELECT o.*, ROW_NUMBER() OVER (PARTITION BY left_id
                                     ORDER BY cosine_sim DESC, right_id) AS rn
      FROM o
    ) WHERE rn <= 3
    """,
    bench=True,
)


def _simknn(spark, sf_dir):
    """Banded-LSH approximate kNN self-join, Arrow variant: all 18
    plane products are one BLAS matmul per batch and per-bucket scoring
    is a gram matrix, replacing the engine's largest interpreted
    expression (the JVM variant remains in ops/similarity for
    Arrow-less environments and for the equivalence test). Scores round
    to 6 dp BEFORE ranking, so the edge set and values hash-match the
    SQL oracle (candidates = pairs sharing any of the 3 band buckets;
    per-left top-3 by rounded cosine desc, right_id)."""
    e = t(spark, sf_dir, "embeddings")
    return similarity.knn_self_join_arrow(e, k=3, bits=6, bands=3, score_dp=6)


CATALOG["sim_knn_join"].fn = _simknn

register(
    "sim_ivf_knn_join",
    oracle=f"""
    WITH en AS (
      SELECT vec_id, embedding, {_EN_NORM_SQL} AS n FROM embeddings
    ),
    sn AS (
      SELECT vec_id AS cid, embedding AS cvec,
             {_EN_NORM_SQL} AS cn
      FROM embeddings ORDER BY vec_id LIMIT 32
    ),
    assign0 AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, s.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(1, 65), i ->
                   CAST(e.embedding[i] AS DOUBLE) * CAST(s.cvec[i] AS DOUBLE)))
                   / (e.n * s.cn) DESC, s.cid) AS rn
        FROM en e CROSS JOIN sn s
      ) WHERE rn = 1
    ),
    cent AS (
      SELECT cid, list(m ORDER BY pos) AS cvec FROM (
        SELECT assign0.cid, p.pos, round(AVG(CAST(e.embedding[p.pos] AS DOUBLE)), 6) AS m
        FROM assign0 JOIN embeddings e USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
        GROUP BY assign0.cid, p.pos
      ) GROUP BY cid
    ),
    cn2 AS (
      SELECT cid, cvec, SQRT(list_sum(list_transform(cvec, x -> x * x))) AS cn
      FROM cent
    ),
    probe AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(1, 65), i ->
                   CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])) / (e.n * c.cn) DESC,
                 c.cid) AS rn
        FROM en e CROSS JOIN cn2 c
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS id_a, q.vec_id AS id_b
      FROM probe p JOIN probe q ON p.cid = q.cid AND p.vec_id < q.vec_id
    ),
    und AS (
      SELECT cand.id_a, cand.id_b,
             {_cos6_sql('a.embedding', 'c.embedding', 'a.n', 'c.n')} AS cosine_sim
      FROM cand JOIN en a ON cand.id_a = a.vec_id
                JOIN en c ON cand.id_b = c.vec_id
    ),
    o AS (
      SELECT id_a AS left_id, id_b AS right_id, cosine_sim FROM und
      UNION ALL
      SELECT id_b AS left_id, id_a AS right_id, cosine_sim FROM und
    )
    SELECT left_id, right_id, cosine_sim FROM (
      SELECT o.*, ROW_NUMBER() OVER (PARTITION BY left_id
                                     ORDER BY cosine_sim DESC, right_id) AS rn
      FROM o
    ) WHERE rn <= 3
    """,
    bench=True,
)


register(
    "sim_knn_query_corpus",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             {_EMB_BAND_SQL[0]} AS bkt0,
             {_EMB_BAND_SQL[1]} AS bkt1,
             {_EMB_BAND_SQL[2]} AS bkt2,
             {_EN_NORM_SQL} AS n
      FROM embeddings
    ),
    l AS (SELECT * FROM b WHERE vec_id % 10 = 0),
    r AS (SELECT * FROM b WHERE vec_id % 10 <> 0),
    cand AS (
      SELECT l.vec_id AS left_id, r.vec_id AS right_id,
             {_cos6_sql('l.embedding', 'r.embedding', 'l.n', 'r.n')} AS cosine_sim
      FROM l JOIN r ON (l.bkt0 = r.bkt0 OR l.bkt1 = r.bkt1 OR l.bkt2 = r.bkt2)
    )
    SELECT left_id, right_id, cosine_sim FROM (
      SELECT cand.*, ROW_NUMBER() OVER (PARTITION BY left_id
                                        ORDER BY cosine_sim DESC, right_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    """,
)


def _simknnqc(spark, sf_dir):
    """Two-corpus kNN join (query set vs corpus — the retrieval shape,
    distinct from the self-join dedup shape): banded-LSH equi-join on
    (band, bucket), per-query top-3 by 6-dp-rounded cosine. One shuffle
    keyed on the bucket; neither side ever cross-joins the other."""
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 10 == 0)
    corpus = e.filter(F.col("vec_id") % 10 != 0)
    return similarity.knn_join(q, corpus, k=3, bits=6, bands=3, score_dp=6)


CATALOG["sim_knn_query_corpus"].fn = _simknnqc


def _simivfknn(spark, sf_dir):
    """IVF approximate kNN self-join: data-dependent centroid cells
    recall mid-cosine neighbors that random-hyperplane sign-LSH misses
    (~0.47 vs ~0.18 recall@3 on this corpus at the same candidate
    budget). Arrow variant: BLAS gram matrices per cell instead of
    interpreted per-pair dot folds (~2x at sf0.1). Value-verified: the
    one Lloyd refinement's recentered means round to 6 dp (engine-
    independent, oracle reproduces the identical centroid table in
    SQL), and pair scores round to 6 dp before ranking — candidates =
    pairs co-probed into a common cell (nprobe=2), per-left top-3 by
    rounded cosine desc, right_id."""
    e = t(spark, sf_dir, "embeddings")
    return similarity.ivf_knn_self_join_arrow(
        e, k=3, n_cells=32, nprobe=2, refine=1, score_dp=6, centroid_dp=6
    )


CATALOG["sim_ivf_knn_join"].fn = _simivfknn

register("mm_embed_dup_pairs", oracle=None)


def _mmembed(spark, sf_dir):
    """End-to-end multimodal dedup (rows-only check): binary payloads ->
    stub encoder embeddings (mapInPandas) -> banded-LSH near-dup pairs.
    The encoder is a deterministic byte-bigram histogram; swapping in a
    real vision model changes one inner function, not this plan."""
    from ..ops import multimodal

    d = t(spark, sf_dir, "documents")
    media = multimodal.attach_payload(d, "text", "doc_id")
    emb = multimodal.embed_media(media).withColumnRenamed("media_id", "vec_id")
    return similarity.embedding_dup_pairs(emb, threshold=0.98, bits=6, bands=3)


CATALOG["mm_embed_dup_pairs"].fn = _mmembed

# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + typed metadata; decode is stubbed)
# ---------------------------------------------------------------------------

register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(length(text) AS BIGINT) AS char_len
    FROM documents
    """,
)


def _mm(spark, sf_dir):
    """Opaque-binary column plumbing: payload bytes + metadata columns.
    Decode/feature-extraction is a stubbed mapInPandas op (ops/multimodal)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("byte_len"),
        F.length("text").cast("long").alias("char_len"),
    )


CATALOG["mm_binary_meta"].fn = _mm


