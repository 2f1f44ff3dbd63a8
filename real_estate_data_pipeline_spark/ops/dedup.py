"""Deduplication operators — the reference's keep-latest window dedup
(W1, silver_etl_script.py:641-652) plus the LLM-training-data dedup
families (exact, MinHash-LSH, SimHash, n-gram Jaccard) required by the
north-star (BASELINE.json).

Scale design notes (100 TB):
- keep_latest / exact dedup: one hash-partition shuffle on the key; no
  driver collection. Skewed keys fall to AQE skew handling.
- MinHash-LSH: shingle -> minhash signatures -> band buckets -> self-join
  per bucket. The band join is an equi-join on (band_id, band_hash) so it
  shuffles once and never materializes the full O(n^2) pair space.
- n-gram Jaccard: only within caller-provided blocking keys; the
  cross-pair explosion is bounded per block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """W1 — one row per key, latest by ``order_col`` (desc), deterministic
    via ``tiebreakers``. Ref: silver_etl_script.py:641-652 (which orders
    only by ingested_at_utc and is tie-unstable; SURVEY.md §7.4.3)."""
    order = [F.col(order_col).desc()] + [F.col(t).desc() for t in (tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact content dedup: group by content, keep the minimum id as the
    canonical representative. Single shuffle on the (hashed) content key."""
    fp = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
    return (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__fp")
    )


def shingles(c, n: int = 5):
    """Character n-gram shingle set of a normalized string column."""
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    # substrings via sequence + transform: stays JVM-side, no UDF
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n))))


def token_set(c):
    """Distinct lowercase whitespace tokens."""
    return F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))


def norm_tokens(c):
    """Normalized token array (lowercase, whitespace-split)."""
    return F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")


def shingles_from_tokens(tk, n: int = 3):
    """Distinct word n-gram shingles from an ALREADY-PROJECTED token
    array column. Callers must materialize the tokens in their own
    select() first: Catalyst does no common-subexpression elimination
    inside higher-order lambdas, so passing the split expression
    directly would re-run the regex+split once per referenced element
    (measured ~20x slowdown). Direct element indexing beats
    slice()+concat_ws by ~2x in codegen."""
    cnt = F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    gram = lambda i: F.concat_ws(" ", *[F.element_at(tk, i + off) for off in range(n)])  # noqa: E731
    return F.array_distinct(F.transform(idx, gram))


def word_shingles(c, n: int = 3):
    """Word n-gram shingles straight from a text column. Fine for
    single-use expressions; hot paths should project norm_tokens()
    first and use shingles_from_tokens (see its docstring)."""
    return shingles_from_tokens(norm_tokens(c), n)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.0,
) -> DataFrame:
    """Near-duplicate candidate pairs by token-set Jaccard within blocking
    keys. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The block equi-join bounds pair count to sum(block_size^2); callers
    choose blocks (e.g. source+lang+length bucket) so blocks stay small at
    scale."""
    toks = df.select(
        F.col(id_col), *[F.col(b) for b in block_cols], token_set(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    a = toks.alias("a")
    b = toks.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # |A∪B| = |A|+|B|-|A∩B| for distinct sets: one intersect per pair,
    # no array_union materialization
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.size(F.array_intersect("a.__toks", "b.__toks")).alias("__i"),
        F.col("a.__n").alias("__na"),
        F.col("b.__n").alias("__nb"),
    )
    jac = F.col("__i").cast("double") / (F.col("__na") + F.col("__nb") - F.col("__i"))
    pairs = pairs.select("id_a", "id_b", jac.alias("jaccard"))
    if threshold > 0.0:
        pairs = pairs.filter(F.col("jaccard") >= threshold)
    return pairs


def _rotl64(c, r: int):
    """Overflow-free 64-bit rotate-left (ANSI mode forbids wrapping + / *)."""
    r = r % 64
    if r == 0:
        return c
    return F.shiftleft(c, r).bitwiseOR(F.shiftrightunsigned(c, 64 - r))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Deterministic MinHash signatures via a two-hash mixing family
    (m_i = min over shingles of h1 XOR rotl(h2, r_i) — Broder's
    few-hashes trick with overflow-free bit mixing), so each shingle is
    hashed twice total instead of num_perm times.

    Plan shape: shingle (map) -> explode -> hash-aggregate with num_perm
    min() columns. The aggregate is a single shuffle on id and runs in
    whole-stage codegen — this scales linearly and needs no RNG."""
    tk = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("__tk"))
    sh = tk.select(
        F.col(id_col), F.explode(shingles_from_tokens(F.col("__tk"), shingle_n)).alias("__s")
    )
    hashed = sh.select(
        F.col(id_col),
        F.xxhash64(F.col("__s"), F.lit(1)).alias("__h1"),
        F.xxhash64(F.col("__s"), F.lit(2)).alias("__h2"),
    )
    mins = [
        F.min(F.col("__h1").bitwiseXOR(_rotl64(F.col("__h2"), (i * 23 + 1) % 64))).alias(f"m{i}")
        for i in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, fully deterministic (fixed
    hash constants, no RNG) and expressed with built-in functions.

    Candidate pairs share a (band, band-hash) bucket — an equi-join, one
    shuffle, never the O(n^2) pair space. Similarity is the standard LSH
    signature-agreement estimate (fraction of matching minhash
    components), so the join carries num_perm longs per row rather than
    the raw shingle sets; at 100 TB that keeps the shuffle narrow."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n)

    rows_per_band = num_perm // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bh")))
    buckets = sigs.select(
        F.col(id_col), *[F.col(f"m{i}") for i in range(num_perm)],
        F.explode(F.array(*band_structs)).alias("__b"),
    ).select(
        F.col(id_col), *[F.col(f"m{i}") for i in range(num_perm)],
        F.col("__b.band").alias("band"), F.col("__b.bh").alias("bh"),
    )

    a = buckets.alias("a")
    b_ = buckets.alias("b")
    agree = sum(
        F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0) for i in range(num_perm)
    )
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (agree.cast("double") / F.lit(float(num_perm))).alias("jaccard_est"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.filter(F.col("jaccard_est") >= jaccard_threshold)


def simhash64_from_hashes(hashes):
    """64-bit SimHash from an ALREADY-PROJECTED array<long> of token
    hashes (see shingles_from_tokens for why the projection matters:
    this expression references its input 64 times). Each bit votes
    +1/-1 across token hashes; the sign vector packs into a long."""
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0),
            # NB: two params only — Spark binds extra lambda params to its
            # own arguments; the loop var i is safe because F.aggregate
            # builds the expression eagerly inside this iteration
            lambda acc, h: acc
            + F.when(
                h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1
            ).otherwise(-1),
        )
        for i in range(64)
    ]
    packed = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = packed + F.shiftleft(bit, i)
    return packed


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, token_n: int = 2) -> DataFrame:
    """Deterministic SimHash per document, via staged projections so
    each stage's expression evaluates once per row: tokens -> n-gram
    hashes -> packed 64-bit signature."""
    tk = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("__tk"))
    grams = tk.select(
        F.col(id_col), shingles_from_tokens(F.col("__tk"), token_n).alias("__g")
    )
    hashed = grams.select(
        F.col(id_col), F.transform(F.col("__g"), lambda g: F.xxhash64(g)).alias("__h")
    )
    return hashed.select(F.col(id_col), simhash64_from_hashes(F.col("__h")).alias("__sim"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top ``block_bits`` bits (near
    dups with distance < 64/block ratio usually share a prefix block),
    verify Hamming distance within blocks."""
    sh = simhash_signatures(df, id_col, text_col)
    blocked = sh.withColumn("__blk", F.shiftrightunsigned(F.col("__sim"), 64 - block_bits))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = a.join(
        b, (F.col("a.__blk") == F.col("b.__blk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.bit_count(F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))).alias("hamming"),
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
