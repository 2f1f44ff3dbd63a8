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


def word_shingles(c, n: int = 3):
    """Distinct word n-gram shingles. O(tokens) per document — unlike
    char shingles whose substr offsets make them O(len^2) on UTF-8 —
    and the standard unit for web-scale text dedup."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    return F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


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
    )
    a = toks.alias("a")
    b = toks.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in block_cols]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        (
            F.size(F.array_intersect("a.__toks", "b.__toks")).cast("double")
            / F.size(F.array_union("a.__toks", "b.__toks"))
        ).alias("jaccard"),
    )
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
    sh = df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__s"))
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


def simhash64(c, token_n: int = 2):
    """Deterministic 64-bit SimHash of a text column, built-ins only.

    Tokens are word n-grams; each token hashes with xxhash64; each of the
    64 bits votes +1/-1; the sign vector packs into a long. Near-dups have
    small Hamming distance."""
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(token_n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, token_n)))
    hashes = F.transform(grams, lambda g: F.xxhash64(g))

    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    packed = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        packed = packed + F.shiftleft(bit, i)
    return packed


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
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("__sim"))
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
