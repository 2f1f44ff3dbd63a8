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

from .pairs import DEFAULT_MAX_BLOCK, pairs_within_groups


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
    slice()+concat_ws by ~2x in codegen.

    Documents with fewer than ``n`` tokens yield one shingle of all
    their tokens; empty documents yield an empty array (try_element_at
    tolerates the out-of-range tail — plain element_at throws under
    Spark 4 ANSI mode)."""
    cnt = F.greatest(F.size(tk) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    gram = lambda i: F.concat_ws(" ", *[F.try_element_at(tk, i + off) for off in range(n)])  # noqa: E731
    grams = F.transform(idx, gram)
    return F.array_distinct(F.filter(grams, lambda g: g != F.lit("")))


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
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Near-duplicate candidate pairs by token-set Jaccard within blocking
    keys. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The block equi-join bounds pair count to sum(block_size^2); callers
    choose blocks (e.g. source+lang+length bucket) so blocks stay small at
    scale."""
    toks = df.select(
        F.col(id_col), *[F.col(b) for b in block_cols], token_set(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))

    # |A∪B| = |A|+|B|-|A∩B| for distinct sets: one intersect per pair,
    # no array_union materialization. Intra-block expansion (see
    # ops/pairs.py) tokenizes each document once; the self-join it
    # replaces tokenized everything twice.
    def _pair(x, y):
        inter = F.size(F.array_intersect(x["toks"], y["toks"]))
        jac = inter.cast("double") / (x["n"] + y["n"] - inter)
        return F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            jac.alias("jaccard"),
        )

    keep = (lambda p: p["jaccard"] >= F.lit(threshold)) if threshold > 0.0 else None
    return pairs_within_groups(
        toks,
        block_cols,
        F.struct(
            F.col(id_col).alias("id"), F.col("__toks").alias("toks"), F.col("__n").alias("n")
        ),
        _pair,
        keep=keep,
        max_block=max_block,
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.0,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Near-duplicate candidate pairs by token-set CONTAINMENT within
    blocking keys: containment = |A∩B| / min(|A|, |B|) — the asymmetric
    cousin of Jaccard that catches SUBSET duplication (a short document
    quoted whole inside a longer one scores ~1.0 here but low on
    Jaccard, because the union is dominated by the longer side). The
    measure used for quote/boilerplate detection and
    partial-scrape dedup in web-corpus curation.

    Returns (id_a, id_b, containment) with id_a < id_b; same blocked
    pair skeleton as :func:`ngram_jaccard_pairs` (one tokenize, pairs
    only within blocks, bounded by the hot-block cap)."""
    toks = df.select(
        F.col(id_col),
        *[F.col(b) for b in block_cols],
        token_set(F.col(text_col)).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))

    def _pair(x, y):
        inter = F.size(F.array_intersect(x["toks"], y["toks"]))
        cont = inter.cast("double") / F.least(x["n"], y["n"])
        return F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            cont.alias("containment"),
        )

    keep = (lambda p: p["containment"] >= F.lit(threshold)) if threshold > 0.0 else None
    return pairs_within_groups(
        toks,
        block_cols,
        F.struct(
            F.col(id_col).alias("id"),
            F.col("__toks").alias("toks"),
            F.col("__n").alias("n"),
        ),
        _pair,
        keep=keep,
        max_block=max_block,
    )


def fuzzy_string_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: list[str],
    max_distance: int = 2,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Fuzzy string-match candidate pairs by Levenshtein distance
    within blocking keys — entity-resolution dedup for names/titles/
    addresses where token-set measures are too coarse (a one-letter
    typo is distance 1 here but can flip a whole token). Returns
    (id_a, id_b, distance) with id_a < id_b, distance <= max_distance.

    ``levenshtein`` is a built-in in Spark AND DuckDB with the same
    unit-cost edit definition, so the gate oracle is exact. Blocking
    carries the usual contract: candidate recall is bounded by the
    blocking scheme (two strings in different blocks are never
    compared) — standard practice is blocking on phonetic keys,
    prefixes, or length buckets, and the length-difference bound
    |len(a)-len(b)| <= max_distance means a length bucket of width
    >= max_distance loses no true pairs ACROSS adjacent buckets only
    when paired with an overlapping scheme; choose blocks accordingly.
    Same intra-block pair skeleton as the other blocked ops (hot-block
    cap included)."""
    base = df.select(
        F.col(id_col), *[F.col(b) for b in block_cols], F.col(str_col).alias("__s")
    )

    def _pair(x, y):
        # Thresholded levenshtein (Spark >= 3.5): banded DP that costs
        # O(len * max_distance) and abandons early, returning -1 above
        # the threshold — vs O(len^2) for the unthresholded form. On the
        # duplicate-heavy 10x probe corpus this is the difference
        # between minutes and the better part of an hour in the capped
        # hot blocks. Kept pairs carry the identical exact distance, so
        # the DuckDB oracle (no threshold arg there) is unchanged.
        dist = F.levenshtein(x["s"], y["s"], max_distance)
        return F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            dist.alias("distance"),
        )

    return pairs_within_groups(
        base,
        block_cols,
        F.struct(F.col(id_col).alias("id"), F.col("__s").alias("s")),
        _pair,
        # the threshold form returns -1 for "farther than max_distance"
        # — the keep filter must reject the sentinel, not just bound
        # from above
        keep=lambda p: (p["distance"] >= F.lit(0))
        & (p["distance"] <= F.lit(max_distance)),
        max_block=max_block,
        # edit distance is the expensive pair function: stripe-split
        # the capped hot blocks 16 ways so a few giant blocks become
        # 16 medium tasks instead of multi-minute stragglers (the r12
        # 10x probe measured the single-task shape at 383 s)
        split_factor=16,
    )


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
    perm_fns=None,
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
    if perm_fns is None:
        hashed = sh.select(
            F.col(id_col),
            F.xxhash64(F.col("__s"), F.lit(1)).alias("__h1"),
            F.xxhash64(F.col("__s"), F.lit(2)).alias("__h2"),
        )
        mins = [
            F.min(
                F.col("__h1").bitwiseXOR(_rotl64(F.col("__h2"), (i * 23 + 1) % 64))
            ).alias(f"m{i}")
            for i in range(num_perm)
        ]
        return hashed.groupBy(id_col).agg(*mins)
    h1, h2 = perm_fns(F.col("__s"))
    hashed = sh.select(F.col(id_col), h1.alias("__h1"), h2.alias("__h2"))
    mins = [
        F.min(F.col("__h1") + F.lit(i) * F.col("__h2")).alias(f"m{i}")
        for i in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*mins)


def minhash_band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    perm_fns=None,
    band_hash_fn=None,
    carry_all: bool = False,
) -> DataFrame:
    """The LSH band index rows for a corpus: one (id, signature, band,
    band-hash) row per document per band. This IS the frame a production
    pipeline PERSISTS — build it once over the corpus, append each
    ingest batch's rows, and every later near-dup probe is an equi-join
    against it instead of a full recompute (see
    :func:`incremental_minhash_dup_pairs`). Shared by the batch
    self-join path (:func:`minhash_dup_pairs`) so index and self-join
    provably band identically. ``carry_all`` forwards to
    :func:`bands_from_signatures` (default off: persisted schema
    unchanged)."""
    sigs = minhash_signatures(df, id_col, text_col, num_perm, shingle_n, perm_fns)
    return bands_from_signatures(sigs, id_col, num_perm, bands, band_hash_fn, carry_all)


def bands_from_signatures(
    sigs: DataFrame,
    id_col: str,
    num_perm: int = 32,
    bands: int = 8,
    band_hash_fn=None,
    carry_all: bool = False,
) -> DataFrame:
    """Band an ALREADY-COMPUTED signature frame (columns m0..m{n-1},
    e.g. a persisted signature store or a streaming-aggregation sink)
    into (id, __sig, band, bh) index rows — the banding half of
    :func:`minhash_band_buckets`, split out so signatures maintained
    elsewhere (incremental stores, streaming state) band identically.

    ``carry_all=True`` additionally carries the row's FULL band-hash
    array as ``__bhs`` (the hashes are computed once pre-explode either
    way). The self-join path uses it to emit each candidate pair from
    exactly one bucket — the first band both members agree on — which
    deletes the pair-dedup exchange (r16 opt round). Off by default so
    the persisted-index schema is unchanged."""
    band_hash_fn = band_hash_fn or (lambda cols: F.xxhash64(*cols))
    rows_per_band = num_perm // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(F.struct(F.lit(b).alias("band"), band_hash_fn(cols).alias("bh")))
    pre = [
        F.col(id_col),
        F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("__sig"),
        F.explode(F.array(*band_structs)).alias("__b"),
    ]
    post = [
        F.col(id_col),
        F.col("__sig"),
        F.col("__b.band").alias("band"),
        F.col("__b.bh").alias("bh"),
    ]
    if carry_all:
        pre.insert(2, F.array(*[s["bh"] for s in band_structs]).alias("__bhs"))
        post.insert(2, F.col("__bhs"))
    return sigs.select(*pre).select(*post)


def _sig_agreement(sig_a, sig_b, num_perm: int):
    """Fraction of agreeing minhash components — the LSH Jaccard
    estimate both the self-join and incremental paths share."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda u, v: F.when(u == v, 1).otherwise(0)),
        F.lit(0),
        lambda acc, z: acc + z,
    )
    return agree.cast("double") / F.lit(float(num_perm))


def incremental_minhash_dup_pairs(
    index_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    perm_fns=None,
    band_hash_fn=None,
) -> DataFrame:
    """NEAR-dup probe of an ingest batch against a PERSISTED LSH index —
    the daily-ingest amortization pattern (the MinHash analog of
    ``train_gram_set`` reuse): only the new batch is shingled and
    hashed; the corpus contributes pre-computed ``index_df`` rows (from
    :func:`minhash_band_buckets`, stored e.g. as parquet partitioned by
    band). Candidates share a (band, band-hash) bucket — one equi-join
    whose build side is the (typically much smaller) new batch — and are
    verified by signature agreement. At 100 TB this turns every ingest
    from an O(corpus) recompute into O(batch + matched buckets).

    Returns (new_id, dup_of, jaccard_est): each new document paired with
    every corpus document it near-duplicates."""
    new_buckets = minhash_band_buckets(
        new_df, id_col, text_col, num_perm, bands, shingle_n, perm_fns, band_hash_fn
    )
    return incremental_pairs_from_buckets(
        index_df, new_buckets, id_col, num_perm, jaccard_threshold
    )


def incremental_pairs_from_buckets(
    index_df: DataFrame,
    new_buckets: DataFrame,
    id_col: str,
    num_perm: int,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """The probe half of :func:`incremental_minhash_dup_pairs`: join
    already-banded new rows against the persisted index on
    (band, band-hash) and verify by signature agreement. Split out so a
    signature frame maintained as STREAMING state can feed the same
    probe the batch path uses.

    Measured rejection (r16 opt round): a once-emission variant (emit
    each pair only from the first band both signatures agree on, as
    :func:`minhash_dup_pairs` now does) deletes this path's pair-dedup
    exchange (5 -> 4 jobs at sf0.1) but must RECOMPUTE both sides' band
    hashes from ``__sig`` per joined row — the persisted index schema
    carries only (id, __sig, band, bh) — and with the portable sha256
    family that per-row work consistently cost more than the saved
    exchange (alternating A/B, 0/6 pairwise wins, ~+0.1 s). The
    self-join path keeps once-emission because it carries the band-hash
    array for free pre-explode; this probe keeps dropDuplicates."""
    idx = index_df.select(
        F.col(id_col).alias("__cid"),
        F.col("__sig").alias("__csig"),
        "band",
        "bh",
    )
    joined = new_buckets.join(idx, ["band", "bh"])
    est = _sig_agreement(F.col("__sig"), F.col("__csig"), num_perm)
    return (
        joined.select(
            F.col(id_col).alias("new_id"),
            F.col("__cid").alias("dup_of"),
            est.alias("jaccard_est"),
        )
        .filter(F.col("jaccard_est") >= F.lit(jaccard_threshold))
        .dropDuplicates(["new_id", "dup_of"])
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    perm_fns=None,
    band_hash_fn=None,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    split_factor: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, fully deterministic (fixed
    hash constants, no RNG) and expressed with built-in functions.

    Candidate pairs share a (band, band-hash) bucket — an equi-join, one
    shuffle, never the O(n^2) pair space. Similarity is the standard LSH
    signature-agreement estimate (fraction of matching minhash
    components), so the join carries num_perm longs per row rather than
    the raw shingle sets; at 100 TB that keeps the shuffle narrow.

    ``perm_fns`` / ``band_hash_fn`` swap the hash family (see
    :func:`minhash_dup_pairs_portable`); the banding algebra is shared,
    so proving it on the portable family proves it for both."""
    buckets = minhash_band_buckets(
        df, id_col, text_col, num_perm, bands, shingle_n, perm_fns, band_hash_fn,
        carry_all=True,
    )

    # Intra-bucket expansion, not a self-join (see ops/pairs.py):
    # buckets shuffle once on (band, bh) carrying (id, signature)
    # structs; the shingle->explode->32-min aggregate runs ONCE.
    #
    # Once-emission instead of dropDuplicates (r16 opt round): a pair
    # that agrees on several bands used to surface once per shared
    # bucket and pay a THIRD exchange (hash on (id_a, id_b)) to
    # collapse the copies. Each member carries its full band-hash array
    # (__bhs, computed once pre-explode), so the pair itself knows
    # every band it agrees on — it is emitted ONLY from the first such
    # band (within the current bucket both members' hashes match at
    # position `band`, so the first agreeing index is always found and
    # is <= band). Exactly one bucket satisfies the condition per pair;
    # jaccard_est is deterministic per pair, so the emitted rows are
    # exactly the old dropDuplicates output. (Under a max_block cap the
    # old path kept a pair if both members survived in ANY shared
    # bucket, the new one requires the FIRST-agreeing bucket — both are
    # degraded semantics that only differ for groups above the cap,
    # per the pairs_within_groups contract.)
    def _pair(x, y):
        agree = F.aggregate(
            F.zip_with(
                x["sig"], y["sig"], lambda u, v: F.when(u == v, 1).otherwise(0)
            ),
            F.lit(0),
            lambda acc, z: acc + z,
        )
        first_band = F.array_position(
            F.zip_with(x["bhs"], y["bhs"], lambda u, v: u == v), F.lit(True)
        )
        return F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            (agree.cast("double") / F.lit(float(num_perm))).alias("jaccard_est"),
            (first_band == F.col("band") + F.lit(1)).alias("__emit"),
        )

    return pairs_within_groups(
        buckets,
        ["band", "bh"],
        F.struct(
            F.col(id_col).alias("id"),
            F.col("__sig").alias("sig"),
            F.col("__bhs").alias("bhs"),
        ),
        _pair,
        keep=lambda p: p["__emit"] & (p["jaccard_est"] >= F.lit(jaccard_threshold)),
        max_block=max_block,
        split_factor=split_factor,
    ).drop("__emit")


def train_gram_set(
    train: DataFrame, text_col: str, shingle_n: int = 3, hashed: bool = False
) -> DataFrame:
    """Distinct word ``shingle_n``-grams of the training corpus — the
    precomputable half of :func:`contamination_report`. At 100 TB the
    train-side distinct is the dominant decontamination cost and it is
    identical across eval sets, so compute it ONCE, write it to parquet
    (ideally sorted by gram so scans of it are splittable and
    run-length-friendly), and pass the re-read frame to
    ``contamination_report(train_grams=...)`` for every eval set.

    ``hashed=True`` stores xxhash64 longs instead of gram strings: the
    persisted index shrinks 3-5x (8 bytes vs ~20-char grams) and the
    overlap join shuffles fixed-width longs. Collision risk is the
    birthday bound on 64 bits (~n²/2⁶⁵ — ~3e-7 even at 100 B distinct
    grams), and a collision only inflates one doc's overlap count by
    one; fine for contamination SCREENING, use strings when counts
    must be provably exact.

    Returns a single-column frame: ``(gram string)`` or
    ``(gram_h bigint)``."""
    # explode_outer + NOT NULL instead of plain explode (r15 opt round):
    # a bare explode lets the optimizer infer `size(grams) > 0` and push
    # that constraint below the scan's balancing exchange, where the
    # whole shingle expression re-evaluates per row inside the (single-
    # task, single-row-group) pre-exchange filter stage — the corpus is
    # then shingled twice, once serially. The outer explode carries no
    # such constraint; empty-gram docs surface one NULL row and die in
    # the (cheap, generated-column) filter. Identical rows out.
    g = train.select(
        F.explode_outer(word_shingles(F.col(text_col), shingle_n)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    if hashed:
        g = g.select(F.xxhash64("gram").alias("gram_h"))
    return g.distinct()


def contamination_report(
    train: DataFrame | None,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    train_grams: DataFrame | None = None,
    prefilter_mod: int | None = None,
    prefilter_k: int = 3,
) -> DataFrame:
    """Train/eval contamination by exact word n-gram overlap — the
    GPT-3/Dolma-style decontamination primitive: an eval document is
    contaminated to the degree its n-grams also appear anywhere in the
    training corpus.

    Returns (id, n_overlap, contam_frac) for eval documents with at
    least one overlapping n-gram: n_overlap = distinct shared n-grams,
    contam_frac = n_overlap / the document's distinct n-gram count.

    Plan shape: both sides shingle once (map-side), the train side
    dedups its gram set (one shuffle — at 100 TB this is the big one,
    so precompute it with :func:`train_gram_set` and pass it via
    ``train_grams`` to amortize across eval sets), candidates meet in
    ONE equi-join on the gram, and the per-eval-doc rollup is a
    partial-aggregated count. Nothing is ever O(train x eval).

    ``prefilter_mod``: optional k-hash Bloom prefilter (``prefilter_k``
    hash functions, default 3, seeded ``xxhash64(gram, i)``). The
    distinct union of the k position sets of the train grams (bounded
    by the modulus, NOT by corpus size — at most ``prefilter_mod``
    longs ~ 8 bytes each) is broadcast; an eval gram survives only if
    ALL k of its positions are present (k chained left-semi joins over
    the SAME broadcast frame — one exchange, reused). False positives
    just fall through to the exact join — the result is unchanged, only
    the shuffled volume shrinks. FP rate is the classic
    ``(1 - e^(-k*n/m))^k``: at m = 16x train-gram count, one hash
    passes ~6% of non-matching grams while k=3 passes ~0.15% — a ~40x
    cut for the same broadcast budget. Measured on the sf0.01 decon
    split (14.1k train grams, m=2^22): one-hash passed 12 of 2,336
    non-matching eval grams (0.51%), k=3 passed 0.
    Spark's own `might_contain`/`bloom_filter_agg` remain
    optimizer-internal in this build (re-probed on 4.1.2: both raise
    UNRESOLVED_ROUTINE from SQL), hence the explicit formulation."""
    if train_grams is None:
        if train is None:
            raise ValueError("pass either train or train_grams")
        train_grams = train_gram_set(train, text_col, shingle_n)
    # train_grams MUST be distinct (train_gram_set guarantees it); the
    # join multiplies per-gram match counts otherwise. Not re-distincted
    # here — skipping that shuffle is the point of the precomputed path.
    # A LongType gram column means the hashed index (train_gram_set
    # hashed=True): eval grams map through the same xxhash64 before the
    # join, so the shuffle carries 8-byte keys instead of strings.
    from pyspark.sql import types as T

    hashed = isinstance(
        train_grams.schema[train_grams.columns[0]].dataType, T.LongType
    )
    tr_g = train_grams.select(F.col(train_grams.columns[0]).alias("__g"))
    ev = eval_df.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("__gs")
    )
    # explode_outer + NOT NULL for the same inferred-constraint reason
    # as train_gram_set: keeps the shingle expression out of the
    # single-task pre-exchange filter stage (r15 opt round)
    ev_g = ev.select(
        F.col(id_col), F.size("__gs").alias("__ng"), F.explode_outer("__gs").alias("__g")
    ).filter(F.col("__g").isNotNull())
    if hashed:
        ev_g = ev_g.select(id_col, "__ng", F.xxhash64("__g").alias("__g"))
    if prefilter_mod is not None:

        def _pos(c, seed: int):
            # seeded hash family: xxhash64(value, seed) gives k
            # independent positions in the same m-slot space; works
            # identically for string grams and pre-hashed longs
            return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(prefilter_mod))

        k = max(1, int(prefilter_k))
        pos = (
            tr_g.select(
                F.explode(
                    F.array(*[_pos(F.col("__g"), i) for i in range(k)])
                ).alias("__pos")
            )
            .distinct()
        )
        for i in range(k):
            ev_g = ev_g.join(
                F.broadcast(pos), _pos(F.col("__g"), i) == F.col("__pos"), "left_semi"
            )
    return (
        ev_g.join(tr_g, "__g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_overlap"),
            (F.count("*").cast("double") / F.max("__ng").cast("double")).alias(
                "contam_frac"
            ),
        )
    )


def _sha_pair(s_col):
    """Portable h1/h2: first/second 8 hex chars of sha256(shingle) —
    32-bit values any engine reproduces (the cross-engine hash family
    shared by the portable self-join and the incremental index probe)."""
    hx = F.sha2(s_col, 256)
    return (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long"),
    )


def _sha_band(cols):
    """Portable band hash: sha256 of the band's joined components."""
    return F.sha2(F.concat_ws("_", *[c.cast("string") for c in cols]), 256)


def minhash_dup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    split_factor: int | None = None,
) -> DataFrame:
    """:func:`minhash_dup_pairs` with a CROSS-ENGINE hash family so the
    whole MinHash->banding->verify pipeline is value-checkable against
    a SQL oracle: h1/h2 are the first/second 8 hex chars of
    sha256(shingle) (32-bit values any engine reproduces), and
    permutation i is Broder's linear mix h1 + i*h2 (< 2^38, so signed
    and unsigned MIN agree and ANSI arithmetic cannot overflow). Band
    buckets are sha256 of the band's joined components. ~3x slower than
    the xxhash64 family (sha256 per shingle) — use the fast variant in
    production, this one to PROVE the banding algebra (which both
    variants share via the hash-family parameters)."""
    return minhash_dup_pairs(
        df,
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        perm_fns=_sha_pair,
        band_hash_fn=_sha_band,
        split_factor=split_factor,
    )


def minhash_band_buckets_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """:func:`minhash_band_buckets` with the cross-engine sha256 hash
    family — the index frame whose incremental probe is value-checkable
    against a SQL oracle."""
    return minhash_band_buckets(
        df, id_col, text_col, num_perm, bands, shingle_n, _sha_pair, _sha_band
    )


def incremental_minhash_dup_pairs_portable(
    index_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """:func:`incremental_minhash_dup_pairs` with the cross-engine
    sha256 hash family (index must come from
    :func:`minhash_band_buckets_portable`)."""
    return incremental_minhash_dup_pairs(
        index_df,
        new_df,
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        perm_fns=_sha_pair,
        band_hash_fn=_sha_band,
    )


# 4 x 16-bit SWAR lanes per long: lane j of sum k counts set bits at
# signature position k + 16*j across a document's token hashes
_LANE = 0x0001000100010001
# lanes are 16-bit AND the summed longs must stay under 2^63 in Spark's
# ANSI mode (SUM on BIGINT throws on overflow): the largest per-term
# value is 0x0001000100010001 ~ 2.8e14, so the count cap is
# floor(Long.MAX / 0x0001000100010001) = 32767 — which also keeps every
# 16-bit lane carry-free. Documented bias: only the first 32767 distinct
# shingles of a pathological document vote.
_MAX_SHINGLES = 32767


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, token_n: int = 2, hash_fn=None
) -> DataFrame:
    """Deterministic 64-bit SimHash per document.

    One pass: tokens -> n-gram hashes -> EXPLODE -> a single hash
    aggregate of 16 SWAR bit-count sums -> majority-vote pack into a
    long. ``(h >> k) & 0x0001000100010001`` accumulates the popcounts
    of bit positions k, k+16, k+32, k+48 in one branch-free add, so the
    aggregate carries 16 longs (64 lanes) per id instead of 64 separate
    conditional sums — and partial (map-side) aggregation means the
    shuffle is per-document, not per-token, the same shape that makes
    the minhash builder scale. Bit i of the signature is set iff more
    than half the token hashes have bit i set (identical semantics to
    the classic ±1-vote formulation). (Replaces 64 per-row
    ``F.aggregate`` folds that were the slowest expression in the
    engine: sf0.1 pairs ~5s -> ~1.3s warm.)
    """
    tk = df.select(F.col(id_col), norm_tokens(F.col(text_col)).alias("__tk"))
    grams = tk.select(
        F.col(id_col),
        F.slice(
            shingles_from_tokens(F.col("__tk"), token_n), 1, _MAX_SHINGLES
        ).alias("__g"),
    )
    # a bare F.xxhash64 is var-positional, which the higher-order
    # function validator rejects — wrap in a unary lambda
    hash_fn = hash_fn or (lambda g: F.xxhash64(g))
    hashed = grams.select(
        F.col(id_col), F.transform(F.col("__g"), hash_fn).alias("__h")
    )
    # explode_outer keeps token-less documents (they get the all-zero
    # signature: zero lane counts never win a majority vote)
    exploded = hashed.select(F.col(id_col), F.explode_outer("__h").alias("__th"))
    h = F.col("__th")
    sums = exploded.groupBy(id_col).agg(
        F.count("__th").alias("__cnt"),
        *[
            F.sum(F.shiftrightunsigned(h, k).bitwiseAND(F.lit(_LANE))).alias(f"__s{k}")
            for k in range(16)
        ],
    )
    cnt = F.col("__cnt")
    # Majority-vote pack. The r2 form chained 64 shiftleft(when(...))
    # adds into ONE deep expression; Janino compiled it into a method
    # too large to split well, costing ~10 s of one-shot JIT (the
    # dominant bench cost — execution itself is ~1 s). Instead: a flat
    # 64-element lane-count array (CreateArray splits into submethods
    # cleanly) OR-folded against bit-weight literals by a tiny
    # higher-order aggregate — 64 interpreted iterations per DOCUMENT,
    # negligible beside the per-token aggregate upstream.
    ones_arr = F.array(
        *[
            F.shiftrightunsigned(
                F.coalesce(F.col(f"__s{i % 16}"), F.lit(0)), 16 * (i // 16)
            ).bitwiseAND(F.lit(0xFFFF))
            for i in range(64)
        ]
    )
    # bit 63's weight is Long.MIN_VALUE (1L<<63 wraps); OR-folding is
    # carry-free so the signed value is still the right bit pattern
    weights = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    packed = F.aggregate(
        F.zip_with(
            ones_arr, weights,
            lambda o, w: F.when(o * 2 > cnt, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return sums.select(F.col(id_col), packed.alias("__sim"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with pigeonhole blocking.

    The 64 signature bits split into ``max_hamming + 1`` disjoint
    segments; two signatures within Hamming distance ``max_hamming``
    differ in at most ``max_hamming`` segments, so they must agree
    EXACTLY on at least one segment (pigeonhole). Blocking on
    (segment_index, segment_value) therefore guarantees recall, unlike
    prefix blocking which silently drops any pair whose differing bit
    lands in the prefix. Candidates equi-join on the segment key (one
    shuffle, never O(n^2)); exact Hamming verifies each candidate.
    """
    sh = simhash_signatures(df, id_col, text_col)
    return simhash_pairs_from_signatures(sh, id_col, max_hamming)


def simhash_pairs_from_signatures(
    sh: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    sim_col: str = "__sim",
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Pigeonhole blocking + Hamming verify over precomputed signatures
    (``sh`` has ``id_col`` and a long ``sim_col``). Split out so the
    recall guarantee is unit-testable on synthetic signatures."""
    k = max_hamming + 1
    if sim_col != "__sim":
        sh = sh.withColumnRenamed(sim_col, "__sim")
    widths = [64 // k] * k
    widths[-1] += 64 % k
    offsets = [sum(widths[:i]) for i in range(k)]
    seg_vals = []
    for i in range(k):
        v = F.shiftrightunsigned(F.col("__sim"), offsets[i])
        if offsets[i] + widths[i] < 64:
            v = v.bitwiseAND(F.lit((1 << widths[i]) - 1))
        seg_vals.append(v)
    segs = F.array(
        *[
            F.struct(F.lit(i).alias("seg"), seg_vals[i].alias("val"))
            for i in range(k)
        ]
    )
    blocked = (
        sh.select(F.col(id_col), F.col("__sim"), F.explode(segs).alias("__s"))
        .select(
            F.col(id_col),
            F.col("__sim"),
            F.col("__s.seg").alias("__seg"),
            F.col("__s.val").alias("__val"),
        )
    )
    # Intra-bucket pair expansion, not a self-join (see ops/pairs.py):
    # signatures compute ONCE and only slim (id, sim) structs shuffle.
    # A pathological bucket (millions of identical signatures) degrades
    # to the max_block smallest members instead of OOMing the task; an
    # exact-dedup pre-pass remains the right fix for such corpora.
    #
    # Once-emission instead of distinct() (r16 opt round): a pair can
    # agree on several segments -> one candidate per segment, and the
    # old distinct() paid a whole extra exchange to collapse the
    # copies. The XOR of the two signatures already encodes EVERY
    # agreeing segment (segment j agrees iff its bits of the XOR are
    # all zero), so the pair is emitted only from the FIRST agreeing
    # segment — within the current bucket the members agree on __seg by
    # construction, so a first agreeing index always exists and is
    # <= __seg; exactly one bucket emits each pair, and hamming is
    # deterministic per pair, so the rows are exactly the old
    # distinct() output. (Same max_block caveat as minhash_dup_pairs:
    # capped groups degrade slightly differently, per the
    # pairs_within_groups contract.)
    def _pair(x, y):
        d = x["sim"].bitwiseXOR(y["sim"])
        seg_agrees = []
        for i in range(k):
            sv = F.shiftrightunsigned(d, offsets[i])
            if offsets[i] + widths[i] < 64:
                sv = sv.bitwiseAND(F.lit((1 << widths[i]) - 1))
            seg_agrees.append(sv == F.lit(0))
        first_seg = F.array_position(F.array(*seg_agrees), F.lit(True))
        return F.struct(
            F.least(x["id"], y["id"]).alias("id_a"),
            F.greatest(x["id"], y["id"]).alias("id_b"),
            F.bit_count(d).alias("hamming"),
            (first_seg == F.col("__seg") + F.lit(1)).alias("__emit"),
        )

    return pairs_within_groups(
        blocked,
        ["__seg", "__val"],
        F.struct(F.col(id_col).alias("id"), F.col("__sim").alias("sim")),
        _pair,
        keep=lambda p: p["__emit"] & (p["hamming"] <= F.lit(max_hamming)),
        max_block=max_block,
    ).drop("__emit")


def portable_token_hash(g):
    """Cross-engine 60-bit token hash: first 15 hex chars of sha256.
    Non-negative and below 2^60, so signed/unsigned bit ops agree in
    every engine; signature bits 60-63 are always zero (harmless — the
    pigeonhole segments still cover them)."""
    return F.conv(F.substring(F.sha2(g, 256), 1, 15), 16, 10).cast("long")


def simhash_dup_pairs_portable(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """:func:`simhash_dup_pairs` with the cross-engine sha256-derived
    token hash, so the whole SimHash->pigeonhole->Hamming pipeline is
    value-checkable against a SQL oracle (the xxhash64 variant stays
    the fast production path)."""
    sh = simhash_signatures(df, id_col, text_col, hash_fn=portable_token_hash)
    return simhash_pairs_from_signatures(sh, id_col, max_hamming)
