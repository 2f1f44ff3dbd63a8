"""Context-window preparation: chunking long documents and packing
short ones — the last mile between a cleaned corpus and a trainer's
fixed-length sequences.

Both ops are pure DataFrame expressions (explode/slice for chunking, a
windowed running total for packing), so they stay JVM-side, push down,
and have exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_tokens`` with ``overlap`` tokens of context carried between
    consecutive chunks (stride = chunk_tokens - overlap). Emits
    (id, chunk_id, chunk_text, n_tokens); empty/blank documents yield
    nothing. One narrow explode — no shuffle, no UDF."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    tk = F.col("__tk")
    n = F.size(tk)
    # chunks start at 0, stride, 2*stride, ... while start < n; the last
    # chunk may be short. ceil((n - overlap) / stride) starts for n > 0.
    n_chunks = F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    toks = df.select(
        F.col(id_col),
        F.split(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ").alias("__tk"),
    ).filter((n > 0) & (F.element_at(tk, 1) != F.lit("")))
    chunks = toks.select(
        F.col(id_col),
        F.col("__tk"),
        F.posexplode(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)).alias(
            "chunk_id", "__start_mult"
        ),
    )
    start = F.col("__start_mult") * stride
    piece = F.slice(F.col("__tk"), start + 1, chunk_tokens)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    budget: int = 512,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign documents to fixed-budget training sequences: within each
    of ``n_buckets`` hash buckets, documents are laid out in id order
    and a document starts a new sequence whenever its EXCLUSIVE running
    token total crosses a budget boundary (seq = floor(cumsum_before /
    budget)). Deterministic, one shuffle (the per-bucket window sort) —
    and crucially PARALLEL: a single global greedy pack would serialize
    on one task, so packing is bucket-local by design (each bucket
    wastes at most one partial sequence, negligible when buckets hold
    thousands of documents). Documents longer than the budget should be
    chunked first (``chunk_documents``). Buckets come from the same
    sha2-based hash as ops/sampling (engine-reproducible, unlike
    xxhash64), so the full layout is oracle-checkable."""
    from .sampling import hash_uniform01

    bucket = F.floor(hash_uniform01(F.col(id_col)) * n_buckets).cast("int").alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = df.select(F.col(id_col), F.col(token_count_col).cast("long").alias("__nt"), bucket)
    cum_before = F.coalesce(F.sum("__nt").over(w), F.lit(0).cast("long"))
    return b.select(
        F.col(id_col),
        F.col("bucket"),
        (F.col("bucket") * F.lit(1_000_000) + F.floor(cum_before / budget)).alias("seq_id"),
        F.col("__nt").alias(token_count_col),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    salt: str = "span",
) -> DataFrame:
    """T5-style span-corruption example construction: each token is
    masked by a deterministic per-(doc, position) hash draw; CONSECUTIVE
    masked tokens collapse into one ``<extra_id_k>`` sentinel in the
    input, and the target lists each sentinel followed by the tokens it
    hides — the (input, target) pair a span-corruption objective trains
    on.

    Everything is derandomized through ``sampling.hash_uniform01`` (the
    corpus-wide convention: first 8 sha256 hex chars scaled to [0,1)),
    so the same doc always yields the same example on any engine — which
    is what makes the gate oracle exact, and what a 100 TB run wants
    anyway (epoch-stable masking, no RNG state per task).

    Plan shape: posexplode (one row per token) -> per-doc lag/running-sum
    window (keyed by doc id — the only shuffle) -> groupBy(doc) ordered
    reassembly via sort_array(collect_list(struct)). Output:
    (id, n_tokens, n_masked, input_text, target_text)."""
    from .sampling import hash_uniform01

    toks = df.select(
        id_col,
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "idx", "tok"
        ),
    ).filter(F.col("tok") != "")
    draw_key = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col("idx").cast("string")
    )
    toks = toks.withColumn(
        "masked", (hash_uniform01(draw_key, salt) < F.lit(float(mask_rate))).cast("int")
    )
    w = Window.partitionBy(id_col).orderBy("idx")
    run_start = (
        (F.col("masked") == 1)
        & (F.coalesce(F.lag("masked").over(w), F.lit(0)) == 0)
    ).cast("int")
    marked = toks.withColumn("run_start", run_start).withColumn(
        "sid",
        F.sum("run_start").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    sentinel = F.concat(F.lit("<extra_id_"), F.col("sid").cast("string"), F.lit(">"))
    input_piece = F.when(F.col("masked") == 0, F.col("tok")).when(
        F.col("run_start") == 1, sentinel
    )
    target_piece = F.when(
        F.col("masked") == 1,
        F.when(
            F.col("run_start") == 1, F.concat(sentinel, F.lit(" "), F.col("tok"))
        ).otherwise(F.col("tok")),
    )
    def _joined(piece):
        return F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(piece.isNotNull(), F.struct(F.col("idx"), piece.alias("p")))
                    )
                ),
                lambda s: s["p"],
            ),
            " ",
        )

    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("masked").alias("n_masked"),
        _joined(input_piece).alias("input_text"),
        _joined(target_piece).alias("target_text"),
    )


def _bpe_doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, toks): whitespace tokens as ONE array row per document
    (empties filtered; zero-token docs dropped, matching the old
    posexplode frame which emitted no rows for them). Array form keeps
    each document's merge locality inside its own row, so a BPE merge
    round is a pure projection — no doc_id exchange, ever."""
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != F.lit("")
    )
    return df.select(F.col(id_col).alias("doc_id"), tk.alias("toks")).filter(
        F.size("toks") > 0
    )


def _bpe_pair_counts(arr: DataFrame) -> DataFrame:
    """Adjacent-pair census over the (doc_id, toks) frame: explode the
    zipped (tok, nxt) pairs and count. ONE shuffle whose map side
    partial-aggregates the (pair, count) rows — the windowed-lead
    formulation repartitioned the whole token frame by doc_id first
    (full-width rows through an exchange) before it could count."""
    pairs = F.zip_with(
        F.slice("toks", 1, F.size("toks") - 1),
        F.slice("toks", 2, F.size("toks") - 1),
        lambda a, b: F.struct(a.alias("tok"), b.alias("nxt")),
    )
    return (
        arr.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.tok").alias("tok"), F.col("p.nxt").alias("nxt"))
        .agg(F.count("*").alias("cnt"))
    )


def _bpe_merge_expr(toks, x: str, y: str):
    """Greedy left-to-right non-overlapping merge of the adjacent pair
    (x, y) over a token array, as a pure ``aggregate`` fold: state is
    (accumulated tokens, unresolved previous token). Each token either
    completes a merge with the pending one, flushes it, or becomes the
    new pending token — exactly the sequential semantics ("a a a a"
    with pair (a, a) -> ["a a", "a a"]) the old islands-parity windows
    computed with a doc_id shuffle. Element copies are quadratic in doc
    length worst-case, bounded by the corpus max (~100 tokens here);
    comparisons are linear."""
    merged = F.lit(x + " " + y)
    nul = F.lit(None).cast("string")
    init = F.struct(
        F.array().cast("array<string>").alias("acc"), nul.alias("prev")
    )

    def step(s, tok):
        return (
            F.when(s["prev"].isNull(), F.struct(s["acc"].alias("acc"), tok.alias("prev")))
            .when(
                (s["prev"] == F.lit(x)) & (tok == F.lit(y)),
                F.struct(
                    F.concat(s["acc"], F.array(merged)).alias("acc"),
                    nul.alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(s["acc"], F.array(s["prev"])).alias("acc"),
                    tok.alias("prev"),
                )
            )
        )

    def fin(s):
        return F.when(s["prev"].isNull(), s["acc"]).otherwise(
            F.concat(s["acc"], F.array(s["prev"]))
        )

    return F.aggregate(toks, init, step, fin)


def bpe_train_rounds(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (Sennrich et al. 2016) unrolled
    for ``rounds`` merges: each round censuses adjacent token pairs
    across the corpus, picks the most frequent pair (ties -> lexicographic
    on the pair), REWRITES the corpus merging every greedy left-to-right
    non-overlapping occurrence of that pair into one token, and repeats
    on the merged corpus. Returns the learned merge table
    (round, tok_a, tok_b, pair_count) — the artifact a tokenizer ships.

    Greedy non-overlap is the sequential-looking part ("a a a a" with
    pair (a,a) merges positions 1-2 and 3-4, not 2-3); it is computed
    per document as a pure ``aggregate`` fold over the document's token
    ARRAY (:func:`_bpe_merge_expr`) — merge locality never leaves the
    row, so a rewrite round costs ZERO shuffles (the earlier
    islands-parity formulation repartitioned a (doc_id, pos, tok) token
    frame by doc_id once per round). The census explodes adjacent pairs
    straight out of the arrays into a partially-aggregated count — the
    only per-round shuffle carries (pair, count) rows. Each round's
    surviving array frame is persisted so round N+1 reads the cache
    instead of replaying rounds 1..N (the Lloyd-round persistence
    pattern). The per-round top pair is a 1-row TakeOrdered collect
    (the model-broadcast pattern): the merge decision must become a
    literal in the next round's plan.

    Stops early if a round finds no adjacent pairs. The heavy work —
    census aggregates and per-document folds — is fully distributed;
    only the ``rounds``-row merge table lives on the driver."""
    spark = df.sparkSession
    merges = _bpe_learn_merges(df, id_col, text_col, rounds)
    # numSlices=1: the merge table is `rounds` rows — the default would
    # parallelize it to defaultParallelism near-empty tasks per action
    return spark.createDataFrame(
        spark.sparkContext.parallelize(merges, 1),
        schema="round int, tok_a string, tok_b string, pair_count bigint",
    )


def _bpe_learn_merges(
    df: DataFrame, id_col: str, text_col: str, rounds: int
) -> list[tuple[int, str, str, int]]:
    """The training loop behind :func:`bpe_train_rounds`: returns the
    learned merges as driver literals (1-row TakeOrdered collect per
    round; each round's survivor array frame persisted, all unpersisted
    on exit)."""
    cur = _bpe_doc_tokens(df, id_col, text_col)
    persisted = []
    merges: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, rounds + 1):
            cur = cur.persist()
            persisted.append(cur)
            top = (
                _bpe_pair_counts(cur)
                .orderBy(F.desc("cnt"), "tok", "nxt")
                .limit(1)
                .collect()
            )
            if not top:
                break
            x, y, cnt = top[0]["tok"], top[0]["nxt"], top[0]["cnt"]
            merges.append((r, x, y, int(cnt)))
            if r == rounds:
                break
            cur = cur.select(
                "doc_id", _bpe_merge_expr(F.col("toks"), x, y).alias("toks")
            )
        return merges
    finally:
        for f in persisted:
            f.unpersist()


def bpe_tokenize_with_merges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """BPE INFERENCE after training: learn ``rounds`` merges
    (:func:`bpe_train_rounds`'s loop), then re-tokenize the corpus by
    applying them in order and report per-document compression —
    (doc_id, n_tok_before, n_tok_after). Because the learned merges are
    driver literals by the time the output plan is built, the apply
    side is a PURE expression chain (``rounds`` nested merge folds over
    each document's token array in one shuffle-free projection, no
    collects in its lineage) — the shape a tokenize-the-whole-corpus
    production job has, where the merge table is read from the
    tokenizer artifact instead of retrained."""
    merges = _bpe_learn_merges(df, id_col, text_col, rounds)
    cur = F.col("toks")
    for _, x, y, _cnt in merges:
        cur = _bpe_merge_expr(cur, x, y)
    return (
        _bpe_doc_tokens(df, id_col, text_col)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tok_before"),
            F.size(cur).cast("long").alias("n_tok_after"),
        )
        .orderBy("doc_id")
    )
