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


def _bpe_token_positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Dense (doc_id, pos, tok) rows from whitespace tokens (empties
    filtered) — the frame every BPE round operates on."""
    tk = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != F.lit("")
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(tk).alias("p", "tok")
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("pos"), "tok")


def _bpe_rewrite(cur: DataFrame, x: str, y: str, led: DataFrame | None = None) -> DataFrame:
    """One greedy left-to-right non-overlapping merge of the adjacent
    pair (x, y) over a (doc_id, pos, tok) frame, via the islands-parity
    trick (see bpe_train_rounds docstring); returns the merged frame
    with re-densified positions. Pass ``led`` (the frame WITH the nxt
    lead column, e.g. the census input) to skip recomputing the lead
    window — the training loop shares one windowed frame per round."""
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    if led is None:
        led = cur.withColumn("nxt", F.lead("tok").over(wdoc))
    pred = F.when((F.col("tok") == F.lit(x)) & (F.col("nxt") == F.lit(y)), 1).otherwise(0)
    # Islands parity with ONE window key: a run of consecutive pr=1
    # positions starts where pr=1 and the previous row has pr=0 (or
    # none); the running MAX of those start positions gives every pr=1
    # row ITS island's start, and "odd offset within the island" is
    # (pos - start) % 2 == 0. The original formulation reached the
    # same flags through row_numbers over (doc_id, pr) and
    # (doc_id, pr, grp) — two extra exchanges PER ROUND that repartition
    # the whole token frame on keys no other stage uses. Everything
    # here rides the same doc_id-partitioned, pos-ordered window as the
    # lead/lag steps, so the rewrite costs one shuffle total.
    wrun = wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = led.withColumn("pr", pred).withColumn(
        "st_pos",
        F.max(
            F.when(
                (F.col("pr") == 1)
                & (F.coalesce(F.lag(pred).over(wdoc), F.lit(0)) == 0),
                F.col("pos"),
            )
        ).over(wrun),
    )
    is_start = (
        (F.col("pr") == 1) & ((F.col("pos") - F.col("st_pos")) % 2 == 0)
    ).cast("int")
    flagged = marked.withColumn("is_start", is_start).withColumn(
        "consumed", F.coalesce(F.lag("is_start").over(wdoc), F.lit(0))
    )
    survivors = flagged.filter(F.col("consumed") == 0).select(
        "doc_id",
        "pos",
        F.when(
            F.col("is_start") == 1, F.concat(F.col("tok"), F.lit(" "), F.col("nxt"))
        )
        .otherwise(F.col("tok"))
        .alias("tok"),
    )
    return survivors.select(
        "doc_id",
        F.row_number().over(wdoc).cast("long").alias("__npos"),
        "tok",
    ).withColumnsRenamed({"__npos": "pos"})


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
    declaratively with the islands trick: within each maximal run of
    consecutive pair-match positions, every ODD-offset position starts a
    merge, and the position after a merge start is consumed. All windows
    partition by document id — bounded by document length, never a
    global sort — and each round's surviving (doc_id, pos, tok) frame is
    persisted so round N+1 reads the cache instead of replaying rounds
    1..N (the Lloyd-round persistence pattern). The per-round top pair
    is a 1-row TakeOrdered collect (the model-broadcast pattern): the
    merge decision must become a literal in the next round's plan.

    Stops early if a round finds no adjacent pairs. The heavy work —
    census aggregates and per-document windows — is fully distributed;
    only the ``rounds``-row merge table lives on the driver."""
    spark = df.sparkSession
    merges = _bpe_learn_merges(df, id_col, text_col, rounds)
    return spark.createDataFrame(
        merges, schema="round int, tok_a string, tok_b string, pair_count bigint"
    )


def _bpe_learn_merges(
    df: DataFrame, id_col: str, text_col: str, rounds: int
) -> list[tuple[int, str, str, int]]:
    """The training loop behind :func:`bpe_train_rounds`: returns the
    learned merges as driver literals (1-row TakeOrdered collect per
    round; each round's survivor frame persisted, all unpersisted on
    exit)."""
    cur = _bpe_token_positions(df, id_col, text_col)
    persisted = []
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, rounds + 1):
            # persist the POST-window frame: both the census (now) and
            # the rewrite (below) read it, so the lead window runs once
            # per round instead of twice
            led = cur.withColumn("nxt", F.lead("tok").over(wdoc)).persist()
            persisted.append(led)
            top = (
                led.filter(F.col("nxt").isNotNull())
                .groupBy("tok", "nxt")
                .agg(F.count("*").alias("cnt"))
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
            cur = _bpe_rewrite(cur, x, y, led=led)
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
    side is a PURE expression chain (``rounds`` islands-parity window
    passes in one job, no collects in its lineage) — the shape a
    tokenize-the-whole-corpus production job has, where the merge table
    is read from the tokenizer artifact instead of retrained."""
    merges = _bpe_learn_merges(df, id_col, text_col, rounds)
    base = _bpe_token_positions(df, id_col, text_col)
    before = base.groupBy("doc_id").agg(F.count("*").alias("n_tok_before"))
    cur = base
    for _, x, y, _cnt in merges:
        cur = _bpe_rewrite(cur, x, y)
    after = cur.groupBy("doc_id").agg(F.count("*").alias("n_tok_after"))
    return before.join(after, "doc_id").orderBy("doc_id")
