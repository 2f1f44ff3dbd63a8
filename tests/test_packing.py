"""Chunking & sequence packing: window math, overlap coverage, budget
discipline, partitioning stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.packing import chunk_documents, pack_sequences


def test_chunking_covers_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, ""), (4, None)],
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    # 100 tokens, stride 24: ceil((100-8)/24) = 4 chunks
    assert len(by_id[1]) == 4
    chunks = sorted(by_id[1], key=lambda r: r["chunk_id"])
    assert chunks[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    # consecutive chunks share exactly 8 tokens of context
    for a, b in zip(chunks, chunks[1:]):
        assert a["chunk_text"].split()[-8:] == b["chunk_text"].split()[:8]
    # full coverage: union of chunk tokens = all tokens
    seen = set()
    for c in chunks:
        seen.update(c["chunk_text"].split())
    assert len(seen) == 100
    assert len(by_id[2]) == 1 and by_id[2][0]["n_tokens"] == 2  # sub-window doc
    assert 3 not in by_id and 4 not in by_id  # empty/null yield nothing


def test_packing_budget_and_stability(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 90 + 10).alias("n_tokens")
    )
    out = pack_sequences(df, budget=512, n_buckets=4).collect()
    assert len(out) == 500  # every document assigned
    # within a sequence, total tokens stay under budget + one doc spill
    per_seq = {}
    for r in out:
        per_seq.setdefault(r["seq_id"], []).append(r["n_tokens"])
    for seq, toks in per_seq.items():
        assert sum(toks) < 512 + 100  # budget + max doc size
    # layout is partitioning-invariant
    again = pack_sequences(
        spark.range(500).select(F.col("id").alias("doc_id"),
                                (F.col("id") % 90 + 10).alias("n_tokens")).repartition(11),
        budget=512, n_buckets=4,
    ).collect()
    assert {(r["doc_id"], r["seq_id"]) for r in again} == {(r["doc_id"], r["seq_id"]) for r in out}


def test_span_corruption_reconstructs_original(spark):
    """Substituting every <extra_id_k> in the input with its target span
    must reproduce the original (lowercased) token stream exactly, and
    sentinel ids must be dense 0..K-1 in both input and target."""
    import re

    from real_estate_data_pipeline_spark.ops.packing import span_corruption

    rows = [
        (1, "The quick Brown fox jumps over the lazy dog again and again today"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one"),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(df, mask_rate=0.4).collect()}
    assert 4 not in out  # blank doc yields nothing
    for doc_id, text in rows[:3]:
        r = out[doc_id]
        orig = text.lower().split()
        assert r["n_tokens"] == len(orig)
        spans = {}
        cur = None
        for tok in r["target_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        assert sorted(spans) == list(range(len(spans)))  # dense ids
        rebuilt = []
        for tok in r["input_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == orig
        assert r["n_masked"] == sum(len(v) for v in spans.values())


def _greedy_merge_ref(toks, x, y):
    """Python reference for greedy left-to-right non-overlapping merge."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == x and toks[i + 1] == y:
            out.append(x + " " + y)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _bpe_ref(texts, rounds):
    """Python reference for the whole training loop (census -> top pair
    with lexicographic tie-break -> greedy rewrite -> repeat)."""
    import re
    from collections import Counter

    seqs = [[t for t in re.split(r"\s+", s.lower().strip()) if t] for s in texts]
    merges = []
    for r in range(1, rounds + 1):
        c = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                c[(a, b)] += 1
        if not c:
            break
        (x, y), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, x, y, cnt))
        if r == rounds:
            break
        seqs = [_greedy_merge_ref(s, x, y) for s in seqs]
    return merges, seqs


def test_bpe_rewrite_matches_python_reference(spark):
    """The per-document merge FOLD must implement EXACTLY greedy
    left-to-right non-overlapping merging — including self-overlapping
    runs ('a a a a' with pair (a,a) -> ['a a', 'a a']). 200 seeded
    random docs over a 3-token alphabet (runs are frequent), ONE Spark
    job, every doc compared to the Python reference — plus a NESTED
    two-merge expression (the inference-path shape) checked by applying
    the reference merges sequentially."""
    import random

    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops.packing import (
        _bpe_doc_tokens,
        _bpe_merge_expr,
    )

    rng = random.Random(42)
    docs = [
        (i, " ".join(rng.choice("a b c".split()) for _ in range(rng.randint(0, 12))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = _bpe_doc_tokens(df, "doc_id", "text")
    for pair in [("a", "a"), ("a", "b"), ("c", "c")]:
        merged = base.select(
            "doc_id", _bpe_merge_expr(F.col("toks"), *pair).alias("toks")
        )
        got = {r["doc_id"]: list(r["toks"]) for r in merged.collect()}
        for doc_id, text in docs:
            want = _greedy_merge_ref([t for t in text.split() if t], *pair)
            if not want:
                assert doc_id not in got, (pair, doc_id, text)
            else:
                assert got[doc_id] == want, (pair, doc_id, text)
    nested = base.select(
        "doc_id",
        _bpe_merge_expr(
            _bpe_merge_expr(F.col("toks"), "a", "a"), "a a", "b"
        ).alias("toks"),
    )
    got = {r["doc_id"]: list(r["toks"]) for r in nested.collect()}
    for doc_id, text in docs:
        want = _greedy_merge_ref(
            _greedy_merge_ref([t for t in text.split() if t], "a", "a"), "a a", "b"
        )
        if want:
            assert got[doc_id] == want, (doc_id, text)


def test_bpe_train_rounds_matches_python_reference(spark):
    """The full unrolled training loop (3 rounds incl. the re-census on
    merged corpora and the lexicographic tie-break) equals the Python
    reference on a seeded random corpus."""
    import random

    from real_estate_data_pipeline_spark.ops.packing import (
        bpe_tokenize_with_merges,
        bpe_train_rounds,
    )

    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("x y z w".split()) for _ in range(rng.randint(0, 15))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["round"], r["tok_a"], r["tok_b"], r["pair_count"])
        for r in bpe_train_rounds(df, rounds=3).collect()
    ]
    want, final_seqs = _bpe_ref([t for _, t in docs], 3)
    assert got == want
    # the training loop skips the LAST round's rewrite (only the census
    # matters there), but the apply path performs all 3 merges — bring
    # the reference corpus up to the applied state
    if want:
        _, x, y, _ = want[-1]
        final_seqs = [_greedy_merge_ref(s, x, y) for s in final_seqs]
    # and the apply path's after-counts equal the reference's final corpus
    after = {
        r["doc_id"]: (r["n_tok_before"], r["n_tok_after"])
        for r in bpe_tokenize_with_merges(df, rounds=3).collect()
    }
    for (doc_id, text), seq in zip(docs, final_seqs):
        n0 = len([t for t in text.split() if t])
        if n0 == 0:
            assert doc_id not in after
        else:
            assert after[doc_id] == (n0, len(seq)), (doc_id, text)
