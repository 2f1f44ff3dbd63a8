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
