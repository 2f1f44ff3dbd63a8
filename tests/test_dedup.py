"""SimHash dedup: pigeonhole-blocking recall guarantee and signature
behavior. The recall test constructs signatures directly so it can place
the differing bits exactly where the old top-16-bit prefix blocking
(VERDICT r1 "What's wrong" #7) silently dropped pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.dedup import (
    simhash_dup_pairs,
    simhash_pairs_from_signatures,
    simhash_signatures,
)


def _sig_df(spark, sigs: dict[str, int]):
    rows = [(k, v if v < 2**63 else v - 2**64) for k, v in sigs.items()]
    return spark.createDataFrame(rows, "doc_id string, __sim long")


def test_pigeonhole_recall_high_bit_difference(spark):
    """A pair differing ONLY inside the top 16 bits (bit 60) — exactly the
    class the old prefix blocking missed — must be found at Hamming 1."""
    base = 0x1234_5678_9ABC_DEF0
    sh = _sig_df(
        spark,
        {
            "a": base,
            "b": base ^ (1 << 60),          # hamming 1, high bit
            "c": base ^ 0xF000_0000_0000_0000,  # hamming 4 from a -> excluded
        },
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_from_signatures(sh, "doc_id", max_hamming=3).collect()
    }
    assert got.get(("a", "b")) == 1
    assert ("a", "c") not in got  # hamming 4 > 3


def test_pigeonhole_recall_spread_bits(spark):
    """Hamming-3 pair with differing bits spread across three different
    segments still agrees exactly on the fourth segment -> found."""
    base = 0x0F0F_0F0F_0F0F_0F0F
    other = base ^ (1 << 2) ^ (1 << 20) ^ (1 << 40)  # segs 0,1,2 differ; seg 3 agrees
    sh = _sig_df(spark, {"x": base, "y": other})
    rows = simhash_pairs_from_signatures(sh, "doc_id", max_hamming=3).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 3


def test_identical_signatures_yield_one_pair(spark):
    """Identical signatures agree on ALL segments; distinct() must
    collapse the per-segment candidates to one pair row."""
    sh = _sig_df(spark, {"p": 42, "q": 42})
    rows = simhash_pairs_from_signatures(sh, "doc_id", max_hamming=3).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


def test_simhash_end_to_end_near_dup(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "the quick brown fox jumps over the lazy dog near the river bank"),
            ("d2", "the quick brown fox jumps over the lazy cat near the river bank"),
            ("d3", "completely unrelated text about spark structured streaming state"),
        ],
        "doc_id string, text string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_dup_pairs(docs, "doc_id", "text", max_hamming=16).collect()}
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") not in pairs and ("d2", "d3") not in pairs


def test_simhash_signature_deterministic_and_empty(spark):
    docs = spark.createDataFrame(
        [("a", "hello world hello"), ("b", "hello world hello"), ("e", "")],
        "doc_id string, text string",
    )
    sigs = {r["doc_id"]: r["__sim"] for r in
            simhash_signatures(docs, "doc_id", "text").collect()}
    assert sigs["a"] == sigs["b"]  # same text -> same signature
    assert sigs["e"] == 0          # token-less doc keeps the zero signature
    assert len(sigs) == 3          # explode_outer must not drop the empty doc


def test_simhash_plan_no_cartesian(spark):
    docs = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y w")], "doc_id string, text string"
    )
    plan = simhash_dup_pairs(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_report_planted_overlap(spark):
    from real_estate_data_pipeline_spark.ops.dedup import contamination_report

    train = spark.createDataFrame(
        [("t1", "the quick brown fox jumps over the lazy dog"),
         ("t2", "spark structured streaming with watermarks")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "a story where the quick brown fox appears verbatim"),
         ("e2", "entirely novel sentence sharing no trigram at all"),
         ("e3", "the quick brown fox jumps over the lazy dog")],  # full copy
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in
            contamination_report(train, ev, "doc_id", "text", shingle_n=3).collect()}
    assert "e2" not in rows                       # clean doc absent
    assert rows["e3"]["contam_frac"] == 1.0       # verbatim copy fully flagged
    assert 0 < rows["e1"]["n_overlap"] < rows["e3"]["n_overlap"]
    # plan stays an equi-join (no cross product of the corpora)
    plan = contamination_report(train, ev, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_contamination_report_empty_gram_docs(spark):
    """r15 opt round: explode -> explode_outer + NOT-NULL inside
    contamination_report/train_gram_set (keeps the optimizer's inferred
    size(grams)>0 constraint from duplicating the shingle expression
    below the scan exchange). The outer explode surfaces one NULL gram
    row for empty/whitespace docs — this pins that those rows die in
    the filter on BOTH sides: an empty train doc contributes no gram
    and an empty eval doc never appears in the report."""
    from real_estate_data_pipeline_spark.ops.dedup import (
        contamination_report,
        train_gram_set,
    )

    train = spark.createDataFrame(
        [("t1", "the quick brown fox jumps over the lazy dog"),
         ("t_empty", ""), ("t_ws", "     ")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "where the quick brown fox appears"),
         ("e_empty", ""), ("e_ws", "      ")],
        "doc_id string, text string",
    )
    grams = {r["gram"] for r in train_gram_set(train, "text", 3).collect()}
    assert None not in grams and "" not in grams
    assert grams, "non-empty train doc must still contribute grams"
    rows = {r["doc_id"]: r for r in
            contamination_report(train, ev, "doc_id", "text", shingle_n=3).collect()}
    assert set(rows) == {"e1"}  # empty/whitespace eval docs never surface
    assert rows["e1"]["n_overlap"] > 0


def test_contamination_precomputed_grams_and_prefilter_match(spark, tmp_path):
    """The persisted train_gram_set path (+ broadcast hash prefilter)
    must be value-identical to the recompute-every-time path, and the
    prefilter's position set must be bounded by the modulus."""
    from real_estate_data_pipeline_spark.ops.dedup import (
        contamination_report,
        train_gram_set,
    )

    train = spark.createDataFrame(
        [("t1", "the quick brown fox jumps over the lazy dog"),
         ("t2", "spark structured streaming with watermarks")],
        "doc_id string, text string",
    )
    ev = spark.createDataFrame(
        [("e1", "a story where the quick brown fox appears verbatim"),
         ("e2", "entirely novel sentence sharing no trigram at all"),
         ("e3", "the quick brown fox jumps over the lazy dog")],
        "doc_id string, text string",
    )
    base = sorted(
        map(tuple, contamination_report(train, ev, "doc_id", "text", 3).collect())
    )
    for hashed in (False, True):
        idx = str(tmp_path / f"grams_{hashed}")
        train_gram_set(train, "text", 3, hashed=hashed).write.parquet(idx)
        grams = spark.read.parquet(idx)
        # tiny modulus (8) forces real false positives through the
        # prefilter, and every k (1 = legacy single-hash shape, 3 =
        # default bloom, 5 = extra hashes) must stay value-identical —
        # the exact join absorbs whatever the bloom passes
        for mod in (None, 8, 1 << 20):
            for k in (1, 3, 5):
                reused = sorted(map(tuple, contamination_report(
                    None, ev, "doc_id", "text", 3,
                    train_grams=grams, prefilter_mod=mod, prefilter_k=k,
                ).collect()))
                assert reused == base, (hashed, mod, k)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        contamination_report(None, ev, "doc_id", "text", 3)


def test_containment_catches_subset_duplication(spark):
    """A short doc quoted whole inside a longer one: containment ~1.0,
    Jaccard low — the asymmetric measure finds what Jaccard misses."""
    from real_estate_data_pipeline_spark.ops.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            ("s", quote),
            ("l", quote + " padded with many extra unrelated words " * 5),
            ("x", "entirely different content with no shared tokens here"),
        ],
        "doc_id string, text string",
    ).withColumn("blk", F.lit(1))
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(df, "doc_id", "text", ["blk"]).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", ["blk"]).collect()
    }
    assert cont[("l", "s")] == 1.0          # full containment of the quote
    assert jac[("l", "s")] < 0.6            # Jaccard diluted by the padding
    assert cont[("s", "x")] < 0.2           # unrelated docs stay unrelated


def test_fuzzy_pairs_levenshtein_blocked(spark):
    """Planted typos at distance 1 are found, far strings are not, and
    cross-block pairs are never compared (the blocking contract)."""
    from real_estate_data_pipeline_spark.ops.dedup import fuzzy_string_pairs

    df = spark.createDataFrame(
        [
            (1, "alexander hamilton", "us"),
            (2, "alexander hamiltop", "us"),   # distance 1
            (3, "alexander hamilton", "uk"),   # identical but other block
            (4, "benjamin franklin!", "us"),   # far away (same length)
        ],
        "id int, name string, country string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_string_pairs(df, "id", "name", ["country"]).collect()
    }
    assert pairs == {(1, 2): 1}  # typo found; 3 blocked away; 4 too far


def test_pairs_stripe_split_same_pairs(spark):
    """The opt-in stripe split (skew parallelism for expensive pair
    functions) must emit EXACTLY the unsplit pair set — each pair once,
    partitioned by left index, across every (threshold, factor) regime:
    blocks under the threshold (single salt-0 copy), blocks over it
    (every stripe enumerated once), and block size not divisible by the
    factor."""
    from real_estate_data_pipeline_spark.ops.pairs import pairs_within_groups
    from pyspark.sql import functions as F

    rows = [(g, i + (0 if g == "a" else 100)) for g in ("a", "b") for i in range(23 if g == "a" else 3)]
    df = spark.createDataFrame(rows, "grp string, id int")
    member = F.struct(F.col("id").alias("id"))
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x["id"], y["id"]).alias("id_a"),
        F.greatest(x["id"], y["id"]).alias("id_b"),
    )

    def run(**kw):
        out = pairs_within_groups(df, ["grp"], member, pair, **kw).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in out]
        assert len(pairs) == len(set(pairs)), "a pair was emitted twice"
        return set(pairs)

    base = run()
    assert run(split_factor=4, split_threshold=8) == base
    assert run(split_factor=7, split_threshold=2) == base
    assert run(split_factor=4, split_threshold=1000) == base  # never splits


def test_incremental_minhash_equals_batch_restriction(spark):
    """The persisted-index probe must return EXACTLY the batch
    self-join's pairs restricted to (new x corpus): same banding, same
    agreement, no pair invented or lost by the index path."""
    from real_estate_data_pipeline_spark.ops.dedup import (
        incremental_minhash_dup_pairs_portable,
        minhash_band_buckets_portable,
        minhash_dup_pairs_portable,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different sentence about spark physical plans",
        "numbers one two three four five six seven eight nine ten",
    ]
    rows = []
    for i, txt in enumerate(base):
        rows.append((i, txt))                      # corpus copy
        rows.append((100 + i, txt))                # near-identical new copy
        rows.append((200 + i, txt + " extra tail tokens added here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.filter("doc_id < 100")
    new = df.filter("doc_id >= 100")

    idx = minhash_band_buckets_portable(corpus, "doc_id", "text")
    inc = {
        (r["new_id"], r["dup_of"], r["jaccard_est"])
        for r in incremental_minhash_dup_pairs_portable(
            idx, new, "doc_id", "text"
        ).collect()
    }
    full = minhash_dup_pairs_portable(df, "doc_id", "text").collect()
    want = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if a < 100 <= b:
            want.add((b, a, r["jaccard_est"]))
        elif b < 100 <= a:
            want.add((a, b, r["jaccard_est"]))
    assert inc == want
    assert inc, "fixture must produce at least one cross-split pair"


def test_minhash_multi_band_pair_emitted_once(spark):
    """r16 once-emission: identical documents agree on EVERY band, so
    the pair is a candidate in all 8 buckets — it must surface exactly
    once (the old path collapsed the copies with a dropDuplicates
    exchange; the new path emits only from the first agreeing band)."""
    from real_estate_data_pipeline_spark.ops.dedup import minhash_dup_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words appear here right now ok"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_dup_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, jaccard_threshold=0.5
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_est"]) for r in rows] == [(1, 2, 1.0)]


def test_incremental_probe_multi_band_pair_emitted_once(spark):
    """The index probe must return one row per (new, corpus) pair even
    when the pair agrees on every band (dropDuplicates path — the
    once-emission variant was measured slower here and rejected, see
    incremental_pairs_from_buckets docstring)."""
    from real_estate_data_pipeline_spark.ops import dedup

    rows = [(i, "same text in every copy of this document") for i in range(4)]
    rows += [(10 + i, f"unique filler sentence number {i} with tail") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bk = dedup.minhash_band_buckets_portable(df, "doc_id", "text", num_perm=16, bands=4)
    idx, inc = bk.filter("doc_id < 2"), bk.filter("doc_id >= 2")
    got = [
        tuple(r)
        for r in dedup.incremental_pairs_from_buckets(
            idx, inc, "doc_id", num_perm=16, jaccard_threshold=0.5
        ).collect()
    ]
    assert len(got) == len(set(got)) and got, "one row per pair, at least one pair"
    assert sorted({(n, c) for n, c, _ in got}) == [(2, 0), (2, 1), (3, 0), (3, 1)]
