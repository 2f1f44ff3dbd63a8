"""Deterministic hash sampling: reproducibility across partitionings,
stratum fractions, split disjointness/exhaustiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.sampling import (
    hash_sample,
    hash_split,
    hash_uniform01,
    stratified_hash_sample,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_hash_sample_partitioning_invariant(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.25).collect()}
    b = {r["doc_id"] for r in hash_sample(df.repartition(17), "doc_id", 0.25).collect()}
    assert a == b  # same rows regardless of layout
    assert 0.18 < len(a) / 2000 < 0.32  # near the asked fraction


def test_hash_sample_salt_changes_draw(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.25).collect()}
    c = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.25, salt="v2").collect()}
    assert a != c  # independent draw
    assert 0.18 < len(c) / 2000 < 0.32


def test_stratified_fractions(spark):
    df = _corpus(spark)
    out = stratified_hash_sample(df, "doc_id", "lang", {"en": 1.0, "de": 0.1}).collect()
    en = sum(1 for r in out if r["lang"] == "en")
    de = sum(1 for r in out if r["lang"] == "de")
    n_en = 2000 // 3 + 1
    assert en == n_en  # fraction 1.0 keeps every row
    assert 0.04 < de / (2000 - n_en) < 0.18


def test_hash_split_disjoint_exhaustive_stable(spark):
    df = _corpus(spark)
    tr, ev, te = hash_split(df, "doc_id", [0.8, 0.1, 0.1])
    s_tr = {r["doc_id"] for r in tr.collect()}
    s_ev = {r["doc_id"] for r in ev.collect()}
    s_te = {r["doc_id"] for r in te.collect()}
    assert s_tr | s_ev | s_te == set(range(2000))
    assert not (s_tr & s_ev) and not (s_tr & s_te) and not (s_ev & s_te)
    # stable under repartition
    tr2 = {r["doc_id"] for r in hash_split(df.repartition(13), "doc_id", [0.8, 0.1, 0.1])[0].collect()}
    assert tr2 == s_tr
    assert 0.74 < len(s_tr) / 2000 < 0.86


def test_uniform01_range_and_pushdown(spark):
    df = _corpus(spark)
    mm = df.select(
        F.min(hash_uniform01(F.col("doc_id"))).alias("lo"),
        F.max(hash_uniform01(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0


def test_weighted_sample_proportional_inclusion(spark):
    """A weight-10 minority (10% of rows) should win ~half of a
    weighted draw (10x weight x 10% of population ~= the weight-1
    majority's total mass); a uniform sampler would give it ~10%."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops.sampling import weighted_sample

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") < 100, 10.0).otherwise(1.0).alias("w"),
    )
    heavy = 0
    for s in range(5):
        picked = weighted_sample(df, "id", "w", k=100, salt=f"s{s}").collect()
        assert len(picked) == 100
        heavy += sum(1 for r in picked if r["id"] < 100)
    frac = heavy / 500.0
    assert 0.30 < frac < 0.75, frac
    # deterministic: same salt -> identical draw
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50, salt="x").collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 50, salt="x").collect())
    assert a == b


def test_shuffled_shards_two_level_identical_pos(spark):
    """The scale-safe two-level (shard, sub-bucket) rank must produce
    bit-identical (shard, pos) to the legacy single-window path — the
    sub-bucket is a monotone prefix of the position draw, so offset +
    local rank IS the global per-shard rank."""
    from real_estate_data_pipeline_spark.ops.sampling import shuffled_shards

    df = _corpus(spark)
    legacy = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffled_shards(df, "doc_id", 4, max_rows_per_task=None).collect()
    }
    two_level = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffled_shards(df, "doc_id", 4, max_rows_per_task=50).collect()
    }
    assert legacy == two_level


def test_shuffled_shards_task_budget_enforced(spark):
    """No (shard, sub-bucket) window partition may exceed the task
    budget by more than hash-imbalance slack: with budget B and n_sub =
    ceil(n/shards/B), the expected bucket size is <= B and the observed
    max must stay within 2x of it."""
    from pyspark.sql import functions as F

    from real_estate_data_pipeline_spark.ops.sampling import (
        hash_uniform01,
        shuffled_shards,
    )

    df = _corpus(spark, 2000)
    budget = 40
    out = shuffled_shards(df, "doc_id", 4, max_rows_per_task=budget)
    # reconstruct the sub-bucket the op used: n_sub = ceil(2000/4/40) = 13
    n_sub = 13
    pu = hash_uniform01(F.col("doc_id"), "shard:pos")
    sizes = (
        out.withColumn("__sub", F.floor(pu * n_sub))
        .groupBy("shard", "__sub")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert sizes <= 2 * budget, sizes
    # pos is a dense 1..n_shard permutation per shard
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"]


def test_shuffled_shards_derives_shard_count(spark):
    """target_rows_per_shard sizes the shard count from the data —
    nothing at 100 TB should depend on a human guessing n_shards."""
    from real_estate_data_pipeline_spark.ops.sampling import shuffled_shards

    df = _corpus(spark, 2000)
    out = shuffled_shards(df, "doc_id", target_rows_per_shard=250)
    n_shards = out.select("shard").distinct().count()
    assert n_shards == 8  # ceil(2000/250)


def test_temperature_mix_quota_shape(spark):
    """alpha=0 -> equal quotas regardless of group size; alpha=1 ->
    size-proportional; 0<alpha<1 lifts the small group's share; the
    fill is deterministic across partitionings."""
    from real_estate_data_pipeline_spark.ops.sampling import temperature_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "small").otherwise("big").alias("g"),
    )  # big=900, small=100
    def quotas(alpha):
        out = temperature_mix(df, "doc_id", "g", n_target=100, alpha=alpha)
        return {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    eq = quotas(0.0)
    assert eq == {"big": 50, "small": 50}
    prop = quotas(1.0)
    assert prop == {"big": 90, "small": 10}
    temp = quotas(0.5)
    assert 10 < temp["small"] < 50 and 50 < temp["big"] < 90
    # deterministic under repartitioning
    a = {r["doc_id"] for r in temperature_mix(df, "doc_id", "g", 100, 0.5).collect()}
    b = {r["doc_id"] for r in temperature_mix(df.repartition(17), "doc_id", "g", 100, 0.5).collect()}
    assert a == b


def test_temperature_mix_tokens_greedy_quota(spark):
    """Token-budget variant: each group's kept set is EXACTLY the
    maximal hash-order prefix whose running token sum stays within the
    n^alpha token quota — verified against a Python replay of the same
    hash order; and the fill is deterministic under repartitioning."""
    import hashlib

    from real_estate_data_pipeline_spark.ops.sampling import temperature_mix_tokens

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "small").otherwise("big").alias("g"),
        (F.col("id") % 37 + 1).cast("long").alias("n_tok"),
    )
    out = temperature_mix_tokens(df, "doc_id", "g", "n_tok", n_target_tokens=2000, alpha=0.7)
    kept = {r["doc_id"] for r in out.collect()}

    rows = df.collect()
    masses = {}
    for r in rows:
        masses[r["g"]] = masses.get(r["g"], 0) + r["n_tok"]
    tot = sum(round(m**0.7, 6) for m in masses.values())
    quotas = {
        g: int(round(m**0.7, 6) / tot * 2000 + 0.5) // 1 for g, m in masses.items()
    }

    def draw(doc_id):
        h = hashlib.sha256(f"{doc_id}mixtok".encode()).hexdigest()
        return int(h[:8], 16) / 4294967296.0

    want = set()
    for g in masses:
        members = sorted(
            (r for r in rows if r["g"] == g), key=lambda r: (draw(r["doc_id"]), r["doc_id"])
        )
        cum = 0
        for r in members:
            cum += r["n_tok"]
            if cum <= quotas[g]:
                want.add(r["doc_id"])
            else:
                break  # greedy: an overflowing doc stops the whole prefix
    assert kept == want
    # per-group kept token mass within quota
    sums = {
        r["g"]: r["s"]
        for r in out.groupBy("g").agg(F.sum("n_tok").alias("s")).collect()
    }
    for g, s in sums.items():
        assert s <= quotas[g]
    b = {
        r["doc_id"]
        for r in temperature_mix_tokens(
            df.repartition(13), "doc_id", "g", "n_tok", 2000, 0.7
        ).collect()
    }
    assert kept == b
