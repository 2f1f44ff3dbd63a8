"""Property-based checks (SURVEY §5.4) with hypothesis: invariants that
must hold for ANY input, not just fixtures. Example counts are kept low
because every example pays a Spark job.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_estate_data_pipeline_spark.ops.dedup import keep_latest
from real_estate_data_pipeline_spark.ops.functions import completeness_score, midpoint
from real_estate_data_pipeline_spark.ops.skew import salted_aggregate
from real_estate_data_pipeline_spark.schema.conform import conform

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),          # key
        st.integers(min_value=0, max_value=5),         # ts
        st.integers(min_value=0, max_value=1000),      # id (tiebreak)
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(rows_strategy)
def test_keep_latest_exactly_one_per_key(spark, rows):
    df = spark.createDataFrame(rows, "k string, ts int, id int, v double")
    out = keep_latest(df, ["k"], "ts", tiebreakers=["id"]).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys)) == df.select("k").distinct().count()
    # winner is the lexicographic max of (ts, id) within its key
    by_key = {}
    for k, ts, i, v in rows:
        if k not in by_key or (ts, i) > by_key[k]:
            by_key[k] = (ts, i)
    for r in out:
        assert (r["ts"], r["id"]) == by_key[r["k"]]


@SLOW
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=5)),
            st.one_of(st.none(), st.floats(allow_nan=False, min_value=-10, max_value=10)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_completeness_score_bounds(spark, rows):
    df = spark.createDataFrame(rows, "a string, b double")
    vals = [
        r["s"] for r in df.select(
            completeness_score([F.col("a"), F.col("b")]).alias("s")
        ).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert all(v * 2 == int(v * 2) for v in vals)  # quantized to halves for 2 fields


@SLOW
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(min_value=0, max_value=1e9, allow_nan=False)),
            st.one_of(st.none(), st.floats(min_value=0, max_value=1e9, allow_nan=False)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_midpoint_fallbacks(spark, rows):
    df = spark.createDataFrame(rows, "lo double, hi double")
    out = df.select("lo", "hi", midpoint(F.col("lo"), F.col("hi")).alias("m")).collect()
    for r in out:
        if r["lo"] is not None and r["hi"] is not None:
            assert math.isclose(r["m"], (r["lo"] + r["hi"]) / 2)
        elif r["lo"] is not None:
            assert r["m"] == r["lo"]
        elif r["hi"] is not None:
            assert r["m"] == r["hi"]
        else:
            assert r["m"] is None


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["HOT"] * 8 + ["a", "b"]),  # heavy skew
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_salted_aggregate_equals_plain(spark, rows):
    df = spark.createDataFrame(rows, "k string, v int")
    df = df.withColumn("rid", F.monotonically_increasing_id())
    plain = {
        (r["k"], r["s"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r["k"], r["s"], r["n"])
        for r in salted_aggregate(
            df, ["k"], {"s": ("v", "sum"), "n": ("*", "count")}, n_salts=4, salt_from="rid"
        ).collect()
    }
    assert plain == salted


@SLOW
@given(st.sets(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=4))
def test_conform_always_exact_schema(spark, present_cols):
    target = T.StructType(
        [
            T.StructField("a", T.StringType()),
            T.StructField("b", T.DoubleType()),
            T.StructField("c", T.ArrayType(T.StringType())),
            T.StructField("d", T.TimestampType()),
        ]
    )
    # build an input with only `present_cols`, all strings (worst case)
    if present_cols:
        row = tuple("1" for _ in present_cols)
        df = spark.createDataFrame([row], ", ".join(f"{c} string" for c in sorted(present_cols)))
    else:
        df = spark.createDataFrame([(1,)], "z int")
    out = conform(df, target)
    assert [f.name for f in out.schema.fields] == ["a", "b", "c", "d"]
    assert {f.name: f.dataType for f in out.schema.fields} == {
        f.name: f.dataType for f in target.fields
    }
    out.collect()  # must also evaluate


pair_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2", "g3"]),       # blocking group
        st.integers(min_value=0, max_value=50),    # member id (dups allowed)
        st.integers(min_value=-5, max_value=5),    # payload
    ),
    min_size=1,
    max_size=25,
)


@SLOW
@given(pair_rows)
def test_pairs_within_groups_equals_self_join(spark, rows):
    """The intra-group expansion must emit exactly the pairs a blocked
    self-join would (same multiset of (group, unordered id pair)) — the
    skeleton every LSH/blocking operator rests on."""
    from real_estate_data_pipeline_spark.ops.pairs import pairs_within_groups

    # distinct (g, i): the expansion pairs ARRAY POSITIONS, a self-join
    # pairs ROWS; they agree on sets, so dedup ids within groups first
    seen, uniq = set(), []
    for g, i, p in rows:
        if (g, i) not in seen:
            seen.add((g, i))
            uniq.append((g, i, p))
    df = spark.createDataFrame(uniq, "g string, i int, p int")
    got = {
        (r["g"], r["id_a"], r["id_b"], r["pa"] + r["pb"])
        for r in pairs_within_groups(
            df,
            ["g"],
            F.struct(F.col("g").alias("g"), F.col("i").alias("i"), F.col("p").alias("p")),
            lambda x, y: F.struct(
                x["g"].alias("g"),
                F.least(x["i"], y["i"]).alias("id_a"),
                F.greatest(x["i"], y["i"]).alias("id_b"),
                x["p"].alias("pa"),
                y["p"].alias("pb"),
            ),
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    want = {
        (r["g"], r["id_a"], r["id_b"], r["ps"])
        for r in a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.i") < F.col("b.i")))
        .select(
            F.col("a.g").alias("g"),
            F.col("a.i").alias("id_a"),
            F.col("b.i").alias("id_b"),
            (F.col("a.p") + F.col("b.p")).alias("ps"),
        )
        .collect()
    }
    assert got == want


def test_pairs_hot_bucket_cap(spark):
    """A pathological bucket (100k members with one blocking key) must
    degrade to the pairs among the max_block smallest members — bounded
    output, no O(n^2) expansion — while buckets under the cap are
    untouched. Uncapped, this bucket would expand ~5e9 pair structs and
    OOM the task; capped it completes in seconds."""
    from real_estate_data_pipeline_spark.ops.pairs import pairs_within_groups

    n = 100_000
    df = spark.range(n).select(
        F.lit("hot").alias("g"), F.col("id").cast("int").alias("i")
    ).unionByName(
        spark.createDataFrame([("cold", 1_000_000), ("cold", 1_000_001)], "g string, i int")
    )
    out = pairs_within_groups(
        df,
        ["g"],
        F.struct(F.col("g").alias("g"), F.col("i").alias("i")),
        lambda x, y: F.struct(
            x["g"].alias("g"),
            F.least(x["i"], y["i"]).alias("id_a"),
            F.greatest(x["i"], y["i"]).alias("id_b"),
        ),
        max_block=64,
    )
    rows = out.collect()
    hot = [(r["id_a"], r["id_b"]) for r in rows if r["g"] == "hot"]
    cold = [(r["id_a"], r["id_b"]) for r in rows if r["g"] == "cold"]
    # Deterministic degrade: the 64 SMALLEST members survive (array_sort
    # before slice), giving exactly C(64,2) pairs over ids 0..63.
    assert len(hot) == 64 * 63 // 2
    assert set(hot) == {(a, b) for a in range(64) for b in range(64) if a < b}
    # The under-cap bucket is exact.
    assert cold == [(1_000_000, 1_000_001)]


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),                 # key
            st.integers(min_value=0, max_value=30),      # hour offset
            st.integers(min_value=0, max_value=10_000),  # unique event id
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[2],
    )
)
def test_resample_ffill_grid_invariants(spark, rows):
    """For ANY event set: the grid is dense and contiguous per key,
    observed-bucket count equals the distinct (key, bucket) pairs with
    events, and every filled (unobserved) bucket carries the value of
    the nearest earlier observed bucket."""
    from real_estate_data_pipeline_spark.ops.timeseries import resample_ffill

    df = spark.createDataFrame(rows, "k string, h int, eid int, v double").select(
        "k",
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(hours="h")).alias("ts"),
        "eid",
        "v",
    )
    out = resample_ffill(df, "k", "ts", "v", 3600, tiebreaker_col="eid").collect()
    per_key: dict[str, list] = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    src = {}
    for k, h, eid, v in rows:
        cur = src.setdefault(k, {})
        # last-in-bucket: highest (ts, eid) wins; ts ties are eid ties
        if h not in cur or eid > cur[h][0]:
            cur[h] = (eid, v)
    for k, rs in per_key.items():
        hs = sorted(r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1) for r in rs)
        assert hs == list(range(min(hs), max(hs) + 1))  # dense, contiguous
        obs = {h for h in src[k]}
        got_obs = {
            r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1)
            for r in rs
            if r["observed"]
        }
        assert got_obs == obs
        # forward fill correctness
        for r in sorted(rs, key=lambda r: r["bucket_ts"]):
            h = r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1)
            prev = max(hh for hh in src[k] if hh <= h)
            assert r["v"] == src[k][prev][1]


@SLOW
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_quantization_bounds_property(spark, vecs):
    """For ANY float vectors: q8 entries stay in [-127, 127], the zero
    vector maps to the zero point, and dequantized values differ from
    the input by at most scale/2 per coordinate (the lattice bound)."""
    from real_estate_data_pipeline_spark.ops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        q8, scale = rows[i]["q8"], rows[i]["scale"]
        assert all(-127 <= q <= 127 for q in q8)
        # float32 storage rounds the input; compare against the stored value
        import numpy as np

        stored = np.array(v, dtype=np.float32).astype(float)
        for x, q in zip(stored, q8):
            assert abs(q * scale - x) <= scale / 2 + 1e-9


doc_strategy = st.lists(
    st.lists(
        st.sampled_from(["the", "cat", "sat", "on", "a", "mat", "X", "42", "spark"]),
        min_size=1,
        max_size=40,
    ),
    min_size=1,
    max_size=6,
)


@SLOW
@given(doc_strategy)
def test_span_corruption_reconstruction_property(spark, docs):
    """For ANY token stream: substituting each <extra_id_k> sentinel's
    target span back into the input reproduces the original stream, ids
    are dense, and n_masked is the total hidden-token count."""
    import re

    from real_estate_data_pipeline_spark.ops.packing import span_corruption

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(df, mask_rate=0.3).collect()}
    for i, toks in enumerate(docs):
        r = out[i]
        orig = [tk.lower() for tk in toks]
        spans, cur = {}, None
        for tok in r["target_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(tok)
        assert sorted(spans) == list(range(len(spans)))
        rebuilt = []
        for tok in r["input_text"].split():
            m = re.fullmatch(r"<extra_id_(\d+)>", tok)
            rebuilt.extend(spans[int(m.group(1))] if m else [tok])
        assert rebuilt == orig
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        assert r["n_tokens"] == len(orig)
