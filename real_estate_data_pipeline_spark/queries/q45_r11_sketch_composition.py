"""Split from queries.py lines 30049-30475 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, register, t
from .q15_curation_r3 import _events_stream_schema, _run_stream_to_memory, _stream_file_source

# ===========================================================================
# round-11 wave 3: the sketch-composition tier — HLL set algebra,
# streaming k-means (19th streaming run), a KLL-sketch drift gate, and
# the Bloom-prefiltered join audit. Each composes an existing sketch
# family into the operation a 100-TB pipeline actually runs it for.
# ===========================================================================

register(
    "sketch_hll_set_operations",
    # HLL set algebra: distinct odd-day users (A), even-day users (B),
    # |A u B| from the MERGED sketch (the estimate you can get without
    # ever co-locating the halves), and |A n B| by inclusion-exclusion.
    # The estimates are engine-specific, so the oracle carries the four
    # EXACT cardinalities (one per-user pass computes all of them) and
    # the PASS verdicts: 6.5% (4 sigma of lgConfigK=12) for the three
    # direct estimates, and the SUM of the three bounds for the
    # intersection — inclusion-exclusion adds errors, it never cancels
    # them, so the gate must widen accordingly.
    oracle="""
    WITH uc AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN date_part('day', ts) % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ia,
             CAST(MAX(CASE WHEN date_part('day', ts) % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ib
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(ia) AS BIGINT) AS n_exact_a,
           CAST(SUM(ib) AS BIGINT) AS n_exact_b,
           CAST(COUNT(*) AS BIGINT) AS n_exact_union,
           CAST(SUM(ia * ib) AS BIGINT) AS n_exact_intersection,
           TRUE AS within_bound_a, TRUE AS within_bound_b,
           TRUE AS within_bound_union, TRUE AS within_bound_intersection
    FROM uc
    """,
)


def _dhllsetops(spark, sf_dir):
    """HLL set algebra: two filtered sketch aggregates, one hll_union
    of the two 1-row frames, and ONE exact per-user pass that scores
    all four gates. At 100 TB the halves can live in different silos —
    only the 1.5 KB sketches ever meet."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", (F.dayofmonth("ts") % 2 == 1).alias("odd")
    )
    ska = ev.filter("odd").agg(F.hll_sketch_agg("user_id").alias("__a"))
    skb = ev.filter(~F.col("odd")).agg(F.hll_sketch_agg("user_id").alias("__b"))
    ests = (
        ska.crossJoin(F.broadcast(skb))
        .select(
            F.hll_sketch_estimate("__a").alias("ea"),
            F.hll_sketch_estimate("__b").alias("eb"),
            F.hll_sketch_estimate(F.hll_union("__a", "__b")).alias("eu"),
        )
        .select(
            "ea", "eb", "eu", (F.col("ea") + F.col("eb") - F.col("eu")).alias("ei")
        )
    )
    uc = ev.groupBy("user_id").agg(
        F.max(F.col("odd").cast("int")).alias("ia"),
        F.max((~F.col("odd")).cast("int")).alias("ib"),
    )
    exact = uc.agg(
        F.sum("ia").cast("long").alias("n_exact_a"),
        F.sum("ib").cast("long").alias("n_exact_b"),
        F.count("*").cast("long").alias("n_exact_union"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("n_exact_intersection"),
    )
    tol = F.lit(0.065)
    return exact.crossJoin(F.broadcast(ests)).select(
        "n_exact_a",
        "n_exact_b",
        "n_exact_union",
        "n_exact_intersection",
        (F.abs(F.col("ea") - F.col("n_exact_a")) <= tol * F.col("n_exact_a")).alias(
            "within_bound_a"
        ),
        (F.abs(F.col("eb") - F.col("n_exact_b")) <= tol * F.col("n_exact_b")).alias(
            "within_bound_b"
        ),
        (F.abs(F.col("eu") - F.col("n_exact_union")) <= tol * F.col("n_exact_union")).alias(
            "within_bound_union"
        ),
        (
            F.abs(F.col("ei") - F.col("n_exact_intersection"))
            <= tol * (F.col("n_exact_a") + F.col("n_exact_b") + F.col("n_exact_union"))
        ).alias("within_bound_intersection"),
    )


CATALOG["sketch_hll_set_operations"].fn = _dhllsetops


# --- streaming k-means (19th streaming run) --------------------------------
# Pinned integer seeds (cents) + a deterministic nearest-seed CASE make
# the one-pass assignment EXACT, so unlike the sketch gates the
# streaming result hash-matches the batch oracle. The assignment
# expression is generated once and fed verbatim to both engines.

_SKM_SEEDS = (1000, 3000, 8000, 20000)


def _skm_assign_sql() -> str:
    """Nearest-of-k-seeds CASE over a column named ``cents``; <= on
    every earlier comparison makes ties resolve to the smaller seed.
    Plain ANSI — the same text parses in DuckDB and Spark SQL."""
    s = _SKM_SEEDS
    branches = []
    for i in range(len(s) - 1):
        conds = " AND ".join(
            f"abs(cents - {s[i]}) <= abs(cents - {s[j]})" for j in range(i + 1, len(s))
        )
        branches.append(f"WHEN {conds} THEN {s[i]}")
    return "CASE " + " ".join(branches) + f" ELSE {s[-1]} END"


register(
    "evt_stream_kmeans_now",
    # nineteenth streaming run: mini-batch k-means statistics as
    # STREAMING STATE — the nearest-seed assignment runs per event and
    # the per-centroid (count, sum) aggregate holds k=4 rows for any
    # stream length (the first Lloyd half-step, restartable and
    # mergeable). Seeds are pinned integer cents, so the whole run is
    # exact and the oracle is the batch twin verbatim.
    oracle=f"""
    WITH x AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events
    ),
    a AS (SELECT {_skm_assign_sql()} AS centroid_seed, cents FROM x),
    g AS (
      SELECT centroid_seed, CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM a GROUP BY centroid_seed
    )
    SELECT CAST(centroid_seed AS BIGINT) AS centroid_seed, n_points,
           round(CAST(s AS DOUBLE) / n_points / 100.0, 6) AS mean_value,
           round(CAST(s AS DOUBLE) / n_points / 100.0 - centroid_seed / 100.0, 6)
               AS centroid_shift
    FROM g ORDER BY centroid_seed
    """,
)


def _dstreamkmeans(spark, sf_dir):
    """Streaming k-means half-step: assignment is a stateless
    projection, the only state is the 4-row (count, sum) aggregate in
    complete mode, and the post-run projection recenters each seed —
    clustering statistics over an unbounded stream with O(k) state."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    assigned = src.select(
        (F.col("value").cast(DEC) * 100).cast("long").alias("cents")
    ).select(F.expr(_skm_assign_sql()).cast("long").alias("centroid_seed"), "cents")
    agg = assigned.groupBy("centroid_seed").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("cents").cast("long").alias("s"),
    )
    sink = _run_stream_to_memory(agg, "evt_stream_kmeans_sink", "complete")
    return sink.select(
        "centroid_seed",
        "n_points",
        F.round(F.col("s").cast("double") / F.col("n_points") / 100.0, 6).alias(
            "mean_value"
        ),
        F.round(
            F.col("s").cast("double") / F.col("n_points") / 100.0
            - F.col("centroid_seed") / 100.0,
            6,
        ).alias("centroid_shift"),
    ).orderBy("centroid_seed")


CATALOG["evt_stream_kmeans_now"].fn = _dstreamkmeans

_KLL_DRIFT_QS = (0.10, 0.25, 0.50, 0.75, 0.90)

register(
    "sketch_kll_drift_gate",
    # quantile-sketch drift monitoring: the KLL sketch of the REFERENCE
    # fortnight's value distribution is the only thing a monitor has to
    # keep; drift = how far each reference quantile edge's CDF position
    # moves under the CURRENT half. The exact side (interpolated
    # reference edges at 4dp, current CDF at those edges, per-edge
    # drift) is fully cross-engine; the sketch's own edges are gated in
    # rank space (within 0.05 of q on the reference distribution — the
    # _kll_gate contract).
    oracle="""
    WITH ref AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events WHERE date_part('day', ts) <= 15
    ),
    cur AS MATERIALIZED (
      SELECT CAST(value AS DOUBLE) AS v FROM events WHERE date_part('day', ts) > 15
    ),
    edges AS MATERIALIZED (
      SELECT 0.10 AS q, ROUND(quantile_cont(v, 0.10), 4) AS ref_edge FROM ref
      UNION ALL SELECT 0.25, ROUND(quantile_cont(v, 0.25), 4) FROM ref
      UNION ALL SELECT 0.50, ROUND(quantile_cont(v, 0.50), 4) FROM ref
      UNION ALL SELECT 0.75, ROUND(quantile_cont(v, 0.75), 4) FROM ref
      UNION ALL SELECT 0.90, ROUND(quantile_cont(v, 0.90), 4) FROM ref
    ),
    cdf AS (
      SELECT e.q, e.ref_edge,
             round(AVG(CASE WHEN c.v <= e.ref_edge THEN 1.0 ELSE 0.0 END), 6)
                 AS cur_cdf
      FROM edges e CROSS JOIN cur c GROUP BY e.q, e.ref_edge
    )
    SELECT q, ref_edge, cur_cdf,
           round(abs(cur_cdf - q), 6) AS drift,
           TRUE AS within_bound
    FROM cdf ORDER BY q
    """,
)


def _dklldrift(spark, sf_dir):
    """KLL drift gate: one pass computes the five exact reference
    edges, one pass scores the current CDF at them, one sketch
    aggregate + one rank-space pass scores the gate — at 100 TB only
    the sketch half runs per tick; the exact half exists for the
    verifier."""
    ev = t(spark, sf_dir, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15).select(
        F.col("value").cast("double").alias("v")
    ).localCheckpoint(eager=False)
    cur = ev.filter(F.dayofmonth("ts") > 15).select(
        F.col("value").cast("double").alias("v")
    )
    qs = _KLL_DRIFT_QS
    edges = ref.agg(
        *[F.round(F.percentile("v", q), 4).alias(f"__e{i}") for i, q in enumerate(qs)]
    ).localCheckpoint(eager=False)
    sk = ref.agg(F.kll_sketch_agg_double("v").alias("__kll")).select(
        *[
            F.kll_sketch_get_quantile_double("__kll", F.lit(q)).alias(f"__s{i}")
            for i, q in enumerate(qs)
        ]
    )
    pos = ref.crossJoin(F.broadcast(sk)).agg(
        *[
            F.avg((F.col("v") <= F.col(f"__s{i}")).cast("double")).alias(f"__p{i}")
            for i in range(len(qs))
        ]
    )
    cdf = cur.crossJoin(F.broadcast(edges)).agg(
        *[
            F.round(F.avg((F.col("v") <= F.col(f"__e{i}")).cast("double")), 6).alias(
                f"__c{i}"
            )
            for i in range(len(qs))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.col(f"__e{i}").alias("ref_edge"),
                F.col(f"__c{i}").alias("cur_cdf"),
                F.round(F.abs(F.col(f"__c{i}") - F.lit(q)), 6).alias("drift"),
                (F.abs(F.col(f"__p{i}") - F.lit(q)) <= F.lit(0.05)).alias(
                    "within_bound"
                ),
            )
            for i, q in enumerate(qs)
        ]
    )
    return (
        cdf.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(pos))
        .select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("q")
    )


CATALOG["sketch_kll_drift_gate"].fn = _dklldrift

# The portable sha2 Bloom cell, single-sourced for the join-prefilter
# query AND the sizing sweep (round 12) so the two can never hash into
# different filters: first 8 hex chars of sha256(key || salt || round)
# as a 32-bit value, modulo the bit-array size.
def _bloom_cell_sql(key_sql: str, salt: str, m_sql) -> str:
    return (
        f"('0x' || substr(sha256(CAST({key_sql} AS VARCHAR) || '{salt}' "
        f"|| CAST(r.r AS VARCHAR)), 1, 8))::UBIGINT % {m_sql}"
    )


def _bloom_cell(key, salt: str, m):
    """Spark twin of _bloom_cell_sql (expects an `r` round column in
    scope; `m` may be an int literal or a Column)."""
    return (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(key.cast("string"), F.lit(salt), F.col("r").cast("string")),
                    256,
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % m
    )


register(
    "sketch_bloom_join_prefilter",
    # the 100-TB join trick the Bloom FPR report exists FOR: prefilter
    # the probe side of a semi-join through the dim side's Bloom filter
    # and measure what the shuffle saved. The portable sha2 Bloom
    # (8192 bits, 3 hashes) over BUILDING-segment customer keys probes
    # every distinct order custkey; candidates, true members, false
    # positives and the shuffle-reduction share are all exact integers.
    oracle=f"""
    WITH dim AS MATERIALIZED (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT {_bloom_cell_sql("c_custkey", "bjp", 8192)} AS cell
      FROM dim CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r
    ),
    probe AS MATERIALIZED (SELECT DISTINCT o_custkey FROM orders),
    hits AS (
      SELECT p.o_custkey,
             CAST(SUM(CASE WHEN b.cell IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS nbits
      FROM probe p
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r) r
      LEFT JOIN bits b
        ON b.cell = {_bloom_cell_sql("p.o_custkey", "bjp", 8192)}
      GROUP BY p.o_custkey
    ),
    scored AS MATERIALIZED (
      SELECT h.o_custkey, (h.nbits = 3) AS candidate,
             (d.c_custkey IS NOT NULL) AS member
      FROM hits h LEFT JOIN dim d ON d.c_custkey = h.o_custkey
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS n_dim,
           CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(SUM(CASE WHEN candidate THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
           CAST(SUM(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positives,
           round(CAST(SUM(CASE WHEN candidate AND NOT member THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END), 0), 6)
               AS fpr_nonmembers,
           round(1.0 - CAST(SUM(CASE WHEN candidate THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS shuffle_reduction
    FROM scored
    """,
)


def _dbloomprefilter(spark, sf_dir):
    """Bloom join prefilter: the dim side's 8192-cell bit set is a
    DISTINCT aggregate (bounded, broadcastable), the probe side tests
    its 3 cells with one equi-join, and membership truth is a left
    join back to the dim — the candidates row count IS the shuffle a
    real pipeline would ship instead of every probe key. All exact,
    no gate booleans needed: the portable sha2 Bloom is deterministic."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    dim = dim.localCheckpoint(eager=False)
    rr = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r")

    def cell(key):
        return _bloom_cell(key, "bjp", 8192)

    bits = (
        dim.select(F.col("c_custkey"), rr)
        .select(cell(F.col("c_custkey")).alias("cell"))
        .distinct()
    )
    probe = o.select("o_custkey").distinct().localCheckpoint(eager=False)
    hits = (
        probe.select("o_custkey", rr)
        .select("o_custkey", cell(F.col("o_custkey")).alias("cell"))
        .join(F.broadcast(bits.withColumn("__hit", F.lit(1))), "cell", "left")
        .groupBy("o_custkey")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("nbits"))
    )
    scored = hits.join(
        dim.withColumn("__m", F.lit(1)),
        hits.o_custkey == dim.c_custkey,
        "left",
    ).select(
        (F.col("nbits") == 3).alias("candidate"),
        F.col("__m").isNotNull().alias("member"),
    )
    ndim = dim.agg(F.count("*").cast("long").alias("n_dim"))
    rep = scored.agg(
        F.count("*").cast("long").alias("n_probe_keys"),
        F.sum(F.when(F.col("candidate"), 1).otherwise(0)).cast("long").alias(
            "n_candidates"
        ),
        F.sum(F.when(F.col("member"), 1).otherwise(0)).cast("long").alias(
            "n_true_members"
        ),
        F.sum(F.when(F.col("candidate") & ~F.col("member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
        F.sum(F.when(~F.col("member"), 1).otherwise(0)).cast("long").alias("__nonmem"),
    )
    return ndim.crossJoin(F.broadcast(rep)).select(
        "n_dim",
        "n_probe_keys",
        "n_candidates",
        "n_true_members",
        "n_false_positives",
        F.round(
            F.col("n_false_positives").cast("double")
            / F.nullif(F.col("__nonmem"), F.lit(0)),
            6,
        ).alias("fpr_nonmembers"),
        F.round(
            1.0 - F.col("n_candidates").cast("double") / F.col("n_probe_keys"), 6
        ).alias("shuffle_reduction"),
    )


CATALOG["sketch_bloom_join_prefilter"].fn = _dbloomprefilter


