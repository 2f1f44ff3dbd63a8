"""Split from queries.py lines 23837-24497 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DEC, F, Window, dedup, register, t
from .q09_llm_dedup_text_sim import _DIST_SQL, _HASH01_SQL
from .q15_curation_r3 import (
    _events_stream_schema,
    _minhash_portable_oracle,
    _run_stream_to_memory,
    _stream_file_source,
)
from .q16_curation_r4 import _assert_rank_mass

# ===========================================================================
# round-10 wave 3: graph scoring (Adamic-Adar, personalized PageRank),
# the Markov stationary distribution, and greedy k-means++ seeding —
# compositions over the proven graph / transition / embedding machinery.
# ===========================================================================

# The link-prediction protocol, single-sourced: the Adamic-Adar,
# resource-allocation and Jaccard evals (rounds 10/12) share the SAME
# held-out-edge split, adjacency and degree frames, so the three scores
# always rank the same candidate pairs over the same training graph.
_LINKPRED_CTES = f"""cand AS MATERIALIZED ({_minhash_portable_oracle(thr=0.0)}),
    pos_all AS MATERIALIZED (
      SELECT id_a, id_b,
             {_HASH01_SQL.format(key="CAST(id_a AS VARCHAR) || '_' || CAST(id_b AS VARCHAR) || 'lp'")} AS u
      FROM cand WHERE jaccard_est >= 0.5
    ),
    test AS (SELECT id_a, id_b, 'positive' AS side FROM pos_all WHERE u < 0.2),
    neg AS (
      SELECT id_a, id_b, 'negative' AS side FROM cand WHERE jaccard_est < 0.5
    ),
    ev AS (SELECT * FROM test UNION ALL SELECT * FROM neg),
    adj AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pos_all WHERE u >= 0.2
      UNION ALL
      SELECT id_b, id_a FROM pos_all WHERE u >= 0.2
    ),
    deg AS MATERIALIZED (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS dg FROM adj GROUP BY src
    )"""


def _linkpred_frames(spark, sf_dir):
    """Spark twin of _LINKPRED_CTES: returns (ev, adj, deg) — the
    eval pairs (side-labelled), training adjacency (both directions,
    checkpointed) and degree table shared by the link-pred family."""
    from ..ops.sampling import hash_uniform01

    d = t(spark, sf_dir, "documents")
    cand = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.0
    ).select("id_a", "id_b", "jaccard_est").localCheckpoint(eager=False)
    u = hash_uniform01(
        F.concat(
            F.col("id_a").cast("string"),
            F.lit("_"),
            F.col("id_b").cast("string"),
            F.lit("lp"),
        )
    )
    pos_all = (
        cand.filter(F.col("jaccard_est") >= 0.5)
        .select("id_a", "id_b", u.alias("__u"))
        .localCheckpoint(eager=False)
    )
    test = pos_all.filter(F.col("__u") < 0.2).select(
        "id_a", "id_b", F.lit("positive").alias("side")
    )
    neg = cand.filter(F.col("jaccard_est") < 0.5).select(
        "id_a", "id_b", F.lit("negative").alias("side")
    )
    ev = test.unionByName(neg)
    retained = pos_all.filter(F.col("__u") >= 0.2)
    adj = (
        retained.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            retained.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    deg = adj.groupBy(F.col("src").alias("__w")).agg(
        F.count("*").cast("long").alias("__dg")
    )
    return ev, adj, deg


register(
    "graph_adamic_adar_link_pred",
    # the weighted upgrade of common-neighbor link prediction: the
    # Adamic-Adar score sum over common neighbors z of 1/ln(deg z)
    # discounts promiscuous hubs. Same held-out-edge protocol as the
    # CN eval (hash split, positives vs band-collision near-misses);
    # per-neighbor weights are micro-quantized after the one
    # 6dp-rounded ln, so the per-pair score is an integer sum.
    oracle=f"""
    WITH {_LINKPRED_CTES},
    aa AS (
      SELECT e.id_a, e.id_b, e.side,
             CAST(SUM(CASE WHEN n2.dst IS NOT NULL THEN
               CAST(floor(round(1.0 / NULLIF(round(ln(CAST(dw.dg AS DOUBLE)), 6),
                                             0.0), 6)
                          * 1000000 + 0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS aa6
      FROM ev e
      LEFT JOIN adj n1 ON n1.src = e.id_a
      LEFT JOIN adj n2 ON n2.src = e.id_b AND n2.dst = n1.dst
      LEFT JOIN deg dw ON dw.node = n1.dst
      GROUP BY e.id_a, e.id_b, e.side
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(aa6) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS mean_adamic_adar,
           round(CAST(SUM(CASE WHEN aa6 > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS share_with_signal
    FROM aa GROUP BY side ORDER BY side
    """,
)


def _dadamicadar(spark, sf_dir):
    """Adamic-Adar link prediction eval: identical join shape to the
    CN eval (pair x degree bounded wedge probes), plus one broadcast
    degree table supplying the 1/ln(deg) hub discount — the score that
    actually separates community edges from hub coincidences. Closes
    over the shared _linkpred_frames protocol."""
    ev, adj, deg = _linkpred_frames(spark, sf_dir)
    w6 = F.floor(
        F.round(
            1.0
            / F.nullif(F.round(F.log(F.col("__dg").cast("double")), 6), F.lit(0.0)),
            6,
        )
        * 1e6
        + 0.5
    ).cast("long")
    n1 = adj.withColumnsRenamed({"src": "id_a", "dst": "__w"})
    n2 = adj.withColumnsRenamed({"src": "id_b", "dst": "__w"}).withColumn(
        "__hit", F.lit(1)
    )
    aa = (
        ev.join(n1, "id_a", "left")
        .join(n2, ["id_b", "__w"], "left")
        .join(F.broadcast(deg), "__w", "left")
        .groupBy("id_a", "id_b", "side")
        .agg(
            F.sum(
                F.when(F.col("__hit").isNotNull(), w6).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("aa6")
        )
    )
    return (
        aa.groupBy("side")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("aa6").cast("double") / F.count("*") / 1e6, 6).alias(
                "mean_adamic_adar"
            ),
            F.round(
                F.sum(F.when(F.col("aa6") > 0, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("share_with_signal"),
        )
        .orderBy("side")
    )


CATALOG["graph_adamic_adar_link_pred"].fn = _dadamicadar


def _ppr_oracle(
    rounds: int = 3,
    damping: float = 0.85,
    n_seeds: int = 5,
    teleport: float = 0.15,
) -> str:
    """Oracle for unrolled PERSONALIZED PageRank over the near-dup
    graph: the teleport vector concentrates on the ``n_seeds``
    highest-degree nodes (deterministic ties by node id) instead of
    spreading uniformly — same per-round 6-dp rounding and micro-unit
    neighbor sums as the global PageRank oracle. ``teleport`` is passed
    EXPLICITLY (not derived as 1-damping): repr(1-0.85) is
    0.15000000000000002, a DIFFERENT double than the Spark side's
    F.lit(0.15), and two different constants feeding the per-round
    round(...,6) break the identical-doubles discipline (review
    finding)."""
    _assert_rank_mass(damping, teleport)
    prev = "pr0"
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    c{r} AS (
      SELECT e.dst AS node,
             SUM(CAST(floor(round(p.pr / d.deg, 6) * 1000000 + 0.5) AS BIGINT)) AS s
      FROM edges e
      JOIN {prev} p ON e.src = p.node
      JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    ),
    pr{r} AS (
      SELECT n.node,
             round({teleport!r} * CASE WHEN s.node IS NOT NULL
                                       THEN 1.0 ELSE 0.0 END
                   + {damping!r} *
                     (CAST(COALESCE(c{r}.s, 0) AS DOUBLE) / 1000000.0), 6) AS pr
      FROM nodes n
      LEFT JOIN seeds s ON s.node = n.node
      LEFT JOIN c{r} ON n.node = c{r}.node
    )""")
        prev = f"pr{r}"
    return f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS MATERIALIZED (
      SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src
    ),
    seeds AS MATERIALIZED (
      SELECT node FROM deg ORDER BY deg DESC, node LIMIT {n_seeds}
    ),
    pr0 AS (
      SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1.0 ELSE 0.0 END AS pr
      FROM nodes n LEFT JOIN seeds s ON s.node = n.node
    ){"".join(iters)}
    SELECT node AS doc_id, pr AS ppr
    FROM {prev}
    WHERE pr > 0
    ORDER BY ppr DESC, doc_id
    LIMIT 20
    """


register("graph_personalized_pagerank", oracle=_ppr_oracle())


def _dppr(spark, sf_dir):
    """Personalized PageRank: the global-PageRank round shape with a
    teleport vector pinned to the 5 highest-degree near-dup nodes —
    'what else belongs to THESE clusters' instead of 'what is globally
    central'. Seeds are one TakeOrdered over the degree frame; rounds
    are localCheckpointed so the executed plan depth stays constant."""
    d = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dup_pairs_portable(
        d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
    ).select("id_a", "id_b")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .persist()
    )
    try:
        nodes = edges.select(F.col("src").alias("node")).distinct()
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("deg")
        )
        seeds = (
            deg.orderBy(F.desc("deg"), "node").limit(5).select("node")
            .withColumn("__seed", F.lit(1))
            .localCheckpoint(eager=False)
        )
        e_tele = F.when(F.col("__seed").isNotNull(), 1.0).otherwise(0.0)
        pr = nodes.join(F.broadcast(seeds), "node", "left").select(
            "node", e_tele.alias("pr")
        )
        for _ in range(3):
            contrib = (
                edges.join(pr.withColumnsRenamed({"node": "src"}), "src")
                .join(deg.withColumnsRenamed({"node": "src", "deg": "__deg"}), "src")
                .select(
                    F.col("dst").alias("node"),
                    F.floor(
                        F.round(F.col("pr") / F.col("__deg"), 6) * 1e6 + F.lit(0.5)
                    )
                    .cast("long")
                    .alias("__c"),
                )
                .groupBy("node")
                .agg(F.sum("__c").alias("__s"))
            )
            pr = (
                nodes.join(contrib, "node", "left")
                .join(F.broadcast(seeds), "node", "left")
                .select(
                    "node",
                    F.round(
                        F.lit(0.15) * e_tele
                        + F.lit(0.85)
                        * (
                            F.coalesce(F.col("__s"), F.lit(0)).cast("double")
                            / F.lit(1e6)
                        ),
                        6,
                    ).alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
        return (
            pr.filter(F.col("pr") > 0)
            .select(F.col("node").alias("doc_id"), F.col("pr").alias("ppr"))
            .orderBy(F.desc("ppr"), "doc_id")
            .limit(20)
        )
    finally:
        edges.unpersist()


CATALOG["graph_personalized_pagerank"].fn = _dppr


def _markov_stationary_oracle(rounds: int = 3) -> str:
    """Oracle for the power-iteration stationary distribution of the
    event-type Markov chain: the 6dp transition matrix from the
    transition-matrix query, ``rounds`` vector-matrix products with
    picounit term quantization and per-round L1 renormalization
    (ratio of exact integers -> identical doubles)."""
    prev = "pi0"
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    m{r} AS (
      SELECT p.dst AS st,
             CAST(SUM(CAST(floor(round(pv.pi * p.p, 12) * 1000000000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS s12
      FROM p JOIN {prev} pv ON pv.st = p.src
      GROUP BY p.dst
    ),
    t{r} AS (SELECT CAST(SUM(s12) AS BIGINT) AS tot FROM m{r}),
    pi{r} AS (
      SELECT s.st,
             round(CAST(COALESCE(m{r}.s12, 0) AS DOUBLE) / NULLIF(t.tot, 0), 6)
                 AS pi
      FROM states s LEFT JOIN m{r} ON m{r}.st = s.st CROSS JOIN t{r} t
    )""")
        prev = f"pi{r}"
    return f"""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (
      SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
      GROUP BY src, dst
    ),
    r AS (SELECT src, SUM(n) AS tot FROM c GROUP BY src),
    p AS MATERIALIZED (
      SELECT c.src, c.dst, round(CAST(c.n AS DOUBLE) / r.tot, 6) AS p
      FROM c JOIN r USING (src)
    ),
    states AS MATERIALIZED (
      SELECT src AS st FROM c UNION SELECT dst FROM c
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
    pi0 AS (SELECT st, round(1.0 / k.k, 6) AS pi FROM states CROSS JOIN k)
    {"".join(iters)}
    SELECT st AS event_type, pi AS stationary_p
    FROM {prev}
    ORDER BY event_type
    """


register("evt_markov_stationary_power", oracle=_markov_stationary_oracle())


def _dmarkovstat(spark, sf_dir):
    """Stationary distribution of the behavioral Markov chain by three
    unrolled power-iteration rounds: the transition matrix is a k x k
    broadcastable frame (k = event types), each round is one join +
    grouped picounit sum + L1 renormalize — where user journeys
    CONVERGE, the long-run attention share per event type."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    r = c.groupBy("src").agg(F.sum("n").alias("__tot"))
    p = (
        c.join(F.broadcast(r), "src")
        .select(
            "src",
            "dst",
            F.round(F.col("n").cast("double") / F.col("__tot"), 6).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    states = (
        p.select(F.col("src").alias("st"))
        .union(p.select(F.col("dst").alias("st")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    k = states.agg(F.count("*").cast("long").alias("k"))
    pi = states.crossJoin(F.broadcast(k)).select(
        "st", F.round(1.0 / F.col("k"), 6).alias("pi")
    )
    for _ in range(3):
        m = (
            p.join(pi.withColumnsRenamed({"st": "src"}), "src")
            .select(
                F.col("dst").alias("st"),
                F.floor(F.round(F.col("pi") * F.col("p"), 12) * 1e12 + 0.5)
                .cast("long")
                .alias("__t12"),
            )
            .groupBy("st")
            .agg(F.sum("__t12").cast("long").alias("s12"))
        )
        tot = m.agg(F.sum("s12").cast("long").alias("tot"))
        pi = (
            states.join(m, "st", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "st",
                F.round(
                    F.coalesce(F.col("s12"), F.lit(0)).cast("double")
                    / F.nullif(F.col("tot"), F.lit(0)),
                    6,
                ).alias("pi"),
            )
            .localCheckpoint(eager=True)
        )
    return pi.select(
        F.col("st").alias("event_type"), F.col("pi").alias("stationary_p")
    ).orderBy("event_type")


CATALOG["evt_markov_stationary_power"].fn = _dmarkovstat

register(
    "emb_farthest_point_seeds",
    # deterministic k-means++ seeding (the farthest-point variant —
    # greedy argmax of the min distance to already-chosen seeds, ties
    # by vec_id): seed 1 is the lowest vec_id, seeds 2 and 3 maximize
    # the micro-quantized min squared distance. The classic way to
    # start Lloyd without a random draw — and the argmax chain is
    # exactly reproducible in SQL.
    oracle=f"""
    WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
    s1 AS (SELECT vec_id AS sid1, embedding AS v1 FROM e ORDER BY vec_id LIMIT 1),
    d1 AS MATERIALIZED (
      SELECT e.vec_id,
             CAST(floor(round({_DIST_SQL('e.embedding', 's1.v1')}, 6)
                        * 1000000 + 0.5) AS BIGINT) AS d6
      FROM e CROSS JOIN s1
    ),
    s2 AS (SELECT vec_id AS sid2, d6 AS sd2 FROM d1 ORDER BY d6 DESC, vec_id LIMIT 1),
    s2v AS (
      SELECT s2.sid2, s2.sd2, e.embedding AS v2
      FROM e JOIN s2 ON e.vec_id = s2.sid2
    ),
    d2 AS MATERIALIZED (
      SELECT d1.vec_id,
             LEAST(d1.d6,
                   CAST(floor(round({_DIST_SQL('e.embedding', 's2v.v2')}, 6)
                              * 1000000 + 0.5) AS BIGINT)) AS d6
      FROM d1 JOIN e ON e.vec_id = d1.vec_id CROSS JOIN s2v
    ),
    s3 AS (SELECT vec_id AS sid3, d6 AS sd3 FROM d2 ORDER BY d6 DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS seed_rank, s1.sid1 AS vec_id, 0.0 AS min_dist_sq
    FROM s1
    UNION ALL
    SELECT 2, s2.sid2, round(s2.sd2 / 1000000.0, 6) FROM s2
    UNION ALL
    SELECT 3, s3.sid3, round(s3.sd3 / 1000000.0, 6) FROM s3
    ORDER BY seed_rank
    """,
)


def _dfarthestseeds(spark, sf_dir):
    """Greedy farthest-point seeding: each round is one broadcast of a
    1-row seed vector, one zip_with fold per vector (no dim explosion),
    one TakeOrdered argmax — k seeds cost k corpus passes with O(1)
    state, the deterministic opener for every Lloyd query in the
    engine."""
    from ..ops.similarity import l2_dist_sq

    e = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=False)
    )

    def _d6(vec_col):
        return (
            F.floor(F.round(l2_dist_sq(F.col("embedding"), vec_col), 6) * 1e6 + 0.5)
            .cast("long")
        )

    s1 = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("sid1"), F.col("embedding").alias("v1")
    )
    d1 = (
        e.crossJoin(F.broadcast(s1))
        .select("vec_id", "embedding", _d6(F.col("v1")).alias("d6"))
        .localCheckpoint(eager=False)
    )
    s2 = d1.orderBy(F.desc("d6"), "vec_id").limit(1).select(
        F.col("vec_id").alias("sid2"),
        F.col("d6").alias("sd2"),
        F.col("embedding").alias("v2"),
    )
    d2 = d1.crossJoin(F.broadcast(s2)).select(
        "vec_id",
        F.least(F.col("d6"), _d6(F.col("v2"))).alias("d6"),
    )
    s3 = d2.orderBy(F.desc("d6"), "vec_id").limit(1).select(
        F.col("vec_id").alias("sid3"), F.col("d6").alias("sd3")
    )
    r1 = s1.select(
        F.lit(1).cast("long").alias("seed_rank"),
        F.col("sid1").alias("vec_id"),
        F.lit(0.0).alias("min_dist_sq"),
    )
    r2 = s2.select(
        F.lit(2).cast("long").alias("seed_rank"),
        F.col("sid2").alias("vec_id"),
        F.round(F.col("sd2") / 1e6, 6).alias("min_dist_sq"),
    )
    r3 = s3.select(
        F.lit(3).cast("long").alias("seed_rank"),
        F.col("sid3").alias("vec_id"),
        F.round(F.col("sd3") / 1e6, 6).alias("min_dist_sq"),
    )
    return r1.unionByName(r2).unionByName(r3).orderBy("seed_rank")


CATALOG["emb_farthest_point_seeds"].fn = _dfarthestseeds

register(
    "sketch_hll_rsd_sweep",
    # accuracy-vs-precision sweep of the HyperLogLog++ cardinality
    # sketch: approx_count_distinct over user_id at three relative-
    # standard-deviation settings, each gated against the exact count
    # (|est - exact| <= 4*rsd*exact — four sigmas of the sketch's own
    # guarantee). The estimates themselves are engine-specific, so the
    # oracle checks the exact count and the PASS verdicts — the same
    # bounded-error gate contract as the KLL and CMS families.
    oracle="""
    SELECT 0.05 AS rsd,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events
    UNION ALL
    SELECT 0.02, CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
    UNION ALL
    SELECT 0.01, CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
    ORDER BY rsd
    """,
)


def _dhllsweep(spark, sf_dir):
    """HLL++ rsd sweep: three sketch aggregates and one exact distinct
    in a single pass over events, then a 3-row verdict frame. At
    100 TB only the sketches run cheap — the exact side is the gate's
    scorer, and the sweep tells you which precision tier the dashboard
    actually needs."""
    ev = t(spark, sf_dir, "events")
    g = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact"),
        F.approx_count_distinct("user_id", 0.05).alias("e05"),
        F.approx_count_distinct("user_id", 0.02).alias("e02"),
        F.approx_count_distinct("user_id", 0.01).alias("e01"),
    ).localCheckpoint(eager=False)  # 3 verdict-row consumers, one scan
    rows = []
    for rsd, col in ((0.05, "e05"), (0.02, "e02"), (0.01, "e01")):
        rows.append(
            g.select(
                F.lit(rsd).alias("rsd"),
                F.col("exact").alias("n_exact"),
                (
                    F.abs(F.col(col) - F.col("exact")).cast("double")
                    <= F.lit(4.0 * rsd) * F.col("exact")
                ).alias("within_bound"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("rsd")


CATALOG["sketch_hll_rsd_sweep"].fn = _dhllsweep


def _ph_report(obs):
    """Shared Page-Hinkley pipeline over an (event_type, h, cents)
    hourly frame — the prefix-sum-minus-running-min identity with
    floor-micro-cent running means; consumed by the batch query AND
    the streaming run's post-run pass so the two can never drift."""
    w = Window.partitionBy("event_type").orderBy("h")
    idx = obs.select(
        "event_type",
        "h",
        "cents",
        F.row_number().over(w).alias("i"),
        F.sum("cents").over(w).alias("s"),
    )
    dev = idx.select(
        "event_type",
        "h",
        (
            F.col("cents") * F.lit(1000000)
            - F.floor(F.col("s") * 1000000.0 / F.col("i")).cast("long")
            - F.lit(100000000)
        ).alias("d6"),
    )
    u = dev.select("event_type", "h", F.sum("d6").over(w).alias("u6"))
    ph = u.select(
        "event_type", "h", (F.col("u6") - F.min("u6").over(w)).alias("ph6")
    )
    mx = ph.withColumn("mx", F.max("ph6").over(Window.partitionBy("event_type")))
    return (
        mx.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.round(F.max("ph6") / 1e8, 6).alias("ph_max_value"),
            F.date_format(
                F.min(F.when(F.col("ph6") == F.col("mx"), F.col("h"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("alarm_hour"),
            (F.max("ph6") / 1e8 >= 1000.0).alias("alarm"),
        )
        .orderBy("event_type")
    )


register(
    "evt_stream_page_hinkley_now",
    # seventeenth streaming run: Page-Hinkley drift detection over a
    # LIVE stream — the hourly (event_type, window) cents aggregate is
    # the streaming state (bounded by types x hours, complete mode),
    # and the post-run pass applies the exact PH identity to the sink
    # through the SAME _ph_report pipeline as the batch query, so the
    # streaming detector provably computes the batch statistic. The
    # oracle is the batch Page-Hinkley oracle verbatim.
    oracle=CATALOG["evt_page_hinkley_hourly"].oracle,
)


def _dstreamph(spark, sf_dir):
    """Streaming Page-Hinkley: the stream maintains one hourly windowed
    aggregate per event type (the only state — never per-event), the
    drift statistic reads the sink after the run. At 100 TB the stream
    side is a watermark-friendly windowed count; the PH pass runs on
    the tiny hourly frame."""
    schema = _events_stream_schema(ts_ntz=False)
    src = _stream_file_source(spark, sf_dir, "events.parquet", schema)
    hourly = (
        src.groupBy("event_type", F.window("ts", "1 hour"))
        .agg((F.sum(F.col("value").cast(DEC)) * 100).cast("long").alias("cents"))
        .select("event_type", F.col("window.start").alias("h"), "cents")
    )
    sink = _run_stream_to_memory(hourly, "evt_stream_ph_sink", "complete")
    return _ph_report(sink)


CATALOG["evt_stream_page_hinkley_now"].fn = _dstreamph


