"""Round-15 wave 11: near-dup graph centralities II — Katz centrality
(3 unrolled attenuated rounds, the beta + alpha*neighbor-sum sibling
of the r7 PageRank), eigenvector centrality by power iteration with
max-normalization, bounded-hop harmonic centrality (<= 3 hops, the
1/d weights cleared to the integer 6c1 + 3c2 + 2c3), bounded path-
length statistics, and the degree-heterogeneity index <k^2>/<k>^2.

All five ride the shared portable-MinHash pair graph (one ground
truth with every other graph_* entry). Exactness: per-round
centrality values snap to 6dp and neighbor sums run as micro-unit
integers (the _pagerank_oracle discipline); distance classes come
from DISTINCT two-hop equi-join frontiers with EXCEPT set semantics
(identical on both engines); degree moments are pure integers.
"""

from __future__ import annotations

from ._registry import CATALOG, F, register, t
from .q15_curation_r3 import _minhash_portable_oracle
from .q19_r7_graph import _DUP_EDGE_CTE, _dup_pairs_edges

_KATZ_ALPHA, _KATZ_BETA, _ROUNDS = 0.1, 1.0, 3


def _katz_oracle() -> str:
    prev = "k0"
    iters = []
    for r in range(1, _ROUNDS + 1):
        iters.append(f""",
    c{r} AS (
      SELECT e.d AS node,
             SUM(CAST(floor(round(p.k, 6) * 1000000 + 0.5) AS BIGINT)) AS s
      FROM edges e JOIN {prev} p ON e.s = p.node
      GROUP BY e.d
    ),
    k{r} AS (
      SELECT n.node,
             round({_KATZ_BETA!r} + {_KATZ_ALPHA!r}
                   * (CAST(COALESCE(c{r}.s, 0) AS DOUBLE) / 1000000.0), 6) AS k
      FROM nodes n LEFT JOIN c{r} ON n.node = c{r}.node
    )""")
        prev = f"k{r}"
    return f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    k0 AS (SELECT node, 1.0 AS k FROM nodes){"".join(iters)}
    SELECT node AS doc_id, k AS katz
    FROM {prev}
    ORDER BY katz DESC, doc_id
    LIMIT 20
    """


register("graph_katz_centrality_rounds", oracle=_katz_oracle())


def _dkatz(spark, sf_dir):
    """Three unrolled Katz rounds: k <- beta + alpha * sum_nb k,
    per-round 6dp snap + micro-int neighbor sums, checkpointed rank
    frames (constant plan depth — the PageRank convention)."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    nodes = edges.select(F.col("s").alias("node")).distinct()
    k = nodes.select("node", F.lit(1.0).alias("k"))
    for _ in range(_ROUNDS):
        contrib = (
            edges.join(
                k.select(
                    F.col("node").alias("s"),
                    F.floor(F.round(F.col("k"), 6) * F.lit(1000000) + F.lit(0.5))
                    .cast("long")
                    .alias("k6"),
                ),
                "s",
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("k6").alias("s6"))
        )
        k = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(_KATZ_BETA)
                    + F.lit(_KATZ_ALPHA)
                    * (F.coalesce(F.col("s6"), F.lit(0)).cast("double") / F.lit(1e6)),
                    6,
                ).alias("k"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        k.orderBy(F.desc("k"), "node")
        .limit(20)
        .select(F.col("node").alias("doc_id"), F.col("k").alias("katz"))
    )


CATALOG["graph_katz_centrality_rounds"].fn = _dkatz


def _eig_oracle() -> str:
    prev = "x0"
    iters = []
    for r in range(1, _ROUNDS + 1):
        iters.append(f""",
    c{r} AS (
      SELECT e.d AS node,
             SUM(CAST(floor(round(p.x, 6) * 1000000 + 0.5) AS BIGINT)) AS s
      FROM edges e JOIN {prev} p ON e.s = p.node
      GROUP BY e.d
    ),
    m{r} AS (SELECT MAX(s) AS mx FROM c{r}),
    x{r} AS (
      SELECT n.node,
             round(CAST(COALESCE(c{r}.s, 0) AS DOUBLE)
                   / (SELECT mx FROM m{r}), 6) AS x
      FROM nodes n LEFT JOIN c{r} ON n.node = c{r}.node
    )""")
        prev = f"x{r}"
    return f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    x0 AS (SELECT node, 1.0 AS x FROM nodes){"".join(iters)}
    SELECT node AS doc_id, x AS eigen_score
    FROM {prev}
    ORDER BY eigen_score DESC, doc_id
    LIMIT 20
    """


register("graph_eigenvector_power_rounds", oracle=_eig_oracle())


def _deigen(spark, sf_dir):
    """Power iteration with max-normalization (max is order-free, so
    no float-reduction hazard), 6dp snap per round."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=False)
    nodes = edges.select(F.col("s").alias("node")).distinct()
    x = nodes.select("node", F.lit(1.0).alias("x"))
    for _ in range(_ROUNDS):
        contrib = (
            edges.join(
                x.select(
                    F.col("node").alias("s"),
                    F.floor(F.round(F.col("x"), 6) * F.lit(1000000) + F.lit(0.5))
                    .cast("long")
                    .alias("x6"),
                ),
                "s",
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("x6").alias("s6"))
            .localCheckpoint(eager=False)
        )
        mx = contrib.agg(F.max("s6").alias("mx"))
        x = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("s6"), F.lit(0)).cast("double") / F.col("mx"), 6
                ).alias("x"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        x.orderBy(F.desc("x"), "node")
        .limit(20)
        .select(F.col("node").alias("doc_id"), F.col("x").alias("eigen_score"))
    )


CATALOG["graph_eigenvector_power_rounds"].fn = _deigen


# Shared SEED-BOUNDED distance-class CTE text: the q77 multi-seed
# labeled-BFS discipline — frontiers are rooted at the top-20 degree
# hubs only, so every frontier join is bounded by |seeds| * reach and
# the closure never goes quadratic on a denser graph (the all-nodes
# 3-hop closure probed 12-16x on the deliberately denser derived
# corpus; seed-bounding is the shape that survives 100 TB).
_DIST_CTES = f"""pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    seeds AS (
      SELECT node FROM deg ORDER BY deg DESC, node LIMIT 20
    ),
    e1 AS (SELECT DISTINCT s, d FROM edges),
    d1 AS (SELECT s, d FROM e1 WHERE s IN (SELECT node FROM seeds)),
    r2 AS (SELECT DISTINCT a.s, b.d FROM d1 a JOIN e1 b ON a.d = b.s
           WHERE a.s <> b.d),
    d2 AS (SELECT s, d FROM r2 EXCEPT SELECT s, d FROM d1),
    r3 AS (SELECT DISTINCT a.s, b.d FROM d2 a JOIN e1 b ON a.d = b.s
           WHERE a.s <> b.d),
    d3 AS (SELECT s, d FROM r3 EXCEPT SELECT s, d FROM d1
           EXCEPT SELECT s, d FROM d2)"""


def _dist_frames(spark, sf_dir):
    """(seeds, d1, d2, d3): top-20-hub-rooted DISTINCT distance-class
    frames (seed-bounded frontier joins against the full edge list)."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    e1 = edges.select("s", "d").distinct().localCheckpoint(eager=False)
    deg = e1.groupBy(F.col("s").alias("node")).agg(F.count("*").alias("deg"))
    seeds = (
        deg.orderBy(F.desc("deg"), "node").limit(20).select("node")
    ).localCheckpoint(eager=False)
    d1 = e1.join(
        F.broadcast(seeds.withColumnRenamed("node", "s")), "s"
    ).localCheckpoint(eager=False)
    a = d1.select(F.col("s").alias("s0"), F.col("d").alias("mid"))
    r2 = (
        a.join(e1.select(F.col("s").alias("mid"), "d"), "mid")
        .filter(F.col("s0") != F.col("d"))
        .select(F.col("s0").alias("s"), "d")
        .distinct()
    )
    d2 = r2.subtract(d1).localCheckpoint(eager=False)
    b = d2.select(F.col("s").alias("s0"), F.col("d").alias("mid"))
    r3 = (
        b.join(e1.select(F.col("s").alias("mid"), "d"), "mid")
        .filter(F.col("s0") != F.col("d"))
        .select(F.col("s0").alias("s"), "d")
        .distinct()
    )
    d3 = r3.subtract(d1).subtract(d2).localCheckpoint(eager=False)
    return seeds, d1, d2, d3


register(
    "graph_harmonic_centrality_bounded",
    # Bounded-hop harmonic centrality of the top-20 degree hubs:
    # sum over reachable v (<= 3 hops) of 1/d(u,v), cleared to the
    # INTEGER 6*c1 + 3*c2 + 2*c3 (x6 the common denominator), ranked
    # with doc_id tie-break.
    oracle=f"""
    WITH {_DIST_CTES},
    per AS (
      SELECT s AS node,
             CAST(SUM(w) AS BIGINT) AS h6x
      FROM (
        SELECT s, 6 AS w FROM d1
        UNION ALL SELECT s, 3 FROM d2
        UNION ALL SELECT s, 2 FROM d3
      ) GROUP BY s
    )
    SELECT node AS doc_id, h6x AS harmonic_x6,
           round(h6x / 6.0, 6) AS harmonic
    FROM per ORDER BY h6x DESC, node LIMIT 20
    """,
)


def _dharmonic(spark, sf_dir):
    """Integer-cleared hub-seeded bounded harmonic centrality."""
    seeds, d1, d2, d3 = _dist_frames(spark, sf_dir)
    allw = (
        d1.select("s", F.lit(6).alias("w"))
        .unionByName(d2.select("s", F.lit(3).alias("w")))
        .unionByName(d3.select("s", F.lit(2).alias("w")))
    )
    per = allw.groupBy(F.col("s").alias("node")).agg(
        F.sum("w").cast("long").alias("h6x")
    )
    return (
        per.orderBy(F.desc("h6x"), "node")
        .limit(20)
        .select(
            F.col("node").alias("doc_id"),
            F.col("h6x").alias("harmonic_x6"),
            F.round(F.col("h6x") / F.lit(6.0), 6).alias("harmonic"),
        )
    )


CATALOG["graph_harmonic_centrality_bounded"].fn = _dharmonic


register(
    "graph_bounded_path_stats",
    # Hub-rooted path-length census within 3 hops: (hub, node) pair
    # counts per distance class, mean bounded distance (c1 + 2c2 +
    # 3c3)/(c1 + c2 + c3), and the share of (hub, other-node) pairs
    # reachable within the horizon.  Pure integer rationals.
    oracle=f"""
    WITH {_DIST_CTES},
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    c AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS c1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d2) AS c2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d3) AS c3,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM seeds) AS ns
    )
    SELECT n AS n_nodes, ns AS n_seeds,
           c1 AS pairs_d1, c2 AS pairs_d2, c3 AS pairs_d3,
           round(CAST(c1 + 2 * c2 + 3 * c3 AS DOUBLE) / (c1 + c2 + c3), 9)
             AS mean_bounded_dist,
           round(CAST(c1 + c2 + c3 AS DOUBLE)
                 / (CAST(ns AS DOUBLE) * (n - 1)), 9) AS reachable_share_3hop
    FROM c
    """,
)


def _dpathstats(spark, sf_dir):
    """Hub-rooted distance-class census off the shared frames."""
    seeds, d1, d2, d3 = _dist_frames(spark, sf_dir)
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    c1 = d1.agg(F.count("*").cast("long").alias("c1"))
    c2 = d2.agg(F.count("*").cast("long").alias("c2"))
    c3 = d3.agg(F.count("*").cast("long").alias("c3"))
    n = (
        edges.select("s")
        .distinct()
        .agg(F.count("*").cast("long").alias("n"))
    )
    ns = seeds.agg(F.count("*").cast("long").alias("ns"))
    c = (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ns))
    )
    reach = F.col("c1") + F.col("c2") + F.col("c3")
    return c.select(
        F.col("n").alias("n_nodes"),
        F.col("ns").alias("n_seeds"),
        F.col("c1").alias("pairs_d1"),
        F.col("c2").alias("pairs_d2"),
        F.col("c3").alias("pairs_d3"),
        F.round(
            (F.col("c1") + 2 * F.col("c2") + 3 * F.col("c3")).cast("double") / reach,
            9,
        ).alias("mean_bounded_dist"),
        F.round(
            reach.cast("double") / (F.col("ns").cast("double") * (F.col("n") - 1)), 9
        ).alias("reachable_share_3hop"),
    )


CATALOG["graph_bounded_path_stats"].fn = _dpathstats


register(
    "graph_degree_heterogeneity",
    # Degree heterogeneity of the near-dup graph: <k^2>/<k>^2 (the
    # scale-free-ness gauge), the degree CV, and max/mean ratio —
    # pure integer degree moments, three final divisions.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(deg) AS BIGINT) AS sk,
             SUM(CAST(deg AS HUGEINT) * deg) AS sk2,
             CAST(MAX(deg) AS BIGINT) AS mx
      FROM deg
    )
    SELECT n AS n_nodes,
           round(CAST(sk AS DOUBLE) / n, 6) AS mean_degree,
           round(CAST(n AS DOUBLE) * CAST(sk2 AS DOUBLE)
                 / (CAST(sk AS DOUBLE) * sk), 9) AS heterogeneity,
           round(sqrt((CAST(sk2 AS DOUBLE) - CAST(sk AS DOUBLE) * sk / n)
                      / (n - 1)) / (CAST(sk AS DOUBLE) / n), 9) AS degree_cv,
           round(CAST(mx AS DOUBLE) / (CAST(sk AS DOUBLE) / n), 6)
             AS max_over_mean
    FROM s
    """,
)


def _dheterogeneity(spark, sf_dir):
    """Degree-moment heterogeneity gauges."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    s = deg.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("deg").cast("long").alias("sk"),
        F.sum(F.col("deg").cast("decimal(38,0)") * F.col("deg")).alias("sk2"),
        F.max("deg").cast("long").alias("mx"),
    )
    mean = F.col("sk").cast("double") / F.col("n")
    return s.select(
        F.col("n").alias("n_nodes"),
        F.round(mean, 6).alias("mean_degree"),
        F.round(
            F.col("n").cast("double")
            * F.col("sk2").cast("double")
            / (F.col("sk").cast("double") * F.col("sk")),
            9,
        ).alias("heterogeneity"),
        F.round(
            F.sqrt(
                (
                    F.col("sk2").cast("double")
                    - F.col("sk").cast("double") * F.col("sk") / F.col("n")
                )
                / (F.col("n") - 1)
            )
            / mean,
            9,
        ).alias("degree_cv"),
        F.round(F.col("mx").cast("double") / mean, 6).alias("max_over_mean"),
    )


CATALOG["graph_degree_heterogeneity"].fn = _dheterogeneity
