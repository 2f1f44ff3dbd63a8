"""Split from queries.py lines 12287-12649 (mechanical move, round 13).

Registers this family's catalog entries on import; see queries/__init__.py
for the ordered family list that reconstructs the original catalog order.
"""

from __future__ import annotations

from ._registry import CATALOG, DataFrame, F, dedup, register, t
from .q15_curation_r3 import _minhash_portable_oracle

# ===========================================================================
# round-7 additions: graph analytics over the near-dup graph
# ===========================================================================
# All four compose the SAME edge set PageRank and the fuzzy-cluster ops
# use: the portable MinHash pair set (id_a < id_b) as an undirected
# graph. Candidate generation is the banded equi-join — these queries
# never touch raw text, only (src, dst) id pairs.

_DUP_EDGE_CTE = """
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    deg AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY s)
"""


def _dup_pairs_edges(spark, sf_dir):
    """(pairs, edges) frames for the near-dup graph — pairs ordered
    id_a < id_b, edges both directions. Same parameters as the
    portable-pair oracle so every graph query shares one ground truth.
    The pair pipeline (shingle + signature + banding — the heaviest
    stage) is localCheckpoint'ed LAZILY: the triangle/clustering/
    neighbor-jaccard consumers fan it into 3-4 join branches, and
    without the checkpoint each branch would replay the full pipeline
    whenever exchange reuse fails to kick in (e.g. after an AQE
    re-plan). Lazy (eager=False) so plan construction — the plan lint
    walks every catalog entry — stays job-free; the first action
    materializes it once and every branch reads the cached blocks."""
    d = t(spark, sf_dir, "documents")
    pairs = (
        dedup.minhash_dup_pairs_portable(
            d, "doc_id", "text", num_perm=16, bands=4, jaccard_threshold=0.5
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("id_a").alias("s"), F.col("id_b").alias("d")
    ).unionByName(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
    return pairs, edges


def _dup_degrees(edges: DataFrame) -> DataFrame:
    """Checkpointed (node, deg) table of the near-dup graph — the
    Spark twin of _DUP_EDGE_CTE's deg, single-sourced so the degree
    definition cannot drift between its consumers (assortativity,
    rich-club, and any future degree-conditioned metric)."""
    return (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )

register(
    "graph_triangle_count",
    # global triangle census of the near-dup graph: triangles via the
    # ordered two-hop equi-join (a<b<c, each triangle counted once),
    # wedges from the degree table, global clustering coefficient =
    # 3*triangles/wedges. Pure integer until the one rounded division.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    wed AS (SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) AS wedges2 FROM deg)
    SELECT triangles,
           CAST(wedges2 / 2 AS BIGINT) AS wedges,
           round(6.0 * triangles / wedges2, 6) AS global_clustering
    FROM tri, wed
    """,
)


def _dtriangles(spark, sf_dir):
    """Global triangle count + clustering coefficient: the ordered
    a<b<c two-hop join counts each triangle exactly once and keeps the
    build sides to the (already banded) pair set — at 100 TB the join
    keys are doc ids, never text, and the pair set is orders of
    magnitude smaller than the corpus."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.id_a") == F.col("e1.id_b"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    wed = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1)).cast("long").alias("__wedges2")
    )
    return tri.crossJoin(F.broadcast(wed)).select(
        "triangles",
        (F.col("__wedges2") / 2).cast("long").alias("wedges"),
        F.round(F.lit(6.0) * F.col("triangles") / F.col("__wedges2"), 6).alias(
            "global_clustering"
        ),
    )


CATALOG["graph_triangle_count"].fn = _dtriangles

register(
    "graph_local_clustering_topk",
    # per-node clustering coefficient: each ordered triangle credits
    # all three corners; cc = 2*tri/(deg*(deg-1)) for deg >= 2; top-20
    # most-clustered nodes, ties by node id. Integers + one rounded
    # division.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    tri AS (
      SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    corner AS (
      SELECT a AS node FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    ),
    tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_n FROM corner GROUP BY node)
    SELECT d.node AS doc_id, d.deg AS degree,
           CAST(COALESCE(tn.tri_n, 0) AS BIGINT) AS triangles,
           round(2.0 * COALESCE(tn.tri_n, 0) / (d.deg * (d.deg - 1)), 6) AS local_cc
    FROM deg d LEFT JOIN tn ON tn.node = d.node
    WHERE d.deg >= 2
    ORDER BY local_cc DESC, doc_id
    LIMIT 20
    """,
)


def _dlocalcc(spark, sf_dir):
    """Per-node clustering coefficient over the near-dup graph (how
    clique-like each document's duplicate neighborhood is — high cc
    marks template families, low cc marks chain-like drift): one
    triangle join, a 3-way corner union, one left join onto degrees,
    distributed TakeOrdered top-20."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.id_a") == F.col("e1.id_b"))
        .join(
            e3,
            (F.col("e3.id_a") == F.col("e1.id_a"))
            & (F.col("e3.id_b") == F.col("e2.id_b")),
        )
        .select(
            F.col("e1.id_a").alias("a"),
            F.col("e1.id_b").alias("b"),
            F.col("e2.id_b").alias("c"),
        )
    )
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tn = corner.groupBy("node").agg(F.count("*").cast("long").alias("tri_n"))
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tn, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.col("deg").alias("degree"),
            F.coalesce(F.col("tri_n"), F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("tri_n"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("local_cc"),
        )
        .orderBy(F.desc("local_cc"), "doc_id")
        .limit(20)
    )


CATALOG["graph_local_clustering_topk"].fn = _dlocalcc


def _label_prop_cte(rounds: int = 3) -> tuple[str, str]:
    """(WITH-body, final-label-table-name) for unrolled synchronous
    min-label propagation: l0 = own id, each round takes the min of
    own and neighbor labels — fully deterministic (no tie-break
    randomness), so exactly oracle-able. Shared by the community-size
    query and the cluster-purity query."""
    prev = "l0"
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    nm{r} AS (
      SELECT e.d AS node, MIN(l.lbl) AS nmin
      FROM edges e JOIN {prev} l ON l.node = e.s
      GROUP BY e.d
    ),
    l{r} AS (
      SELECT p.node, least(p.lbl, COALESCE(nm{r}.nmin, p.lbl)) AS lbl
      FROM {prev} p LEFT JOIN nm{r} ON nm{r}.node = p.node
    )""")
        prev = f"l{r}"
    body = f"""pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    nodes AS (SELECT DISTINCT s AS node FROM edges),
    l0 AS (SELECT node, node AS lbl FROM nodes){"".join(iters)}"""
    return body, prev


def _label_prop_oracle(rounds: int = 3) -> str:
    body, final = _label_prop_cte(rounds)
    return f"""
    WITH {body}
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM {final}
    GROUP BY lbl
    ORDER BY n_members DESC, community
    LIMIT 20
    """


register("graph_label_propagation_communities", oracle=_label_prop_oracle())


def _min_label_frames(spark, sf_dir, rounds: int = 3):
    """Final (node, lbl) frame of synchronous min-label propagation
    over the near-dup graph — the deterministic community-detection
    variant (the classic random-tie LPA is not reproducible across
    engines; min-label is, and converges to connected components in
    diameter rounds). Each round is one neighbor-min aggregate + one
    left join; each round's label frame is localCheckpoint'ed per the
    iterative-op convention, so executed plan depth is constant in
    the round count."""
    _, edges = _dup_pairs_edges(spark, sf_dir)
    edges = edges.persist()
    try:
        nodes = edges.select(F.col("s").alias("node")).distinct()
        lbl = nodes.select("node", F.col("node").alias("lbl"))
        for _ in range(rounds):
            nm = (
                edges.join(
                    lbl.withColumnsRenamed({"node": "s", "lbl": "__l"}), "s"
                )
                .groupBy(F.col("d").alias("node"))
                .agg(F.min("__l").alias("__nmin"))
            )
            lbl = (
                lbl.join(nm, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("__nmin"), F.col("lbl"))
                    ).alias("lbl"),
                )
                .localCheckpoint(eager=True)
            )
        return lbl
    finally:
        edges.unpersist()


def _dlabelprop(spark, sf_dir):
    """Community sizes from 3-round min-label propagation (see
    _min_label_frames); top-20 by size, deterministic ties."""
    lbl = _min_label_frames(spark, sf_dir, rounds=3)
    return (
        lbl.groupBy(F.col("lbl").cast("long").alias("community"))
        .agg(F.count("*").cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(20)
    )


CATALOG["graph_label_propagation_communities"].fn = _dlabelprop

register(
    "graph_neighbor_jaccard_topk",
    # structural similarity of each connected pair: Jaccard of the two
    # neighbor sets, |N(a) n N(b)| via the shared-neighbor equi-join,
    # |N(a) u N(b)| = deg_a + deg_b - cn. The edge-embeddedness score
    # that separates incidental near-dups from template families.
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    {_DUP_EDGE_CTE},
    cn AS (
      SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS common_n
      FROM pairs p
      JOIN edges n1 ON n1.s = p.id_a
      JOIN edges n2 ON n2.s = p.id_b AND n2.d = n1.d
      GROUP BY p.id_a, p.id_b
    )
    SELECT p.id_a, p.id_b,
           CAST(COALESCE(cn.common_n, 0) AS BIGINT) AS common_neighbors,
           round(CAST(COALESCE(cn.common_n, 0) AS DOUBLE)
                 / (da.deg + db.deg - COALESCE(cn.common_n, 0)), 6)
             AS neighbor_jaccard
    FROM pairs p
    JOIN deg da ON da.node = p.id_a
    JOIN deg db ON db.node = p.id_b
    LEFT JOIN cn ON cn.id_a = p.id_a AND cn.id_b = p.id_b
    ORDER BY neighbor_jaccard DESC, p.id_a, p.id_b
    LIMIT 20
    """,
)


def _dneighborjaccard(spark, sf_dir):
    """Neighbor-set Jaccard per connected pair: the common-neighbor
    count is a two-hop equi-join on node ids (shuffle keys are ids,
    payloads are ids — nothing wide moves), degrees join in, top-20 by
    embeddedness. High scores mark pairs whose whole neighborhoods
    duplicate each other — the template-family signal."""
    pairs, edges = _dup_pairs_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("s").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    n1 = edges.withColumnsRenamed({"s": "id_a", "d": "__n"})
    n2 = edges.withColumnsRenamed({"s": "id_b", "d": "__n"})
    cn = (
        pairs.join(n1, "id_a")
        .join(n2, ["id_b", "__n"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("common_n"))
    )
    da = deg.withColumnsRenamed({"node": "id_a", "deg": "__da"})
    db = deg.withColumnsRenamed({"node": "id_b", "deg": "__db"})
    common = F.coalesce(F.col("common_n"), F.lit(0))
    return (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .join(cn, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            common.cast("long").alias("common_neighbors"),
            F.round(
                common.cast("double") / (F.col("__da") + F.col("__db") - common), 6
            ).alias("neighbor_jaccard"),
        )
        .orderBy(F.desc("neighbor_jaccard"), "id_a", "id_b")
        .limit(20)
    )


CATALOG["graph_neighbor_jaccard_topk"].fn = _dneighborjaccard


