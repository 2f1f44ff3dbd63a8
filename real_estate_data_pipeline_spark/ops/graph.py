"""Connected components over dup-pair edges — the step between a
pairwise near-dup operator (minhash/simhash/jaccard/embedding) and the
thing a training pipeline actually wants: ONE representative per
duplicate cluster.

Label propagation to the component-minimum id: every node starts
labeled with itself, and each round takes the min of its own and its
neighbors' labels. Converges in O(component diameter) rounds — dup
clusters are near-cliques (diameter 1-2), so 3-5 rounds close almost
any real corpus; ``max_iter`` hard-bounds pathological chains.

Scale notes:
- each round is one shuffle (join on dst) + one aggregate; edges are
  re-used as-is, only the slim (id, label) frame iterates;
- ``localCheckpoint`` truncates the lineage each round — without it
  the plan doubles per iteration and the job dies on plan size long
  before it dies on data;
- convergence detection rides the label aggregate itself: the round's
  ``groupBy`` also emits a per-id ``changed`` flag (new min label !=
  the id's prior label), so the probe is a join-free ``limit(1)`` scan
  of the just-checkpointed frame instead of a second shuffle join per
  iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(id, cluster) for every id appearing in ``edges``; ``cluster``
    is the smallest id in the component. Isolated ids never appear in
    edges, so callers union them back with cluster = own id (see
    ``keep_cluster_representative``).

    Each round is min-label propagation over the edges followed by one
    pointer-jumping shortcut (label <- label's label), so convergence
    takes O(log diameter) rounds, not O(diameter) — the default
    ``max_iter=10`` then covers any component of diameter ~2^10, and a
    path graph (the typo-chain adversary for ER blocking) converges in
    a handful of rounds instead of needing one per hop. The fixpoint
    test lives on the propagation step: at its fixpoint every edge has
    equal labels on both ends, which is exactly label == component
    minimum, so shortcut steps in between can't fake convergence.
    Exhausting ``max_iter`` without converging raises instead of
    returning silently-partial labels (the oracles compute an unbounded
    transitive closure, so a truncated result would diverge silently)."""
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    # Materialize the symmetric edge frame ONCE: every round joins it,
    # and without the checkpoint the caller's whole edge pipeline
    # (LSH banding, cosine verify, ...) replays per round — the 10x
    # probe measured the cosine-components query at ~290 s of which
    # almost all was this replay. Also pins the edge set for the run:
    # components are defined over ONE observation of the edges.
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    # max_iter + 1 propagation passes: the +1 is the boundary check —
    # the last round's pointer jump may complete convergence, and only
    # a propagation pass can observe that (so exhaustion on an
    # already-exact label table never raises spuriously).
    for it in range(max_iter + 1):
        neigh = sym.join(labels, sym.dst == labels.id).select(
            F.col("src").alias("id"), F.col("label")
        )
        # Every id has exactly ONE row from `labels` (its prior label,
        # is_old) and any number of neighbor rows; min over the old rows
        # recovers the prior label inside the same aggregate, so the
        # changed flag costs no extra join.
        combined = labels.withColumn("is_old", F.lit(True)).unionByName(
            neigh.withColumn("is_old", F.lit(False))
        )
        new = (
            combined.groupBy("id")
            .agg(
                F.min("label").alias("label"),
                (
                    F.min("label")
                    != F.min(F.when(F.col("is_old"), F.col("label")))
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        any_changed = new.filter(F.col("changed")).limit(1).count()
        labels = new.drop("changed")
        if any_changed == 0:
            return labels.select(F.col("id"), F.col("label").alias("cluster"))
        if it == max_iter:
            raise RuntimeError(
                f"connected_components did not converge within {max_iter} "
                "propagate+jump rounds (component min-label distance still "
                f"> ~2^{max_iter} hops); raise max_iter"
            )
        # Pointer jumping: every label value is itself an id in `labels`
        # (labels only ever take min-of-ids values), so label-of-label is
        # a node-table self-join — much smaller than the edge join — and
        # halves the remaining propagation distance each round.
        lab2 = labels.select(F.col("id").alias("lid"), F.col("label").alias("llabel"))
        labels = (
            labels.join(lab2, labels["label"] == lab2["lid"], "left")
            .select("id", F.coalesce("llabel", "label").alias("label"))
            .localCheckpoint(eager=True)
        )


def keep_cluster_representative(
    df: DataFrame,
    edges: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Near-dup removal: keep ONE row (the minimum id) per duplicate
    cluster, plus every row that appears in no dup pair. A left join
    against the (small) component labels — null label means isolated,
    kept; labeled rows survive iff they ARE their cluster's minimum."""
    labels = connected_components(edges, id_a, id_b, max_iter)
    return (
        df.join(labels, df[id_col] == labels.id, "left")
        .filter(F.col("cluster").isNull() | (F.col(id_col) == F.col("cluster")))
        .drop("id", "cluster")
    )
