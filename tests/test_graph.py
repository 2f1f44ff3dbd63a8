"""Connected-components / cluster-representative tests: exactness on
known graphs, convergence behavior, and the dedup end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_data_pipeline_spark.ops.graph import (
    connected_components,
    keep_cluster_representative,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_exact_on_known_graph(spark):
    # components: {1,2,3} (path), {5,6} (edge), {8,9,10} (triangle)
    e = _edges(spark, [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (8, 10)])
    got = {r["id"]: r["cluster"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_components_long_chain_converges(spark):
    # a 9-node path: worst case for propagation (diameter 8 < max_iter)
    e = _edges(spark, [(i, i + 1) for i in range(1, 9)])
    got = {r["id"]: r["cluster"] for r in connected_components(e).collect()}
    assert set(got.values()) == {1} and len(got) == 9


def test_components_chain_beyond_max_iter_diameter(spark):
    # a 60-node path has diameter 59 — pure min-label propagation would
    # need 59 rounds and silently truncate at max_iter=10 (the ADVICE r8
    # finding); pointer jumping converges it within the default budget
    e = _edges(spark, [(i, i + 1) for i in range(1, 60)])
    got = {r["id"]: r["cluster"] for r in connected_components(e).collect()}
    assert set(got.values()) == {1} and len(got) == 60


def test_components_nonconvergence_raises(spark):
    # with max_iter=1 a 60-node chain cannot converge: the failure must
    # be loud (the oracles compute an unbounded closure, so a silently
    # partial label table would diverge downstream)
    import pytest

    e = _edges(spark, [(i, i + 1) for i in range(1, 60)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iter=1)


def test_components_boundary_jump_convergence_returns(spark):
    # a 3-node path at max_iter=1: the one propagation round still
    # reports changes, but the pointer jump after it completes the
    # labels — the boundary check must RETURN the (correct) result,
    # not raise on an already-exact table (round-9 review finding)
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {r["id"]: r["cluster"] for r in connected_components(e, max_iter=1).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_components_direction_invariant(spark):
    a = connected_components(_edges(spark, [(4, 2), (2, 7)]))
    b = connected_components(_edges(spark, [(2, 4), (7, 2)]))
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_keep_cluster_representative(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in [1, 2, 3, 5, 6, 9]], "doc_id long, body string"
    )
    e = _edges(spark, [(1, 2), (2, 3), (5, 6)])
    kept = sorted(
        r["doc_id"]
        for r in keep_cluster_representative(df, e, "doc_id").collect()
    )
    # cluster {1,2,3} -> keep 1; {5,6} -> keep 5; isolated 9 kept
    assert kept == [1, 5, 9]
