"""connected_components unit behavior: known graphs, isolated
vertices, convergence guard."""

from __future__ import annotations

import pytest

from dmds_spark.operators.dedup import connected_components


def _cc(spark, edges, vertices=None):
    edf = spark.createDataFrame(edges, ["id_a", "id_b"])
    vdf = (
        spark.createDataFrame([(v,) for v in vertices], ["id"])
        if vertices is not None
        else None
    )
    out = connected_components(edf, "id_a", "id_b", vertices=vdf, id_col="id")
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_two_components_and_isolated(spark):
    # {1,2,3} via 1-2, 2-3; {10,11}; 99 isolated
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)], vertices=[1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_converges_beyond_one_round(spark):
    # a path graph needs ~diameter rounds of min propagation
    chain = [(i, i + 1) for i in range(1, 9)]
    got = _cc(spark, chain)
    assert got == {i: 1 for i in range(1, 10)}


def test_edge_only_vertices_default(spark):
    got = _cc(spark, [(5, 7)])
    assert got == {5: 5, 7: 5}


def test_nonconvergence_raises(spark):
    edf = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, "id_a", "id_b", max_iter=1)
