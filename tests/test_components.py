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
    # small_graph_rows=0 forces the distributed loop: the union-find
    # fast path has no convergence loop, so the guard lives only there
    edf = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edf, "id_a", "id_b", max_iter=1, small_graph_rows=0
        )


def test_small_graph_fast_path_equals_distributed(spark):
    """The driver-side union-find fast path returns EXACTLY the
    distributed min-label fixpoint — same components, same min-id
    labels, isolated vertices included — on a seeded random graph
    (multiple components, chains, self-contained triangles)."""
    import random

    rng = random.Random(13)
    nodes = list(range(60))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(45)})
    verts = nodes + [999]  # one guaranteed-isolated vertex
    edf = spark.createDataFrame(edges, ["id_a", "id_b"])
    vdf = spark.createDataFrame([(v,) for v in verts], ["id"])
    fast = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            edf, "id_a", "id_b", vertices=vdf, id_col="id"
        ).collect()
    }
    dist = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            edf, "id_a", "id_b", vertices=vdf, id_col="id",
            small_graph_rows=0,
        ).collect()
    }
    assert fast == dist
    # and without vertices: node set == edge endpoints on both paths
    fast2 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edf, "id_a", "id_b").collect()
    }
    dist2 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            edf, "id_a", "id_b", small_graph_rows=0
        ).collect()
    }
    assert fast2 == dist2


def test_jaccard_exact_column_form(spark):
    from pyspark.sql import functions as F

    from dmds_spark.functions.text import jaccard_exact

    df = spark.createDataFrame(
        [(["a b c", "b c d"], ["b c d", "d e f"]), ([], [])],
        ["sa", "sb"],
    )
    got = [r.j for r in df.select(
        jaccard_exact(F.col("sa"), F.col("sb")).alias("j")
    ).collect()]
    assert got[0] == 1 / 3  # {a b c, b c d} vs {b c d, d e f}
    assert got[1] == 0.0


def test_containment_verify_subset_doc(spark):
    """A doc fully contained in a longer one scores containment 1.0
    (inter == min size) even though its Jaccard is well below 0.5."""
    from dmds_spark.operators.dedup import (
        containment_verify_pairs,
        jaccard_verify_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " zeta eta theta iota kappa lam mu nu xi omicron pi rho"
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    got = {
        (r.id_a, r.id_b): (r.inter_cnt, r.min_cnt)
        for r in containment_verify_pairs(
            docs, pairs, "text", "doc_id", k=3, threshold_pct=70
        ).collect()
    }
    # short has 3 distinct 3-shingles, all present in long; (1,3) shares none
    assert got == {(1, 2): (3, 3)}
    # the same pair fails a 0.5 Jaccard verify (union is much larger)
    jac = jaccard_verify_pairs(docs, pairs, "text", "doc_id", 3, 0.5)
    assert jac.count() == 0


def test_optimized_plan_inspection(spark):
    from dmds_spark.plans import physical_plan
    from dmds_spark.plans.inspect import optimized_plan

    df = spark.range(10).filter("id > 3")
    assert "id" in optimized_plan(df)
    assert "Range" in physical_plan(df)


def test_containment_matches_bruteforce_random_corpus(spark):
    """containment_verify_pairs == pure-Python shingle-set math on a
    seeded random corpus, over ALL candidate pairs."""
    import itertools
    import random

    from dmds_spark.operators.dedup import containment_verify_pairs

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(30)
    ]
    k, pct = 3, 50

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        if not sa or not sb:
            continue
        inter, mn = len(sa & sb), min(len(sa), len(sb))
        if inter * 100 >= pct * mn:
            want[(ia, ib)] = (inter, mn)

    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = spark.createDataFrame(
        [(a, b) for (a, _), (b, _) in itertools.combinations(docs, 2)],
        ["id_a", "id_b"],
    )
    got = {
        (r.id_a, r.id_b): (r.inter_cnt, r.min_cnt)
        for r in containment_verify_pairs(
            ddf, pairs, "text", "doc_id", k=k, threshold_pct=pct
        ).collect()
    }
    assert got == want


def test_triangle_enumeration_matches_bruteforce(spark):
    """The oriented two-join triangle shape (as used by
    graph_triangle_count) finds each triangle exactly once on a seeded
    random graph."""
    import itertools
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    nodes = list(range(20))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)}
    )
    eset = set(edges)
    want_tris = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }
    want_counts = {}
    for t in want_tris:
        for v in t:
            want_counts[v] = want_counts.get(v, 0) + 1

    edf = spark.createDataFrame(edges, ["u", "v"])
    e1 = edf.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edf.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edf.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = e1.join(e2, F.col("b") == F.col("b2")).join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    got_tris = {(r.a, r.b, r.c) for r in tri.collect()}
    assert got_tris == want_tris
    nodes_df = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
    )
    got_counts = {
        r.n: r.cnt
        for r in nodes_df.groupBy("n").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got_counts == want_counts
