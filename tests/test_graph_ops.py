"""Degree-capped wedge enumeration: the hub mitigation the graph
queries document at 100 TB. Pins: cap >= max degree is EXACT; capped
counts are undercounts only; fan-out is actually bounded; the kept
sample is deterministic across reruns and partitionings."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.operators.graph import (
    cap_vertex_degree,
    common_neighbor_counts,
)


def _edges(spark):
    # shared endpoint 0 is a hub (degree 12); 1..4 are small
    rows = [(0, i) for i in range(1, 13)]
    rows += [(1, 2), (1, 3), (2, 2), (2, 3), (3, 7), (4, 9)]
    return spark.createDataFrame(rows, "shared long, a long")


def _exact(spark, edges):
    return {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbor_counts(edges, "shared", "a").collect()
    }


def test_uncapped_matches_bruteforce(spark):
    e = _edges(spark)
    got = _exact(spark, e)
    rows = [(r["shared"], r["a"]) for r in e.collect()]
    from collections import defaultdict

    adj = defaultdict(set)
    for s, a in rows:
        adj[s].add(a)
    want = defaultdict(int)
    for s, ns in adj.items():
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                want[(ns[i], ns[j])] += 1
    assert got == dict(want)


def test_cap_at_max_degree_is_exact(spark):
    e = _edges(spark)
    exact = _exact(spark, e)
    capped = {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbor_counts(
            e, "shared", "a", degree_cap=12
        ).collect()
    }
    assert capped == exact


def test_capped_is_undercount_only_and_bounded(spark):
    e = _edges(spark)
    exact = _exact(spark, e)
    cap = 4
    capped = {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbor_counts(
            e, "shared", "a", degree_cap=cap
        ).collect()
    }
    for pair, c in capped.items():
        assert c <= exact.get(pair, 0), pair
    # fan-out bound: no shared endpoint contributes more than C(cap,2)
    kept = cap_vertex_degree(e, "shared", "a", cap)
    sizes = {
        r["shared"]: r["n"]
        for r in kept.groupBy("shared").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert all(n <= cap for n in sizes.values())
    assert sizes[0] == cap  # the hub was actually capped


def test_cap_selection_deterministic_across_partitionings(spark):
    e = _edges(spark)
    a = {
        tuple(r)
        for r in cap_vertex_degree(e, "shared", "a", 4).collect()
    }
    b = {
        tuple(r)
        for r in cap_vertex_degree(
            e.repartition(13), "shared", "a", 4
        ).collect()
    }
    assert a == b


def test_capped_agrees_with_registered_query_shape(spark):
    """On the real purchase graph at sf0.001, a generous cap must
    reproduce the registered common-neighbors top-20 exactly."""
    from dmds_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    max_deg = (
        e.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    got = (
        common_neighbor_counts(e, "c", "s", degree_cap=int(max_deg))
        .orderBy(F.col("common").desc(), "a", "b")
        .limit(20)
        .collect()
    )
    want = all_queries()["graph_common_neighbors"](spark, sf).collect()
    assert [
        (r["a"], r["b"], r["common"]) for r in got
    ] == [
        (r["supp_a"], r["supp_b"], r["common_customers"]) for r in want
    ]


def test_khop_frontiers_on_toy_graph(spark, tmp_path):
    """Hand-computable BFS: suppliers {1,2,3} x customers {10,20,30}
    with edges 1-10, 1-20, 2-20, 3-30. Seed = supplier 1.
    hop1 = {10,20}; hop2 = suppliers of {10,20} minus 1 = {2};
    hop3 = customers of {2} minus hop1 = {} (20 already reached)."""
    import os

    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries

    d = str(tmp_path / "sf")
    os.makedirs(d)
    li = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 2), (103, 3)],
        "l_orderkey long, l_suppkey long",
    )
    # _li reads more columns; give it the full lineitem shape it needs
    li = li.select(
        "l_orderkey", "l_suppkey",
        F.lit(1).alias("l_partkey"), F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"), F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.current_date().alias("l_shipdate"),
        F.current_date().alias("l_commitdate"),
        F.current_date().alias("l_receiptdate"),
    )
    li.write.parquet(f"{d}/lineitem.parquet")
    orders = spark.createDataFrame(
        [(100, 10), (101, 20), (102, 20), (103, 30)],
        "o_orderkey long, o_custkey long",
    )
    orders.write.parquet(f"{d}/orders.parquet")
    got = {
        r["hop"]: r["frontier"]
        for r in all_queries()["graph_khop_reachability"](spark, d).collect()
    }
    assert got == {1: 2, 2: 1, 3: 0}
