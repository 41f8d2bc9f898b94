"""Embedding operator tests: LSH pair blocking, exact centroids,
deterministic k-means (operators/similarity.py)."""

from pyspark.sql import functions as F

from dmds_spark.operators.similarity import (
    centroids,
    cosine,
    kmeans_assign,
    lsh_blocked_pairs,
    pair_cosine,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_centroids_exact_small(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        ["label", "v"],
    )
    got = {r["label"]: r["centroid"] for r in centroids(df, "label", "v", dim=2).collect()}
    assert got[0] == [2.0, 4.0]
    assert got[1] == [10.0, 0.0]


def test_centroids_order_independent(spark):
    """Same rows, different partitioning -> bit-identical centroids
    (the decimal-sum property a float sum does not have)."""
    e = _emb(spark)
    a = {r["label"]: r["centroid"] for r in centroids(e, "label", "embedding").collect()}
    b = {
        r["label"]: r["centroid"]
        for r in centroids(e.repartition(7), "label", "embedding").collect()
    }
    assert a == b


def test_pair_cosine_matches_cosine(spark):
    """pair_cosine (norms precomputed per vector) must equal the
    per-pair cosine expression bit-for-bit."""
    e = _emb(spark)
    pairs = lsh_blocked_pairs(e, "vec_id", "embedding", tables=4, planes=4)
    diff = pairs.withColumn(
        "d", pair_cosine() - cosine(F.col("va"), F.col("vb"))
    ).filter(F.col("d") != 0.0)
    assert diff.count() == 0


def test_kmeans_deterministic_and_valid(spark):
    e = _emb(spark)
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(e, "vec_id", "embedding", k=4, iters=2).collect()}
    b = {r["vec_id"]: r["cluster"] for r in kmeans_assign(e, "vec_id", "embedding", k=4, iters=2).collect()}
    assert a == b  # no RNG anywhere: bit-identical re-runs
    assert set(a) == {r["vec_id"] for r in e.select("vec_id").collect()}
    assert all(0 <= c < 4 for c in a.values())
    assert len(set(a.values())) > 1  # actually partitions the space
