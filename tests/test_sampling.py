"""Deterministic-sampling invariants: partition-independence,
disjoint-and-total splits, referential integrity of co-keyed samples."""

from pyspark.sql import functions as F

from dmds_spark.operators.sampling import hash_sample, hash_split

SF = "/root/testdata/sf0.001"


def test_sample_partition_invariant(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    a = {r[0] for r in hash_sample(orders, F.col("o_orderkey"), 0.1).select("o_orderkey").collect()}
    b = {
        r[0]
        for r in hash_sample(orders.repartition(7, "o_custkey"), F.col("o_orderkey"), 0.1)
        .select("o_orderkey")
        .collect()
    }
    assert a == b and 0 < len(a) < orders.count()


def test_split_disjoint_total(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    splits = hash_split(docs, F.col("doc_id"), [0.8, 0.1, 0.1])
    ids = [
        {r[0] for r in s.select("doc_id").collect()} for s in splits
    ]
    assert sum(len(i) for i in ids) == docs.count()
    assert ids[0] | ids[1] | ids[2] == {r[0] for r in docs.select("doc_id").collect()}
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])


def test_cokeyed_referential_integrity(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    so = hash_sample(orders, F.col("o_orderkey"), 0.2)
    sl = hash_sample(li, F.col("l_orderkey"), 0.2)
    # every sampled lineitem's order is in the sampled orders
    orphans = sl.join(so, sl.l_orderkey == so.o_orderkey, "left_anti")
    assert orphans.count() == 0


def test_capped_per_group_matches_single_window(spark):
    """Two-level cap == single-window rank <= k, including on a
    heavily skewed group."""
    from pyspark.sql import Window as W

    from dmds_spark.operators.sampling import capped_per_group

    rows = [(i, "hot" if i % 10 != 0 else f"g{i % 7}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    order = ["id"]
    for k in (1, 7, 50):
        naive = (
            df.withColumn(
                "rn", F.row_number().over(W.partitionBy("grp").orderBy(*order))
            )
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
        fast = capped_per_group(df, "grp", order, k, slices=8)
        a = sorted((r["grp"], r["id"]) for r in fast.collect())
        b = sorted((r["grp"], r["id"]) for r in naive.collect())
        assert a == b
        assert len(a) > 0
