"""salted_agg / salted_join equivalence with their unsalted forms on a
deliberately skewed frame (one key holds ~90% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    hot = [(i, "hot", float(i % 7)) for i in range(900)]
    cold = [(1000 + i, f"k{i % 5}", float(i)) for i in range(100)]
    return spark.createDataFrame(hot + cold, ["id", "key", "v"])


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = salted_agg(
        df,
        keys=["key"],
        aggs={
            "s": (F.sum(F.col("v").cast("decimal(18,6)")), "sum"),
            "n": (F.count(F.lit(1)), "sum"),
            "lo": (F.min("id"), "min"),
            "hi": (F.max("id"), "max"),
        },
        distributor_cols=["id"],
        salt_n=16,
    )
    want = df.groupBy("key").agg(
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain(spark):
    df = _skewed(spark)
    dim = df.groupBy("key").agg(F.count(F.lit(1)).alias("total"))
    got = salted_join(df, dim, on="key", distributor_cols=["id"], salt_n=8)
    want = df.join(dim, "key")
    assert sorted(map(tuple, got.select("id", "key", "total").collect())) == sorted(
        map(tuple, want.select("id", "key", "total").collect())
    )


def test_salted_join_left_outer_keeps_unmatched(spark):
    df = _skewed(spark)
    dim = (
        df.filter(F.col("key") == "hot")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    got = salted_join(df, dim, on="key", distributor_cols=["id"], salt_n=4, how="left")
    want = df.join(dim, "key", "left")
    assert sorted(
        map(tuple, got.select("id", "key", "total").collect())
    ) == sorted(map(tuple, want.select("id", "key", "total").collect()))


def test_salted_join_rejects_dim_preserving_shapes(spark):
    # right/full would emit each unmatched dim row once per salt
    # replica — rejected up front
    import pytest

    df = _skewed(spark)
    dim = df.groupBy("key").agg(F.count(F.lit(1)).alias("total"))
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError):
            salted_join(df, dim, on="key", distributor_cols=["id"], how=how)
