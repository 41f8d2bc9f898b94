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


def test_lsh_band_join_hot_bucket_skew_split(spark):
    """The dedup docstring's 'AQE splits hot buckets' claim, TESTED
    (round-12 verdict item 6): plant a degenerate band bucket — a
    corpus slice of identical text, so every hot doc shares all four
    band keys — and pin that AQE's skew-join split actually fires on
    the band equi-join (SortMergeJoin(skew=true) + AQEShuffleRead
    skewed in the final adaptive plan), with the candidate set still
    exact (all C(hot,2) pairs).

    The thresholds are scaled to the toy corpus exactly as the
    defaults relate to production: skewedPartitionThresholdInBytes
    (256 MB default) shrinks to 1 KB because the hot bucket here is
    ~40 KB, and the hot buckets must be OUTLIERS vs the median
    partition for Spark to call them skew — hence 64 shuffle
    partitions (4 hot buckets among 8 makes the MEDIAN hot, and
    uniform hotness is correctly not skew). Partition coalescing is
    off for the measurement: at this byte scale the coalescer folds
    the cold partitions into the hot ones before skew detection runs,
    while at production scale coalescing targets the advisory size and
    a 256 MB+ hot bucket stays an outlier."""
    from dmds_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )

        n_hot = 800
        hot = [
            (i, "the same exact text repeated for every hot document "
                "in this slice " * 3)
            for i in range(n_hot)
        ]
        cold = [
            (100000 + i,
             f"unique document number {i} with its own words "
             f"{i * 7} {i * 13} and tail {i % 97}")
            for i in range(200)
        ]
        docs = spark.createDataFrame(hot + cold, ["doc_id", "text"])
        sigs = minhash_signatures(docs, "text", "doc_id", 16, 3)
        ids = minhash_lsh_candidates(sigs, "doc_id", 16, 4).select(
            "id_a", "id_b"
        )
        pairs = ids.collect()
        plan = ids._jdf.queryExecution().executedPlan().toString()
        final = plan.split("Initial Plan")[0]
        band_join = next(
            line for line in final.splitlines()
            if "SortMergeJoin" in line and "band_key" in line
        )
        assert "skew=true" in band_join, band_join
        assert "AQEShuffleRead skewed" in final
        # candidate recall untouched by the split: every hot pair found
        hot_pairs = sum(
            1 for r in pairs if r["id_a"] < n_hot and r["id_b"] < n_hot
        )
        assert hot_pairs == n_hot * (n_hot - 1) // 2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
