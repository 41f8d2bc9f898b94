"""bucketized_range_join (scale path) must produce exactly the naive
range_join's rows, and its plan must be a hash equi-join on the bucket
— not a nested loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.relational import bucketized_range_join, range_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, float(i * 3 % 500)) for i in range(1000)], ["pid", "v"]
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 40), float(j * 40 + 55)) for j in range(12)],
        ["iid", "lo", "hi"],
    )
    return pts, ivs


def test_bucketized_matches_naive(spark):
    pts, ivs = _frames(spark)
    naive = range_join(pts, ivs, F.col("v"), F.col("lo"), F.col("hi"))
    fast = bucketized_range_join(pts, ivs, "v", "lo", "hi", bucket_width=64)
    key = lambda df: sorted(
        (r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()
    )
    assert key(fast) == key(naive)
    assert len(key(fast)) > 0


def test_bucketized_is_hash_join(spark):
    pts, ivs = _frames(spark)
    fast = bucketized_range_join(pts, ivs, "v", "lo", "hi", bucket_width=64)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "__bucket" in plan


def test_bucketized_by_keys_matches_naive(spark):
    """With ``by`` equi-keys the result must equal the naive per-key
    range join — across bucket boundaries, touching endpoints, and
    keys with no intervals."""
    pts = spark.createDataFrame(
        [(i, i % 7, float(i * 3 % 500)) for i in range(1000)],
        ["pid", "k", "v"],
    )
    ivs = spark.createDataFrame(
        [(j, j % 5, float(j * 40), float(j * 40 + 55)) for j in range(12)],
        ["iid", "k", "lo", "hi"],
    )
    naive = (
        pts.join(ivs.withColumnRenamed("k", "k2"),
                 (F.col("k") == F.col("k2"))
                 & (F.col("v") >= F.col("lo"))
                 & (F.col("v") <= F.col("hi")))
        .select("pid", "iid")
    )
    fast = bucketized_range_join(
        pts, ivs, "v", "lo", "hi", bucket_width=64, by=["k"]
    ).select("pid", "iid")
    key = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert key(fast) == key(naive)
    assert len(key(fast)) > 0


def _interval_frames(spark):
    import random

    rnd = random.Random(7)
    a = spark.createDataFrame(
        [(i, lo := rnd.randrange(0, 900), lo + rnd.randrange(0, 60))
         for i in range(300)],
        ["aid", "alo", "ahi"],
    )
    b = spark.createDataFrame(
        [(j, lo := rnd.randrange(0, 900), lo + rnd.randrange(0, 60))
         for j in range(200)],
        ["bid", "blo", "bhi"],
    )
    return a, b


def test_interval_overlap_matches_naive(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    naive = a.join(
        b,
        (F.col("alo") <= F.col("bhi")) & (F.col("blo") <= F.col("ahi")),
    )
    fast = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32)
    key = lambda df: sorted(
        (r["aid"], r["bid"]) for r in df.select("aid", "bid").collect()
    )
    nk, fk = key(naive), key(fast)
    assert nk == fk
    assert len(fk) > 100
    # exactly once per pair: the first-shared-bin credit dedups
    assert len(fk) == len(set(fk))


def test_interval_overlap_is_hash_join_and_emits_once(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    fast = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "__bin" in plan


def test_interval_overlap_bucket_width_invariance(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    key = lambda df: sorted(
        (r["aid"], r["bid"]) for r in df.select("aid", "bid").collect()
    )
    base = key(interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32))
    for w in (1, 7, 64, 1000):
        assert key(
            interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", w)
        ) == base
