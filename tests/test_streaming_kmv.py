"""Streaming bottom-k (KMV) distinct sketches: the fold must be
associative, commutative, AND idempotent (safe under at-least-once
replay), exact below capacity, and a real micro-batched stream must
match the pure fold and the exact distinct counts."""

from __future__ import annotations

import itertools

import pandas as pd

from dmds_spark.streaming.kmv import KMV_SPACE, kmv_estimate, kmv_merge

SF = "/root/testdata/sf0.001"


def test_merge_split_order_and_replay_invariance():
    vals = [907, 3, 512, 3, 88, 2**47, 41, 907, 15]
    k = 4
    whole = kmv_merge([], vals, k)
    assert whole == [3, 15, 41, 88]
    for cut in range(len(vals) + 1):
        a, b = vals[:cut], vals[cut:]
        assert kmv_merge(kmv_merge([], a, k), b, k) == whole, cut
        assert kmv_merge(kmv_merge([], b, k), a, k) == whole, cut
    # idempotence: replaying a batch changes nothing
    assert kmv_merge(whole, vals, k) == whole


def test_estimate_exact_below_capacity():
    n, kth, est = kmv_estimate([5, 9, 12], k=64)
    assert (n, kth, est) == (3, None, 3.0)


def test_estimate_formula_at_capacity():
    hashes = sorted([KMV_SPACE // (i + 2) for i in range(8)])
    n, kth, est = kmv_estimate(hashes, k=8)
    assert n == 8 and kth == hashes[7]
    assert est == 7 * KMV_SPACE / hashes[7]


def test_real_stream_matches_fold_and_truth(spark, tmp_path):
    """Two-micro-batch file stream: freshest emission per key must
    equal the pure fold over all items, and with k far above the
    true cardinality the estimate must be EXACT."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.kmv import streaming_kmv_distinct

    e = load_events(spark, SF).select("event_type", "user_id", "ts")
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for i, part in enumerate(
        [e.filter(F.col("ts") <= mid), e.filter(F.col("ts") > mid)]
    ):
        part.coalesce(1).write.parquet(f"{d}/__{i}")
        shutil.move(
            glob.glob(f"{d}/__{i}/part-*.parquet")[0], f"{d}/part{i}.parquet"
        )
        shutil.rmtree(f"{d}/__{i}")
    now = 1_700_000_000
    os.utime(f"{d}/part0.parquet", (now - 100, now - 100))
    os.utime(f"{d}/part1.parquet", (now, now))

    K = 10_000  # far above per-type distinct users at sf0.001 -> exact
    sdf = (
        spark.readStream.schema(spark.read.parquet(f"{d}/part0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )
    q = (
        streaming_kmv_distinct(sdf, k=K)
        .writeStream.format("memory")
        .queryName("kmv_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("kmv_stream").collect()
    assert rows
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["n_seen"] > latest[r["key"]]["n_seen"]:
            latest[r["key"]] = r

    truth = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(latest) == set(truth)
    for key, r in latest.items():
        assert r["n_tracked"] == truth[key], key
        assert r["est_distinct"] == float(truth[key]), key


def test_real_capacity_estimate_quality():
    """At k=64 over all sf0.001 user ids, the estimate must land
    within the ~1/sqrt(k-2) KMV band of the true distinct count."""
    ev = pd.read_parquet(f"{SF}/events.parquet")["user_id"]
    import hashlib

    def u(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:12], 16)

    hashes = kmv_merge([], [u(x) for x in ev], 64)
    n, kth, est = kmv_estimate(hashes, 64)
    true = ev.nunique()
    if n < 64:
        assert est == float(true)
    else:
        assert abs(est / true - 1) < 0.5  # 3.9 sigma at k=64


def test_kmv_merge_hypothesis_fold_invariance():
    """Property: for random value multisets and random 3-way splits,
    any fold order/grouping yields the identical bottom-k set, and
    replaying any batch is a no-op."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=1 << 48), max_size=40),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    )
    def prop(vals, k, c1, c2):
        lo, hi = sorted((min(c1, len(vals)), min(c2, len(vals))))
        a, b, c = vals[:lo], vals[lo:hi], vals[hi:]
        whole = kmv_merge([], vals, k)
        assert kmv_merge(kmv_merge(kmv_merge([], a, k), b, k), c, k) == whole
        assert kmv_merge(kmv_merge(kmv_merge([], c, k), a, k), b, k) == whole
        if b:
            assert kmv_merge(whole, b, k) == whole

    prop()


def test_estimate_zero_kth_hash_guard():
    """A bottom-k set whose kth hash is 0 (single item hashing to
    exactly 0) must estimate, not divide by zero — the update fn runs
    inside the streaming query, where an exception kills the stream."""
    from dmds_spark.streaming.kmv import kmv_estimate

    n, kth, est = kmv_estimate([0], 1)  # would raise ZeroDivisionError
    assert n == 1 and kth == 1 and est == 0.0
    # distinctness makes kth=0 impossible for k>1; normal path intact
    n, kth, est = kmv_estimate([0, 4], 2)
    assert kth == 4 and est > 0
