"""Distributed FFD bin packing: bit-exact vs the shared Python
reference, capacity respected, and the FFD approximation guarantee
(bins <= 11/9 * OPT + 1, OPT >= ceil(total/capacity)) per shard."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dmds_spark.operators.packing import bin_pack_ffd, ffd_pack
from dmds_spark.operators.sampling import hash_bucket

SF = "/root/testdata/sf0.001"
CAP = 512
SHARDS = 16


def _docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("w")
    )


def test_matches_reference_and_capacity(spark):
    d = _docs(spark)
    got = {
        r["doc_id"]: (r["shard"], r["bin"])
        for r in bin_pack_ffd(d, "w", "doc_id", CAP, shards=SHARDS).collect()
    }
    rows = [
        (r["doc_id"], r["w"], r["b"])
        for r in d.withColumn("b", hash_bucket(F.col("doc_id"), SHARDS))
        .collect()
        if r["w"] <= CAP
    ]
    assert got and len(got) == len(rows)
    # reference packing per shard
    by_shard: dict[int, list] = {}
    for i, w, b in rows:
        by_shard.setdefault(b, []).append((i, w))
    fills: dict[int, int] = {}
    for b, items in by_shard.items():
        ref = ffd_pack([i for i, _ in items], [w for _, w in items], CAP)
        for i, w in items:
            assert got[i] == (b, (b << 32) + ref[i]), i
            key = got[i][1]
            fills[key] = fills.get(key, 0) + w
    assert all(f <= CAP for f in fills.values())
    # FFD guarantee per shard: bins <= 11/9 * OPT + 1 with
    # OPT >= ceil(total / CAP)
    for b, items in by_shard.items():
        total = sum(w for _, w in items)
        n_bins = len({got[i][1] for i, _ in items})
        opt_lb = math.ceil(total / CAP)
        assert n_bins <= math.ceil(11 * opt_lb / 9) + 1, b


def test_oversized_items_excluded(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, CAP), (3, CAP + 1)], ["doc_id", "w"]
    )
    out = bin_pack_ffd(df, "w", "doc_id", CAP, shards=2)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2}


def test_deterministic_across_partitionings(spark):
    d = _docs(spark)
    a = {
        r["doc_id"]: r["bin"]
        for r in bin_pack_ffd(d, "w", "doc_id", CAP, shards=SHARDS).collect()
    }
    b = {
        r["doc_id"]: r["bin"]
        for r in bin_pack_ffd(
            d.repartition(7), "w", "doc_id", CAP, shards=SHARDS
        ).collect()
    }
    assert a == b
