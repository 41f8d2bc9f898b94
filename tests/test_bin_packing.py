"""Distributed FFD bin packing: bit-exact vs the shared Python
reference, capacity respected, the sound any-fit property (at most one
bin per shard under half full), native id types, and partitioning
invariance."""

from __future__ import annotations

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
    # SOUND any-fit property per shard (the 11/9 theorem bounds vs
    # true OPT, which a volume lower bound understates — e.g. items
    # just over CAP/2 pack one per bin correctly): first-fit never
    # leaves TWO bins under half full, because the second bin's first
    # item would have fit in the first.
    for b, items in by_shard.items():
        shard_fills = [
            f for key, f in fills.items() if key >> 32 == b
        ]
        assert sum(1 for f in shard_fills if f < CAP / 2) <= 1, b


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


def test_string_ids_and_null_rows(spark):
    """Ids keep their native type (regression: a long cast turned
    string/url keys into NaN and crashed the Arrow task); null ids or
    weights are excluded, not crashed on."""
    df = spark.createDataFrame(
        [("u1", 10), ("u2", 20), (None, 30), ("u4", None)],
        ["url", "w"],
    )
    out = bin_pack_ffd(df, "w", "url", CAP, shards=2)
    rows = {r["url"]: r["bin"] for r in out.collect()}
    assert set(rows) == {"u1", "u2"}
    assert dict(out.dtypes)["url"] == "string"


def test_duplicate_ids_fail_fast_corpus_wide(spark):
    """Duplicate ids must fail on the driver BEFORE packing, even when
    the two copies hash to different shards (previously: silent
    double-pack) or the same shard (previously: executor-side
    ValueError mid-job)."""
    import pytest

    df = spark.createDataFrame(
        [(1, 5), (1, 7), (2, 3)], "doc_id long, w long"
    )
    with pytest.raises(ValueError, match="unique"):
        bin_pack_ffd(df, "w", "doc_id", 16, shards=4).collect()
    # escape hatch: pre-validated callers skip the extra aggregate
    # (the per-shard raise inside ffd_pack remains a backstop)
    uniq = df.filter("w != 7")
    out = bin_pack_ffd(
        uniq, "w", "doc_id", 16, shards=4, validate_unique=False
    )
    assert out.count() == 2
