"""Rows-only invariant contract for dmds_world_maintenance — the one
driver-sampled query with no SQL oracle (stats() reports physical
layout, which DuckDB cannot model). These invariants make the query's
1000-odd rows verifiable: compaction leaves exactly one file per live
partition, every id lands in the chunk that owns it, and no row is
lost or duplicated across the two upsert waves."""

from pyspark.sql import functions as F

from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_world_maintenance_invariants(spark):
    rows = all_queries()["dmds_world_maintenance"](spark, SF).collect()
    assert rows, "no live partitions"

    # compact(order='id') contract: ONE file per live partition
    assert all(r.n_files == 1 for r in rows)
    assert all(r.n_rows > 0 for r in rows)

    # chunk routing: DimSpec('id', 0, 8191, 64) puts id in chunk
    # c0 = id // 64, so a partition's id range stays inside its cell
    for r in rows:
        assert 0 <= r.min_id <= r.max_id <= 8191
        assert r.c0 * 64 <= r.min_id
        assert r.max_id < (r.c0 + 1) * 64

    # one stats row per physical partition
    keys = [(r.c0, r.c1) for r in rows]
    assert len(keys) == len(set(keys))

    # conservation: the two half-waves (id even / id odd) upsert every
    # distinct source id exactly once
    n_src = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select((F.col("o_orderkey") % 8192).alias("id"))
        .distinct()
        .count()
    )
    assert sum(r.n_rows for r in rows) == n_src
