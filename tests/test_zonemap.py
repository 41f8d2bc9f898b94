"""Zone-map data skipping: correctness against a plain filtered read,
real pruning on the time-correlated layout, conservative handling of
stale zones (writes after refresh NEVER lose rows), dirty-only refresh,
pending-buffer visibility, versioned-world fingerprints, and the static
partition-pruning plan shape."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.plans import physical_plan
from dmds_spark.sources.registry import load_events
from dmds_spark.world import World

SF = "/root/testdata/sf0.001"


def _us(s: str) -> int:
    return int(
        datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()
        * 1_000_000
    )


BOUNDS = {"ts": (_us("2024-01-05 00:00:00"), _us("2024-01-08 00:00:00"))}


@pytest.fixture()
def world(spark, tmp_path):
    spec = WorldSpec(dims=(DimSpec("event_id", 0, 2**20 - 1, 256),))
    w = World(spark, spec, str(tmp_path / "zw"))
    w.upsert(load_events(spark, SF).select(
        "event_id", "user_id", "event_type", "value", "ts"
    ))
    w.flush()
    return w


def _rows(df):
    return {(r["event_id"], r["user_id"]) for r in df.collect()}


def test_read_where_matches_plain_filter(spark, world):
    world.zonemap_refresh(["ts"])
    got = _rows(world.read_where(BOUNDS))
    lo, hi = BOUNDS["ts"]
    want = _rows(
        world.snapshot().filter(
            (F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi)
        )
    )
    assert got == want and got


def test_zones_actually_prune(world):
    """event_id is assigned in ts order, so id-chunk zones on ts are
    tight: a 3-day window out of 30 must skip most partitions."""
    world.zonemap_refresh(["ts"])
    rep = world.zonemap_prune_report(BOUNDS)
    assert rep["stale"] == 0
    assert rep["pruned"] >= rep["total"] // 2


def test_stale_partitions_are_conservatively_scanned(spark, world):
    """Rows written AFTER the refresh extend a partition's real ts
    range beyond its stored zone; without a new refresh the partition's
    fingerprint mismatches, so it must be scanned, not pruned."""
    world.zonemap_refresh(["ts"])
    mid = (BOUNDS["ts"][0] + BOUNDS["ts"][1]) // 2
    row = spark.createDataFrame(
        [(999_000, 1, "late", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_micros(F.lit(mid)))
    world.upsert(row)
    world.flush()  # new partition, no refresh
    assert (999_000, 1) in _rows(world.read_where(BOUNDS))
    rep = world.zonemap_prune_report(BOUNDS)
    assert rep["stale"] >= 1


def test_refresh_is_dirty_only(spark, world):
    r1 = world.zonemap_refresh(["ts"])
    assert r1["recomputed"] == r1["partitions"] > 0
    # touch exactly one existing chunk (event_id 0 -> chunk 0)
    world.upsert(
        load_events(spark, SF)
        .filter(F.col("event_id") == 0)
        .select("event_id", "user_id", "event_type", "value", "ts")
    )
    world.flush()
    r2 = world.zonemap_refresh(["ts"])
    assert r2["recomputed"] == 1
    assert r2["kept"] == r2["partitions"] - 1


def test_pending_rows_visible_without_flush(spark, world):
    world.zonemap_refresh(["ts"])
    mid = (BOUNDS["ts"][0] + BOUNDS["ts"][1]) // 2
    row = spark.createDataFrame(
        [(999_111, 2, "pending", 1.0)],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_micros(F.lit(mid)))
    world.upsert(row)  # NOT flushed
    assert (999_111, 2) in _rows(world.read_where(BOUNDS))


def test_versioned_world_zonemap(spark, tmp_path):
    spec = WorldSpec(dims=(DimSpec("event_id", 0, 2**20 - 1, 256),))
    w = World(spark, spec, str(tmp_path / "zv"), versioned=True)
    w.upsert(load_events(spark, SF).select(
        "event_id", "user_id", "event_type", "value", "ts"
    ))
    w.flush()
    r1 = w.zonemap_refresh(["ts"])
    assert r1["recomputed"] == r1["partitions"] > 0
    got = _rows(w.read_where(BOUNDS))
    lo, hi = BOUNDS["ts"]
    want = _rows(w.snapshot().filter(
        (F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi)
    ))
    assert got == want and got
    # a new commit bumps the owner version = the fingerprint
    w.upsert(load_events(spark, SF).filter(F.col("event_id") == 0).select(
        "event_id", "user_id", "event_type", "value", "ts"
    ))
    w.flush()
    r2 = w.zonemap_refresh(["ts"])
    assert r2["recomputed"] == 1


def test_read_before_any_refresh_is_correct(spark, world):
    """Refresh is maintenance, not a correctness dependency: a range
    read on a timestamp column with NO sidecar at all must type its
    literals from the live schema and return the right rows (review
    regression: kinds came from the sidecar, so an unrefreshed read
    compared TIMESTAMP against a raw BIGINT literal and crashed)."""
    got = _rows(world.read_where(BOUNDS))
    lo, hi = BOUNDS["ts"]
    want = _rows(world.snapshot().filter(
        (F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi)
    ))
    assert got == want and got


def test_read_where_with_delete_only_pending(spark, world):
    """A delete-only pending buffer carries only dim columns; the
    bounds predicate must treat it as unsatisfiable, not unresolvable
    (review regression: AnalysisException UNRESOLVED_COLUMN ts)."""
    world.zonemap_refresh(["ts"])
    before = _rows(world.read_where(BOUNDS))
    victim = sorted(before)[0][0]
    world.delete_ids([victim])  # NOT flushed: delete-only op log
    got = _rows(world.read_where(BOUNDS))
    assert got == before - {r for r in before if r[0] == victim}


def test_survivor_predicate_is_static_partition_filter(world):
    """1-dim worlds must prune via a literal isin on the partition
    column — static pruning visible in the scan, no runtime join."""
    import re

    world.zonemap_refresh(["ts"])
    plan = physical_plan(world.read_where(BOUNDS))
    assert re.search(r"PartitionFilters: \[[^\]]*c0", plan), plan
    # and the exact ts predicate pushes into the parquet scan
    assert re.search(r"PushedFilters: \[[^\]]*ts", plan), plan
