"""Streaming CDC apply (streaming/cdc_apply.py): a real micro-batched
change stream through foreachBatch must land the same serving state as
the one-shot batch merge; deletes are tombstones (seq memory), so
stale upserts and at-least-once replay can never resurrect a deleted
key; purge reclaims tombstones without touching the serving view."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.operators.cdc import apply_changeset
from dmds_spark.streaming.cdc_apply import (
    apply_cdc_batch,
    cdc_apply_sink,
    current_state,
    purge_tombstones,
)
from dmds_spark.world import World

KW = dict(keys=["k"], seq=["ts", "sub"], op_col="op", payload=["val"])
SCHEMA = "k long, val string, ts long, sub long, op string"


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, val=v, ts=t, sub=s, op=o) for (k, v, t, s, o) in rows],
        SCHEMA,
    )


def _world(spark, tmp_path, name="w"):
    spec = WorldSpec(dims=(DimSpec("k", 0, 1023, 64),))
    return World(spark, spec, str(tmp_path / name))


def _state(world):
    return {(r["k"], r["val"]) for r in current_state(world).collect()}


def test_stream_matches_batch_merge(spark, tmp_path):
    """Two real micro-batches through the sink == one batch
    apply_changeset over the union."""
    all_rows = [
        (1, "a", 10, 0, "U"),
        (2, "b", 11, 0, "U"),
        (1, "a2", 20, 0, "U"),
        (2, "x", 21, 0, "D"),
        (3, "c", 22, 0, "U"),
    ]
    src = str(tmp_path / "src")
    _df(spark, all_rows[:2]).coalesce(1).write.parquet(src)
    _df(spark, all_rows[2:]).coalesce(1).write.mode("append").parquet(src)

    world = _world(spark, tmp_path)
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    sq = (
        sdf.writeStream.foreachBatch(cdc_apply_sink(world, **KW))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)

    empty = _df(spark, []).filter(F.lit(False))
    want = {
        (r["k"], r["val"])
        for r in apply_changeset(empty, _df(spark, all_rows), **KW).collect()
    }
    assert _state(world) == want == {(1, "a2"), (3, "c")}
    # the delete is retained as a tombstone, not physically removed
    tombs = world.snapshot().filter(F.col("op") == "D").collect()
    assert [(t["k"], t["val"]) for t in tombs] == [(2, None)]


def test_stale_upsert_is_skipped(spark, tmp_path):
    """A later-delivered batch carrying an OLDER seq for an applied key
    must not regress the stored value (out-of-order upsert safety)."""
    world = _world(spark, tmp_path)
    apply_cdc_batch(world, _df(spark, [(1, "new", 20, 0, "U")]), **KW)
    apply_cdc_batch(world, _df(spark, [(1, "old", 10, 0, "U"),
                                       (4, "d", 5, 0, "U")]), **KW)
    assert _state(world) == {(1, "new"), (4, "d")}


def test_tombstone_blocks_stale_resurrect(spark, tmp_path):
    """The case delete-as-removal gets wrong: key deleted in a LATER
    batch, then an OLDER upsert for it is redelivered — the tombstone's
    seq memory must keep it dead."""
    world = _world(spark, tmp_path)
    b1 = _df(spark, [(5, "v", 10, 0, "U")])
    b2 = _df(spark, [(5, "x", 20, 0, "D")])
    apply_cdc_batch(world, b1, **KW)
    apply_cdc_batch(world, b2, **KW)
    apply_cdc_batch(world, b1, **KW)  # redelivery of the older upsert
    assert _state(world) == set()


def test_replay_after_later_batches_is_noop(spark, tmp_path):
    world = _world(spark, tmp_path)
    b1 = _df(spark, [(1, "v1", 10, 0, "U"), (2, "g", 11, 0, "D")])
    b2 = _df(spark, [(2, "back", 20, 0, "U")])
    apply_cdc_batch(world, b1, **KW)
    apply_cdc_batch(world, b2, **KW)
    before = _state(world)
    apply_cdc_batch(world, b1, **KW)  # redelivery
    assert _state(world) == before == {(1, "v1"), (2, "back")}


def test_purge_reclaims_without_changing_serving_view(spark, tmp_path):
    world = _world(spark, tmp_path)
    apply_cdc_batch(
        world,
        _df(spark, [(1, "a", 10, 0, "U"), (2, "b", 11, 0, "U"),
                    (2, "x", 20, 0, "D"), (3, "y", 21, 0, "D")]),
        **KW,
    )
    before = _state(world)
    n = purge_tombstones(world, F.col("ts") <= F.lit(20))
    assert n == 1  # only the tombstone behind the horizon
    assert _state(world) == before == {(1, "a")}
    # physically gone from the store
    assert world.snapshot().filter(F.col("k") == 2).count() == 0
    # the one ahead of the horizon is retained
    assert world.snapshot().filter(F.col("k") == 3).count() == 1


def test_empty_trigger_is_noop(spark, tmp_path):
    world = _world(spark, tmp_path)
    apply_cdc_batch(world, _df(spark, [(1, "a", 10, 0, "U")]), **KW)
    writes_before = world.writes
    sink = cdc_apply_sink(world, **KW)
    sink(_df(spark, []), 99)
    assert world.writes == writes_before
    assert _state(world) == {(1, "a")}
