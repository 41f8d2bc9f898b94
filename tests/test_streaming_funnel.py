"""Streaming funnel: per-user state advances across micro-batches and,
for in-ts-order arrival, converges to the batch fold's answer."""

import os
from datetime import datetime

import pandas as pd

from dmds_spark.streaming.funnel import _make_update, streaming_funnel

SF = "/root/testdata/sf0.001"


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the update fn."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def _batch(rows):
    return pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])


def test_update_fn_advances_across_batches():
    up = _make_update(["a", "b", "c"])
    st = _FakeState()
    out1 = list(up((1,), iter([_batch([(1, "a", _t(0))])]), st))
    assert out1[0].iloc[0]["step_reached"] == 1
    # batch 2: b at the SAME time as a must not advance (strict), then
    # c before b's time must not advance either
    out2 = list(up((1,), iter([_batch([(1, "b", _t(0))])]), st))
    assert out2[0].iloc[0]["step_reached"] == 1
    out3 = list(up((1,), iter([_batch([(1, "b", _t(1)), (1, "c", _t(2))])]), st))
    assert out3[0].iloc[0]["step_reached"] == 3
    # completed funnels stay completed
    out4 = list(up((1,), iter([_batch([(1, "a", _t(9))])]), st))
    assert out4[0].iloc[0]["step_reached"] == 3


def test_update_fn_sorts_within_batch():
    up = _make_update(["a", "b"])
    st = _FakeState()
    # arrival order b-then-a within one batch, but ts order a-then-b:
    # the within-batch sort must still advance both steps
    out = list(up((1,), iter([_batch([(1, "b", _t(5)), (1, "a", _t(1))])]), st))
    assert out[0].iloc[0]["step_reached"] == 2


def test_streaming_matches_batch_fold_in_order(spark, tmp_path):
    """Events split into two time-ordered micro-batches (file mtimes
    force the order): the final per-user step must equal the batch
    sequential_funnel over the union."""
    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events

    steps = ["view", "click", "purchase"]
    e = load_events(spark, SF).select("user_id", "event_type", "ts")
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    d = str(tmp_path / "stream")
    os.makedirs(d)
    early, late = f"{d}/part0.parquet", f"{d}/part1.parquet"
    e.filter(F.col("ts") <= mid).coalesce(1).write.parquet(f"{d}/__e")
    e.filter(F.col("ts") > mid).coalesce(1).write.parquet(f"{d}/__l")
    import glob
    import shutil

    shutil.move(glob.glob(f"{d}/__e/part-*.parquet")[0], early)
    shutil.move(glob.glob(f"{d}/__l/part-*.parquet")[0], late)
    shutil.rmtree(f"{d}/__e")
    shutil.rmtree(f"{d}/__l")
    now = 1_700_000_000
    os.utime(early, (now - 100, now - 100))
    os.utime(late, (now, now))

    schema = spark.read.parquet(early).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )
    q = (
        streaming_funnel(sdf, steps)
        .writeStream.format("memory")
        .queryName("stream_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("stream_funnel").toPandas()
    final = (
        emitted.sort_values("step_reached")
        .groupby("user_id")["step_reached"]
        .last()
    )

    # batch reference: how many steps each user completed
    batch_steps = {}
    prev = None
    for i, step in enumerate(steps, start=1):
        pred = F.col("event_type") == step
        if prev is None:
            s = e.filter(pred)
        else:
            s = e.join(prev, "user_id").filter(pred & (F.col("ts") > F.col("__t")))
        prev = s.groupBy("user_id").agg(F.min("ts").alias("__t"))
        for r in prev.select("user_id").collect():
            batch_steps[r["user_id"]] = i

    for user, step in batch_steps.items():
        assert final.get(user, 0) == step, f"user {user}"
    # users that never reached step 1 must not report progress
    for user, step in final.items():
        if step > 0:
            assert batch_steps.get(user) == step
