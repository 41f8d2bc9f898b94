"""Stream-stream interval join attribution: the watermarked
purchase x touch join must emit exactly the candidate pairs the batch
attribution join produces, and the last-touch reduction over them must
equal the registered ``events_attribution_last_touch`` query."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from dmds_spark.sources.registry import load_events
from dmds_spark.streaming.attribution import (
    attribution_candidates,
    last_touch,
    split_touch_streams,
)

SF = "/root/testdata/sf0.001"


def _batch_candidates(spark, e):
    p, t = split_touch_streams(e)  # batch frames pass through unchanged
    return attribution_candidates(p, t)


def test_batch_equivalence_with_registered_query(spark):
    """Same builder on batch inputs + last_touch == the registered
    batch query (identical plan semantics, different composition)."""
    from dmds_spark.queries import all_queries

    e = load_events(spark, SF)
    got = {
        tuple(r)
        for r in last_touch(_batch_candidates(spark, e))
        .select("purchase_id", "touch_id", "touch_type", "gap_us")
        .collect()
    }
    ref = {
        tuple(r)
        for r in all_queries()["events_attribution_last_touch"](
            spark, SF
        ).collect()
    }
    assert got == ref
    assert len(got) > 0


def test_stream_candidates_match_batch(spark, tmp_path):
    """Real stream: two parquet files split at the median timestamp,
    one per micro-batch (availableNow). The stream-stream join's
    append output must equal the batch candidate set — including pairs
    that SPAN the file boundary (touch in batch 1, purchase in batch
    2), which is exactly the state the watermark bounds retain."""
    e = (
        load_events(spark, SF)
        .filter(F.col("user_id") < 60)
        .select("event_id", "ts", "user_id", "event_type")
    )
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    d = str(tmp_path / "stream")
    os.makedirs(d)
    early, late = f"{d}/part0.parquet", f"{d}/part1.parquet"
    e.filter(F.col("ts") <= mid).coalesce(1).write.parquet(f"{d}/__e")
    e.filter(F.col("ts") > mid).coalesce(1).write.parquet(f"{d}/__l")
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
    p, t = split_touch_streams(sdf)
    q = (
        attribution_candidates(p, t)
        .writeStream.format("memory")
        .queryName("attr_candidates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        tuple(r)
        for r in spark.table("attr_candidates")
        .select("purchase_id", "touch_id", "touch_type", "gap_us")
        .collect()
    }

    ref = {tuple(r) for r in _batch_candidates(spark, e).collect()}
    assert got == ref
    assert len(got) > 0
    # the state-retention property actually exercised: some pairs span
    # the file boundary (purchase after mid, touch at/before mid)
    batch_e = spark.read.parquet(early)
    early_touch_ids = {
        r["event_id"]
        for r in batch_e.filter(
            F.col("event_type").isin("click", "view")
        ).collect()
    }
    late_purchase_ids = {
        r["event_id"]
        for r in spark.read.parquet(late)
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    spanning = [
        (pid, tid)
        for (pid, tid, _, _) in got
        if pid in late_purchase_ids and tid in early_touch_ids
    ]
    assert spanning, "no cross-batch pairs: the split exercised nothing"


def test_foreachbatch_last_touch_pipeline(spark, tmp_path):
    """The documented consumption pattern: candidates stream into
    foreachBatch, each micro-batch reduces with last_touch() and
    appends to a parquet sink. Because a purchase's full candidate set
    arrives in ONE micro-batch (the join emits a pair only when the
    purchase row first matches, and every touch it can match is
    already buffered or co-arrives within the watermark), the
    per-batch reduction equals the global one — asserted against the
    registered batch query."""
    from pyspark.sql import functions as F2

    from dmds_spark.queries import all_queries

    e = (
        load_events(spark, SF)
        .filter(F.col("user_id") < 60)
        .select("event_id", "ts", "user_id", "event_type")
    )
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    d = str(tmp_path / "stream")
    os.makedirs(d)
    early, late = f"{d}/part0.parquet", f"{d}/part1.parquet"
    e.filter(F.col("ts") <= mid).coalesce(1).write.parquet(f"{d}/__e")
    e.filter(F.col("ts") > mid).coalesce(1).write.parquet(f"{d}/__l")
    shutil.move(glob.glob(f"{d}/__e/part-*.parquet")[0], early)
    shutil.move(glob.glob(f"{d}/__l/part-*.parquet")[0], late)
    shutil.rmtree(f"{d}/__e")
    shutil.rmtree(f"{d}/__l")
    now = 1_700_000_000
    os.utime(early, (now - 100, now - 100))
    os.utime(late, (now, now))

    sink = str(tmp_path / "attributed")
    schema = spark.read.parquet(early).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )
    p, t = split_touch_streams(sdf)
    cands = attribution_candidates(p, t)

    def emit(batch_df, batch_id):
        last_touch(batch_df).write.mode("append").parquet(sink)

    q = (
        cands.writeStream.foreachBatch(emit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        tuple(r)
        for r in spark.read.parquet(sink)
        .select("purchase_id", "touch_id", "touch_type", "gap_us")
        .collect()
    }
    ref = {
        tuple(r)
        for r in all_queries()["events_attribution_last_touch"](spark, SF)
        .join(
            e.filter(F2.col("event_type") == "purchase").select(
                F2.col("event_id").alias("purchase_id")
            ),
            "purchase_id",
            "left_semi",
        )
        .collect()
    }
    assert got == ref
    assert len(got) > 0


def test_state_eviction_loses_pairs_behind_the_frontier(spark, tmp_path):
    """What the watermark bounds actually guarantee — and cost. A
    purchase's buffered state is dropped once the watermark passes its
    event time, so a touch arriving in a LATER micro-batch with the
    frontier already far ahead cannot pair with it (the batch twin
    still finds the pair: the divergence is bounded state, not the
    join). Late rows that co-arrive in the SAME micro-batch still pair
    gracefully — Spark drops late input best-effort, never the
    within-batch join — which the first assertion documents."""
    from datetime import datetime

    rows1 = [  # frontier pushed to Jan 20 on BOTH inputs
        (100, datetime(2024, 1, 10, 12), 1, "purchase"),
        (110, datetime(2024, 1, 20, 12), 9, "purchase"),
        (111, datetime(2024, 1, 20, 12), 9, "click"),
    ]
    rows2 = [  # an intervening batch: eviction is applied at batch
        # boundaries, so the Jan-10 purchase's state drops HERE (the
        # Jan-20 watermark from batch 1 is in force), one batch after
        # the frontier passed it. A same-batch late pair still joins.
        (301, datetime(2024, 1, 14, 12), 3, "view"),
        (302, datetime(2024, 1, 15, 12), 3, "purchase"),
        (310, datetime(2024, 1, 21, 12), 9, "purchase"),
        (311, datetime(2024, 1, 21, 12), 9, "click"),
    ]
    rows3 = [  # user 1's touch arrives two batches behind its partner
        (201, datetime(2024, 1, 9, 12), 1, "view"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for i, rows in enumerate([rows1, rows2, rows3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{d}/__{i}"
        )
        shutil.move(
            glob.glob(f"{d}/__{i}/part-*.parquet")[0], f"{d}/part{i}.parquet"
        )
        shutil.rmtree(f"{d}/__{i}")
    now = 1_700_000_000
    os.utime(f"{d}/part0.parquet", (now - 200, now - 200))
    os.utime(f"{d}/part1.parquet", (now - 100, now - 100))
    os.utime(f"{d}/part2.parquet", (now, now))

    sdf = (
        spark.readStream.schema(
            spark.read.parquet(f"{d}/part0.parquet").schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )
    p, t = split_touch_streams(sdf)
    q = (
        attribution_candidates(p, t)
        .writeStream.format("memory")
        .queryName("attr_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["touch_id"])
        for r in spark.table("attr_late").collect()
    }
    assert (302, 301) in got      # same-batch late pair still joins
    assert (110, 111) in got      # frontier pair
    assert (100, 201) not in got  # partner state already evicted

    # the batch twin finds every pair — the divergence is bounded
    # state, not the join predicate
    e = spark.read.parquet(f"{d}/part*.parquet")
    pb, tb = split_touch_streams(e)
    batch = {
        (r["purchase_id"], r["touch_id"])
        for r in attribution_candidates(pb, tb).collect()
    }
    assert {(302, 301), (110, 111), (100, 201)} <= batch
