"""Streaming batch-equivalence tests (SURVEY.md §5 strategy (e)):
the same logical window over the same events must produce identical
results whether executed as a stream of micro-batches or one batch.

The stream source is the sf0.001 events table re-written as a multi-file
parquet directory read with maxFilesPerTrigger=1, so the stream really
processes several micro-batches, exercising state merge across triggers.
"""

import pytest
from pyspark.sql import functions as F

from dmds_spark.sources.registry import load_events
from dmds_spark.streaming import (
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    streaming_dedup,
    tumbling_window_agg,
    watermarked,
    world_upsert_sink,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events as a 4-file parquet dir (multi-micro-batch stream source)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_events(spark, SF).repartition(4).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def events_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_equivalence(spark, events_dir, events_stream):
    batch = tumbling_window_agg(spark.read.parquet(events_dir), "ts", "1 hour")
    stream = tumbling_window_agg(watermarked(events_stream, "ts", "1 hour"), "ts", "1 hour")
    got = run_stream_to_memory(stream, "tumbling_eq")
    assert canon(got, ["ws", "n", "total"]) == canon(batch, ["ws", "n", "total"])


def test_sliding_equivalence(spark, events_dir, events_stream):
    batch = sliding_window_agg(spark.read.parquet(events_dir), "ts", "1 hour", "30 minutes")
    stream = sliding_window_agg(
        watermarked(events_stream, "ts", "1 hour"), "ts", "1 hour", "30 minutes"
    )
    got = run_stream_to_memory(stream, "sliding_eq")
    assert canon(got, ["ws", "n", "total"]) == canon(batch, ["ws", "n", "total"])


def test_session_window_equivalence(spark, events_dir, events_stream):
    batch = session_window_agg(spark.read.parquet(events_dir), "ts", "10 minutes", "user_id")
    # the 4-file source is unordered in event time, so the watermark
    # must exceed the full disorder span for exact batch equivalence
    # (a production stream would be roughly time-ordered and use a
    # small delay — the late-data drop test below covers that policy)
    stream = session_window_agg(
        watermarked(events_stream, "ts", "45 days"), "ts", "10 minutes", "user_id"
    )
    got = run_stream_to_memory(stream, "session_eq")
    cols = ["user_id", "n_events", "session_start", "session_end"]
    assert canon(got, cols) == canon(batch, cols)


def test_streaming_dedup(spark, events_stream, events_dir):
    # duplicate-free by construction on event_id -> dedup is identity;
    # the semantic check is that state+watermark plumbing runs
    s = streaming_dedup(events_stream, ["event_id"], "ts", "45 days")
    q = (
        s.writeStream.format("memory")
        .queryName("dedup_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.table("dedup_eq").count()
    n_batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"]).count()
    assert n_stream == n_batch


def test_watermark_drops_late(spark, tmp_path):
    """The late-data policy itself: an event older than the watermark
    horizon is dropped; an in-horizon event aggregates normally. Two
    availableNow runs share one checkpoint, so the watermark persists
    across them (exactly a restart of a production stream)."""
    import datetime as dt

    from pyspark.sql import types as T

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("value", T.DoubleType())]
    )

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    out_dir = str(tmp_path / "out")

    def run():
        # file sink: the only built-in append sink that supports
        # checkpoint recovery (memory sink cannot restart)
        sdf = spark.readStream.schema(schema).parquet(src)
        agg = tumbling_window_agg(watermarked(sdf, "ts", "1 hour"), "ts", "10 minutes")
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [tuple(r) for r in spark.read.parquet(out_dir).collect()]

    t = lambda h, m: dt.datetime(2024, 6, 1, h, m)  # noqa: E731
    # run 1: events at 10:00, 10:05, and 12:00 -> watermark = 11:00
    write_batch([(t(10, 0), 1.0), (t(10, 5), 2.0), (t(12, 0), 3.0)])
    out1 = run()
    assert t(10, 0) in {r[0] for r in out1}  # closed window emitted

    # run 2: one LATE event (9:00, window end 9:10 < watermark 11:00),
    # one in-horizon event (11:30), and one advancing event (14:00 ->
    # watermark 13:00 > 11:40, so the 11:30 window closes and emits
    # in run 2's trailing no-data micro-batch)
    write_batch([(t(9, 0), 99.0), (t(11, 30), 4.0), (t(14, 0), 5.0)])
    out2 = run()
    emitted2 = {r[0]: (r[1], r[2]) for r in out2} .items() - {
        (r[0], (r[1], r[2])) for r in out1
    }
    emitted2 = dict(emitted2)
    assert t(9, 0) not in emitted2  # late event dropped
    assert emitted2.get(t(11, 30)) == (1, 4.0)  # in-horizon event kept


def test_world_upsert_sink(spark, events_dir, tmp_path):
    # the reference's flush daemon as foreachBatch: stream -> World,
    # flushed per micro-batch (write-behind persistence)
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.world import World

    spec = WorldSpec(
        dims=(DimSpec("event_id", 0, 2**20 - 1, 4096), DimSpec("user_id", 0, 2047, 64))
    )
    w = World(spark, spec, str(tmp_path / "stream_world"))
    schema = spark.read.parquet(events_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_dir)
        .select("event_id", "user_id", "event_type", "value")
    )
    q = world_upsert_sink(sdf, w, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert w.writes == 0  # everything flushed
    w2 = World(spark, spec, w.path)
    assert w2.snapshot().count() == spark.read.parquet(events_dir).count()


def test_stream_static_join(spark, events_dir, events_stream):
    from dmds_spark.streaming import stream_static_enrich

    ev = spark.read.parquet(events_dir)
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
    stream = stream_static_enrich(
        events_stream.select("event_id", "event_type"), dim, "event_type"
    )
    got = run_stream_to_memory(stream, "ss_join", output_mode="append")
    want = ev.select("event_id", "event_type").join(dim, "event_type")
    assert canon(got, ["event_id", "event_type", "type_total"]) == canon(
        want, ["event_id", "event_type", "type_total"]
    )


def test_streaming_dedup_window_keys_match_batch_query(spark, events_stream, events_dir):
    """Streaming dedup keyed on (user, type, 10-min window) must keep
    exactly the key set of the batch query stream_dedup_events. The
    SURVIVOR per key is arrival-order-dependent in a stream (first
    arrival wins) vs ts-order in batch, so the equivalence contract is
    the key set, not the surviving event_id."""
    from dmds_spark.queries.llm_extra import stream_dedup_events

    keyed = events_stream.withColumn(
        "ws_us", F.unix_micros(F.window("ts", "10 minutes").start)
    )
    s = streaming_dedup(keyed, ["user_id", "event_type", "ws_us"], "ts", "45 days")
    q = (
        s.writeStream.format("memory")
        .queryName("dedup_win_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = canon(spark.table("dedup_win_eq"), ["user_id", "event_type", "ws_us"])
    # batch query reads the canonical sf0.001 table; same logical rows
    want = canon(
        stream_dedup_events(spark, SF), ["user_id", "event_type", "ws_us"]
    )
    assert got == want
