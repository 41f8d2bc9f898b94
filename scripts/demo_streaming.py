#!/usr/bin/env python
"""Runnable tour of the streaming family over a REAL micro-batched
stream: the driver events table split into two parquet files fed one
per trigger (`maxFilesPerTrigger=1`, availableNow), through every
online operator — windows, dedup, sessionization, anomaly flags,
heavy hitters, GK quantiles, and the stream-stream attribution join
with a foreachBatch last-touch reduction. Prints one line per stage.

Usage: python scripts/demo_streaming.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def _file_stream(spark, e, d):
    """Split events at the median ts into two files, mtime-ordered so
    the stream replays them as two micro-batches."""
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
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
    return (
        spark.readStream.schema(spark.read.parquet(f"{d}/part0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )


def _run(df, name, ckpt, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from dmds_spark.session import get_spark
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.anomaly import streaming_daily_anomalies
    from dmds_spark.streaming.attribution import (
        attribution_candidates,
        last_touch,
        split_touch_streams,
    )
    from dmds_spark.streaming.heavy_hitters import streaming_heavy_hitters
    from dmds_spark.streaming.quantiles import streaming_quantiles
    from dmds_spark.streaming.sessionize import streaming_sessionize
    from dmds_spark.streaming.windows import (
        streaming_dedup,
        tumbling_window_agg,
    )

    spark = get_spark(app_name="demo_streaming")
    e = load_events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    with tempfile.TemporaryDirectory() as root:
        def stream():
            # a fresh stream per stage (each consumes the same 2 files)
            stream.n += 1
            return _file_stream(spark, e, f"{root}/s{stream.n}")
        stream.n = 0

        sdf = stream()
        _run(
            tumbling_window_agg(
                sdf.withWatermark("ts", "1 hour"), "ts", "1 hour"
            ),
            "demo_windows", f"{root}/c1",
        )
        nwin = spark.table("demo_windows").count()
        print(f"1. windows: {nwin} closed hourly windows (watermark 1h)")

        _run(
            streaming_dedup(stream(), ["event_id"], "ts", "10 minutes"),
            "demo_dedup", f"{root}/c2",
        )
        print(f"2. dedup: {spark.table('demo_dedup').count()} unique events "
              "(watermark-bounded seen-set)")

        _run(
            streaming_sessionize(
                stream().select("user_id", "ts").withWatermark("ts", "0 seconds")
            ),
            "demo_sessions", f"{root}/c3",
        )
        print(f"3. sessions: {spark.table('demo_sessions').count()} CLOSED "
              "sessions emitted online (10-min gap, event-time timeout)")

        _run(
            streaming_daily_anomalies(
                stream().withWatermark("ts", "1 hour")
            ),
            "demo_anomaly", f"{root}/c4",
        )
        flags = spark.table("demo_anomaly")
        print(f"4. anomaly: {flags.count()} closed-day rows, "
              f"{flags.filter('is_anomaly = 1').count()} flagged (integer z-test)")

        _run(
            streaming_heavy_hitters(stream(), k=8),
            "demo_hh", f"{root}/c5",
        )
        hh = spark.table("demo_hh")
        fresh = hh.orderBy(F.col("n_seen").desc()).limit(1).collect()[0]
        print(f"5. heavy hitters: k=8 Misra-Gries per type; freshest summary "
              f"at n_seen={fresh['n_seen']} carries its own error bound")

        _run(
            streaming_quantiles(stream(), eps=0.05, phis=(0.5, 0.9)),
            "demo_gk", f"{root}/c6",
        )
        gk = spark.table("demo_gk")
        p50 = (
            gk.filter("phi = 0.5")
            .orderBy(F.col("n_seen").desc())
            .limit(1)
            .collect()[0]
        )
        print(f"6. quantiles: GK p50({p50['key']})={p50['value']:.1f} over "
              f"n={p50['n_seen']} with |rank err| <= {0.05 * p50['n_seen'] + 0.5:.1f}")

        p, t = split_touch_streams(stream())
        sink = f"{root}/attributed"

        def emit(batch_df, batch_id):
            last_touch(batch_df).write.mode("append").parquet(sink)

        q = (
            attribution_candidates(p, t)
            .writeStream.foreachBatch(emit)
            .option("checkpointLocation", f"{root}/c7")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        n_attr = spark.read.parquet(sink).count()
        print(f"7. attribution: stream-stream interval join -> foreachBatch "
              f"last-touch -> {n_attr} purchases credited")

        # 8. incremental corpus-vs-history dedup: a documents stream
        # maintained as a MinHash near-dup index, one O(new-batch)
        # increment per micro-batch, replay-safe by batch id
        from dmds_spark.operators.incremental_dedup import (
            IncrementalMinHashDedup,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        dsrc = f"{root}/docs_src"
        docs.repartition(2).write.parquet(dsrc)
        store = IncrementalMinHashDedup(
            spark, None, f"{root}/minhash_store", "text", "doc_id"
        )
        dstream = (
            spark.readStream.schema(
                spark.read.parquet(dsrc).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{dsrc}/part-*.parquet")
        )
        q = (
            dstream.writeStream.foreachBatch(store.foreach_batch())
            .option("checkpointLocation", f"{root}/c8")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        n_pairs = store.pairs().count()
        n_sigs = store.signatures().count()
        print(f"8. incremental dedup: {n_sigs} docs signatured across "
              f"micro-batches, {n_pairs} near-dup pairs accumulated "
              f"(== full-corpus recompute, pinned in tests)")

        from dmds_spark.streaming.decayed_topk import streaming_decayed_topk

        _run(
            streaming_decayed_topk(stream(), halflife="7 days", k=5),
            "demo_dtk", f"{root}/c9",
        )
        dtk = spark.table("demo_dtk")
        hot = (
            dtk.orderBy(F.col("ref_ts").desc(), F.col("weight").desc())
            .limit(1)
            .collect()[0]
        )
        print(f"9. decayed top-k: hottest {hot['key']} item now = user "
              f"{hot['item']} (decayed weight {hot['weight']:.2f}, "
              f"pruning error <= {hot['dropped_bound']:.2f})")

    # -- 10. ingest-time decontamination (stateless broadcast probe) --
    from dmds_spark.operators.dedup import word_kgram_rows
    from dmds_spark.streaming.decontaminate import contamination_probe

    with tempfile.TemporaryDirectory() as d10:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.repartition(2).write.parquet(f"{d10}/docs")
        ev_grams = [
            r["sh"]
            for r in word_kgram_rows(docs, "text", "doc_id", 8, col="sh")
            .filter(F.pmod(F.expr("doc_id DIV 8"), F.lit(50)) == 0)
            .select("sh")
            .distinct()
            .collect()
        ]
        dstream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d10}/docs")
        )
        flags = contamination_probe(dstream, ev_grams, k=8)
        _run(flags, "contam_demo", f"{d10}/ckpt")
        n = spark.table("contam_demo").count()
        print(f"10. ingest decontamination: {n} contaminated docs flagged "
              f"in-stream against {len(ev_grams)} benchmark 8-grams")

    # -- 11. streaming ANN serving over the maintained IVF index --
    from dmds_spark.operators.incremental_ivf import IncrementalIVFIndex
    from dmds_spark.streaming.ann_serve import ann_probe_sink, probe_results

    with tempfile.TemporaryDirectory() as d11:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        idx = IncrementalIVFIndex(
            spark, None, f"{d11}/store", "vec_id", "embedding"
        )
        anchors = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        idx.set_centroids([list(r["embedding"]) for r in anchors])
        idx.fold_batch(emb, 0)
        q = emb.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        q.coalesce(1).write.parquet(f"{d11}/queries")
        q.coalesce(1).write.mode("append").parquet(f"{d11}/queries")
        qstream = (
            spark.readStream.schema(spark.read.parquet(f"{d11}/queries").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d11}/queries/part-*.parquet")
        )
        sq = (
            qstream.writeStream.foreachBatch(
                ann_probe_sink(idx, f"{d11}/answers", topk=5, nprobe=2)
            )
            .option("checkpointLocation", f"{d11}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)
        n = probe_results(spark, f"{d11}/answers").count()
        print(f"11. streaming ANN serving: {n} top-k answers landed across "
              f"micro-batches from the maintained IVF store "
              f"(stream == batch probe, pinned in tests)")

    # -- 12. streaming CDC ingest into a World (tombstoned deletes) --
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.streaming.cdc_apply import (
        cdc_apply_sink,
        current_state,
        purge_tombstones,
    )
    from dmds_spark.world import World

    with tempfile.TemporaryDirectory() as d12:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ch = ev.select(
            "user_id", "event_type", "value", "ts", "event_id"
        ).withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        cstream = _file_stream(spark, ch, f"{d12}/src")
        world = World(
            spark,
            WorldSpec(dims=(DimSpec("user_id", 0, 2**20 - 1, 64),)),
            f"{d12}/world",
        )
        sq = (
            cstream.writeStream.foreachBatch(
                cdc_apply_sink(
                    world,
                    keys=["user_id"],
                    seq=["ts", "event_id"],
                    payload=["event_type", "value"],
                )
            )
            .option("checkpointLocation", f"{d12}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)
        live = current_state(world).count()
        # the stream is drained, so the whole month is behind the
        # redelivery horizon — every tombstone is reclaimable
        purged = purge_tombstones(
            world, F.col("ts") < F.lit("2024-02-01").cast("timestamp")
        )
        print(f"12. streaming CDC ingest: {live} live keys after two "
              f"micro-batches of tombstoned seq-aware merges; "
              f"{purged} tombstones purged behind the redelivery horizon "
              f"(serving view unchanged)")
        world.close()

    # -- 13. streaming quality monitor (per-batch constraint suite) --
    from dmds_spark.operators.quality import completeness, in_range
    from dmds_spark.streaming.quality_monitor import (
        failing_batches,
        monitor_reports,
        quality_monitor_sink,
    )

    with tempfile.TemporaryDirectory() as d13:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        estream = _file_stream(spark, ev, f"{d13}/src")
        checks = [completeness("user_id"), in_range("value", 0.0, 50.0)]
        sq = (
            estream.writeStream.foreachBatch(
                quality_monitor_sink(checks, f"{d13}/reports")
            )
            .option("checkpointLocation", f"{d13}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)
        rep = monitor_reports(spark, f"{d13}/reports")
        alerts = failing_batches(spark, f"{d13}/reports").count()
        print(f"13. quality monitor: {rep.count()} constraint verdicts "
              f"across micro-batches (one agg pass per trigger); "
              f"{alerts} batches raised alerts")

    print("demo: all streaming stages ran")
    return 0


if __name__ == "__main__":
    sys.exit(main())
