"""Streaming quality monitor (streaming/quality_monitor.py): a real
two-micro-batch stream produces one report per trigger; per-batch
verdicts equal the batch suite run on that batch's rows; replay
overwrites rather than duplicates; the alert view surfaces only the
failing batch."""

from __future__ import annotations

import glob

from pyspark.sql import Row
from pyspark.sql import functions as F

from dmds_spark.operators.quality import (
    completeness,
    constraint_report,
    in_range,
)
from dmds_spark.streaming.quality_monitor import (
    failing_batches,
    monitor_reports,
    quality_monitor_sink,
)

SCHEMA = "id long, v double"
CHECKS = [completeness("v"), in_range("v", 0.0, 10.0)]

GOOD = [Row(id=1, v=1.0), Row(id=2, v=9.5)]
BAD = [Row(id=3, v=None), Row(id=4, v=42.0)]  # fails both checks


def _stream_two_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(GOOD, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(BAD, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out = str(tmp_path / "reports")
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    sq = (
        sdf.writeStream.foreachBatch(quality_monitor_sink(CHECKS, out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)
    return out


def test_per_batch_reports_match_batch_suite(spark, tmp_path):
    out = _stream_two_batches(spark, tmp_path)
    assert len(glob.glob(f"{out}/qc-batch-*")) == 2
    rep = monitor_reports(spark, out)
    got = {
        (r["batch_id"], r["constraint"]): (r["ok_ppm"], r["passed"])
        for r in rep.collect()
    }
    # each batch's verdicts == the batch suite on exactly its rows
    for bid, rows in enumerate([GOOD, BAD]):
        want = {
            r["constraint"]: (r["ok_ppm"], r["passed"])
            for r in constraint_report(
                spark.createDataFrame(rows, SCHEMA), CHECKS
            ).collect()
        }
        for c, v in want.items():
            assert got[(bid, c)] == v
    assert all(p == 1 for (b, _), (_, p) in got.items() if b == 0)
    assert all(p == 0 for (b, _), (_, p) in got.items() if b == 1)


def test_replay_overwrites_same_batch_dir(spark, tmp_path):
    out = str(tmp_path / "reports")
    sink = quality_monitor_sink(CHECKS, out)
    df = spark.createDataFrame(GOOD, SCHEMA)
    sink(df, 7)
    sink(df, 7)  # at-least-once redelivery
    rep = monitor_reports(spark, out)
    assert rep.count() == len(CHECKS)  # one report, not two


def test_failing_batches_alert_view(spark, tmp_path):
    out = _stream_two_batches(spark, tmp_path)
    alerts = failing_batches(spark, out).collect()
    assert len(alerts) == 1
    a = alerts[0]
    assert a["batch_id"] == 1 and a["n_failing"] == 2
    assert "completeness(v)" in a["failing_constraints"]


def test_empty_trigger_writes_nothing(spark, tmp_path):
    out = str(tmp_path / "reports")
    sink = quality_monitor_sink(CHECKS, out)
    sink(spark.createDataFrame([], SCHEMA), 3)
    assert monitor_reports(spark, out).count() == 0
