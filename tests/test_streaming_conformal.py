"""Online conformal coverage (streaming/conformal_monitor.py): unit
fold semantics plus the real-stream equivalence — final per-type
emissions must equal the batch eval_conformal_coverage rows on the
same slice, in a genuinely multi-micro-batch arrangement."""

from __future__ import annotations

import pandas as pd
import pytest

from dmds_spark.streaming.conformal_monitor import _make_update

SF = "/root/testdata/sf0.001"


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_fold_counts_and_accumulates():
    st = _FakeState()
    upd = _make_update(50)
    out1 = pd.concat(
        upd(("view",), iter([pd.DataFrame({"s": [0, 50, 51]})]), st),
        ignore_index=True,
    ).iloc[0]
    assert (out1["n_test"], out1["n_covered"]) == (3, 2)
    assert out1["coverage_ppm"] == 2 * 1_000_000 // 3
    out2 = pd.concat(
        upd(("view",), iter([pd.DataFrame({"s": [100]})]), st),
        ignore_index=True,
    ).iloc[0]
    assert (out2["n_test"], out2["n_covered"]) == (4, 2)
    assert out2["emit_seq"] == 2 and out2["q_hat_cents"] == 50


@pytest.mark.slow
def test_stream_matches_batch_query(spark, tmp_path):
    """Post-cutoff events arrive in two micro-batches; each type's
    LAST emission must equal the batch eval_conformal_coverage row —
    n_test, n_covered, coverage_ppm, q_hat."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.queries.round13 import CUTOFF
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.conformal_monitor import (
        streaming_conformal_coverage,
    )

    batch = {
        r["event_type"]: r
        for r in all_queries()["eval_conformal_coverage"](
            spark, SF
        ).collect()
    }
    q_hat = next(iter(batch.values()))["q_hat_cents"]
    ev = load_events(spark, SF)
    cal = ev.filter(F.col("ts") < F.lit(CUTOFF).cast("timestamp")).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    pred = cal.groupBy("event_type").agg(
        F.expr("SUM(cents) div COUNT(*)").cast("bigint").alias("pred_c")
    )
    held = ev.filter(
        F.col("ts") >= F.lit(CUTOFF).cast("timestamp")
    ).select("event_type", "value", "event_id")
    src = str(tmp_path / "src")
    held.filter(F.col("event_id") % 2 == 0).drop("event_id") \
        .coalesce(1).write.parquet(src)
    held.filter(F.col("event_id") % 2 == 1).drop("event_id") \
        .coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_conformal_coverage(stream, pred, int(q_hat))
        .writeStream.format("memory")
        .queryName("conformal_live")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("conformal_live").collect()
    assert max(r["emit_seq"] for r in rows) >= 2
    last = {}
    for r in rows:
        if (r["event_type"] not in last
                or r["emit_seq"] > last[r["event_type"]]["emit_seq"]):
            last[r["event_type"]] = r
    assert set(last) == set(batch)
    for t, b in batch.items():
        g = last[t]
        assert g["n_test"] == b["n_test"], t
        assert g["n_covered"] == b["n_covered"], t
        assert g["coverage_ppm"] == b["coverage_ppm"], t
        assert g["q_hat_cents"] == b["q_hat_cents"], t
