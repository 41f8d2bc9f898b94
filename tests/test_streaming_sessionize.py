"""Streaming sessionization: closed sessions emitted online (gap
splits within batches, event-time timeout for idle flush) must agree
with the batch sessionize_10m window query for in-order arrival."""

import os
from datetime import datetime

import pandas as pd

from dmds_spark.streaming.sessionize import _make_update

SF = "/root/testdata/sf0.001"

GAP_MS = 600_000


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self.timeout_ts = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _t(m, s=0):
    return pd.Timestamp(datetime(2024, 1, 1, 0, m, s))


def _batch(ts_list):
    return pd.DataFrame({"user_id": [1] * len(ts_list), "ts": ts_list})


def test_gap_closes_session_within_batch():
    up = _make_update(GAP_MS)
    st = _FakeState()
    out = list(up((1,), iter([_batch([_t(0), _t(5), _t(30), _t(31)])]), st))
    closed = pd.concat(out, ignore_index=True)
    assert len(closed) == 1
    r = closed.iloc[0]
    assert r["session_start"] == _t(0)
    assert r["session_end"] == _t(5)
    assert r["n_events"] == 2
    # open session state: started at minute 30, 2 events
    assert st.get == (_t(30), _t(31), 2)
    # timeout armed at last_ts + gap
    assert st.timeout_ts == int(_t(31).timestamp() * 1000) + GAP_MS


def test_session_spans_batches_then_times_out():
    up = _make_update(GAP_MS)
    st = _FakeState()
    assert list(up((1,), iter([_batch([_t(0)])]), st)) == []
    # second batch continues the same session (gap exactly == 10 min is
    # NOT a split: the batch query splits on gap > 600s, strictly)
    assert list(up((1,), iter([_batch([_t(10)])]), st)) == []
    assert st.get == (_t(0), _t(10), 2)
    # watermark passes: Spark calls back with hasTimedOut
    st.hasTimedOut = True
    out = list(up((1,), iter([]), st))
    final = pd.concat(out, ignore_index=True).iloc[0]
    assert final["session_start"] == _t(0)
    assert final["session_end"] == _t(10)
    assert final["n_events"] == 2
    assert not st.exists  # state reaped


def test_streaming_closed_sessions_match_batch(spark, tmp_path):
    """Two time-ordered micro-batches through a real stream: every
    emitted closed session must appear in the batch sessionize result,
    and every batch session except each user's LAST (still open at
    end-of-stream — availableNow's final watermark never passes it)
    must have been emitted."""
    import glob
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.sessionize import streaming_sessionize

    e = (
        load_events(spark, SF)
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts", "event_id")
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
        .withWatermark("ts", "0 seconds")
    )
    q = (
        streaming_sessionize(sdf)
        .writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for _, r in spark.table("stream_sessions").toPandas().iterrows()
    }

    # batch reference, same lag/gap/running-sum shape as sessionize_10m
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        prev.isNull() | ((F.unix_micros("ts") - prev) > 600_000_000), 1
    ).otherwise(0)
    sess = e.withColumn(
        "sid",
        F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    ref = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "is_last",
            F.col("sid")
            == F.max("sid").over(W.partitionBy("user_id")),
        )
        .collect()
    )
    want_closed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ref
        if not r["is_last"]
    }
    all_batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ref
    }
    assert want_closed <= got  # everything closable was emitted
    assert got <= all_batch  # nothing invented


def test_native_session_window_matches_batch_sessionize(spark):
    """Cross-pin the sessionization forms on the same corpus: the
    batch lag+cumsum query (sessionize_10m) and Spark's built-in
    session_window aggregate must emit IDENTICAL sessions — including
    at the exact-gap boundary, where both merge (sessionize_10m splits
    only when gap > 10min, and session_window merges ADJACENT windows,
    verified by the constructed case below — [t0, t0+10m) and
    [t0+10m, ...) fuse into one session, so the inclusive-merge
    semantics agree everywhere, not just off-boundary)."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.windows import session_window_agg

    ev = load_events(spark, SF)
    batch = all_queries()["sessionize_10m"](spark, SF)
    native = session_window_agg(ev, "ts", "10 minutes", "user_id")

    def canon_native(df):
        return sorted(
            (r["user_id"], r["n_events"],
             int(r["session_start"].timestamp() * 1_000_000),
             int(r["session_end"].timestamp() * 1_000_000))
            for r in df.collect()
        )

    def canon_batch(df):
        return sorted(
            (r["user_id"], r["n_events"],
             r["session_start_us"], r["session_end_us"])
            for r in df.collect()
        )

    assert canon_native(native) == canon_batch(batch)

    # the exact-gap boundary, constructed: events at t0 and t0+exactly
    # 10 minutes -> ONE session under BOTH definitions (adjacent
    # session windows merge; the lag query splits only on gap > 10min)
    import datetime as dt

    from pyspark.sql import Window as W

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    two = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=10))], ["user_id", "ts"]
    )
    assert session_window_agg(two, "ts", "10 minutes", "user_id").count() == 1
    prev = F.lag(F.unix_micros(F.col("ts"))).over(
        W.partitionBy("user_id").orderBy("ts")
    )
    splits = two.select(
        F.when(
            prev.isNull()
            | ((F.unix_micros(F.col("ts")) - prev) > 600_000_000),
            1,
        ).otherwise(0).alias("new_session")
    )
    assert splits.agg(F.sum("new_session")).collect()[0][0] == 1  # one session
