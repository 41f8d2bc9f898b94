"""Streaming daily anomaly detector: day counts must equal the batch
rollup, and the online flag for each closed day must equal the batch
integer z-test computed over the prefix of days seen so far (so the
final day's flag is the batch query's flag exactly)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from dmds_spark.streaming.anomaly import _make_update, integer_z_flag

SF = "/root/testdata/sf0.001"


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


def _t(d, h=0):
    return pd.Timestamp(datetime(2024, 1, d, h))


def _batch(ts_list):
    return pd.DataFrame({"event_type": ["click"] * len(ts_list), "ts": ts_list})


def _drive(batches, timeout_after_each=False):
    """Feed batches through the fold; return (emitted rows, state)."""
    up = _make_update(0)
    st = _FakeState()
    rows = []
    for b in batches:
        for out in up(("click",), iter([b]), st):
            rows.extend(out.to_dict("records"))
    return rows, st, up


def test_day_rollover_closes_and_flags_with_prefix_stats():
    # 3 events day1, 1 event day2, day3 opens -> day1, day2 closed
    rows, st, _ = _drive(
        [_batch([_t(1), _t(1, 5), _t(1, 9), _t(2, 1), _t(3, 2)])]
    )
    assert [(r["day"], r["n_events"]) for r in rows] == [(_t(1), 3), (_t(2), 1)]
    # day1 flag: n=1 -> never anomalous; day2 flag over prefix {3, 1}
    assert rows[0]["is_anomaly"] == integer_z_flag(1, 3, 3, 9)
    assert rows[1]["is_anomaly"] == integer_z_flag(2, 1, 4, 10)
    # open day3 carried in state with stats over the two closed days
    open_day, c, n, s, q = st.get
    assert (open_day, c, n, s, q) == (_t(3), 1, 2, 4, 10)


def test_timeout_flushes_open_day_and_keeps_stats():
    rows, st, up = _drive([_batch([_t(1), _t(2)])])
    assert len(rows) == 1  # day1 closed by rollover
    st.hasTimedOut = True
    out = list(up(("click",), iter([]), st))
    final = pd.concat(out, ignore_index=True).iloc[0]
    assert final["day"] == _t(2)
    assert final["n_events"] == 1
    # stats absorbed both days; no open day remains
    assert st.get == (None, 0, 2, 2, 2)


def test_late_event_older_than_open_day_dropped():
    rows, st, up = _drive([_batch([_t(2)])])
    out = list(up(("click",), iter([_batch([_t(1, 23)])]), st))
    assert out == [] and st.get[0] == _t(2) and st.get[1] == 1


def test_prefix_equivalence_vs_batch_ztest_sf0001():
    """Stream the real sf0.001 events per type in ts order: every
    emitted day count equals the batch daily rollup, and every flag
    equals the batch integer z-test over days 1..d."""
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "ts"]]
    ev["ts"] = pd.to_datetime(ev["ts"]).dt.tz_localize(None)
    for etype, g in ev.groupby("event_type"):
        g = g.sort_values("ts", kind="mergesort")
        up = _make_update(0)
        st = _FakeState()
        rows = []
        for out in up((etype,), iter([g]), st):
            rows.extend(out.to_dict("records"))
        st.hasTimedOut = True
        for out in up((etype,), iter([]), st):
            rows.extend(out.to_dict("records"))
        daily = (
            g["ts"].dt.normalize().value_counts().sort_index()
        )
        assert [r["day"] for r in rows] == list(daily.index)
        assert [r["n_events"] for r in rows] == [int(v) for v in daily]
        n = s = q = 0
        for r, c in zip(rows, (int(v) for v in daily)):
            n, s, q = n + 1, s + c, q + c * c
            assert r["is_anomaly"] == integer_z_flag(n, c, s, q), (etype, r)


def test_streaming_anomalies_match_batch_prefix(spark, tmp_path):
    """Two time-ordered micro-batches through a real stream with
    event-time timeout: emitted rows must be exactly the batch daily
    rollup minus each type's LAST day (still open when availableNow's
    final watermark stops at the max event ts), with prefix z-flags."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.anomaly import streaming_daily_anomalies

    e = load_events(spark, SF).select("event_type", "ts")
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
        streaming_daily_anomalies(sdf)
        .writeStream.format("memory")
        .queryName("stream_anomalies")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["day"], r["n_events"], r["is_anomaly"])
        for _, r in spark.table("stream_anomalies").toPandas().iterrows()
    }

    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "ts"]]
    ev["ts"] = pd.to_datetime(ev["ts"]).dt.tz_localize(None)
    want = set()
    for etype, g in ev.groupby("event_type"):
        daily = g["ts"].dt.normalize().value_counts().sort_index()
        n = s = q2 = 0
        for day, c in list(daily.items())[:-1]:  # last day stays open
            c = int(c)
            n, s, q2 = n + 1, s + c, q2 + c * c
            want.add((etype, day, c, integer_z_flag(n, c, s, q2)))
    assert got == want
