"""Online Misra–Gries heavy hitters: the merge must keep the classic
sketch guarantees under batching (undercount bounded by total
decrements, decrements bounded by n/(k+1), no heavy hitter evicted),
and the real-stream summary must match folding the same batches by
hand against exact pandas counts."""

from __future__ import annotations

import pandas as pd

from dmds_spark.streaming.heavy_hitters import (
    _make_update,
    misra_gries_merge,
)

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


def _drive(batches, k=4, key="click"):
    up = _make_update(k)
    st = _FakeState()
    rows = []
    for b in batches:
        pdf = pd.DataFrame({"item": [str(x) for x in b]})
        for out in up((key,), iter([pdf]), st):
            rows.extend(out.to_dict("records"))
    return rows, st


def test_merge_counts_exact_when_under_capacity():
    counters, removed = misra_gries_merge({}, {"a": 3, "b": 1}, k=4)
    assert counters == {"a": 3, "b": 1} and removed == 0
    counters, removed = misra_gries_merge(counters, {"a": 2, "c": 5}, k=4)
    assert counters == {"a": 5, "b": 1, "c": 5} and removed == 0


def test_merge_restores_bound_by_min_subtraction():
    # 5 distinct items into k=4: one min-subtraction round
    counters, removed = misra_gries_merge(
        {}, {"a": 5, "b": 4, "c": 3, "d": 2, "e": 1}, k=4
    )
    assert removed == 1
    assert counters == {"a": 4, "b": 3, "c": 2, "d": 1}
    assert len(counters) <= 4


def test_guarantees_on_real_data():
    """Fold sf0.001 events per type (two arbitrary batch splits): for
    every type, est <= true <= est + decrements for tracked items,
    decrements <= n//(k+1), and every item with true count > n//(k+1)
    is tracked."""
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_type", "user_id"]]
    k = 8
    for etype, g in ev.groupby("event_type"):
        items = [str(u) for u in g["user_id"]]
        cut = len(items) // 3
        rows, st = _drive([items[:cut], items[cut:]], k=k, key=etype)
        tracked, counts, n_seen, decr = st.get
        est = dict(zip(tracked, counts))
        true = pd.Series(items).value_counts()
        assert n_seen == len(items)
        assert decr <= n_seen // (k + 1)
        for item, e in est.items():
            t = int(true[item])
            assert e <= t <= e + decr, (etype, item)
        thresh = n_seen // (k + 1)
        for item, t in true.items():
            if int(t) > thresh:
                assert item in est, (etype, item)


def test_emission_tags_n_seen_monotonically():
    rows, _ = _drive([["a", "a", "b"], ["a", "c"]], k=2)
    seen = sorted({r["n_seen"] for r in rows})
    assert seen == [3, 5]
    # freshest summary = rows at max n_seen; batch 2 overflows k=2
    # ({a:3,b:1,c:1} -> subtract min 1 -> {a:2}, decrements=1), so the
    # estimate undercounts by exactly the advertised bound
    final = [r for r in rows if r["n_seen"] == 5]
    assert [(r["item"], r["est_count"], r["decrements"]) for r in final] == [
        ("a", 2, 1)
    ]
    assert final[0]["est_count"] + final[0]["decrements"] >= 3  # true count


def test_streaming_heavy_hitters_real_stream(spark, tmp_path):
    """Two file-ordered micro-batches through a real stream: the rows
    at each key's max n_seen must equal the hand-fold of the same two
    batches (deterministic given maxFilesPerTrigger=1 and file mtimes).
    """
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.heavy_hitters import streaming_heavy_hitters

    e = load_events(spark, SF).select("event_type", "user_id", "ts")
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
    q = (
        streaming_heavy_hitters(sdf, k=8)
        .writeStream.format("memory")
        .queryName("stream_hh")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_pdf = spark.table("stream_hh").toPandas()
    got = {}
    for key, g in got_pdf.groupby("key"):
        final = g[g["n_seen"] == g["n_seen"].max()]
        got[key] = {
            (r["item"], r["est_count"]) for _, r in final.iterrows()
        }

    # hand-fold the same two batches (batch membership = file split)
    ep, lp = pd.read_parquet(early), pd.read_parquet(late)
    want = {}
    for key in got:
        b1 = [str(u) for u in ep[ep["event_type"] == key]["user_id"]]
        b2 = [str(u) for u in lp[lp["event_type"] == key]["user_id"]]
        _, st = _drive([b1, b2], k=8, key=key)
        items, counts, n_seen, _d = st.get
        want[key] = set(zip(items, (int(c) for c in counts)))
    assert got == want


def test_merge_guarantees_random_streams():
    """Property: for ANY stream and ANY batch split, the merged summary
    keeps every Misra-Gries guarantee — pure-Python fold, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        items=st.lists(
            st.integers(min_value=0, max_value=12), min_size=1, max_size=200
        ),
        k=st.integers(min_value=1, max_value=6),
        ncuts=st.integers(min_value=0, max_value=4),
        data=st.data(),
    )
    def run(items, k, ncuts, data):
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(items)),
                    min_size=ncuts,
                    max_size=ncuts,
                )
            )
        )
        batches, prev = [], 0
        for c in [*cuts, len(items)]:
            batches.append([str(x) for x in items[prev:c]])
            prev = c
        counters, decr = {}, 0
        for b in batches:
            vc: dict[str, int] = {}
            for x in b:
                vc[x] = vc.get(x, 0) + 1
            counters, removed = misra_gries_merge(counters, vc, k)
            decr += removed
        n = len(items)
        true: dict[str, int] = {}
        for x in items:
            s = str(x)
            true[s] = true.get(s, 0) + 1
        assert len(counters) <= k
        assert decr <= n // (k + 1)
        for item, est in counters.items():
            assert est <= true[item] <= est + decr
        for item, t in true.items():
            if t > n // (k + 1):
                assert item in counters

    run()
