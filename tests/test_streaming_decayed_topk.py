"""Time-decayed top-k: the decayed count must be a pure function of
event timestamps and the reference instant (batch-split invariant up
to float rounding), pruning must be undercount-only with the forfeited
mass bounded by the emitted dropped_bound, and the half-life must mean
what it says. A real two-batch stream pins the applyInPandasWithState
wiring against the pure fold."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from dmds_spark.streaming.decayed_topk import _make_update, decayed_merge

HL = 1_000_000  # 1 s half-life in micros


def _true_decayed(events, ref, hl=HL):
    out: dict[str, float] = {}
    for item, ts in events:
        out[item] = out.get(item, 0.0) + 2.0 ** (-(ref - ts) / hl)
    return out


def test_halflife_hand_check():
    # one event exactly one half-life before a second one: the first
    # carries half weight at the later ref
    w, ref, dropped = decayed_merge(
        {}, 0, [("a", 0), ("b", HL)], HL, k=8, min_weight=0.0
    )
    assert ref == HL and dropped == 0.0
    assert w["b"] == pytest.approx(1.0)
    assert w["a"] == pytest.approx(0.5)


def test_batch_split_invariance():
    import random

    rnd = random.Random(3)
    events = [
        (str(rnd.randrange(6)), rnd.randrange(0, 10 * HL))
        for _ in range(400)
    ]
    events.sort(key=lambda e: e[1])
    ref = max(ts for _, ts in events)
    want = _true_decayed(events, ref)

    for cuts in ([], [100], [50, 200, 350]):
        w, r, dropped = {}, 0, 0.0
        prev = 0
        for c in [*cuts, len(events)]:
            w, r, d = decayed_merge(
                w, r, events[prev:c], HL, k=100, min_weight=0.0
            )
            dropped += d
            prev = c
        assert r == ref and dropped == 0.0
        assert set(w) == set(want)
        for item in want:
            assert w[item] == pytest.approx(want[item], rel=1e-9), cuts


def test_pruning_is_undercount_only_and_bounded():
    import random

    rnd = random.Random(9)
    events = [
        (str(rnd.randrange(20)), rnd.randrange(0, 4 * HL))
        for _ in range(600)
    ]
    events.sort(key=lambda e: e[1])
    ref = max(ts for _, ts in events)
    want = _true_decayed(events, ref)

    w, r, dropped = {}, 0, 0.0
    for i in range(0, 600, 50):
        w, r, d = decayed_merge(
            w, r, events[i:i + 50], HL, k=5, min_weight=1e-4
        )
        dropped += d
    assert len(w) <= 5
    tol = 1e-9
    for item, est in w.items():
        assert est <= want[item] + tol  # undercount only
    # total missing mass is bounded by the cumulative dropped weight
    # (which only DECAYS after dropping, so the cumulative is an upper
    # bound on what's missing now)
    missing = math.fsum(want.values()) - math.fsum(w.values())
    assert missing <= dropped + tol


def test_out_of_order_batch_does_not_move_ref_backwards():
    w, r, _ = decayed_merge({}, 0, [("a", 5 * HL)], HL, 8, 0.0)
    assert r == 5 * HL
    # a late batch whose events trail the ref folds at the current ref
    w, r2, _ = decayed_merge(w, r, [("b", 3 * HL)], HL, 8, 0.0)
    assert r2 == 5 * HL
    assert w["b"] == pytest.approx(0.25)  # two half-lives stale
    assert w["a"] == pytest.approx(1.0)


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


def test_update_fn_matches_pure_fold():
    up = _make_update(HL, 4, 0.0)
    st = _FakeState()
    batches = [
        [("a", 0), ("b", HL // 2)],
        [("a", HL), ("c", 2 * HL), ("a", 2 * HL)],
    ]
    for b in batches:
        pdf = pd.DataFrame(
            {"item": [i for i, _ in b], "ts_us": [t for _, t in b]}
        )
        list(up(("k",), iter([pdf]), st))
    items, ws, ref, dropped = st.get
    w, r = {}, 0
    for b in batches:
        w, r, _ = decayed_merge(w, r, b, HL, 4, 0.0)
    assert ref == r
    assert dict(zip(items, ws)) == pytest.approx(w)


def test_streaming_decayed_topk_real_stream(spark, tmp_path):
    """Two file-ordered micro-batches through a real stream: rows at
    each key's max ref_ts must equal the pure fold of the same two
    batches."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.decayed_topk import streaming_decayed_topk

    SF = "/root/testdata/sf0.001"
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
    hl_us = 86_400_000_000  # 1 day
    q = (
        streaming_decayed_topk(sdf, halflife="1 day", k=8)
        .writeStream.format("memory")
        .queryName("stream_dtk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got_pdf = spark.table("stream_dtk").toPandas()
    got = {}
    for key, g in got_pdf.groupby("key"):
        final = g[g["ref_ts"] == g["ref_ts"].max()]
        got[key] = {
            r["item"]: r["weight"] for _, r in final.iterrows()
        }

    ep, lp = pd.read_parquet(early), pd.read_parquet(late)
    for pdf in (ep, lp):
        pdf["ts_us"] = (pdf["ts"].astype("int64")) // 1000  # nanos->us
    assert set(got) == set(ep["event_type"]) | set(lp["event_type"])
    for key in got:
        w, r = {}, 0
        for pdf in (ep, lp):
            b = [
                (str(u), int(t))
                for u, t in zip(
                    pdf[pdf["event_type"] == key]["user_id"],
                    pdf[pdf["event_type"] == key]["ts_us"],
                )
            ]
            w, r, _ = decayed_merge(w, r, b, hl_us, 8, 1e-6)
        assert set(got[key]) == set(w), key
        for item in w:
            assert got[key][item] == pytest.approx(w[item], rel=1e-9)


def test_decayed_properties_random_streams():
    """Property sweep (multi-regime, per the sketch-guarantee testing
    discipline): for ANY event stream, ANY batch split, ANY (k,
    min_weight) regime — pruning is undercount-only per item, the
    missing mass is bounded by the cumulative dropped weight, the ref
    never moves backwards, and with no pruning the fold matches the
    closed form."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        events=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),      # item
                st.integers(min_value=0, max_value=8 * HL),  # ts
            ),
            min_size=1,
            max_size=120,
        ),
        k=st.integers(min_value=1, max_value=12),
        min_w=st.sampled_from([0.0, 1e-6, 1e-3, 0.05]),
        ncuts=st.integers(min_value=0, max_value=4),
        data=st.data(),
    )
    def run(events, k, min_w, ncuts, data):
        events = sorted(
            [(str(i), t) for i, t in events], key=lambda e: e[1]
        )
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(events)),
                    min_size=ncuts, max_size=ncuts,
                )
            )
        )
        ref = max(t for _, t in events)
        want = _true_decayed(events, ref)

        w, r, dropped = {}, 0, 0.0
        prev = 0
        for c in [*cuts, len(events)]:
            w, r2, d = decayed_merge(w, r, events[prev:c], HL, k, min_w)
            assert r2 >= r  # ref monotone
            r, dropped, prev = r2, dropped + d, c
        assert r == ref
        assert len(w) <= k
        tol = 1e-9
        for item, est in w.items():
            assert est <= want[item] + tol          # undercount only
        missing = math.fsum(want.values()) - math.fsum(w.values())
        assert missing <= dropped + tol             # bound holds
        if k >= 10 and min_w == 0.0:
            # no pruning possible in this regime: exact (to rounding)
            for item in want:
                assert w[item] == __import__("pytest").approx(
                    want[item], rel=1e-9
                )

    run()
