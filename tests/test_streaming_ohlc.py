"""Streaming OHLC bars: the fold must be associative/commutative over
any batch split, and a real micro-batched stream must equal the batch
query (events_ohlc_downsample) bar for bar."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from dmds_spark.streaming.ohlc import ohlc_merge

SF = "/root/testdata/sf0.001"


def _pdf(rows):
    return pd.DataFrame(
        {"ok": [r[0] for r in rows], "value": [r[1] for r in rows]}
    )


_ROWS = [
    ("00003", 5.0),
    ("00001", 2.0),
    ("00009", 7.0),
    ("00004", -1.0),
    ("00002", 2.0),
]


def _fold(split_points):
    state = None
    prev = 0
    for p in list(split_points) + [len(_ROWS)]:
        batch = _ROWS[prev:p]
        prev = p
        if batch:
            state = ohlc_merge(state, _pdf(batch))
    return state


def test_merge_split_invariance():
    """Every way of cutting the row sequence into batches yields the
    identical bar — the associativity the no-watermark claim rests
    on."""
    whole = _fold([])
    assert whole[1] == 2.0 and whole[3] == 7.0  # open at key 00001, close 00009
    assert whole[4] == 7.0 and whole[5] == -1.0 and whole[6] == 5
    for k in (1, 2):
        for cuts in itertools.combinations(range(1, len(_ROWS)), k):
            assert _fold(cuts) == whole, cuts


def test_merge_order_invariance():
    """Permuting whole batches (late arrival) folds to the same bar."""
    a, b = _pdf(_ROWS[:2]), _pdf(_ROWS[2:])
    assert ohlc_merge(ohlc_merge(None, a), b) == ohlc_merge(
        ohlc_merge(None, b), a
    )


def test_open_close_tie_break_total_order():
    """Equal timestamps differ in the event_id suffix of the order
    key, so open/close stay deterministic."""
    rows = [("00001000a", 1.0), ("00001000b", 9.0)]
    s = ohlc_merge(None, _pdf(rows))
    assert s[1] == 1.0 and s[3] == 9.0


def test_resume_from_old_key_format_fails_fast():
    """A state resumed from a pre-r11 checkpoint (32-char lpad order
    keys) must raise, not silently mis-order against 40-char
    sortable_int64 keys."""
    from dmds_spark.streaming.ohlc import OHLC_KEY_WIDTH, _update

    class _FakeState:
        hasTimedOut = False
        exists = True
        # old-format state: two 32-char keys
        get = ("0" * 32, 1.0, "9" * 32, 2.0, 2.0, 1.0, 3)

        def update(self, v):  # pragma: no cover - must not be reached
            raise AssertionError("state.update on corrupt resume")

    new_key = "0" * OHLC_KEY_WIDTH
    batch = _pdf([(new_key, 5.0)])
    with pytest.raises(ValueError, match="checkpoint"):
        list(_update(("click", "2024-01-01 00:00:00"),
                     iter([batch]), _FakeState()))


@pytest.mark.slow
def test_real_stream_matches_batch_query(spark, tmp_path):
    """Two-micro-batch file stream == the batch OHLC query, bar for
    bar (freshest emission per bar)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.sources.registry import load_events
    from dmds_spark.streaming.ohlc import streaming_ohlc

    e = load_events(spark, SF).select(
        "event_id", "ts", "event_type", "value"
    )
    mid = e.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    d = str(tmp_path / "stream")
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

    sdf = (
        spark.readStream.schema(spark.read.parquet(f"{d}/part0.parquet").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/part*.parquet")
    )
    q = (
        streaming_ohlc(sdf)
        .writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("ohlc_stream").collect()
    assert rows
    latest = {}
    for r in rows:
        k = (r["event_type"], r["bar_hour"])
        if k not in latest or r["n_events"] > latest[k]["n_events"]:
            latest[k] = r

    batch = {
        (r["event_type"], r["bar_hour"]): r
        for r in all_queries()["events_ohlc_downsample"](spark, SF).collect()
    }
    assert set(latest) == set(batch)
    for k, r in latest.items():
        b = batch[k]
        assert (
            r["open_v"], r["high_v"], r["low_v"], r["close_v"], r["n_events"]
        ) == (
            b["open_v"], b["high_v"], b["low_v"], b["close_v"], b["n_events"]
        ), k


def test_ohlc_merge_hypothesis_split_invariance():
    """Property: for random (key, value) batches and random cut
    points, every grouping of the sequence folds to the same bar."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="0123456789", min_size=3, max_size=6),
                st.floats(allow_nan=False, allow_infinity=False,
                          width=32),
            ),
            min_size=1,
            max_size=24,
        ),
        st.integers(min_value=0, max_value=24),
    )
    def prop(rows, cut):
        # unique keys: duplicate order keys make argmin/argmax depend
        # on batch boundaries (pandas idxmin takes the first), which
        # the operator avoids by construction (ok embeds event_id)
        seen, uniq = set(), []
        for i, (k, v) in enumerate(rows):
            kk = f"{k}:{i:02d}"
            if kk not in seen:
                seen.add(kk)
                uniq.append((kk, v))
        cut = min(cut, len(uniq))
        a, b = uniq[:cut], uniq[cut:]
        whole = ohlc_merge(None, _pdf(uniq))
        state = None
        for batch in (a, b):
            if batch:
                state = ohlc_merge(state, _pdf(batch))
        assert state == whole

    prop()


def test_total_order_key_negative_and_wide_values(spark):
    """The min_by/max_by key must order correctly for negative
    timestamps/ids and ids wider than 12 digits (the old lpad key
    truncated >=10^12 ids and mis-sorted negatives)."""
    from dmds_spark.functions.keys import sortable_int64
    from pyspark.sql import functions as F

    vals = [-(2**62), -1000000000000001, -1, 0, 1, 999999999999,
            10**13, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = (
        df.select("x", sortable_int64(F.col("x")).alias("k"))
        .orderBy("k")
        .collect()
    )
    assert [r.x for r in rows] == sorted(vals)
    assert all(len(r.k) == 20 for r in rows)


def test_sortable_int64_random_bulk(spark):
    """Seeded-random bulk pin across the whole i64 range: lexicographic
    order of the key must equal numeric order (300 draws incl. the
    domain extremes)."""
    import random

    from pyspark.sql import functions as F

    from dmds_spark.functions.keys import sortable_int64

    rng = random.Random(42)
    vals = list({rng.randint(-(2**63), 2**63 - 1) for _ in range(300)})
    vals += [-(2**63), 2**63 - 1, 0, -1, 1]
    df = spark.createDataFrame([(v,) for v in set(vals)], "x long")
    rows = (
        df.select("x", sortable_int64(F.col("x")).alias("k"))
        .orderBy("k")
        .collect()
    )
    assert [r.x for r in rows] == sorted({*vals})
