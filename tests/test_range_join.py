"""bucketized_range_join (scale path) must produce exactly the naive
range_join's rows, and its plan must be a hash equi-join on the bucket
— not a nested loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.relational import bucketized_range_join, range_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(i, float(i * 3 % 500)) for i in range(1000)], ["pid", "v"]
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 40), float(j * 40 + 55)) for j in range(12)],
        ["iid", "lo", "hi"],
    )
    return pts, ivs


def test_bucketized_matches_naive(spark):
    pts, ivs = _frames(spark)
    naive = range_join(pts, ivs, F.col("v"), F.col("lo"), F.col("hi"))
    fast = bucketized_range_join(pts, ivs, "v", "lo", "hi", bucket_width=64)
    key = lambda df: sorted(
        (r["pid"], r["iid"]) for r in df.select("pid", "iid").collect()
    )
    assert key(fast) == key(naive)
    assert len(key(fast)) > 0


def test_bucketized_is_hash_join(spark):
    pts, ivs = _frames(spark)
    fast = bucketized_range_join(pts, ivs, "v", "lo", "hi", bucket_width=64)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "__bucket" in plan


def test_bucketized_by_keys_matches_naive(spark):
    """With ``by`` equi-keys the result must equal the naive per-key
    range join — across bucket boundaries, touching endpoints, and
    keys with no intervals."""
    pts = spark.createDataFrame(
        [(i, i % 7, float(i * 3 % 500)) for i in range(1000)],
        ["pid", "k", "v"],
    )
    ivs = spark.createDataFrame(
        [(j, j % 5, float(j * 40), float(j * 40 + 55)) for j in range(12)],
        ["iid", "k", "lo", "hi"],
    )
    naive = (
        pts.join(ivs.withColumnRenamed("k", "k2"),
                 (F.col("k") == F.col("k2"))
                 & (F.col("v") >= F.col("lo"))
                 & (F.col("v") <= F.col("hi")))
        .select("pid", "iid")
    )
    fast = bucketized_range_join(
        pts, ivs, "v", "lo", "hi", bucket_width=64, by=["k"]
    ).select("pid", "iid")
    key = lambda df: sorted((r["pid"], r["iid"]) for r in df.collect())
    assert key(fast) == key(naive)
    assert len(key(fast)) > 0


def _interval_frames(spark):
    import random

    rnd = random.Random(7)
    a = spark.createDataFrame(
        [(i, lo := rnd.randrange(0, 900), lo + rnd.randrange(0, 60))
         for i in range(300)],
        ["aid", "alo", "ahi"],
    )
    b = spark.createDataFrame(
        [(j, lo := rnd.randrange(0, 900), lo + rnd.randrange(0, 60))
         for j in range(200)],
        ["bid", "blo", "bhi"],
    )
    return a, b


def test_interval_overlap_matches_naive(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    naive = a.join(
        b,
        (F.col("alo") <= F.col("bhi")) & (F.col("blo") <= F.col("ahi")),
    )
    fast = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32)
    key = lambda df: sorted(
        (r["aid"], r["bid"]) for r in df.select("aid", "bid").collect()
    )
    nk, fk = key(naive), key(fast)
    assert nk == fk
    assert len(fk) > 100
    # exactly once per pair: the first-shared-bin credit dedups
    assert len(fk) == len(set(fk))


def test_interval_overlap_is_hash_join_and_emits_once(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    fast = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "__bin" in plan


def test_interval_overlap_bucket_width_invariance(spark):
    from dmds_spark.operators.relational import interval_overlap_join

    a, b = _interval_frames(spark)
    key = lambda df: sorted(
        (r["aid"], r["bid"]) for r in df.select("aid", "bid").collect()
    )
    base = key(interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", 32))
    for w in (1, 7, 64, 1000):
        assert key(
            interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi", w)
        ) == base


def test_asof_forward_hand_computed(spark):
    """Forward as-of: earliest right row at-or-after each left row,
    per key — hand-checkable fixture incl. the equal-timestamp case
    (inclusive: the same-ts right row wins)."""
    from dmds_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [("u", 5), ("u", 10), ("u", 30), ("v", 1)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("u", 10, 100.0), ("u", 20, 200.0), ("v", 0, 7.0)],
        ["k", "t", "val"],
    )
    out = {
        (r["k"], r["t"]): r["val"]
        for r in asof_join(
            left, right, on="t", by=["k"], right_value_cols=["val"],
            direction="forward",
        ).collect()
    }
    assert out == {
        ("u", 5): 100.0,    # next right at t=10
        ("u", 10): 100.0,   # equal ts: inclusive
        ("u", 30): None,    # nothing after
        ("v", 1): None,     # right at t=0 is in the past
    }


def test_asof_backward_unchanged_by_direction_param(spark):
    from dmds_spark.operators.relational import asof_join

    left = spark.createDataFrame([("u", 10)], ["k", "t"])
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 9, 2.0)], ["k", "t", "val"]
    )
    got = asof_join(
        left, right, on="t", by=["k"], right_value_cols=["val"]
    ).collect()
    assert got[0]["val"] == 1.0  # equal-ts right row qualifies backward too


def test_interval_overlap_property_random(spark):
    """Property sweep: random interval sets and bucket widths — the
    binned join must equal the naive predicate join exactly, with no
    duplicate pairs, including zero-length and bucket-straddling
    intervals."""
    import random

    from dmds_spark.operators.relational import interval_overlap_join

    rnd = random.Random(42)
    for trial in range(6):
        w = rnd.choice([1, 3, 16, 97, 10_000])
        n_a, n_b = rnd.randrange(1, 120), rnd.randrange(1, 120)
        mk = lambda n, tag: [
            (i, lo := rnd.randrange(-200, 200),
             lo + rnd.choice([0, 1, rnd.randrange(0, 150)]))
            for i in range(n)
        ]
        a = spark.createDataFrame(mk(n_a, "a"), ["aid", "alo", "ahi"])
        b = spark.createDataFrame(mk(n_b, "b"), ["bid", "blo", "bhi"])
        naive = sorted(
            (r["aid"], r["bid"])
            for r in a.join(
                b,
                (F.col("alo") <= F.col("bhi"))
                & (F.col("blo") <= F.col("ahi")),
            ).select("aid", "bid").collect()
        )
        fast = [
            (r["aid"], r["bid"])
            for r in interval_overlap_join(
                a, b, "alo", "ahi", "blo", "bhi", w
            ).select("aid", "bid").collect()
        ]
        assert sorted(fast) == naive, (trial, w)
        assert len(fast) == len(set(fast)), (trial, w)


def test_asof_both_directions_property_random(spark):
    """Property sweep: random (key, time) frames — both as-of
    directions must equal the brute-force definition (backward: max
    right.on <= left.on; forward: min right.on >= left.on), including
    equal-timestamp and no-match edges."""
    import random

    from dmds_spark.operators.relational import asof_join

    rnd = random.Random(77)
    for trial in range(4):
        left = [
            (f"k{rnd.randrange(4)}", rnd.randrange(0, 40))
            for _ in range(60)
        ]
        right = {}
        for _ in range(30):  # unique (k, t) on the right: defined pick
            right[(f"k{rnd.randrange(4)}", rnd.randrange(0, 40))] = None
        right = [
            (k, t, float(i)) for i, (k, t) in enumerate(sorted(right))
        ]
        ldf = spark.createDataFrame(left, ["k", "t"])
        rdf = spark.createDataFrame(right, ["k", "t", "val"])

        def brute(direction):
            out = {}
            for k, t in left:
                cands = [
                    (rt, v) for (rk, rt, v) in right
                    if rk == k and (rt <= t if direction == "backward"
                                    else rt >= t)
                ]
                if not cands:
                    out[(k, t)] = None
                elif direction == "backward":
                    out[(k, t)] = max(cands)[1]
                else:
                    out[(k, t)] = min(cands)[1]
            return out

        for direction in ("backward", "forward"):
            got = {
                (r["k"], r["t"]): r["val"]
                for r in asof_join(
                    ldf.dropDuplicates(), rdf, on="t", by=["k"],
                    right_value_cols=["val"], direction=direction,
                ).collect()
            }
            want = brute(direction)
            want = {kk: want[kk] for kk in {(k, t) for k, t in left}}
            assert got == want, (trial, direction)


def test_interval_overlap_by_keys(spark):
    """The per-key variant must equal the naive per-key overlap join
    (pairs only match within the same key), and the join keys must
    include the by column (hot-bin sharding)."""
    import random

    from dmds_spark.operators.relational import interval_overlap_join

    rnd = random.Random(13)
    mk = lambda n: [
        (i, f"t{rnd.randrange(3)}", lo := rnd.randrange(0, 300),
         lo + rnd.randrange(0, 80))
        for i in range(n)
    ]
    a = spark.createDataFrame(mk(80), ["aid", "tenant", "alo", "ahi"])
    b = spark.createDataFrame(mk(60), ["bid", "tenant2", "blo", "bhi"])
    b2 = b.withColumnRenamed("tenant2", "tenant")
    naive = sorted(
        (r["aid"], r["bid"])
        for r in a.join(
            b,
            (a.tenant == b.tenant2)
            & (F.col("alo") <= F.col("bhi"))
            & (F.col("blo") <= F.col("ahi")),
        ).select("aid", "bid").collect()
    )
    fast = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(
            a, b2, "alo", "ahi", "blo", "bhi", 32, by=["tenant"]
        ).select("aid", "bid").collect()
    )
    assert fast == naive and len(fast) > 0


def test_asof_null_right_values_nearest_row_wins(spark):
    """A genuinely NULL right VALUE must survive the pick: the nearest
    qualifying right row wins even when some (or all) of its value
    columns are NULL — matching SQL ASOF semantics (DuckDB keeps the
    NULL). Per-column ignorenulls picking would fall through to a
    farther row's value; the struct pick must also keep multiple value
    columns from the SAME row, never mix rows."""
    from dmds_spark.operators.relational import asof_join

    left = spark.createDataFrame([("u", 10), ("u", 25)], ["k", "t"])
    right = spark.createDataFrame(
        [("u", 1, 1.0, "a"), ("u", 8, None, "b"), ("u", 20, 3.0, None)],
        "k string, t long, val double, tag string",
    )
    back = {
        (r["k"], r["t"]): (r["val"], r["tag"])
        for r in asof_join(
            left, right, on="t", by=["k"],
            right_value_cols=["val", "tag"],
        ).collect()
    }
    # t=10 -> nearest past row is t=8: val NULL (NOT 1.0 from t=1), tag "b"
    # t=25 -> nearest past row is t=20: val 3.0, tag NULL (NOT "b")
    assert back == {("u", 10): (None, "b"), ("u", 25): (3.0, None)}

    fwd_left = spark.createDataFrame([("u", 5), ("u", 15)], ["k", "t"])
    fwd = {
        (r["k"], r["t"]): (r["val"], r["tag"])
        for r in asof_join(
            fwd_left, right, on="t", by=["k"],
            right_value_cols=["val", "tag"], direction="forward",
        ).collect()
    }
    # t=5 -> nearest future row is t=8: val NULL, tag "b"
    # t=15 -> nearest future row is t=20: val 3.0, tag NULL
    assert fwd == {("u", 5): (None, "b"), ("u", 15): (3.0, None)}


def test_asof_tolerance_hand_computed(spark):
    """merge_asof tolerance: the NEAREST pick matches only inside the
    gap window; beyond it the value is NULL (never a farther fallback),
    in both directions; tolerance=None unchanged."""
    from dmds_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [("u", 10), ("u", 25), ("u", 100)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("u", 8, 80.0), ("u", 20, 200.0)], ["k", "t", "val"]
    )

    def run(**kw):
        return {
            (r["k"], r["t"]): r["val"]
            for r in asof_join(
                left, right, on="t", by=["k"], right_value_cols=["val"],
                **kw,
            ).collect()
        }

    back = run(direction="backward", tolerance=5)
    assert back == {
        ("u", 10): 80.0,    # gap 2 <= 5
        ("u", 25): 200.0,   # gap 5 == 5: inclusive
        ("u", 100): None,   # nearest is t=20, gap 80 > 5 — no fallback
    }
    # forward gap = right.t - left.t: next right after t=10 is t=20
    # (gap 10 > 5), nothing at all after t=25/t=100 within 5
    fwd = run(direction="forward", tolerance=5)
    assert fwd == {("u", 10): None, ("u", 25): None, ("u", 100): None}
    assert run(direction="backward") == {
        ("u", 10): 80.0, ("u", 25): 200.0, ("u", 100): 200.0,
    }


def test_asof_tolerance_date_on_column(spark):
    """A DATE on column compares the tolerance in whole days (raw date
    subtraction yields an interval, which fails analysis against an
    integer — the round-12 advisory). Unsupported on dtypes raise a
    clear error instead of an analysis failure."""
    import datetime as dt

    import pytest as _pytest

    from dmds_spark.operators.relational import asof_join

    d = dt.date
    left = spark.createDataFrame(
        [("u", d(2024, 1, 10)), ("u", d(2024, 3, 1))], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("u", d(2024, 1, 8), 80.0), ("u", d(2024, 1, 20), 200.0)],
        ["k", "t", "val"],
    )
    got = {
        (r["k"], r["t"]): r["val"]
        for r in asof_join(
            left, right, on="t", by=["k"], right_value_cols=["val"],
            direction="backward", tolerance=5,
        ).collect()
    }
    assert got == {
        ("u", d(2024, 1, 10)): 80.0,   # gap 2 days <= 5
        ("u", d(2024, 3, 1)): None,    # nearest is Jan 20: 41 days > 5
    }
    # string on column + tolerance: clear ValueError at plan time
    sleft = spark.createDataFrame([("u", "b")], ["k", "t"])
    sright = spark.createDataFrame([("u", "a", 1.0)], ["k", "t", "val"])
    with _pytest.raises(ValueError, match="tolerance is not supported"):
        asof_join(
            sleft, sright, on="t", by=["k"], right_value_cols=["val"],
            tolerance=1,
        )
