"""N-step funnel builder tests (operators/events.py): the fold must
reproduce the hand-chained 3-step funnel exactly, and scale to step
counts the hand-chained form never covered."""

from datetime import datetime

from pyspark.sql import functions as F

from dmds_spark.operators.events import funnel_step_times, sequential_funnel

SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_five_step_funnel_strict_order(spark):
    """5-step funnel over a hand-built stream: u1 completes all five in
    order; u2 does steps 1-3 but has step 4 BEFORE step 3 (must not
    count); u3 only step 1."""
    steps = ["a", "b", "c", "d", "e"]
    rows = []
    for i, s in enumerate(steps):
        rows.append(("u1", s, _t(i)))
    rows += [
        ("u2", "d", _t(0)),  # too early: before u2's step c
        ("u2", "a", _t(1)),
        ("u2", "b", _t(2)),
        ("u2", "c", _t(3)),
        ("u3", "a", _t(0)),
    ]
    got = {
        r["step"]: r["users"]
        for r in sequential_funnel(_ev(spark, rows), steps).collect()
    }
    assert got == {1: 3, 2: 2, 3: 2, 4: 1, 5: 1}


def test_funnel_equal_ts_not_counted(spark):
    """Strict means strict: a step-2 event at exactly the step-1 time
    does not advance the funnel."""
    rows = [("u1", "a", _t(0)), ("u1", "b", _t(0)), ("u1", "b", _t(1))]
    got = {
        r["step"]: r["users"]
        for r in sequential_funnel(_ev(spark, rows), ["a", "b"]).collect()
    }
    assert got == {1: 1, 2: 1}
    rows2 = [("u1", "a", _t(0)), ("u1", "b", _t(0))]
    got2 = {
        r["step"]: r["users"]
        for r in sequential_funnel(_ev(spark, rows2), ["a", "b"]).collect()
    }
    assert got2 == {1: 1, 2: 0}


def test_funnel_predicate_steps(spark):
    """Steps can be arbitrary predicates, not just type equality."""
    rows = [
        ("u1", "view_home", _t(0)),
        ("u1", "view_item", _t(1)),
        ("u1", "purchase", _t(2)),
    ]
    got = {
        r["step"]: r["users"]
        for r in sequential_funnel(
            _ev(spark, rows),
            [
                F.col("event_type").startswith("view"),
                F.col("event_type") == "purchase",
            ],
        ).collect()
    }
    assert got == {1: 1, 2: 1}


def test_funnel_matches_registered_query(spark):
    """The registered 3-step query (driver-checked surface) is the
    fold at steps=[view, click, purchase] — outputs must be equal."""
    from dmds_spark.queries import all_queries
    from dmds_spark.sources.registry import load_events

    qs = all_queries()

    e = load_events(spark, SF)
    a = sorted(
        (r["step"], r["users"])
        for r in sequential_funnel(e, ["view", "click", "purchase"]).collect()
    )
    b = sorted(
        (r["step"], r["users"])
        for r in qs["events_funnel_steps"](spark, SF).collect()
    )
    assert a == b


def test_funnel_step_times_completers_only(spark):
    rows = [
        ("u1", "a", _t(0)),
        ("u1", "b", _t(1)),
        ("u2", "a", _t(0)),
    ]
    got = funnel_step_times(_ev(spark, rows), ["a", "b"]).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == "u1" and r["t1"] == _t(0) and r["t2"] == _t(1)


# --------------------------------------------------------------------------
# Property: the distributed fold must match a trivial in-memory funnel
# simulator on random event streams.


def _model_funnel(rows, steps):
    """Reference implementation: per user, walk steps greedily taking
    the earliest matching event strictly after the previous step."""
    by_user = {}
    for u, typ, ts in rows:
        by_user.setdefault(u, []).append((ts, typ))
    counts = {i: 0 for i in range(1, len(steps) + 1)}
    for evs in by_user.values():
        evs.sort()
        prev = None
        for i, step in enumerate(steps, start=1):
            cand = [t for t, typ in evs
                    if typ == step and (prev is None or t > prev)]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


def test_funnel_matches_model_random(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    steps = ["a", "b", "c"]
    ROWS = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),        # user
            st.sampled_from(["a", "b", "c", "x"]),        # type
            st.integers(min_value=0, max_value=20),       # minute
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(rows=ROWS)
    def check(rows):
        df = _ev(spark, [(f"u{u}", typ, _t(m)) for u, typ, m in rows])
        got = {
            r["step"]: r["users"]
            for r in sequential_funnel(df, steps, materialize=False).collect()
        }
        want = _model_funnel(
            [(u, typ, m) for u, typ, m in rows], steps
        )
        assert got == want

    check()


def test_linear_attribution_conserves_credit(spark):
    """Per purchase, the integer-ppm credits must sum to exactly
    1000000 - (1000000 mod n_touches) — equal split loses only the
    integer-division remainder (< n_touches ppm), never credit to the
    wrong type. Checked purchase-by-purchase against a Python model
    of the same join."""
    from pyspark.sql import functions as F

    from dmds_spark.queries import all_queries
    from dmds_spark.sources.registry import load_events

    sf = "/root/testdata/sf0.001"
    ev = load_events(spark, sf)
    rows = ev.select("event_id", "user_id", "event_type",
                     F.unix_micros("ts").alias("us")).collect()
    W_US = 7 * 24 * 3600 * 1_000_000
    touches = [r for r in rows if r["event_type"] in ("click", "view")]
    by_user = {}
    for r in touches:
        by_user.setdefault(r["user_id"], []).append(r)
    per_type = {}
    n_purchases_touched = set()
    for p in (r for r in rows if r["event_type"] == "purchase"):
        ts = [
            t for t in by_user.get(p["user_id"], [])
            if t["us"] <= p["us"] and p["us"] - t["us"] <= W_US
        ]
        if not ts:
            continue
        n_purchases_touched.add(p["event_id"])
        share = 1_000_000 // len(ts)
        for t in ts:
            k = t["event_type"]
            agg = per_type.setdefault(k, [0, 0, set()])
            agg[0] += 1          # n_credits
            agg[1] += share      # credit_ppm
            agg[2].add(p["event_id"])
    got = {
        r["touch_type"]: (r["n_credits"], r["credit_ppm"], r["n_purchases"])
        for r in all_queries()["events_attribution_linear"](spark, sf)
        .collect()
    }
    want = {k: (v[0], v[1], len(v[2])) for k, v in per_type.items()}
    assert got == want
    # conservation: total ppm within one remainder of full credit
    total_ppm = sum(v[1] for v in per_type.values())
    assert total_ppm <= 1_000_000 * len(n_purchases_touched)
