"""Round-14 additions: survivorship/golden record, split-conformal
coverage, and B-cubed cluster quality — hand-computed micro-cases on
constructed fixtures (the oracle sweep certifies the full corpus; these
pin the SEMANTICS) plus plan-shape pins for the scale properties."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dmds_spark.plans import physical_plan, unpartitioned_window_count
from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


@pytest.fixture(scope="module")
def mini_dir(spark, tmp_path_factory):
    """Hand-sized events: user 1 with three distinct-type events, user
    2 with a same-timestamp tie; conformal calibration/test slices for
    one event type around the Jan-16 cutoff."""
    d = str(tmp_path_factory.mktemp("mini_sf14"))
    t = dt.datetime
    cal, tst = t(2024, 1, 10), t(2024, 1, 20)
    ev = [
        # user 1 (also the calibration slice: cents 100/200/300)
        (1, t(2024, 1, 10, 10), 1, "view", 1.00, '{"k": 7}'),
        (2, t(2024, 1, 10, 11), 1, "purchase", 2.00, '{"k": 9}'),
        (3, t(2024, 1, 10, 12), 1, "click", 3.00, '{"k": 2}'),
        # user 2: SAME timestamp twice -> event_id breaks the tie
        (4, cal, 2, "error", 1.00, '{"k": 1}'),
        (5, cal, 2, "error", 2.00, '{"k": 4}'),
        # test slice (>= Jan 16): residuals vs per-type cal means
        (6, tst, 1, "view", 1.50, '{"k": 0}'),
        (7, tst, 1, "purchase", 3.50, '{"k": 0}'),
        (8, tst, 2, "error", 2.50, '{"k": 0}'),
        (9, tst, 2, "click", 2.00, '{"k": 0}'),
    ]
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_survivorship_hand_computed(spark, qs, mini_dir):
    """User 1 (events 1,2,3,6,7): the latest observation is event 7
    (Jan 20, higher id than the same-timestamp event 6) -> last_k = 0;
    two purchases carry the top precedence and the later one (350
    cents) survives; type counts view=2/purchase=2/click=1 tie ->
    lexicographically smallest of the modals ('purchase' < 'view').
    User 2 (events 4,5,8,9): same-timestamp ties resolve by event_id
    (event 9 latest -> last_k = 0); click outranks error in precedence
    -> best 200 cents; modal 'error' (3 of 4)."""
    got = {
        r["user_id"]: r
        for r in qs["survivorship_golden_record"](spark, mini_dir).collect()
    }
    u1, u2 = got[1], got[2]
    assert u1["last_k"] == 0
    assert u1["best_value_cents"] == 350
    assert u1["modal_type"] == "purchase"
    assert u1["n_records"] == 5
    assert u1["first_seen_us"] < u1["last_seen_us"]
    assert u2["last_k"] == 0
    assert u2["best_value_cents"] == 200
    assert u2["modal_type"] == "error"
    assert u2["n_records"] == 4


def test_conformal_hand_computed(spark, qs, mini_dir):
    """Calibration (pre-cutoff): view 100, purchase 200, click 300,
    error 100, error 200 — per-type means: view 100, purchase 200,
    click 300, error 150. All calibration residuals are 0 except the
    two error events (|100-150| = |200-150| = 50): score multiset
    {0,0,0,50,50}. n_cal = 5, k = ceil(0.9*6) = 6 -> capped to 5 ->
    q_hat = max = 50. Test residuals: view 50 (covered), purchase 150
    (not), error 100 (not), click 100 (not)."""
    rows = {
        r["event_type"]: r
        for r in qs["eval_conformal_coverage"](spark, mini_dir).collect()
    }
    assert all(r["q_hat_cents"] == 50 for r in rows.values())
    assert rows["view"]["n_test"] == 1 and rows["view"]["n_covered"] == 1
    assert rows["view"]["coverage_ppm"] == 1_000_000
    assert rows["purchase"]["n_covered"] == 0
    assert rows["error"]["n_covered"] == 0
    assert rows["click"]["n_covered"] == 0


def test_conformal_grid_window_is_the_only_unpartitioned_one(spark, qs):
    df = qs["eval_conformal_coverage"](spark, SF)
    assert unpartitioned_window_count(df) == 1  # the bounded score grid


def test_survivorship_is_pure_hash_aggregation(spark, qs):
    """The golden record must come from max_by/min_by hash aggregates —
    no Window over the event stream (the store-design latest-wins
    rule), and map-side partial aggregation present."""
    plan = physical_plan(qs["survivorship_golden_record"](spark, SF))
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial_min_by" in plan


def test_bcubed_perfect_on_identical_texts(spark, qs, tmp_path):
    """Planted truth: two identical-text pairs + a singleton. Estimate
    and exact clusterings agree exactly (identical signatures, jaccard
    1.0), so B-cubed precision == recall == 1e6 over 5 docs."""
    d = str(tmp_path / "docs_sf")
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
        (3, "one two three four five six seven eight nine", "en", "s", 9),
        (4, "one two three four five six seven eight nine", "en", "s", 9),
        (5, "completely different words nothing shared here at all x", "en", "s", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    row = qs["dedup_bcubed_quality"](spark, d).collect()[0]
    assert row["n_docs"] == 5
    assert row["bcubed_precision_ppm"] == 1_000_000
    assert row["bcubed_recall_ppm"] == 1_000_000


def test_bcubed_no_cartesian(spark, qs):
    plan = physical_plan(qs["dedup_bcubed_quality"](spark, SF))
    assert "CartesianProduct" not in plan


def test_theilsen_hand_computed(spark, qs, tmp_path):
    """Four days of revenue 10.00/20.00/10.00/40.00 at days 0,1,2,3:
    pairwise slopes (cents/day) = {1000, 0, 1000, -1000, 1000, 3000};
    sorted [-1000, 0, 1000, 1000, 1000, 3000]; lower median (k =
    (6+1)//2 = 3) -> 1000."""
    import datetime as dt

    d = str(tmp_path / "ts_sf")
    base = dt.datetime(2020, 1, 1)
    rows = [
        (1, 1, "O", 10.0, base, "x"),
        (2, 1, "O", 20.0, base + dt.timedelta(days=1), "x"),
        (3, 1, "O", 10.0, base + dt.timedelta(days=2), "x"),
        (4, 1, "O", 40.0, base + dt.timedelta(days=3), "x"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    row = qs["orders_theilsen_trend"](spark, d).collect()[0]
    assert row["n_days"] == 4 and row["n_pairs"] == 6
    assert row["slope_cents_per_day"] == 1000


def test_theilsen_negative_slope_exact(spark, qs, tmp_path):
    """Strictly decreasing revenue: every pairwise slope is negative —
    the shifted floor division must still match pure-Python floor
    (the negative-integer-division divergence trap)."""
    import datetime as dt

    d = str(tmp_path / "ts_neg")
    base = dt.datetime(2020, 1, 1)
    vals = [40.0, 25.0, 13.0]  # cents 4000, 2500, 1300
    rows = [
        (i + 1, 1, "O", v, base + dt.timedelta(days=2 * i), "x")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    # slopes (floor): (2500-4000)//2 = -750, (1300-4000)//4 = -675,
    # (1300-2500)//2 = -600 -> sorted [-750, -675, -600], median -675
    row = qs["orders_theilsen_trend"](spark, d).collect()[0]
    assert row["slope_cents_per_day"] == -675


def test_cusum_hand_computed(spark, qs, tmp_path):
    """Counts 1,1,5,5 over four days: total 12, n 4. g_t =
    |4*cum_t - t*12| = |4*1-12|=8, |4*2-24|=16, |4*7-36|=8,
    |4*12-48|=0 -> max 16 at the 2nd day (the level shift)."""
    import datetime as dt

    d = str(tmp_path / "cp_sf")
    base = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    for day, n in enumerate([1, 1, 5, 5]):
        for _ in range(n):
            ev.append((eid, base + dt.timedelta(days=day), 1, "view",
                       1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    row = qs["events_cusum_changepoint"](spark, d).collect()[0]
    assert row["n_days"] == 4 and row["total_events"] == 12
    day0 = (base.date() - dt.date(1970, 1, 1)).days
    assert row["changepoint_day"] == day0 + 1
    assert row["max_cusum_stat"] == 16


def test_cusum_tie_breaks_to_earliest_day(spark, qs, tmp_path):
    """Symmetric series 3,1,1,3: g = |4*3-8|=4, |4*4-16|=0,
    |4*5-24|=4, 0 -> ties at days 0 and 2; the earliest wins."""
    import datetime as dt

    d = str(tmp_path / "cp_tie")
    base = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    for day, n in enumerate([3, 1, 1, 3]):
        for _ in range(n):
            ev.append((eid, base + dt.timedelta(days=day), 1, "view",
                       1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    row = qs["events_cusum_changepoint"](spark, d).collect()[0]
    day0 = (base.date() - dt.date(1970, 1, 1)).days
    assert row["max_cusum_stat"] == 4
    assert row["changepoint_day"] == day0


def test_association_rules_hand_computed(spark, qs, tmp_path):
    """3 baskets over items from two 'brands': baskets {A,B}, {A,B},
    {A}. n_A=3, n_B=2, n_AB=2, N=3. conf(A->B) = 2/3 -> 666666 ppm;
    conf(B->A) = 1e6; lift both ways = 2*3/(3*2) = 1.0 -> 1e6 ppm."""
    d = str(tmp_path / "ar_sf")
    # part: partkey 1 -> Brand#A, 2 -> Brand#B
    spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string"
    ).coalesce(1).write.parquet(f"{d}/part.parquet")
    li = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1)]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    import dmds_spark.queries.round14e as m

    orig = m._AR_MINSUP
    try:
        m._AR_MINSUP = 1
        got = {
            (r["ante"], r["cons"]): r
            for r in m.basket_association_rules(spark, d).collect()
        }
    finally:
        m._AR_MINSUP = orig
    ab, ba = got[("Brand#A", "Brand#B")], got[("Brand#B", "Brand#A")]
    assert ab["n_ab"] == 2 and ba["n_ab"] == 2
    assert ab["confidence_ppm"] == 666_666
    assert ba["confidence_ppm"] == 1_000_000
    assert ab["lift_ppm"] == 1_000_000 and ba["lift_ppm"] == 1_000_000


def test_chi2_hand_computed(spark, qs, tmp_path):
    """2x2 table [[30,10],[10,30]]: T=80, all margins 40. Every cell:
    (O*T - R*C)^2 * 1e6 / (T*R*C) = (O*80 - 1600)^2 * 1e6 / 128000.
    O=30: (2400-1600)^2 = 640000 -> 5e6 ppm; O=10: same (800)^2 ->
    5e6 ppm. chi2 = 20e6 ppm (classic chi2 = 20 for this table)."""
    d = str(tmp_path / "chi_sf")
    rows = []
    i = 0
    for src, lang, n in [("s1", "en", 30), ("s1", "de", 10),
                         ("s2", "en", 10), ("s2", "de", 30)]:
        for _ in range(n):
            rows.append((i, "t", lang, src, 1))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    row = qs["profile_chi2_independence"](spark, d).collect()[0]
    assert (row["n_rows"], row["n_cols"], row["dof"]) == (2, 2, 1)
    assert row["chi2_ppm"] == 20_000_000


def test_chi2_zero_on_independent_table(spark, qs, tmp_path):
    """Perfectly independent margins -> every observed == expected ->
    chi2 exactly 0 (the floor of 0 is 0 in both engines)."""
    d = str(tmp_path / "chi_ind")
    rows = []
    i = 0
    for src, lang, n in [("s1", "en", 20), ("s1", "de", 10),
                         ("s2", "en", 40), ("s2", "de", 20)]:
        for _ in range(n):
            rows.append((i, "t", lang, src, 1))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    row = qs["profile_chi2_independence"](spark, d).collect()[0]
    assert row["chi2_ppm"] == 0


def test_kendall_tau_hand_computed(spark, qs, tmp_path):
    """Revenue 10/20/15/30 over days 0..3: pairs C=5, D=1 (20>15),
    n=6 -> tau = 4/6 -> floor ppm 666666. Negative check by symmetry
    lives in the shift: (C-D+n)*1e6//n - 1e6."""
    import datetime as dt

    d = str(tmp_path / "kt_sf")
    base = dt.datetime(2020, 1, 1)
    rows = [
        (i + 1, 1, "O", v, base + dt.timedelta(days=i), "x")
        for i, v in enumerate([10.0, 20.0, 15.0, 30.0])
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    row = qs["orders_kendall_tau"](spark, d).collect()[0]
    assert (row["n_days"], row["n_pairs"]) == (4, 6)
    assert (row["n_conc"], row["n_disc"]) == (5, 1)
    assert row["tau_a_ppm"] == 666_666


def test_pinball_hand_computed_and_mae_crosscheck(spark, qs, tmp_path):
    """One event type, daily counts [2,0,0,0,0,0,0, 5,1]: snaive lag-7
    scores days 8 (n=5, fc=2, e=3) and 9 (n=1, fc=0, e=1).
    10x losses: tau .1 -> max(1e, -9e) = e -> 3, 1; tau .5 -> 5e ->
    15, 5; tau .9 -> 9e -> 27, 9. ppm = sum*1e5/2 -> 200000, 1000000,
    1800000. tau=.5 must equal half the MAE (MAE = 2 -> 1e6 ppm)."""
    import datetime as dt

    d = str(tmp_path / "pb_sf")
    base = dt.datetime(2024, 1, 1)
    ev, eid = [], 0
    for day, n in enumerate([2, 0, 0, 0, 0, 0, 0, 5, 1]):
        for _ in range(n):
            ev.append((eid, base + dt.timedelta(days=day), 1, "view",
                       1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    rows = {r["tau_pct"]: r
            for r in qs["forecast_eval_pinball"](spark, d).collect()}
    assert all(r["n_scored"] == 2 for r in rows.values())
    assert rows[10]["pinball_ppm"] == 200_000
    assert rows[50]["pinball_ppm"] == 1_000_000
    assert rows[90]["pinball_ppm"] == 1_800_000


def test_mannwhitney_hand_computed(spark, qs, tmp_path):
    """Sample 1 (pre-cutoff) cents {100, 300}, sample 2 {200, 300}.
    Sorted with doubled midranks: 100 -> 2, 200 -> 4, 300,300 ->
    2*2 + 2 + 1 = 7 each. R1_x2 = 2 + 7 = 9... recomputed below:
    values 100(s1), 200(s2), 300(s1), 300(s2): doubled ranks 2, 4,
    7, 7. R1_x2 = 2 + 7 = 9; U1_x2 = 9 - 2*3 = 3 (U1 = 1.5 with the
    tie). rank-biserial = 2*1.5/4 - 1 = -0.25."""
    import datetime as dt

    d = str(tmp_path / "mw_sf")
    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    ev = [
        (1, pre, 1, "view", 1.00, "{}"),
        (2, pre, 1, "view", 3.00, "{}"),
        (3, post, 1, "view", 2.00, "{}"),
        (4, post, 1, "view", 3.00, "{}"),
    ]
    spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    row = qs["events_mannwhitney_u"](spark, d).collect()[0]
    assert (row["n1"], row["n2"]) == (2, 2)
    assert row["u1_x2"] == 3  # 2*U1 with the tied pair counted half
    # rb = 2*(3/2)/(2*2) - 1 = -0.25 -> floor-chained ppm
    assert row["rank_biserial_ppm"] == (3 * 1_000_000 // 8) * 2 - 1_000_000


def test_cramers_v2_hand_computed(spark, qs, tmp_path):
    """The chi2 hand fixture [[30,10],[10,30]] has chi2 = 20, T = 80,
    min(r-1,c-1) = 1 -> V^2 = 20/80 = 0.25 -> 250000 ppm."""
    import os

    d = str(tmp_path / "cv_sf")
    rows = []
    i = 0
    for src, lang, n in [("s1", "en", 30), ("s1", "de", 10),
                         ("s2", "en", 10), ("s2", "de", 30)]:
        for _ in range(n):
            rows.append((i, "t", lang, src, 1))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    del os
    row = qs["profile_cramers_v2"](spark, d).collect()[0]
    assert row["chi2_ppm"] == 20_000_000
    assert row["cramers_v2_ppm"] == 250_000


def test_kappa_hand_computed_on_planted_disagreement(spark, qs, tmp_path):
    """Five docs: two identical pairs (est == exact == dup) plus a
    singleton — every blocked candidate gets the same label from both
    methods. Whatever the candidate set, perfect agreement means
    kappa = 1e6 (either via the exact formula or the pe=1 degenerate
    convention when all labels coincide)."""
    d = str(tmp_path / "kp_sf")
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 8),
        (3, "one two three four five six seven eight nine", "en", "s", 9),
        (4, "one two three four five six seven eight nine", "en", "s", 9),
        (5, "completely different words nothing shared here at all x",
         "en", "s", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    row = qs["dedup_method_kappa"](spark, d).collect()[0]
    assert row["n_est_only"] == 0 and row["n_exact_only"] == 0
    assert row["kappa_ppm"] == 1_000_000


def test_kappa_formula_mixed_case(spark, qs):
    """On the real corpus the two labelings disagree somewhere
    (dedup_minhash_precision exists because they do): check the
    emitted kappa against a driver-side recompute from the emitted
    confusion counts."""
    row = qs["dedup_method_kappa"](spark, SF).collect()[0]
    a, b, c, d = (row["n_both"], row["n_est_only"],
                  row["n_exact_only"], row["n_neither"])
    n = a + b + c + d
    pe_n2 = (a + b) * (a + c) + (c + d) * (b + d)
    den = n * n - pe_n2
    if den == 0:
        assert row["kappa_ppm"] == 1_000_000
    else:
        num_shifted = (a + d) * n - pe_n2 + den
        assert row["kappa_ppm"] == num_shifted * 1_000_000 // den - 1_000_000
