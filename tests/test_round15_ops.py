"""Round-15 additions: rank/effect-size statistics (Spearman,
Kruskal-Wallis, Cohen's d^2, runs test, lag-k ACF) and reciprocal-rank
fusion — hand-computed micro-cases on constructed fixtures (the oracle
sweep certifies the full corpus; these pin the SEMANTICS) plus
plan-shape pins for the scale properties."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dmds_spark.plans import physical_plan
from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

_EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _write_events(spark, d, rows):
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )


def test_spearman_hand_computed(spark, qs, tmp_path):
    """Three days: (count, revenue cents) = (1, 1000), (2, 1000),
    (3, 6000). Doubled midranks rx = [2, 4, 6], ry = [5, 5, 6] (the
    revenue tie -> 2*0+2+1 = 5 twice). Components: num = 3*66 -
    12*16 = 6, denx = 24, deny = 2 -> rho^2 = 36/48 = 0.75, sign +1
    (and rho = +sqrt(0.75) ~ 0.866, the monotone-tie case)."""
    d = str(tmp_path / "sp_sf")
    base = dt.datetime(2020, 1, 1)
    rows = []
    k = 0
    for day, prices in [(0, [10.0]), (1, [5.0, 5.0]),
                        (2, [20.0, 20.0, 20.0])]:
        for p in prices:
            k += 1
            rows.append((k, 1, "O", p, base + dt.timedelta(days=day), "x"))
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    row = qs["orders_spearman_daily"](spark, d).collect()[0]
    assert row["n_days"] == 3
    assert row["rho2_ppm"] == 750_000
    assert row["rho_sign"] == 1


def test_kruskal_wallis_hand_computed(spark, qs, tmp_path):
    """view cents {100, 300}, click {200, 300}: doubled midranks 2, 4,
    7, 7 -> S2_view = 9, S2_click = 11, N = 4. Exact H = 3/20 *
    (81/2 + 121/2) - 15 = 0.15; the floor-chained ppm lands exactly
    on 150000 here (both per-group 3e6*S2^2 are even)."""
    d = str(tmp_path / "kw_sf")
    t = dt.datetime(2024, 1, 10)
    _write_events(spark, d, [
        (1, t, 1, "view", 1.00, "{}"),
        (2, t, 1, "view", 3.00, "{}"),
        (3, t, 1, "click", 2.00, "{}"),
        (4, t, 1, "click", 3.00, "{}"),
    ])
    row = qs["events_kruskal_wallis"](spark, d).collect()[0]
    assert (row["n_groups"], row["n_total"]) == (2, 4)
    assert row["kw_h_ppm"] == 150_000


def test_kruskal_wallis_zero_for_identical_groups(spark, qs, tmp_path):
    """Two groups with identical value multisets: every group's mean
    rank equals the grand mean rank -> H = 0 exactly (ties across
    groups, the midrank machinery's fixed point)."""
    d = str(tmp_path / "kw0_sf")
    t = dt.datetime(2024, 1, 10)
    rows = []
    for i, (g, v) in enumerate(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)]
    ):
        rows.append((i + 1, t, 1, g, v, "{}"))
    _write_events(spark, d, rows)
    row = qs["events_kruskal_wallis"](spark, d).collect()[0]
    assert row["kw_h_ppm"] == 0


def test_cohens_d2_hand_computed(spark, qs, tmp_path):
    """Pre cents {100, 300}, post {200, 400}: means 200 vs 300, both
    sample variances 20000 -> pooled 20000, d = -100/sqrt(20000),
    d^2 = 0.5 -> 500000 ppm, sign -1."""
    d = str(tmp_path / "cd_sf")
    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    _write_events(spark, d, [
        (1, pre, 1, "view", 1.00, "{}"),
        (2, pre, 1, "view", 3.00, "{}"),
        (3, post, 1, "view", 2.00, "{}"),
        (4, post, 1, "view", 4.00, "{}"),
    ])
    row = qs["eval_cohens_d2"](spark, d).collect()[0]
    assert (row["n_pre"], row["n_post"]) == (2, 2)
    assert row["d2_ppm"] == 500_000
    assert row["d_sign"] == -1


def test_runs_test_hand_computed(spark, qs, tmp_path):
    """Daily revenue cents [10, 30, 10, 30, 10]: mean 18 -> sign
    sequence 0 1 0 1 0 = five runs; n_above = 2, n_below = 3,
    expected = 1 + 2*2*3/5 = 3.4 -> 3400000 ppm."""
    d = str(tmp_path / "rt_sf")
    base = dt.datetime(2024, 1, 1)
    vals = [0.10, 0.30, 0.10, 0.30, 0.10]
    _write_events(spark, d, [
        (i + 1, base + dt.timedelta(days=i), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ])
    row = qs["events_runs_test"](spark, d).collect()[0]
    assert (row["n_runs"], row["n_above"], row["n_below"]) == (5, 2, 3)
    assert row["expected_runs_ppm"] == 3_400_000


def test_acf_hand_computed_alternating(spark, qs, tmp_path):
    """Six days alternating 100/200 dollars: lag 1 is perfect
    anti-correlation (rho^2 = 1e6, sign -1), lag 2 perfect positive."""
    d = str(tmp_path / "acf_sf")
    base = dt.datetime(2024, 1, 1)
    _write_events(spark, d, [
        (i + 1, base + dt.timedelta(days=i), 1, "view",
         100.0 if i % 2 == 0 else 200.0, "{}")
        for i in range(6)
    ])
    rows = {r["lag"]: r for r in qs["events_acf_daily"](spark, d).collect()}
    assert rows[1]["n_pairs"] == 5
    assert (rows[1]["acf2_ppm"], rows[1]["acf_sign"]) == (1_000_000, -1)
    assert (rows[2]["acf2_ppm"], rows[2]["acf_sign"]) == (1_000_000, 1)


def test_acf_calendar_alignment_drops_gap_pairs(spark, qs, tmp_path):
    """A missing calendar day must DROP the pairs that span it, not
    misalign the series: days 1,2,4,5 -> lag 1 pairs are (1,2) and
    (4,5) only."""
    d = str(tmp_path / "acfg_sf")
    base = dt.datetime(2024, 1, 1)
    _write_events(spark, d, [
        (i + 1, base + dt.timedelta(days=day), 1, "view",
         float(100 * (i + 1)), "{}")
        for i, day in enumerate([0, 1, 3, 4])
    ])
    rows = {r["lag"]: r for r in qs["events_acf_daily"](spark, d).collect()}
    assert rows[1]["n_pairs"] == 2
    assert rows[3]["n_pairs"] == 2  # (day0, day3), (day1, day4)


def test_rrf_fusion_shape_and_component_consistency(spark, qs):
    """Fusion must agree with its component lists: every fused rank
    pair within depth, scores decompose as floor(1e6/(60+r)) sums,
    and the lexical ranks of the docs also in text_bm25_topk's top-20
    match exactly (same shared scorer)."""
    out = qs["retrieval_rrf_fusion"](spark, SF).collect()
    assert len(out) == 20
    for r in out:
        expect = 0
        if r["rank_lex"]:
            assert 1 <= r["rank_lex"] <= 100
            expect += 1_000_000 // (60 + r["rank_lex"])
        if r["rank_vec"]:
            assert 1 <= r["rank_vec"] <= 100
            expect += 1_000_000 // (60 + r["rank_vec"])
        assert r["rrf_ppm"] == expect and expect > 0
    bm = {r["doc_id"]: r["rnk"]
          for r in qs["text_bm25_topk"](spark, SF).collect()}
    fused_lex = {r["doc_id"]: r["rank_lex"] for r in out if r["rank_lex"]}
    overlap = set(bm) & set(fused_lex)
    assert overlap  # fixed terms: the heads of both lists intersect
    assert all(bm[d] == fused_lex[d] for d in overlap)


def test_stats_plan_shapes(spark, qs):
    """Scale pins: the corpus-sized side is touched by ONE scan per
    query (the bounded grids absorb everything downstream), and no
    query degenerates to a data-sized nested-loop product."""
    for name in ("orders_spearman_daily", "events_kruskal_wallis",
                 "eval_cohens_d2", "events_runs_test",
                 "events_acf_daily"):
        plan = physical_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
    # the ACF lag fan-out rides a BROADCAST of the 14-row lag grid
    acf = physical_plan(qs["events_acf_daily"](spark, SF))
    assert "BroadcastNestedLoopJoin" in acf or "BroadcastExchange" in acf


def test_cohens_d2_zero_when_means_equal(spark, qs, tmp_path):
    d = str(tmp_path / "cd0_sf")
    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    _write_events(spark, d, [
        (1, pre, 1, "view", 1.00, "{}"),
        (2, pre, 1, "view", 3.00, "{}"),
        (3, post, 1, "view", 0.50, "{}"),
        (4, post, 1, "view", 3.50, "{}"),
    ])
    row = qs["eval_cohens_d2"](spark, d).collect()[0]
    assert row["d2_ppm"] == 0 and row["d_sign"] == 0


# -- batch three: paired/change-point tests, label prop, k-anon ladder ----


def test_wilcoxon_hand_computed(spark, qs, tmp_path):
    """Days 0,1,28,29,56 with cents 100,200,300,200,300: the 28-day
    pairing gives diffs {+200, 0, 0} — zeros drop, the single
    positive diff takes doubled rank 2 -> W+x2 = 2, W-x2 = 0,
    effect = +1e6."""
    d = str(tmp_path / "wsr_sf")
    base = dt.datetime(2024, 1, 1)
    vals = {0: 1.00, 1: 2.00, 28: 3.00, 29: 2.00, 56: 3.00}
    _write_events(spark, d, [
        (i + 1, base + dt.timedelta(days=day), 1, "view", v, "{}")
        for i, (day, v) in enumerate(sorted(vals.items()))
    ])
    row = qs["events_wilcoxon_signed_rank"](spark, d).collect()[0]
    assert (row["n_pairs"], row["n_nonzero"]) == (3, 1)
    assert (row["w_plus_x2"], row["w_minus_x2"]) == (2, 0)
    assert row["effect_ppm"] == 1_000_000


def test_pettitt_hand_computed(spark, qs, tmp_path):
    """Cents [100, 100, 300, 300] over four days: U = [2, 4, 2] ->
    change point after day 2 (epoch day of 2024-01-02), K = 4."""
    d = str(tmp_path / "pt_sf")
    base = dt.datetime(2024, 1, 1)
    _write_events(spark, d, [
        (i + 1, base + dt.timedelta(days=i), 1, "view", v, "{}")
        for i, v in enumerate([1.00, 1.00, 3.00, 3.00])
    ])
    row = qs["events_pettitt_changepoint"](spark, d).collect()[0]
    assert (row["n_days"], row["k_stat"]) == (4, 4)
    assert row["change_day"] == (dt.date(2024, 1, 2)
                                 - dt.date(1970, 1, 1)).days


def test_label_propagation_hand_computed(spark, qs, tmp_path):
    """Suppliers 10, 20 (nation 1) share part 5 -> one community
    labeled 10; supplier 30 shares the part but sits in nation 2 (no
    edge); supplier 40 is isolated."""
    d = str(tmp_path / "lp_sf")
    spark.createDataFrame(
        [(5, 10), (5, 20), (5, 30), (6, 40)],
        "l_partkey long, l_suppkey long",
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        [(10, 1), (20, 1), (30, 2), (40, 1)],
        "s_suppkey long, s_nationkey long",
    ).coalesce(1).write.parquet(f"{d}/supplier.parquet")
    rows = sorted(
        (r["label"], r["n_members"], r["min_member"], r["max_member"])
        for r in qs["graph_label_propagation"](spark, d).collect()
    )
    assert rows == [(10, 2, 10, 20), (30, 1, 30, 30), (40, 1, 40, 40)]


def test_k_anonymity_ladder_hand_computed(spark, qs, tmp_path):
    """Four customers at $150 and one at $1050, same nation/segment:
    $100 and $1000 buckets both split them (all 5 rows exposed at
    k=5); dropping the balance merges to one k=5 class -> fully
    anonymous."""
    d = str(tmp_path / "ka_sf")
    rows = [(i + 1, 1, "A", 150.0) for i in range(4)]
    rows.append((5, 1, "A", 1050.0))
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, "
              "c_acctbal double"
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    out = {r["level"]: r
           for r in qs["privacy_k_anonymity_ladder"](spark, d).collect()}
    assert (out[0]["n_groups"], out[0]["k_min"],
            out[0]["n_exposed_rows"], out[0]["anon_ppm"]) == (2, 1, 5, 0)
    assert (out[1]["n_groups"], out[1]["n_exposed_rows"]) == (2, 5)
    assert (out[2]["n_groups"], out[2]["k_min"],
            out[2]["n_exposed_rows"], out[2]["anon_ppm"]) == (
        1, 5, 0, 1_000_000)


def test_batch3_plan_shapes(spark, qs):
    """No data-sized nested-loop products; the Pettitt straddling
    joins live on the bounded day grid only (non-equi, so nested-loop
    there is by design and bounded)."""
    for name in ("events_wilcoxon_signed_rank",
                 "graph_label_propagation",
                 "privacy_k_anonymity_ladder"):
        plan = physical_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name


# -- batch four: scorer-evaluation completions + dedup audit --------------


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")


def test_brier_and_ece_hand_computed(spark, qs, tmp_path):
    """Two docs: 'a a dup b' -> score 750000 label 1 (e = 250000^2);
    'a b c d' -> score 1e6 label 0 (e = 1e12). Brier = 1.0625e12 /
    2e6 = 531250 ppm; conditional 62500 / 1000000. ECE bins 6 and 7:
    gaps 250000 and 1e6 -> ECE 625000, MCE 1000000."""
    d = str(tmp_path / "be_sf")
    _write_docs(spark, d, [(1, "a a dup b", 9), (2, "a b c d", 7)])
    b = qs["eval_brier_score"](spark, d).collect()[0]
    assert b["n"] == 2
    assert b["brier_ppm"] == 531_250
    assert (b["brier_pos_ppm"], b["brier_neg_ppm"]) == (62_500, 1_000_000)
    e = qs["eval_ece"](spark, d).collect()[0]
    assert (e["n"], e["n_bins"]) == (2, 2)
    assert (e["ece_ppm"], e["mce_ppm"]) == (625_000, 1_000_000)


def test_lift_gains_hand_computed(spark, qs, tmp_path):
    """Scores 1e6(0), 750k(1), 500k(1), 250k(0): deciles pick the
    first grid row reaching ceil(k*4/10) rows; full-depth decile 10
    must recover gain = lift = 1e6 exactly."""
    d = str(tmp_path / "lg_sf")
    _write_docs(spark, d, [
        (1, "a b c d", 7),      # 1e6, label 0
        (2, "a a dup b", 9),    # 750000, label 1
        (3, "dup dup a a", 11), # 500000, label 1
        (4, "a a a a", 7),      # 250000, label 0
    ])
    rows = {r["decile"]: r for r in qs["eval_lift_gains"](spark, d).collect()}
    assert len(rows) == 10
    assert (rows[1]["n_captured"], rows[1]["pos_captured"],
            rows[1]["gain_ppm"]) == (1, 0, 0)
    assert (rows[3]["n_captured"], rows[3]["pos_captured"],
            rows[3]["gain_ppm"], rows[3]["lift_ppm"]) == (
        2, 1, 500_000, 1_000_000)
    assert (rows[6]["n_captured"], rows[6]["pos_captured"],
            rows[6]["lift_ppm"]) == (3, 2, 1_333_333)
    assert (rows[10]["n_captured"], rows[10]["gain_ppm"],
            rows[10]["lift_ppm"]) == (4, 1_000_000, 1_000_000)
    # gains are monotone non-decreasing in depth
    gains = [rows[k]["gain_ppm"] for k in range(1, 11)]
    assert gains == sorted(gains)


def test_selection_bias_hand_computed(spark, qs, tmp_path):
    """Three copies of one text (bucket 0), a unique text (bucket 1),
    two copies of another (bucket 9): survive_ppm = 333333 / 1e6 /
    500000 — the skew the audit exists to surface."""
    d = str(tmp_path / "sb_sf")
    _write_docs(spark, d, [
        (1, "t one", 50), (2, "t one", 50), (3, "t one", 50),
        (4, "t two", 150),
        (5, "t three", 950), (6, "t three", 950),
    ])
    rows = {r["len_bucket"]: r
            for r in qs["dedup_selection_bias_report"](spark, d).collect()}
    assert (rows[0]["n_docs"], rows[0]["n_survivors"],
            rows[0]["survive_ppm"]) == (3, 1, 333_333)
    assert (rows[1]["n_docs"], rows[1]["survive_ppm"]) == (1, 1_000_000)
    assert (rows[9]["n_docs"], rows[9]["n_dropped"],
            rows[9]["survive_ppm"]) == (2, 1, 500_000)


def test_batch4_plan_shapes(spark, qs):
    for name in ("eval_brier_score", "eval_ece", "eval_lift_gains",
                 "dedup_selection_bias_report"):
        plan = physical_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
