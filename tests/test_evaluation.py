"""Evaluation metrics (operators/evaluation.py): exactness against a
pure-Python reference (AUC with ties, P/R/F1, calibration), edge cases
(single-class AUC is NULL, zero-denominator P/R/F1 are NULL), and the
one-pass plan shape."""

from __future__ import annotations

from itertools import product

from pyspark.sql import Row

from dmds_spark.operators.evaluation import (
    PPM,
    auc_rank_sum,
    calibration_bins,
    confusion_at_threshold,
    pr_curve,
)

# (score_ppm, label) with deliberate ties within and across classes
DATA = [
    (100_000, 0), (200_000, 0), (200_000, 1), (300_000, 0),
    (300_000, 0), (300_000, 1), (700_000, 1), (700_000, 0),
    (900_000, 1), (900_000, 1), (100_000, 1), (500_000, 0),
]


def _df(spark, rows=DATA):
    return spark.createDataFrame(
        [Row(score=s, label=l) for s, l in rows], "score long, label long"
    )


def _auc_reference(rows):
    """Brute-force pairwise AUC: wins + half-ties over all pos x neg."""
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in product(pos, neg)
    )
    return len(pos), len(neg), int(wins * 2 * PPM) // (2 * len(pos) * len(neg))


def test_auc_matches_pairwise_reference(spark):
    row = auc_rank_sum(_df(spark), "score", "label").collect()[0]
    n_pos, n_neg, want = _auc_reference(DATA)
    assert (row["n_pos"], row["n_neg"], row["auc_ppm"]) == (
        n_pos, n_neg, want,
    )


def test_auc_single_class_is_null(spark):
    rows = [(100_000, 1), (200_000, 1)]
    row = auc_rank_sum(_df(spark, rows), "score", "label").collect()[0]
    assert row["auc_ppm"] is None and row["n_neg"] == 0


def test_confusion_prf_exact(spark):
    thr = 300_000
    row = confusion_at_threshold(_df(spark), "score", "label", thr).collect()[0]
    tp = sum(1 for s, l in DATA if s >= thr and l == 1)
    fp = sum(1 for s, l in DATA if s >= thr and l == 0)
    fn = sum(1 for s, l in DATA if s < thr and l == 1)
    tn = sum(1 for s, l in DATA if s < thr and l == 0)
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["precision_ppm"] == tp * PPM // (tp + fp)
    assert row["recall_ppm"] == tp * PPM // (tp + fn)
    assert row["f1_ppm"] == 2 * tp * PPM // (2 * tp + fp + fn)


def test_confusion_zero_denominators_are_null(spark):
    rows = [(100_000, 0), (200_000, 0)]  # no positives anywhere
    row = confusion_at_threshold(
        _df(spark, rows), "score", "label", 999_999
    ).collect()[0]
    assert row["precision_ppm"] is None  # tp+fp == 0
    assert row["recall_ppm"] is None     # tp+fn == 0
    assert row["f1_ppm"] is None


def test_calibration_bins_exact(spark):
    out = {
        r["bin"]: (r["n"], r["mean_score_ppm"], r["pos_rate_ppm"])
        for r in calibration_bins(_df(spark), "score", "label", 4).collect()
    }
    # bin = floor(score*4/1e6) capped at 3
    bins = {}
    for s, l in DATA:
        b = min(s * 4 // PPM, 3)
        bins.setdefault(b, []).append((s, l))
    want = {
        b: (
            len(v),
            sum(s for s, _ in v) // len(v),
            sum(l for _, l in v) * PPM // len(v),
        )
        for b, v in bins.items()
    }
    assert out == want
    # the top score (exactly PPM would hit bin 4) is capped into bin 3
    assert max(out) == 3


def test_pr_curve_matches_brute_force(spark):
    out = {
        r["threshold"]: (r["tp"], r["fp"], r["precision_ppm"],
                         r["recall_ppm"])
        for r in pr_curve(_df(spark), "score", "label").collect()
    }
    n_pos = sum(l for _, l in DATA)
    for t in sorted({s for s, _ in DATA}):
        tp = sum(1 for s, l in DATA if s >= t and l == 1)
        fp = sum(1 for s, l in DATA if s >= t and l == 0)
        assert out[t] == (
            tp, fp, tp * PPM // (tp + fp), tp * PPM // n_pos,
        )
    assert len(out) == len({s for s, _ in DATA})


def test_confusion_is_one_scan(spark):
    from dmds_spark.plans import scan_count

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = confusion_at_threshold(
        df.selectExpr("n_chars * 100 AS score", "doc_id % 2 AS label"),
        "score", "label", 50_000,
    )
    assert scan_count(rep) == 1
