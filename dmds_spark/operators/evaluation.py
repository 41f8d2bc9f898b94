"""Classifier-evaluation metrics for quality filters — exact integer
arithmetic end to end (ppm), so AUC / precision / recall / calibration
hash-match a declarative oracle bit-for-bit.

A training-data pipeline ships scorers (LM keep gates, quality
heuristics, dedup confidence) whose thresholds must be justified;
these are the evaluation primitives that justify them, computed
distributed:

- ``auc_rank_sum``: exact ROC AUC via the Mann-Whitney U statistic on
  GROUPED scores — ties handled exactly by the per-group
  ``pos_g * neg_g / 2`` term (kept integral as 2U). The only window
  runs over the distinct-score grain, which is BOUNDED (ppm scores
  have <= 1e6+1 distinct values at any corpus size), never over rows.
- ``confusion_at_threshold``: one aggregation pass -> tp/fp/fn/tn and
  exact-ppm precision/recall/F1 (F1 = 2tp/(2tp+fp+fn), one floor-div,
  no intermediate float).
- ``calibration_bins``: reliability diagram on equal-width ppm bins,
  one aggregation pass; a well-calibrated scorer has
  pos_rate_ppm tracking mean_score_ppm per bin.

All metrics take an integer score column in [0, 1e6] (ppm) and a 0/1
label column — the pipeline's scorers already emit exact-ppm integers
for oracle stability, so this composes for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from dmds_spark.core.exact import PPM, floor_scaled_div as _floor_div


def auc_rank_sum(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC (probability a random positive outscores a random
    negative, ties counted half). One row: n_pos, n_neg, auc_ppm.
    Undefined AUC (a class is empty) surfaces as NULL, not a crash."""
    g = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__pos"),
        F.count(F.lit(1)).alias("__n"),
    ).withColumn("__neg", F.col("__n") - F.col("__pos"))
    # running negatives strictly below this score group: the window is
    # over DISTINCT scores (<= 1e6+1 groups for ppm scores) — bounded,
    # never corpus-sized
    w = W.orderBy("__s").rowsBetween(W.unboundedPreceding, -1)
    g = g.withColumn(
        "__neg_below", F.coalesce(F.sum("__neg").over(w), F.lit(0))
    )
    # every product in DECIMAL before multiplying: 2*pos*neg_below and
    # 2*n_pos*n_neg overflow long once each class passes ~2^31 rows —
    # exactly the corpus scale this module targets
    tot = g.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.sum(
            F.expr(
                "CAST(2 AS DECIMAL(38,0)) * __pos * __neg_below"
                " + CAST(__pos AS DECIMAL(38,0)) * __neg"
            )
        ).alias("__two_u"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr(
                f"(CAST(__two_u AS DECIMAL(38,0)) * {PPM})"
                " div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)"
            ),
        )
        .cast("long")
        .alias("auc_ppm"),
    )


def confusion_at_threshold(
    df: DataFrame, score_col: str, label_col: str, threshold_ppm: int
) -> DataFrame:
    """Confusion matrix + exact-ppm P/R/F1 at ``score >= threshold``.
    One aggregation pass; one row."""
    pred = F.col(score_col) >= F.lit(threshold_ppm)
    lab = F.col(label_col) == 1
    one = df.agg(
        F.sum(F.when(pred & lab, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~lab, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & lab, 1).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when(~pred & ~lab, 1).otherwise(0)).cast("long").alias("tn"),
    )
    return one.select(
        "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") > 0, _floor_div("tp", "tp + fp"))
        .cast("long").alias("precision_ppm"),
        F.when(F.col("tp") + F.col("fn") > 0, _floor_div("tp", "tp + fn"))
        .cast("long").alias("recall_ppm"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.expr(
                f"(CAST(tp AS DECIMAL(38,0)) * 2 * {PPM}) "
                f"div (2 * tp + fp + fn)"
            ),
        ).cast("long").alias("f1_ppm"),
    )


def pr_curve(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Precision/recall at EVERY operating point ``score >= t`` for t
    over the distinct observed scores — the full curve behind a
    threshold choice, one row per distinct score (bounded: ppm scores
    have <= 1e6+1 distinct values at any corpus size). tp/fp at each
    threshold are descending cumulative sums over the grouped score
    table — the same bounded-window shape as ``auc_rank_sum``; the
    corpus is touched by ONE hash aggregate."""
    g = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__pos"),
        F.count(F.lit(1)).alias("__n"),
    )
    w = W.orderBy(F.col("threshold").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    g = g.withColumn("tp", F.sum("__pos").over(w).cast("long")).withColumn(
        "fp", (F.sum("__n").over(w) - F.col("tp")).cast("long")
    )
    # total positives from the GROUPED table (<= 1e6+1 rows), not a
    # second pass over df — the "ONE hash aggregate" contract above
    total_pos = g.agg(F.sum("__pos").cast("long").alias("__np"))
    return (
        g.crossJoin(F.broadcast(total_pos))
        .select(
            F.col("threshold").cast("long").alias("threshold"),
            "tp",
            "fp",
            _floor_div("tp", "tp + fp").cast("long").alias("precision_ppm"),
            F.when(F.col("__np") > 0, _floor_div("tp", "__np"))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Reliability diagram: equal-width ppm score bins -> per-bin count,
    exact mean score and positive rate (both ppm). One aggregation;
    n_bins output rows (empty bins absent)."""
    # integer floor: (score * n_bins) div PPM, capped at the last bin
    b = F.least(
        F.expr(f"(CAST({score_col} AS DECIMAL(38,0)) * {n_bins}) div {PPM}"),
        F.lit(n_bins - 1),
    ).cast("long")
    g = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(score_col).cast("decimal(38,0)")).alias("__ssum"),
        F.sum(F.col(label_col).cast("long")).alias("__pos"),
    )
    return g.select(
        "bin",
        "n",
        F.expr("__ssum div n").cast("long").alias("mean_score_ppm"),
        _floor_div("__pos", "n").cast("long").alias("pos_rate_ppm"),
    )
