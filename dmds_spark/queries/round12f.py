"""Round-12 queries, batch six: classifier-evaluation metrics
(operators/evaluation.py) — the numbers that justify a quality
filter's threshold, computed distributed and EXACT (ppm integers, no
libm): rank-sum ROC AUC with exact tie handling, confusion + P/R/F1 at
a threshold, and the calibration reliability diagram.

The evaluated scorer here is lexical diversity (distinct tokens /
tokens, in ppm) and the label is the corpus's planted near-duplicate
marker (docs carrying the 'dup' token, 5% of the corpus). The honest
finding the report returns: diversity lands at CHANCE (auc_ppm 468378
at sf0.01) — it does not detect the planted dups. That is the
evaluation harness doing its job: rejecting a useless filter with an
exact number before it ships is precisely what these metrics are for
(tests pin the metric math itself against a pure-Python reference,
ties included).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.evaluation import (
    auc_rank_sum,
    calibration_bins,
    confusion_at_threshold,
    pr_curve,
)
from dmds_spark.queries import register

_THR = 330_000  # confusion threshold on the diversity score
_BINS = 8

# score: floor(1e6 * distinct_tokens / tokens); label: has 'dup' token
_SCORED_SQL = """
    scored AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                  // len(string_split(text, ' ')) AS BIGINT) AS score,
             CASE WHEN list_contains(string_split(text, ' '), 'dup')
                  THEN 1 ELSE 0 END AS label
      FROM documents
    )
"""


def _scored(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.expr(
            "(CAST(size(array_distinct(split(text, ' '))) AS DECIMAL(38,0))"
            " * 1000000) div size(split(text, ' '))"
        ).cast("long").alias("score"),
        F.array_contains(toks, "dup").cast("long").alias("label"),
    )


@register(
    "eval_auc_rank_sum",
    f"""
    WITH {_SCORED_SQL},
    g AS (
      SELECT score AS s, sum(label) AS pos, count(*) AS n
      FROM scored GROUP BY score
    ),
    r AS (
      SELECT s, pos, n - pos AS neg,
             COALESCE(sum(n - pos) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM g
    )
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(neg) AS BIGINT) AS n_neg,
           CAST(sum(2 * pos * neg_below + pos * neg) * 1000000
                // (2 * sum(pos) * sum(neg)) AS BIGINT) AS auc_ppm
    FROM r
    """,
)
def eval_auc_rank_sum(spark, sf_dir):
    """Exact ROC AUC of the diversity scorer against the planted
    near-dup label, via grouped Mann-Whitney U (ties exact). The
    window runs over distinct ppm scores — bounded at any corpus
    size — so the metric scales as two hash aggregates + a tiny
    window, never a corpus sort. The value lands at chance — the
    harness's honest verdict on this scorer (see module docstring)."""
    return auc_rank_sum(_scored(spark, sf_dir), "score", "label")


@register(
    "eval_confusion_prf",
    f"""
    WITH {_SCORED_SQL},
    m AS (
      SELECT
        sum(CASE WHEN score >= {_THR} AND label = 1 THEN 1 ELSE 0 END) AS tp,
        sum(CASE WHEN score >= {_THR} AND label = 0 THEN 1 ELSE 0 END) AS fp,
        sum(CASE WHEN score < {_THR} AND label = 1 THEN 1 ELSE 0 END) AS fn,
        sum(CASE WHEN score < {_THR} AND label = 0 THEN 1 ELSE 0 END) AS tn
      FROM scored
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT) END
             AS precision_ppm,
           CASE WHEN tp + fn > 0
                THEN CAST(tp * 1000000 // (tp + fn) AS BIGINT) END
             AS recall_ppm,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(tp * 2 * 1000000 // (2 * tp + fp + fn) AS BIGINT)
                END AS f1_ppm
    FROM m
    """,
)
def eval_confusion_prf(spark, sf_dir):
    """Confusion matrix + exact-ppm precision/recall/F1 at the
    score >= 330000 operating point — ONE aggregation pass over the
    scored corpus, the threshold-justification row a filter ships
    with."""
    return confusion_at_threshold(_scored(spark, sf_dir), "score", "label", _THR)


@register(
    "eval_calibration_bins",
    f"""
    WITH {_SCORED_SQL},
    b AS (
      SELECT LEAST(score * {_BINS} // 1000000, {_BINS - 1}) AS bin,
             score, label
      FROM scored
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(score) // count(*) AS BIGINT) AS mean_score_ppm,
           CAST(sum(label) * 1000000 // count(*) AS BIGINT) AS pos_rate_ppm
    FROM b GROUP BY bin
    """,
)
def eval_calibration_bins(spark, sf_dir):
    """Reliability diagram of the diversity scorer on equal-width ppm
    bins: per-bin exact mean score vs positive rate — one aggregation,
    <= 8 output rows regardless of corpus size."""
    return calibration_bins(_scored(spark, sf_dir), "score", "label", _BINS)


@register(
    "eval_pr_curve",
    f"""
    WITH {_SCORED_SQL},
    g AS (
      SELECT score AS threshold, sum(label) AS pos, count(*) AS n
      FROM scored GROUP BY score
    ),
    c AS (
      SELECT threshold,
             sum(pos) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n) OVER (ORDER BY threshold DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - sum(pos) OVER (ORDER BY threshold DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM g
    ),
    np AS (SELECT sum(label) AS total_pos FROM scored)
    SELECT CAST(threshold AS BIGINT) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_ppm,
           CASE WHEN np.total_pos > 0
                THEN CAST(tp * 1000000 // np.total_pos AS BIGINT) END
             AS recall_ppm
    FROM c CROSS JOIN np
    """,
)
def eval_pr_curve(spark, sf_dir):
    """The full precision/recall curve of the diversity scorer — one
    exact-ppm row per distinct observed score (the operating points a
    threshold choice picks from). One hash aggregate over the corpus;
    the cumulative sums run over the bounded distinct-score grid."""
    return pr_curve(_scored(spark, sf_dir), "score", "label")
