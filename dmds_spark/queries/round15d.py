"""Round-15 queries, batch four: the scorer-evaluation completions
(Brier score, expected/maximum calibration error, the decile
lift/gains table — the three numbers every filter-threshold review
asks for beside AUC/PR), and the dedup selection-bias
report (does keep-first dedup skew the surviving corpus?). Exact-ppm
integers throughout, reusing round-12f's scored-corpus fixture so
every evaluation metric grades the SAME scorer."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.round12f import _SCORED_SQL, _scored


# ---------------------------------------------------------------------------
# Brier score
# ---------------------------------------------------------------------------


@register(
    "eval_brier_score",
    f"""
    WITH {_SCORED_SQL},
    e AS (
      SELECT label,
             CAST(score - label * 1000000 AS HUGEINT)
             * (score - label * 1000000) AS sq
      FROM scored
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(sq) // (COUNT(*) * 1000000) AS BIGINT) AS brier_ppm,
           CAST(SUM(CASE WHEN label = 1 THEN sq ELSE 0 END)
                // (SUM(label) * 1000000) AS BIGINT) AS brier_pos_ppm,
           CAST(SUM(CASE WHEN label = 0 THEN sq ELSE 0 END)
                // (SUM(1 - label) * 1000000) AS BIGINT) AS brier_neg_ppm
    FROM e
    """,
)
def eval_brier_score(spark, sf_dir):
    """Brier score of the diversity scorer against the planted
    near-dup label (Brier 1950): mean squared error of the ppm score
    as a probability — the PROPER scoring rule that punishes both
    miscalibration and indiscrimination in one number (AUC cannot see
    calibration; the reliability diagram cannot rank). Per-class
    conditional Briers localize the damage. Exact: per-row
    (score - 1e6*label)^2 is an integer <= 1e12, summed in HUGEINT/
    decimal(38,0), one floor by n*1e6.

    Shape at scale: ONE aggregation pass over the scored corpus —
    four sums, zero windows, zero joins."""
    from dmds_spark.operators.relational import exact_floordiv

    s = _scored(spark, sf_dir)
    sq = (
        (F.col("score") - F.col("label") * 1_000_000)
        .cast("decimal(38,0)")
        * (F.col("score") - F.col("label") * 1_000_000)
    )
    a = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sq).cast("decimal(38,0)").alias("sq_all"),
        F.sum(F.when(F.col("label") == 1, sq).otherwise(
            F.lit(0).cast("decimal(38,0)"))).cast("decimal(38,0)")
        .alias("sq_pos"),
        F.sum(F.when(F.col("label") == 0, sq).otherwise(
            F.lit(0).cast("decimal(38,0)"))).cast("decimal(38,0)")
        .alias("sq_neg"),
        F.sum("label").cast("decimal(38,0)").alias("n_pos"),
        F.sum(F.lit(1) - F.col("label")).cast("decimal(38,0)")
        .alias("n_neg"),
    )
    return a.select(
        F.col("n").cast("bigint").alias("n"),
        exact_floordiv(
            F.col("sq_all"),
            F.col("n").cast("decimal(38,0)") * F.lit(1_000_000),
        ).cast("bigint").alias("brier_ppm"),
        exact_floordiv(
            F.col("sq_pos"), F.col("n_pos") * F.lit(1_000_000)
        ).cast("bigint").alias("brier_pos_ppm"),
        exact_floordiv(
            F.col("sq_neg"), F.col("n_neg") * F.lit(1_000_000)
        ).cast("bigint").alias("brier_neg_ppm"),
    )


# ---------------------------------------------------------------------------
# expected / maximum calibration error
# ---------------------------------------------------------------------------

_ECE_BINS = 8


@register(
    "eval_ece",
    f"""
    WITH {_SCORED_SQL},
    b AS (
      SELECT LEAST(score * {_ECE_BINS} // 1000000, {_ECE_BINS - 1})
               AS bin, score, label
      FROM scored
    ), per AS (
      SELECT bin, COUNT(*) AS nb,
             abs(CAST(SUM(label) AS HUGEINT) * 1000000 - SUM(score))
               AS gap
      FROM b GROUP BY bin
    )
    SELECT CAST(SUM(nb) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(gap) // SUM(nb) AS BIGINT) AS ece_ppm,
           CAST(MAX(gap // nb) AS BIGINT) AS mce_ppm
    FROM per
    """,
)
def eval_ece(spark, sf_dir):
    """Expected and maximum calibration error of the diversity scorer
    (Naeini et al. 2015) over the same equal-width ppm bins as
    eval_calibration_bins: ECE = sum_b (n_b/N)|acc_b - conf_b|
    collapses the reliability diagram to the headline number, MCE to
    its worst bin. Exact: per bin the gap |1e6*pos_b - sum(score_b)|
    is an integer (both terms are 1e6-scaled sums), ECE is one floor
    by N, MCE the max of per-bin floors — no per-row division
    anywhere.

    Shape at scale: one hash aggregate to <= {_ECE_BINS} bin rows,
    then a 1-row fold."""
    from dmds_spark.operators.relational import exact_floordiv

    s = _scored(spark, sf_dir)
    b = s.select(
        F.least(
            F.expr(f"score * {_ECE_BINS} div 1000000"),
            F.lit(_ECE_BINS - 1),
        ).alias("bin"),
        "score",
        "label",
    )
    per = b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"),
        F.abs(
            F.sum("label").cast("decimal(38,0)") * 1_000_000
            - F.sum("score")
        ).cast("decimal(38,0)").alias("gap"),
    )
    return per.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        exact_floordiv(
            F.sum("gap").cast("decimal(38,0)"),
            F.sum("nb").cast("decimal(38,0)"),
        ).cast("bigint").alias("ece_ppm"),
        F.max(exact_floordiv(F.col("gap"), F.col("nb")))
        .cast("bigint").alias("mce_ppm"),
    )


# ---------------------------------------------------------------------------
# decile lift / gains table
# ---------------------------------------------------------------------------


@register(
    "eval_lift_gains",
    f"""
    WITH {_SCORED_SQL},
    g AS (
      SELECT score, SUM(label) AS pos, COUNT(*) AS n
      FROM scored GROUP BY score
    ), c AS (
      SELECT score,
             SUM(n) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(pos) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
      FROM g
    ), t AS (SELECT COUNT(*) AS nn, SUM(label) AS pp FROM scored),
    d AS (SELECT k.k AS decile FROM UNNEST(range(1, 11)) AS k(k)),
    pick AS (
      SELECT d.decile,
             MIN(c.cum_n) AS n_captured,
             min_by(c.cum_pos, c.cum_n) AS pos_captured
      FROM d CROSS JOIN t
      JOIN c ON c.cum_n >= (d.decile * t.nn + 9) // 10
      GROUP BY d.decile
    )
    SELECT CAST(p.decile AS BIGINT) AS decile,
           CAST(p.n_captured AS BIGINT) AS n_captured,
           CAST(p.pos_captured AS BIGINT) AS pos_captured,
           CAST(CAST(p.pos_captured AS HUGEINT) * 1000000 // t.pp
                AS BIGINT) AS gain_ppm,
           CAST(CAST(p.pos_captured AS HUGEINT) * t.nn * 1000000
                // (p.n_captured * t.pp) AS BIGINT) AS lift_ppm
    FROM pick p CROSS JOIN t
    ORDER BY decile
    """,
)
def eval_lift_gains(spark, sf_dir):
    """Decile gains/lift table of the diversity scorer — the campaign-
    targeting view of ranking quality: take the top k/10 of the corpus
    by score, report positives captured (gains) and capture rate vs
    the base rate (lift). Tie-exact: deciles are read off the
    distinct-score cumulative grid (each boundary is the FIRST grid
    row reaching ceil(k*N/10) rows — ties never split, so n_captured
    reports the actual row count), cum_n is strictly increasing so the
    min_by pick is deterministic.

    Shape at scale: one hash aggregate to the bounded ppm-score grid,
    one cumulative window over it, a 10-row pick join — the corpus is
    scanned once."""
    from dmds_spark.core.engine import materialize
    from dmds_spark.operators.relational import exact_floordiv

    s = _scored(spark, sf_dir).transform(materialize)  # grid + totals
    g = s.groupBy("score").agg(
        F.sum("label").alias("pos"), F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    c = g.select(
        "score",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    t = s.agg(
        F.count(F.lit(1)).alias("nn"), F.sum("label").alias("pp")
    )
    d = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    pick = (
        d.crossJoin(F.broadcast(t))
        .join(
            c,
            F.col("cum_n")
            >= F.expr("(decile * nn + 9) div 10"),
        )
        .groupBy("decile", "nn", "pp")
        .agg(
            F.min("cum_n").alias("n_captured"),
            F.min_by("cum_pos", F.col("cum_n")).alias("pos_captured"),
        )
    )
    return pick.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_captured").cast("bigint").alias("n_captured"),
        F.col("pos_captured").cast("bigint").alias("pos_captured"),
        exact_floordiv(
            F.col("pos_captured").cast("decimal(38,0)") * F.lit(1_000_000),
            F.col("pp"),
        ).cast("bigint").alias("gain_ppm"),
        exact_floordiv(
            F.col("pos_captured").cast("decimal(38,0)")
            * F.col("nn") * F.lit(1_000_000),
            F.col("n_captured").cast("decimal(38,0)") * F.col("pp"),
        ).cast("bigint").alias("lift_ppm"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# dedup selection-bias report
# ---------------------------------------------------------------------------


@register(
    "dedup_selection_bias_report",
    """
    WITH canon AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS k
      FROM documents GROUP BY md5(text)
    ), tagged AS (
      SELECT d.doc_id, LEAST(d.n_chars // 100, 9) AS len_bucket,
             CASE WHEN d.doc_id = c.keeper THEN 1 ELSE 0 END AS kept
      FROM documents d JOIN canon c ON c.h = md5(d.text)
    )
    SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_survivors,
           CAST(SUM(1 - kept) AS BIGINT) AS n_dropped,
           CAST(CAST(SUM(kept) AS HUGEINT) * 1000000 // COUNT(*)
                AS BIGINT) AS survive_ppm
    FROM tagged GROUP BY len_bucket
    """,
)
def dedup_selection_bias_report(spark, sf_dir):
    """Selection-bias audit of exact keep-first dedup: per document-
    length bucket, how many documents survive vs drop — the check
    that deduplication is not silently reshaping the corpus's length
    (and therefore topic/quality) distribution before training. A
    uniform survive_ppm across buckets means dedup is length-neutral;
    a skewed column is the early warning every corpus release should
    carry (the same audit generalizes to any quality column).

    Shape at scale: the canonical-per-hash aggregate is the dedup
    pass itself (one hash shuffle on md5); the tag join keys on the
    same md5 column (co-partitioned with the aggregate's exchange)
    and the bucket rollup is 10 rows — one extra aggregate over work
    dedup already does."""
    from dmds_spark.operators.relational import exact_floordiv

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars", F.md5("text").alias("h")
    )
    canon = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    tagged = d.join(canon, "h").select(
        F.least(F.expr("n_chars div 100"), F.lit(9)).alias("len_bucket"),
        F.when(F.col("doc_id") == F.col("keeper"), 1).otherwise(0)
        .alias("kept"),
    )
    return tagged.groupBy("len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("kept").cast("bigint").alias("n_survivors"),
        F.sum(F.lit(1) - F.col("kept")).cast("bigint").alias("n_dropped"),
        exact_floordiv(
            F.sum("kept").cast("decimal(38,0)") * F.lit(1_000_000),
            F.count(F.lit(1)),
        ).cast("bigint").alias("survive_ppm"),
    ).select(
        F.col("len_bucket").cast("bigint").alias("len_bucket"),
        "n_docs", "n_survivors", "n_dropped", "survive_ppm",
    )
