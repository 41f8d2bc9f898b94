"""Round-7 batch ten: spectral embedding health — the dominant
principal component by power iteration (rows-only: one Arrow Gram-
partial pass + a driver-side iteration on the d x d matrix; float
partials are partition-order dependent, so no bit-exact oracle — the
loadings are pinned against numpy's dense eigensolver in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from dmds_spark.queries import register


@register("embedding_pca_power", None)  # float spectral: rows-only
def embedding_pca_power(spark, sf_dir):
    """Dominant principal component of the embedding table — the
    spectral health view behind whitening, anisotropy checks, and
    compression decisions (a top component explaining most variance
    means the embedding space collapsed toward a line — the classic
    anisotropic-embedding failure). Long format: one row per
    dimension with its loading, plus the shared eigenvalue/explained
    ratio (scalar columns per the driver contract).

    Scale shape (operators/similarity.principal_component): ONE Arrow
    scan emits per-task Gram partials (d + d^2 doubles per task),
    O(tasks) partials fold on the driver, and the power iteration
    runs on the tiny d x d covariance — data volume never touches the
    iteration. Sign fixed by the largest-|loading| convention."""
    from dmds_spark.operators.similarity import principal_component

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eigval, v, explained, n = principal_component(emb, "embedding")
    rows = [
        (i, float(x), float(eigval), float(explained), int(n))
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(
        rows, ["dim", "loading", "eigenvalue", "explained_ratio", "n_vecs"]
    )


# ---------------------------------------------------------------------------
# user-lifetime survival curve
# ---------------------------------------------------------------------------

_SURV_STEP = 7
_SURV_MAX = 70  # grid 0, 7, ..., 70 days


@register(
    "events_survival_curve",
    f"""
    WITH life AS (
      SELECT user_id,
             date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               AS lifetime_days
      FROM events GROUP BY user_id
    ), tot AS (SELECT COUNT(*) AS n FROM life)
    SELECT d AS day,
           CAST(SUM(CASE WHEN lifetime_days >= d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_surviving,
           CAST(MIN(tot.n) AS BIGINT) AS n_users,
           CAST(CAST(SUM(CASE WHEN lifetime_days >= d THEN 1 ELSE 0 END)
                     AS DOUBLE) / MIN(tot.n) AS DOUBLE) AS survival_rate
    FROM life, tot,
         (SELECT UNNEST(range(0, {_SURV_MAX + 1}, {_SURV_STEP})) AS d)
    GROUP BY d ORDER BY d
    """,
)
def events_survival_curve(spark, sf_dir):
    """User-lifetime survival curve: the share of users still active
    d days after their first event (lifetime = last minus first event
    day), sampled on a fixed 0..{_SURV_MAX}-by-{_SURV_STEP} day grid —
    the retention-survival primitive behind churn curves and LTV
    discounting (the observational flavor: no censoring model, the
    corpus window is the horizon). Exact integer day arithmetic; one
    ratio per grid point.

    Shape at scale: one user-keyed aggregate collapses the stream to
    |users| lifetimes; the fixed grid broadcasts and the curve folds
    in one pass — a calendar-bounded cross join, never per-event."""
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir)
    life = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .alias("lifetime_days")
    )
    tot = life.agg(F.count(F.lit(1)).alias("n"))
    grid = spark.createDataFrame(
        [(d,) for d in range(0, _SURV_MAX + 1, _SURV_STEP)], ["day"]
    )
    j = life.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(grid))
    return (
        j.groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("lifetime_days") >= F.col("day"), 1).otherwise(0)
            ).cast("bigint").alias("n_surviving"),
            F.min("n").cast("bigint").alias("n_users"),
            (
                F.sum(
                    F.when(
                        F.col("lifetime_days") >= F.col("day"), 1
                    ).otherwise(0)
                ).cast("double")
                / F.min("n")
            ).cast("double").alias("survival_rate"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# embedding centroid drift between two data halves
# ---------------------------------------------------------------------------


@register(
    "embedding_centroid_drift",
    """
    WITH r AS (
      SELECT vec_id % 2 AS half,
             UNNEST([{'pos': i - 1, 'x': embedding[i]}
                     for i in range(1, len(embedding) + 1)]) AS u
      FROM embeddings
    ), m AS (
      SELECT half, u.pos AS pos,
             ROUND(CAST(SUM(CAST(CAST(u.x AS DOUBLE) AS DECIMAL(28,12)))
                        AS DOUBLE) / COUNT(*), 6) AS m
      FROM r GROUP BY half, u.pos
    )
    SELECT CAST(a.pos AS INT) AS pos, a.m AS mean_a, b.m AS mean_b,
           ROUND(ABS(a.m - b.m), 6) AS drift
    FROM m a JOIN m b ON a.pos = b.pos AND a.half = 0 AND b.half = 1
    ORDER BY pos
    """,
)
def embedding_centroid_drift(spark, sf_dir):
    """Per-dimension centroid drift between two deterministic halves
    of the embedding table (vec_id parity — the stand-in for
    old-batch vs new-batch) — the embedding drift monitor: a model or
    preprocessing change shows up as per-dimension mean shift long
    before retrieval quality visibly degrades. Same exact machinery as
    embedding_centroids (decimal sums, one division, round-6 display),
    so the drift column is engine-identical; |a - b| of two identically
    rounded doubles is deterministic.

    One posexplode + one (half, pos) aggregate + a 2x64-row self-join
    — the monitoring query you schedule next to the incremental
    rollup refresh."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from dmds_spark.operators.similarity import centroids_long

    half = emb.withColumn("half", F.col("vec_id") % 2)
    m = centroids_long(half, "half", "embedding")
    a = m.filter(F.col("half") == 0).select(
        "pos", F.col("m").alias("mean_a")
    )
    b = m.filter(F.col("half") == 1).select(
        "pos", F.col("m").alias("mean_b")
    )
    return (
        a.join(b, "pos")
        .select(
            F.col("pos").cast("int").alias("pos"),
            "mean_a",
            "mean_b",
            F.round(F.abs(F.col("mean_a") - F.col("mean_b")), 6)
            .alias("drift"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# batch approx-percentile calibration (rows-only, completes the
# quantile side of the sketch-calibration family)
# ---------------------------------------------------------------------------


@register("agg_approx_percentile_calibration", None)
def agg_approx_percentile_calibration(spark, sf_dir):
    """Batch quantile-sketch calibration: per order status, the EXACT
    p50/p90 of integer cents against approx_percentile's estimate at
    accuracy 10000 (error <= n/accuracy ranks), with the absolute
    value gap — the acceptance row for every dashboard that will use
    the approx form at 100 TB (where the exact percentile's full sort
    per group is the thing being avoided). Rows-only: the sketch is
    Spark's GK implementation; the exact side anchors it. The
    STREAMING quantile family (streaming/quantiles.py) carries its own
    hard rank guarantee; this is the batch twin's measured check."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    v = o.select(
        "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    g = v.groupBy("o_orderstatus").agg(
        F.expr("percentile(cents, 0.5)").alias("exact_p50"),
        F.expr("percentile(cents, 0.9)").alias("exact_p90"),
        F.expr("approx_percentile(cents, 0.5, 10000)").alias("approx_p50"),
        F.expr("approx_percentile(cents, 0.9, 10000)").alias("approx_p90"),
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        F.col("exact_p50").cast("double").alias("exact_p50"),
        F.col("approx_p50").cast("bigint").alias("approx_p50"),
        F.abs(F.col("exact_p50") - F.col("approx_p50"))
        .cast("double").alias("gap_p50"),
        F.col("exact_p90").cast("double").alias("exact_p90"),
        F.col("approx_p90").cast("bigint").alias("approx_p90"),
        F.abs(F.col("exact_p90") - F.col("approx_p90"))
        .cast("double").alias("gap_p90"),
    ).orderBy("o_orderstatus")
