"""Round-7 batch seven: XYZ demand-variability classification (the
inventory-planning complement of the Pareto/ABC revenue classes —
coefficient-of-variation bands decided by integer cross-multiplication,
no sqrt, no float thresholds) and Count-Min-Sketch calibration (the
overcount-only sketch family completing the HLL/GK/Misra-Gries
calibration set; rows-only — sketch internals are engine-specific).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register


@register(
    "parts_xyz_classification",
    """
    WITH m AS (
      SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS mon,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ), s AS (
      SELECT l_partkey, COUNT(*) AS n, SUM(q) AS s1, SUM(q * q) AS s2
      FROM m GROUP BY l_partkey
    ), cls AS (
      SELECT l_partkey, n,
             CASE
               WHEN n < 2 THEN 'Z'
               WHEN 4 * (n * s2 - s1 * s1) <= s1 * s1 THEN 'X'
               WHEN n * s2 - s1 * s1 <= s1 * s1 THEN 'Y'
               ELSE 'Z'
             END AS xyz
      FROM s
    )
    SELECT xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(n) AS BIGINT) AS part_months,
           CAST(MIN(n) AS BIGINT) AS min_months,
           CAST(MAX(n) AS BIGINT) AS max_months
    FROM cls GROUP BY xyz ORDER BY xyz
    """,
)
def parts_xyz_classification(spark, sf_dir):
    """XYZ classification of demand variability per part — the
    inventory-planning axis orthogonal to Pareto/ABC revenue share: X
    = steady demand (coefficient of variation <= 0.5 over the part's
    observed monthly quantities), Y = variable (cv <= 1), Z = erratic
    (cv > 1, or seen in fewer than 2 months — no variance estimate).
    The cv bands need NO sqrt and NO float threshold: cv <= t over
    population variance is (n*s2 - s1^2)/s1^2 <= t^2, and with t in
    {1/2, 1} the test cross-multiplies to exact int64 comparisons
    (4*(n*s2 - s1^2) <= s1^2, resp. n*s2 - s1^2 <= s1^2).

    Shape at scale: one (part, month) aggregate, one part-keyed fold,
    one tiny class rollup — all partial-aggregated; no window, no
    join. The same two-moment machinery as lineitem_corr_components,
    applied per key."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = li.groupBy(
        "l_partkey",
        F.date_format(F.to_date("l_shipdate"), "yyyy-MM").alias("mon"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    s = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    varnum = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    s1sq = F.col("s1") * F.col("s1")
    cls = s.select(
        "n",
        F.when(F.col("n") < 2, "Z")
        .when(4 * varnum <= s1sq, "X")
        .when(varnum <= s1sq, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        cls.groupBy("xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("n").cast("bigint").alias("part_months"),
            F.min("n").cast("bigint").alias("min_months"),
            F.max("n").cast("bigint").alias("max_months"),
        )
        .orderBy("xyz")
    )


@register("agg_cms_calibration", None)
def agg_cms_calibration(spark, sf_dir):
    """Count-Min-Sketch calibration: per event type, the exact count,
    the CMS estimate (eps=0.01, confidence=0.95 — KB-sized sketch),
    and the signed error in ppm — completing the sketch calibration
    family (HLL for distincts, GK for quantiles, Misra-Gries for
    heavy hitters, CMS for frequencies). CMS is OVERCOUNT-ONLY
    (estimate >= true, collisions only add) — asserted in the output
    via the over_ok flag and pinned in tests. Rows-only: the sketch
    layout is Spark's DataSketches build, which DuckDB does not share.

    Shape: the sketch folds in one pass (merge-combine per partition,
    KB per task); only the |event-type|-sized estimate table touches
    the driver. The exact side is the same one aggregate every
    engine pays — the sketch's value shows when keys number in the
    billions, not five."""
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir).select(
        F.col("event_type").cast("string").alias("event_type")
    )
    # pyspark 4 has no Python wrapper for countMinSketch; the Scala
    # DataFrameStatFunctions one is reachable through the JVM handle
    # (same distributed one-pass build, KB-sized result to the driver)
    cms = ev._jdf.stat().countMinSketch("event_type", 0.01, 0.95, 42)
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    rows = [
        (r["event_type"], int(r["exact_cnt"]))
        for r in exact.collect()  # |event types| rows — driver-safe
    ]
    report = [
        (
            k,
            c,
            int(cms.estimateCount(k)),
            int((int(cms.estimateCount(k)) - c) * 1_000_000 // max(c, 1)),
            1 if int(cms.estimateCount(k)) >= c else 0,
        )
        for k, c in sorted(rows)
    ]
    return spark.createDataFrame(
        report,
        ["event_type", "exact_cnt", "cms_estimate", "error_ppm", "over_ok"],
    )
