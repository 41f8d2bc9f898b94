"""Round-7 batch eight: SCD2 dimension LOOKUP — the consumption side
of the events_scd2_intervals build. Enriching facts with the dimension
version valid at fact time is THE slowly-changing-dimension join, and
because SCD2 intervals partition each key's timeline, the lookup is
exactly an AS-OF join against the interval STARTS — no interval
explode, no range join, one sort-shuffle (the asof_join operator).
Oracle-checked via DuckDB's native ASOF join.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register


@register(
    "join_scd2_lookup",
    """
    WITH dim AS (
      SELECT * FROM events WHERE event_type <> 'purchase'
    ), o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM dim
    ), flagged AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM o
    ), runs AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
      FROM flagged
    ), iv AS (
      SELECT user_id, event_type AS regime_type, run_id,
             MIN(epoch_us(ts)) AS valid_from_us
      FROM runs GROUP BY user_id, event_type, run_id
    ), starts AS (
      SELECT user_id, regime_type, valid_from_us FROM (
        SELECT user_id, regime_type, valid_from_us,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id, valid_from_us
                 ORDER BY regime_type) AS rn
        FROM iv
      ) WHERE rn = 1
    ), p AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(s.regime_type, 'none') AS regime_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
           CAST(SUM(p.v) AS DOUBLE) AS total_value
    FROM p ASOF LEFT JOIN starts s
      ON p.user_id = s.user_id AND p.ts_us >= s.valid_from_us
    GROUP BY COALESCE(s.regime_type, 'none')
    ORDER BY regime_type
    """,
)
def join_scd2_lookup(spark, sf_dir):
    """SCD2 LOOKUP: every purchase (the fact stream) enriched with the
    BROWSING regime — SCD2 intervals built from the user's non-purchase
    events, the dimension stream — valid at purchase time, rolled up
    per regime ("what state was the user in when they bought") — the
    fact-joined-to-dimension-version-as-of-fact-time query every
    warehouse runs. KEY INSIGHT for scale: SCD2 intervals PARTITION
    the per-key timeline, so "ts within [valid_from, valid_to)" is
    equivalent to "latest valid_from <= ts" — an AS-OF join against
    interval STARTS. No interval explode (open intervals would explode
    unboundedly in a binned range join), no theta join: one union +
    one (user, time) sort-shuffle via operators.relational.asof_join.

    Interval starts are deduped per (user, valid_from) with a total
    order (two runs can start on the same timestamp via event-time
    ties), so the as-of pick is engine-deterministic; money folds in
    DECIMAL. Purchases
    before a user's first dimension event take the explicit 'none'
    regime (dtype-stable, no NULL group)."""
    from dmds_spark.operators.relational import asof_join
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir)
    dim = ev.filter(F.col("event_type") != "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = dim.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    iv = runs.groupBy(
        "user_id", F.col("event_type").alias("regime_type"), "run_id"
    ).agg(F.min(F.unix_micros(F.col("ts"))).alias("valid_from_us"))
    w2 = W.partitionBy("user_id", "valid_from_us").orderBy("regime_type")
    starts = (
        iv.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "regime_type", F.col("valid_from_us").alias("ts_us")
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    enriched = asof_join(
        p, starts, on="ts_us", by=["user_id"],
        right_value_cols=["regime_type"],
    )
    return (
        enriched.withColumn(
            "regime_type", F.coalesce("regime_type", F.lit("none"))
        )
        .groupBy("regime_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .orderBy("regime_type")
    )
