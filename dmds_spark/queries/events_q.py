"""Event-stream analytics: strict sequential funnel and weekly
retention cohorts — the two query shapes every product-analytics
workload runs over an events table. Both are pure aggregate/join
plans (no windows over the full stream, no per-user UDFs), and both
are oracle-checked.

Registered after llm_extra2: the driver's 50-query correctness window
is reserved for the round-1-unchecked set this round; these queue for
round 3 with local oracle coverage meanwhile (tests/test_oracle.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.sources.registry import load_events


@register(
    "events_funnel_steps",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS step, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
    UNION ALL
    SELECT 2, CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    """,
)
def events_funnel_steps(spark, sf_dir):
    """Strict sequential funnel view -> click -> purchase: a user
    counts at step N only with an event strictly after their step-N-1
    time. Three aggregate passes chained by equi-joins (the standard
    funnel plan); each pass shuffles on user_id so AQE reuses the
    partitioning, and each stage's input is pre-filtered to one event
    type before the join (predicate pushdown to the scan).

    Scale shape: per-step state is one row per surviving user (never
    the raw event stream); joins are user_id equi-joins that shrink
    monotonically down the funnel. No window over the full stream —
    a per-user sort-window funnel at 100 TB would shuffle every event;
    this shape moves each event exactly once per step it can satisfy.
    """
    from dmds_spark.operators.events import sequential_funnel

    e = load_events(spark, sf_dir)
    return sequential_funnel(e, ["view", "click", "purchase"])


@register(
    "events_retention_cohorts",
    """
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS aw
      FROM events
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST((aw - cw) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY cw, (aw - cw) // 7
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users cohorted by first-seen week,
    counted in every later week they were active. Both week columns
    are Monday-truncated dates in both engines, so the day difference
    is an exact multiple of 7 and the offset is integer-exact. The
    cohort week is emitted as a 'yyyy-MM-dd' string: a DATE column
    round-trips as pandas Timestamp on one engine and datetime.date on
    the other, which breaks representation-level hash compares even
    when the values are equal.

    Scale shape: cohort table is one row per user (min-agg, map-side
    partial); activity is DISTINCT (user, week) — both shuffles are on
    user_id and the join reuses that partitioning. The output is
    cohort-weeks x offsets, tiny at any corpus size.
    """
    e = load_events(spark, sf_dir)
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("aw")
    ).distinct()
    off = (F.datediff("aw", "cw") / 7).cast("bigint")
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            off.alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("users"))
    )
