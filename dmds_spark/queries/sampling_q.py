"""Deterministic-sampling queries (training-data pipeline surface).
Hash-mod sampling is the only sampling that is reproducible across
engines/partitionings at 100 TB — see operators/sampling.py. The
DuckDB oracle computes the identical buckets via
``('0x' || substr(md5(k),1,15))::BIGINT`` = Spark's
``conv(substring(md5(k),1,15),16,10)``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from dmds_spark.queries import register
from dmds_spark.queries.relational import T

_BUCKET_SQL = (
    "(('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 15))::BIGINT % 10000)"
)


@register(
    "sample_hash_10pct",
    f"""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE {_BUCKET_SQL.format(k='o_orderkey')} < 1000
    """,
)
def sample_hash_10pct(spark, sf_dir):
    """10% deterministic sample of orders keyed on o_orderkey — a pure
    scan filter (no shuffle, no RNG state); re-running on any
    partitioning yields the identical sample, and sampling lineitem on
    l_orderkey with the same rate keeps the orders⋈lineitem sample
    referentially intact."""
    orders = T(spark, sf_dir, "orders")
    return hash_sample(orders, F.col("o_orderkey"), 0.10).select(
        "o_orderkey", "o_custkey"
    )


@register(
    "sample_stratified_events",
    f"""
    SELECT event_id, event_type
    FROM events
    WHERE {_BUCKET_SQL.format(k='event_id')} <
          CASE event_type
            WHEN 'view' THEN 100
            WHEN 'click' THEN 1000
            WHEN 'purchase' THEN 10000
            ELSE 0 END
    """,
)
def sample_stratified_events(spark, sf_dir):
    """Stratified downsampling: views 1%, clicks 10%, purchases 100%,
    everything else dropped — the class-rebalancing shape of a training
    pipeline, still a single scan filter."""
    from dmds_spark.sources.registry import load_events

    ev = load_events(spark, sf_dir)
    return stratified_hash_sample(
        ev,
        F.col("event_id"),
        "event_type",
        {"view": 0.01, "click": 0.10, "purchase": 1.0},
    ).select("event_id", "event_type")


@register(
    "sample_train_val_test",
    f"""
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM (
      SELECT n_chars,
             CASE WHEN {_BUCKET_SQL.format(k='doc_id')} < 8000 THEN 'train'
                  WHEN {_BUCKET_SQL.format(k='doc_id')} < 9000 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY split
    """,
)
def sample_train_val_test(spark, sf_dir):
    """80/10/10 disjoint deterministic split of the corpus: every doc
    in exactly one split, stable across re-runs and cluster sizes (the
    property RNG splits lose the moment data is repartitioned)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tr, va, te = hash_split(docs, F.col("doc_id"), [0.8, 0.1, 0.1])
    parts = [
        d.select(F.lit(name).alias("split"), "n_chars")
        for name, d in [("train", tr), ("val", va), ("test", te)]
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return u.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )


@register(
    "sample_bucket_distribution",
    f"""
    SELECT {_BUCKET_SQL.format(k='c_custkey')} // 1000 AS decile,
           COUNT(*) AS n
    FROM customer
    GROUP BY decile
    """,
)
def sample_bucket_distribution(spark, sf_dir):
    """Bucket-uniformity check as a query: counts per hash decile —
    the operational guardrail that the sampler is unbiased."""
    cust = T(spark, sf_dir, "customer")
    return (
        cust.select(
            (hash_bucket(F.col("c_custkey")) / 1000)
            .cast("bigint")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sample_weighted_quality",
    f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    WHERE {_BUCKET_SQL.format(k='doc_id')}
          < ROUND(LEAST(n_chars, 2000) / 2000.0 * 10000)
    """,
)
def sample_weighted_quality(spark, sf_dir):
    """Quality-weighted downsampling: keep probability = min(length,
    2000)/2000, decided by content hash (deterministic, partition-
    independent, superset-stable under weight increases). A narrow
    per-row filter — pushes into the scan, no shuffle anywhere."""
    from dmds_spark.operators.sampling import weighted_hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.least(F.col("n_chars"), F.lit(2000)) / F.lit(2000.0)
    return weighted_hash_sample(docs, F.col("doc_id"), w).select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
    )


@register(
    "sample_referential",
    f"""
    WITH so AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE {_BUCKET_SQL.format(k='o_orderkey')} < 1000
    )
    SELECT so.o_orderkey, CAST(COUNT(l_linenumber) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
    FROM so JOIN lineitem ON l_orderkey = so.o_orderkey
    WHERE {_BUCKET_SQL.format(k='l_orderkey')} < 1000
    GROUP BY so.o_orderkey
    """,
)
def sample_referential(spark, sf_dir):
    """Referential-integrity sampling: hash-sample orders at 10% on
    o_orderkey and lineitem at 10% on l_orderkey — because the hash and
    key agree, every sampled order arrives with ALL its lineitems (no
    orphaned or truncated join groups), which a random sample cannot
    guarantee. The join is then exact over the 10% slice. Both filters
    are per-row scan predicates; one shuffle for the join+agg."""
    from dmds_spark.operators.sampling import hash_sample

    orders = hash_sample(
        T(spark, sf_dir, "orders"), F.col("o_orderkey"), 0.10
    ).select("o_orderkey")
    li = hash_sample(
        T(spark, sf_dir, "lineitem"), F.col("l_orderkey"), 0.10
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.count("l_linenumber").cast("long").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("qty"),
        )
    )
