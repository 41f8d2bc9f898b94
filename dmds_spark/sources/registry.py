"""Table registry over the driver-generated parquet test tables.

Mirrors the reference's pluggable ``IoHandle`` (src/lib.rs:76-97): the
storage location/format is config, the engine only sees DataFrames.
Parquet is the default source — columnar, predicate pushdown, column
pruning — which at 100 TB is the difference between scanning terabytes
and scanning the two columns a query projects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Filters/projections later in the plan are
    pushed into this scan by Catalyst (check: explain() shows
    PushedFilters / ReadSchema)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects) and with plain TIMESTAMP(MICROS) —
    handle both. Nanos path: read as long (legacy conf,
    runtime-settable) and truncate to microseconds — the same
    truncation DuckDB applies when it coerces ns -> TIMESTAMP, so both
    engines see identical microsecond values. Micros path: cast the
    (NTZ) timestamp to the session type — identity under the engine's
    UTC session timezone."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so the SQL API sees the same
    catalog the DuckDB oracle does."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
