"""Bucketed tables: pre-shuffled layout for co-located (exchange-free)
fact-fact joins and aggregations.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem ⋈
orders, events ⋈ events) is the shuffle of both sides. Bucketing pays
that shuffle ONCE at write: each side is hash-partitioned into
``num_buckets`` files per partition by the join key and optionally
sorted within buckets. Spark's scan then reports the hash
distribution, and Catalyst drops the Exchange (and with sorted buckets
the Sort) from every subsequent join/groupBy on that key.

This is the DataFrame-native equivalent of the reference's grid
co-location (records that share chunk coordinates live in the same
file, src/world.rs:198-250) applied to the analytics tables.

Rules of thumb encoded here:
- both join sides must have the SAME bucket count (or one a divisor of
  the other with AQE off) for the exchange to drop;
- bucket count is chosen once per table from target file size
  (~128-256 MB per bucket file at production scale);
- bucketed tables must be written via ``saveAsTable`` (bucket metadata
  lives in the catalog, not the parquet footer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the physical plan contains no Exchange — each task
    merge-joins bucket i of both sides locally."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
