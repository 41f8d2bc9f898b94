"""Parallelism hygiene for expression-heavy stages.

A small parquet file arrives as ONE input partition, so every
expensive per-row expression after it runs on one core of the machine
(measured: 32x slowdown on the shingle/hash stages). On a production
cluster a 100 TB table has tens of thousands of splits and this is a
no-op — the guard only repartitions when the source is narrower than
the session's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the default parallelism iff the input has
    fewer partitions. Cheap for small inputs (a round-robin shuffle of
    what fits in one partition); a no-op for well-split sources."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # JVM-side partition count: df.rdd would build a Python RDD wrapper
    # (pickler + serializer setup) per call just to read one int.
    if df._jdf.rdd().getNumPartitions() < target:
        return df.repartition(target)
    return df
