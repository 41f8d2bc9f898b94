"""Parallelism hygiene for expression-heavy stages.

A small parquet file arrives as ONE input partition, so every
expensive per-row expression after it runs on one core of the machine
(measured: 32x slowdown on the shingle/hash stages). On a production
cluster a 100 TB table has tens of thousands of splits and this is a
no-op — the guard only repartitions when the source is narrower than
the session's parallelism.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def overlap_jobs(*thunks: Callable[[], object]) -> list:
    """Run independent Spark actions concurrently from a small driver
    thread pool (guide §2.6): the scheduler happily interleaves jobs
    inside one application, and a store build's independent steps
    (freeze centroids, train codebooks, write the source files) are
    sequential only because the driver calls them sequentially —
    overlapping them lets the next job's tasks back-fill the previous
    job's scheduling/commit tail. Results return in ``thunks`` order.

    Callers are responsible for independence: nothing here may
    read state another thunk writes (store pointer flips remain safe
    regardless — every flip is serialized on the store's interned
    WriterLock and composes via a re-read of the pointer under it)."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(3, len(thunks))) as pool:
        futs = [pool.submit(t) for t in thunks]
        return [f.result() for f in futs]


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
