"""Whole-document bin packing (first-fit-decreasing) for training
batches that must NOT split documents — the packing-efficiency
alternative to concat-and-chunk (tokens_pack_sequences), which slices
documents across sequence boundaries.

Scale design: FFD is inherently sequential, so the corpus is sharded
by content hash into bounded groups and each shard packs
independently in one Arrow `applyInPandas` task. Packing quality is
lost only at shard boundaries (each shard wastes less than one bin
versus packing the corpus globally — the classic partition-then-pack
argument), while the work distributes across every executor. Shard
count is a knob: size it so a shard's (id, weight) pairs fit an
executor comfortably — the task holds two int64 columns per doc plus
the bin fill array, NOT the documents themselves.

Determinism: within a shard, items are packed in (weight desc, id)
order and bins probed first-fit in creation order, so the layout is a
pure function of the (id, weight) multiset — reproducible across
runs, partitionings and cluster sizes (same contract as the hash
sampling family).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ffd_pack(ids: Iterable[int], weights: Iterable[int], capacity: int):
    """Reference first-fit-decreasing: returns {id: bin_index} packing
    items in (weight desc, id) order, probing bins in creation order.
    PRECONDITIONS (asserted / caller-enforced): ids are UNIQUE within a
    call (the result is keyed by id — a duplicate would silently pack
    both weights but report only the later assignment) and weights are
    NON-NEGATIVE (a negative weight would let reported fills violate
    the capacity invariant). Items heavier than ``capacity`` must be
    filtered by the caller. Pure Python — the executor-side packer and
    the tests share it, so the distributed result is pinned to this
    exact function."""
    order = sorted(zip(ids, weights), key=lambda t: (-t[1], t[0]))
    if len({i for i, _ in order}) != len(order):
        raise ValueError("ffd_pack requires unique ids within a shard")
    fills: list[int] = []
    out: dict[int, int] = {}
    for i, w in order:
        for b, fill in enumerate(fills):
            if fill + w <= capacity:
                fills[b] = fill + w
                out[i] = b
                break
        else:
            fills.append(w)
            out[i] = len(fills) - 1
    return out


def bin_pack_ffd(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    capacity: int,
    shards: int = 64,
    shard_key: Column | None = None,
    validate_unique: bool = True,
) -> DataFrame:
    """Distributed whole-item FFD: hash-shard, pack each shard with
    :func:`ffd_pack` in one Arrow task, emit
    ``(id_col, weight_col, shard, bin)`` where ``bin`` is global
    (``shard * 2^32 + local_bin``). Items with weight > capacity are
    EXCLUDED (they belong to the chunking path — concat-and-chunk
    splits them; FFD by definition cannot), as are rows with a NULL or
    NEGATIVE weight or a NULL id (a null id cannot be addressed; a
    negative weight would let fills violate the capacity invariant).
    ``id_col`` values must be unique corpus-wide; with
    ``validate_unique`` (the default) that precondition is enforced UP
    FRONT with one cheap count-vs-countDistinct aggregate over the
    eligible rows, so a violation fails fast on the driver with a clear
    error instead of either an executor-side ValueError mid-job (two
    duplicates in one shard) or a silent double-pack (duplicates split
    across shards). The id keeps its native type end to end —
    string/url keys work (same contract as streaming
    contamination_probe)."""
    from dmds_spark.operators.sampling import hash_bucket

    if shard_key is None:
        shard_key = hash_bucket(F.col(id_col), shards)
    id_type = df.schema[id_col].dataType.simpleString()
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(weight_col).cast("long").alias("__w"),
        shard_key.cast("long").alias("__shard"),
    ).filter(
        F.col("__id").isNotNull()
        & (F.col("__w") >= 0)
        & (F.col("__w") <= capacity)
    )
    if validate_unique:
        n, nd = keyed.agg(
            F.count("__id"), F.count_distinct("__id")
        ).first()
        if n != nd:
            raise ValueError(
                f"bin_pack_ffd requires corpus-wide unique {id_col!r}: "
                f"{n} eligible rows but only {nd} distinct ids"
            )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        assign = ffd_pack(pdf["__id"], pdf["__w"], capacity)
        shard = int(pdf["__shard"].iloc[0])
        return pd.DataFrame(
            {
                "__id": pdf["__id"],
                "__w": pdf["__w"],
                "__shard": pdf["__shard"],
                "__bin": [
                    (shard << 32) + assign[i] for i in pdf["__id"]
                ],
            }
        )

    schema = f"__id {id_type}, __w long, __shard long, __bin long"
    packed = keyed.groupBy("__shard").applyInPandas(pack, schema)
    return packed.select(
        F.col("__id").alias(id_col),
        F.col("__w").alias(weight_col),
        F.col("__shard").alias("shard"),
        F.col("__bin").alias("bin"),
    )
