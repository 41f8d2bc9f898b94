"""Deterministic sampling operators for training-data pipelines.

At 100 TB you never sample with an RNG: a seeded `df.sample` is only
reproducible for a fixed partitioning, and any repartition/split change
silently changes the sample. The scale-correct primitive is a content
hash: `keep iff hash(key) mod D < K`. It's reproducible across runs,
engines, partitionings and cluster sizes, it's a pure per-row filter
(no shuffle, pushes into the scan pipeline), and joining two hash
samples of related tables keeps referential integrity when keyed on
the join key (sample orders by o_orderkey -> their lineitems by
l_orderkey land in the same sample).

md5-based so the DuckDB oracle computes the identical sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, denominator: int = 10_000) -> Column:
    """Stable bucket in [0, denominator): first 15 hex chars of md5
    (60 bits — exact in an i64 on both engines) mod denominator."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) % denominator


def hash_sample(
    df: DataFrame, key: Column, rate: float, denominator: int = 10_000
) -> DataFrame:
    """Keep rows whose hash bucket < rate*denominator. `rate` resolution
    is 1/denominator."""
    keep = int(round(rate * denominator))
    return df.filter(hash_bucket(key, denominator) < keep)


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denominator: int = 10_000,
) -> DataFrame:
    """Per-stratum hash sampling (e.g. downsample 'view' events 100x,
    keep every 'purchase'). One scan, no shuffle: the per-stratum keep
    threshold is a CASE expression over the stratum column."""
    thr = F.lit(int(round(default_rate * denominator)))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, int(round(rate * denominator))
        ).otherwise(thr)
    return df.filter(hash_bucket(key, denominator) < thr)


def hash_split(
    df: DataFrame, key: Column, weights: list[float], denominator: int = 10_000
) -> list[DataFrame]:
    """Disjoint deterministic train/val/test-style splits: bucket
    ranges proportional to `weights`. Every row lands in exactly one
    split, stable under any re-run or repartition."""
    total = sum(weights)
    bounds = [0]
    acc = 0.0
    for w in weights:
        acc += w
        bounds.append(int(round(acc / total * denominator)))
    b = hash_bucket(key, denominator)
    return [
        df.filter((b >= lo) & (b < hi))
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]


def weighted_hash_sample(
    df: DataFrame, key: Column, weight: Column, denominator: int = 10_000
) -> DataFrame:
    """Per-row weighted sampling: keep a row with probability
    ``weight`` (a column in [0, 1]) — deterministically, via the same
    content-hash bucket as hash_sample. Quality-weighted corpus
    downsampling ("keep good docs more often") without an RNG: the
    decision is a pure per-row expression, reproducible everywhere,
    and re-running with a higher weight keeps a superset (hash buckets
    don't reshuffle between runs).

    Quantization: the effective keep probability is
    ``round(weight * denominator) / denominator`` — resolution
    1/denominator with symmetric (round-half-up) bias, matching
    hash_sample. Weights below 1/(2*denominator) round to a zero keep
    rate; raise ``denominator`` if sub-0.5e-4 weights matter."""
    thr = F.round(weight * denominator).cast("long")
    return df.filter(hash_bucket(key, denominator) < thr)


def capped_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k,
    slices: int = 64,
    slice_col: Column | None = None,
) -> DataFrame:
    """At most ``k`` rows per group, selected by rank over
    ``order_cols`` (callers pass a total order) — with the hot-group
    window input BOUNDED.

    The single-window form (rank within group <= k) puts every row of a
    group through one task: a domain holding 10% of a 100 TB crawl
    serializes. Two levels fix it with identical output: stage 1 ranks
    within (group, hash-slice of the first order column) and keeps each
    slice's top-k — a superset of the group's true top-k, because any
    globally-kept row is also within its own slice's top-k; stage 2
    ranks the survivors (<= slices*k rows per group, bounded regardless
    of group size) within the group. Both windows are
    WindowGroupLimit-eligible rank filters. ``slice_col`` picks the
    hashed slice key (required when order_cols[0] is a sort-ordered
    expression; any column that spreads evenly works — the tie-break
    id is the natural choice).

    ``k`` may be an int or a Column already attached to ``df`` (a
    data-derived cap, e.g. the minority-class count for balanced
    sampling) — the superset argument holds per group for any per-row
    constant-within-group k."""
    if slice_col is None:
        first = order_cols[0]
        slice_col = F.col(first) if isinstance(first, str) else first
    # a SortOrder (col.asc()/desc()) can't be hashed — fail with the
    # actual fix instead of Spark's codegen internal error. Detect via
    # the underlying expression node's class (stable API surface), with
    # the Column repr suffix as a fallback for builds where the py4j
    # node accessor differs — the repr text is version-dependent, so it
    # is never the primary check.
    try:
        is_sort_order = (
            slice_col._jc.node().getClass().getSimpleName() == "SortOrder"
        )
    except Exception:  # pragma: no cover - accessor shape varies
        is_sort_order = str(slice_col).endswith(
            ("NULLS FIRST'>", "NULLS LAST'>")
        )
    if is_sort_order:
        raise ValueError(
            "slice_col (or order_cols[0] used as its default) is a "
            "sort-ordered expression; pass slice_col=<plain Column> "
            "(the tie-break id is the natural choice)"
        )
    sl = F.pmod(F.xxhash64(slice_col), F.lit(slices))
    from pyspark.sql import Window as W

    w1 = W.partitionBy(group_col, "__slice").orderBy(*order_cols)
    w2 = W.partitionBy(group_col).orderBy(*order_cols)
    pruned = (
        df.withColumn("__slice", sl)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__slice")
    )
    return (
        pruned.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= k)
        .drop("__r2")
    )
