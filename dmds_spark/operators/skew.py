"""Skew mitigation operators (SURVEY.md §2b scale hygiene): salted
two-phase aggregation and salted replicate joins.

When one key holds a disproportionate share of rows (hot users, hot
event types, null-heavy foreign keys), the shuffle for a groupBy/join
lands that key's entire volume on one task. AQE's skew-join split
handles the sort-merge case at runtime; these operators are the
*declarative* fix for when you know the skew up front:

- salted_agg: groupBy(key, salt) partial -> groupBy(key) final. Both
  phases are algebraic (sum/count/min/max merge associatively), so the
  result is exactly the unsalted aggregate, but the first shuffle
  spreads a hot key over ``salt_n`` tasks.
- salted_join: the fact side gets a deterministic salt in
  [0, salt_n); the dim side is replicated salt_n times (explode on a
  literal range). Join key becomes (key, salt) — a hot key's rows
  split across salt_n tasks at the cost of salt_n x the (small) dim
  side. For genuinely small dims prefer broadcast; salting is for the
  mid-size dim that doesn't fit the broadcast threshold.

The salt is xxhash64 of caller-chosen distributor columns (a unique id
if available) modulo salt_n — deterministic across retries, so plans
stay reproducible (a rand() salt is not retry-safe: a recomputed task
would re-salt rows differently mid-shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(distributor_cols: list[str], salt_n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in distributor_cols]), F.lit(salt_n))


_MERGES = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    distributor_cols: list[str],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``aggs`` maps output name -> (partial aggregate expression, merge
    function name). Merges: counts and sums re-SUM, min/min and
    max/max are idempotent — so the result is exactly the unsalted
    groupBy's."""
    partial = (
        df.withColumn("__salt", _salt(distributor_cols, salt_n))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGES[merge](f"__p_{name}").alias(name)
            for name, (_, merge) in aggs.items()
        ]
    )


_SALTED_JOIN_SAFE = {"inner", "left", "left_outer", "leftouter",
                     "left_semi", "leftsemi", "semi",
                     "left_anti", "leftanti", "anti"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    distributor_cols: list[str],
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated
    ``salt_n`` times. For fact-preserving join types (inner/left/
    semi/anti) result rows are identical to ``fact.join(dim, on,
    how)``; the shuffle distributes each hot key over salt_n tasks.

    right/full are rejected: an unmatched dim row exists once per
    replica, so those joins would emit it salt_n times. Swap the sides
    (salt the dim if IT is the skewed one) or rely on AQE's skew-join
    split for outer shapes."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SALTED_JOIN_SAFE
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins {sorted(_SALTED_JOIN_SAFE)}; "
            f"got how={how!r} (unmatched dim replicas would duplicate)"
        )
    f = fact.withColumn("__salt", _salt(distributor_cols, salt_n))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return f.join(d, [on, "__salt"], how).drop("__salt")
