"""Query registry: every operator family declared in SURVEY.md §2b gets
a named query with (a) a Spark DataFrame builder and (b) an equivalent
ANSI-SQL oracle string for DuckDB. The driver hash-compares the two at
sf0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides;
- money arithmetic is done in DECIMAL on both sides and cast to DOUBLE
  at the end — decimal arithmetic is exact, so the resulting doubles are
  bit-identical regardless of each engine's summation order (doubles
  summed in different orders are NOT, which would break hash-compare);
- top-k queries always order by a total order (explicit tie-break keys).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None):
    """Decorator: add a query builder + its DuckDB oracle SQL (None for
    non-SQL-expressible ops — driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {k: v[0] for k, v in _REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load():
    global _LOADED
    if _LOADED:
        return
    # import for side effect: each module registers its queries
    from dmds_spark.queries import dmds_core  # noqa: F401
    from dmds_spark.queries import relational  # noqa: F401
    from dmds_spark.queries import tpch_extra  # noqa: F401
    from dmds_spark.queries import extra_ops  # noqa: F401
    from dmds_spark.queries import sampling_q  # noqa: F401
    from dmds_spark.queries import llm_ops  # noqa: F401
    from dmds_spark.queries import llm_dedup  # noqa: F401
    from dmds_spark.queries import streaming_batch  # noqa: F401
    from dmds_spark.queries import advanced  # noqa: F401

    _LOADED = True
