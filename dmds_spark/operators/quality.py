"""Declarative data-quality constraints (Deequ-lite): a check suite
compiles into ONE aggregation pass over the table and returns a
long-format validation report — the contract gate a pipeline runs
before publishing a table version.

Why one pass matters at 100 TB: each check is a conditional aggregate
(`sum(case when ...)`, `count(distinct ...)`) over the same scan, so N
constraints cost one table read + one (tiny) shuffle, not N. Metrics
are exact-ppm INTEGERS (floor(1e6 * ok / total)) so pass/fail
decisions are bit-stable across engines and partitionings — the same
no-libm discipline as the LM scorer and rational BM25.

Referential checks (foreign-key orphans) are key-only anti-join
counts — they ship key columns, never payload.

Reference analogue: the domain guard the reference enforces on every
write (`DimMapping::check`/value-out-of-range, src/range.rs:61-69,
surfaced here as `World._domain_guard`) generalized from dimension
bounds to a user-declared constraint language over any column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmds_spark.core.exact import PPM, floor_scaled_div as _floor_ppm


@dataclass(frozen=True)
class Check:
    """One declarative constraint. ``kind`` in: completeness,
    uniqueness, in_range, accepted_values, matches. ``min_ppm`` is the
    pass threshold on the exact-ppm satisfaction rate (default: every
    row must satisfy)."""

    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str | None = None
    min_ppm: int = PPM

    @property
    def name(self) -> str:
        # parameterized kinds embed their params: two checks of the
        # same kind on one column must not collide in the report
        if self.kind == "in_range":
            return f"in_range({self.column},[{self.lo},{self.hi}])"
        if self.kind == "matches":
            return f"matches({self.column},{self.pattern})"
        if self.kind == "accepted_values":
            vals = ",".join(str(v) for v in self.values)
            return f"accepted_values({self.column},[{vals}])"
        return f"{self.kind}({self.column})"

    def _ok_expr(self):
        c = F.col(self.column)
        if self.kind == "completeness":
            return c.isNotNull()
        if self.kind == "in_range":
            p = F.lit(True)
            if self.lo is not None:
                p = p & (c >= F.lit(self.lo))
            if self.hi is not None:
                p = p & (c <= F.lit(self.hi))
            return c.isNotNull() & p
        if self.kind == "accepted_values":
            return c.isin(*self.values)
        if self.kind == "matches":
            return c.rlike(self.pattern)
        raise ValueError(f"unknown check kind {self.kind}")


def completeness(column: str, min_ppm: int = PPM) -> Check:
    return Check("completeness", column, min_ppm=min_ppm)


def uniqueness(column: str, min_ppm: int = PPM) -> Check:
    return Check("uniqueness", column, min_ppm=min_ppm)


def in_range(column, lo=None, hi=None, min_ppm: int = PPM) -> Check:
    return Check("in_range", column, lo=lo, hi=hi, min_ppm=min_ppm)


def accepted_values(column, values, min_ppm: int = PPM) -> Check:
    return Check(
        "accepted_values", column, values=tuple(values), min_ppm=min_ppm
    )


def matches(column, pattern, min_ppm: int = PPM) -> Check:
    return Check("matches", column, pattern=pattern, min_ppm=min_ppm)


def constraint_report(
    df: DataFrame, checks: list[Check], with_rows: bool = False
) -> DataFrame:
    """Run the suite in ONE aggregation pass. Output (long format, one
    row per check): constraint, column, ok_ppm (exact integer
    satisfaction rate; for uniqueness: distinct/total), passed (0/1
    against the check's min_ppm). ``with_rows=True`` prepends the input
    row count (``n_rows``) to every report row — the single aggregate
    already computes it, so callers that need the count (the streaming
    monitor) never pay a second pass over the input."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, ck in enumerate(checks):
        if ck.kind == "uniqueness":
            aggs.append(
                F.count_distinct(F.col(ck.column)).alias(f"__ok_{i}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(ck._ok_expr(), 1).otherwise(0)
                ).alias(f"__ok_{i}")
            )
    one = df.agg(*aggs)
    # long format WITHOUT re-reading: explode one array of per-check
    # structs over the single aggregate row (a union of per-check
    # selects would re-plan the scan once per constraint — caught by
    # the scan_count==1 pin in tests/test_quality.py)
    structs = []
    for i, ck in enumerate(checks):
        ppm = _floor_ppm(f"__ok_{i}", "__n")
        fields = [
            F.lit(ck.name).alias("constraint"),
            F.lit(ck.column).alias("column"),
            ppm.cast("long").alias("ok_ppm"),
            (ppm >= F.lit(ck.min_ppm)).cast("long").alias("passed"),
        ]
        if with_rows:
            fields.insert(0, F.col("__n").cast("long").alias("n_rows"))
        structs.append(F.struct(*fields))
    return one.select(F.explode(F.array(*structs)).alias("__r")).select(
        "__r.*"
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    name: str,
) -> DataFrame:
    """FK integrity as a key-only anti join: one row
    (constraint, n_orphans, n_rows, ok_ppm, passed). Null FKs count as
    orphans (a null reference is a violation here; model optional FKs
    with a completeness check + pre-filter instead)."""
    from dmds_spark.core.engine import maybe_broadcast

    total = child.select(F.count(F.lit(1)).alias("__n"))
    orphans = (
        child.select(F.col(fk))
        .join(
            maybe_broadcast(parent.select(F.col(pk).alias(fk)).distinct()),
            fk,
            "left_anti",
        )
        .select(F.count(F.lit(1)).alias("__bad"))
    )
    return (
        total.crossJoin(orphans)
        .select(
            F.lit(name).alias("constraint"),
            F.col("__bad").cast("long").alias("n_orphans"),
            F.col("__n").cast("long").alias("n_rows"),
            _floor_ppm("__n - __bad", "__n").cast("long").alias("ok_ppm"),
            (F.col("__bad") == 0).cast("long").alias("passed"),
        )
    )
