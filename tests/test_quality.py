"""Declarative quality constraints (operators/quality.py): each check
kind against synthetic violations, threshold semantics, null handling,
the single-scan plan shape, and orphan counting (incl. null FKs)."""

from __future__ import annotations

from pyspark.sql import Row

from dmds_spark.operators.quality import (
    PPM,
    accepted_values,
    completeness,
    constraint_report,
    in_range,
    matches,
    referential_report,
    uniqueness,
)


def _report(df, checks):
    return {
        r["constraint"]: (r["ok_ppm"], r["passed"])
        for r in constraint_report(df, checks).collect()
    }


def test_check_kinds_count_violations(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x", c=5.0),
            Row(a=1, b="y", c=50.0),
            Row(a=2, b=None, c=-1.0),
            Row(a=3, b="x1", c=None),
        ]
    )
    rep = _report(
        df,
        [
            completeness("b"),            # 3/4
            uniqueness("a"),              # 3 distinct / 4
            in_range("c", 0, 10),         # only 5.0 -> 1/4 (null fails)
            accepted_values("b", ["x", "y"]),  # 2/4 (null + 'x1' fail)
            matches("b", "^x"),           # 'x', 'x1' -> 2/4
        ],
    )
    assert rep["completeness(b)"] == (750_000, 0)
    assert rep["uniqueness(a)"] == (750_000, 0)
    assert rep["in_range(c,[0,10])"] == (250_000, 0)
    assert rep["accepted_values(b,[x,y])"] == (500_000, 0)
    assert rep["matches(b,^x)"] == (500_000, 0)


def test_thresholds_and_clean_pass(spark):
    df = spark.createDataFrame([Row(a=1), Row(a=2), Row(a=3)])
    rep = _report(
        df,
        [
            completeness("a"),                 # 1e6, passes at default
            uniqueness("a", min_ppm=PPM),      # exact uniqueness passes
            in_range("a", 1, 2, min_ppm=600_000),  # 2/3 ~ 666666 passes
            in_range("a", 1, 1, min_ppm=600_000),  # 1/3 fails
        ],
    )
    assert rep["completeness(a)"] == (PPM, 1)
    assert rep["uniqueness(a)"] == (PPM, 1)
    assert rep["in_range(a,[1,2])"] == (666_666, 1)
    assert rep["in_range(a,[1,1])"] == (333_333, 0)


def test_suite_is_one_scan(spark):
    """N constraints must compile to ONE pass: a single scan feeds
    every metric (no per-check re-read)."""
    from dmds_spark.plans import scan_count

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = constraint_report(
        df,
        [completeness("text"), uniqueness("doc_id"), matches("lang", "^e")],
    )
    assert scan_count(rep) == 1


def test_referential_orphans_and_null_fk(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    r = referential_report(child, parent, "fk", "pk", "fk(child->parent)")
    row = r.collect()[0]
    assert (row["n_orphans"], row["n_rows"], row["passed"]) == (2, 4, 0)
    assert row["ok_ppm"] == 500_000
    clean = referential_report(
        child.filter("fk <= 2"), parent, "fk", "pk", "ok"
    ).collect()[0]
    assert (clean["n_orphans"], clean["passed"]) == (0, 1)
