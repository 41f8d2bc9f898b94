"""Oracle regression gate: run the DuckDB comparison harness
(``dmds_spark.oracle.run_all``) over EVERY registered query that has an
oracle SQL, at sf0.01 — the same scale and compare semantics the
correctness driver uses (row count + sorted columns + order-insensitive
value hash). Any oracle drift fails pytest instead of waiting for the
per-round driver run.

Parameterized per query so a failure names the query directly and the
rest still run. The DuckDB connection and results are computed once per
session (module-level cache) to keep the whole file within a few
minutes on local[8].
"""

from __future__ import annotations

import pytest

from dmds_spark.oracle import compare_query, duckdb_connection
from dmds_spark.queries import all_oracle_sql, all_queries

from .conftest import SF_DIR_MED

_QUERIES = all_queries()
_SQLS = all_oracle_sql()
_NAMES = [n for n in _QUERIES if n in _SQLS]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR_MED)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_match(spark, duck, name):
    from dmds_spark.session import release_materialized_state

    try:
        res = compare_query(spark, duck, name, _QUERIES[name], _SQLS[name],
                            SF_DIR_MED)
    finally:
        # drop any localCheckpoint blocks the query pinned: 180+
        # parametrized cases share one session
        release_materialized_state(spark)
    assert res.ok, f"{name}: {res.detail}"


def test_rows_only_queries_run(spark):
    """Queries without oracle SQL (engine-specific / multimodal) must at
    least evaluate, return a stable schema at sf0.01, and honor the
    scalar-output driver contract (oracle-checked queries get the same
    schema guard inside compare_query)."""
    from dmds_spark.oracle import scalar_schema_violations

    for name in (set(_QUERIES) - set(_SQLS)):
        df = _QUERIES[name](spark, SF_DIR_MED)
        assert df.columns, name
        assert not scalar_schema_violations(df), name
        assert df.count() >= 0, name


def test_integer_division_negatives_both_engines_truncate(spark):
    """Adjudicates the round-14 ADVICE claim that DuckDB `//` FLOORS
    (making Spark's truncating `div` diverge on negative sums, e.g.
    eval_conformal_coverage's pred_c): measured on the installed
    binaries, BOTH engines truncate toward zero on integer operands,
    so signed integral division agrees engine-to-engine with no shift.
    It is Python/numpy `//` that floors — the rule of the round-13
    +shift trick applies when an oracle is restated from PYTHON math,
    not between these two engines."""
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3), (1, -3)]
    duck = [
        duckdb.sql(
            f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT) AS q"
        ).fetchone()[0]
        for a, b in cases
    ]
    got = spark.sql(
        "SELECT "
        + ", ".join(f"{a} div {b} AS q{i}" for i, (a, b) in enumerate(cases))
    ).collect()[0]
    assert duck == [got[f"q{i}"] for i in range(len(cases))]
    # and both equal C-style truncation, NOT Python floor
    assert duck == [int(a / b) for a, b in cases]
