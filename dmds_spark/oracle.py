"""DuckDB-oracle comparison harness — mirrors the driver's correctness
gate: run the Spark query and the oracle SQL on the same parquet
tables, compare row count, sorted column names, and order-insensitive
values.

Used by tests/test_oracle.py and scripts/check_oracle.py; keeping it in
the package because "validate this pipeline against a trusted
single-node engine" is itself a useful operator for pipeline authors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize a cell for order-insensitive compare."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (np.floating, float)):
        f = float(v)
        # exact repr: the whole pipeline is engineered so both engines
        # produce bit-identical doubles; surface any drift loudly
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_frame(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


@dataclass
class OracleResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def scalar_schema_violations(df) -> list[str]:
    """Driver contract: registered query output columns must be scalar.
    The driver's canonicalizer (pandas ``sort_values``) crashes on
    array/map cells with "unhashable type: 'list'" (CORRECTNESS_r04) —
    our own `_canon_value` stringifies them, which would silently mask
    that failure mode, so the local gate checks the schema explicitly."""
    from pyspark.sql import types as st

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (st.ArrayType, st.MapType, st.StructType))
    ]


def compare_query(spark, con, name: str, query_fn, sql: str, sf_dir: str) -> OracleResult:
    out = query_fn(spark, sf_dir)
    bad = scalar_schema_violations(out)
    if bad:
        return OracleResult(
            name, False, -1, -1,
            f"non-scalar output columns {bad}: the driver canonicalizer "
            "cannot hash array/map/struct cells (queries/__init__.py)",
        )
    sdf = out.toPandas()
    odf = con.execute(sql).df()

    s_cols, s_rows = _canon_frame(sdf)
    o_cols, o_rows = _canon_frame(odf)

    if s_cols != [c.lower() for c in s_cols] and [c.lower() for c in s_cols] == [
        c.lower() for c in o_cols
    ]:
        pass  # column-case differences are fine after lowering below

    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        return OracleResult(
            name, False, len(s_rows), len(o_rows),
            f"schema mismatch: spark={s_cols} oracle={o_cols}",
        )
    if len(s_rows) != len(o_rows):
        return OracleResult(
            name, False, len(s_rows), len(o_rows),
            f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}",
        )
    if s_rows != o_rows:
        diff_i = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
        return OracleResult(
            name, False, len(s_rows), len(o_rows),
            f"value mismatch at sorted row {diff_i}:\n  cols : {s_cols}"
            f"\n  spark: {s_rows[diff_i]}\n  duck : {o_rows[diff_i]}",
        )
    return OracleResult(name, True, len(s_rows), len(o_rows))


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[OracleResult]:
    from dmds_spark.queries import all_oracle_sql, all_queries

    qs = all_queries()
    sqls = all_oracle_sql()
    con = duckdb_connection(sf_dir)
    out = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in sqls:
            continue  # rows-only queries: no oracle
        try:
            out.append(compare_query(spark, con, name, fn, sqls[name], sf_dir))
        except Exception as e:  # noqa: BLE001
            out.append(OracleResult(name, False, -1, -1, f"exception: {e}"))
        finally:
            # drop localCheckpoint blocks some queries pin (packing,
            # pagerank, ks-drift, ...): 180+ queries in one session
            # would otherwise accumulate them for the whole gate
            from dmds_spark.session import release_materialized_state

            release_materialized_state(spark)
    return out
