"""Multi-format source/sink support (§2a sources row: the reference's
``IoHandle`` is a pluggable storage trait, src/lib.rs:76-97 — here the
pluggability is Spark's DataSource API, so every format below works on
any Hadoop-compatible filesystem scheme).

Parquet is the native format (columnar, statistics, pushdown). CSV and
JSON are ingest/egress formats: schema must be supplied explicitly —
runtime schema inference reads the data twice and types drift (a
timestamp column inferred as string silently breaks range pruning), so
we forbid it. ORC is supported as a second columnar format.

Scale notes: CSV/JSON scans parallelize per file-split like parquet but
carry no column pruning or predicate pushdown — the guidance (enforced
in docstring, checked in tests) is ingest-once to parquet via
``convert_to_parquet`` and query the parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_WRITERS = {
    "parquet": lambda df, p: df.write.mode("overwrite").parquet(p),
    "orc": lambda df, p: df.write.mode("overwrite").orc(p),
    "csv": lambda df, p: df.write.mode("overwrite")
    .option("header", True)
    .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    .csv(p),
    "json": lambda df, p: df.write.mode("overwrite")
    .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    .json(p),
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` at ``path`` in ``fmt`` (parquet|orc|csv|json)."""
    try:
        _WRITERS[fmt](df, path)
    except KeyError:
        raise ValueError(f"unsupported format {fmt!r}: one of {sorted(_WRITERS)}")


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | None = None
) -> DataFrame:
    """Read ``path`` as ``fmt``. CSV/JSON require an explicit schema
    (no inference — see module docstring)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        r = spark.read.schema(schema).option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        )
        if fmt == "csv":
            return r.option("header", True).csv(path)
        return r.json(path)
    raise ValueError(f"unsupported format {fmt!r}")


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    fmt: str,
    schema: T.StructType,
    sort_by: list[str] | None = None,
) -> int:
    """Ingest a CSV/JSON/ORC dataset to parquet (the query-path format).
    Optionally sort within partitions so row-group min/max statistics
    prune point lookups (the reference's BTreeMap id order,
    src/world.rs:25, serves the same purpose). Returns row count."""
    df = read_table(spark, src_path, fmt, schema)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    df.write.mode("overwrite").parquet(dest_path)
    return spark.read.parquet(dest_path).count()
