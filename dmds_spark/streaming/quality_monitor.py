"""Streaming data-quality monitoring: run a declarative constraint
suite (operators/quality.py) over EACH micro-batch and land the
per-batch validation reports durably — the observability arm of the
batch publish gate, catching a broken upstream the trigger it breaks
instead of at the next full-table audit.

Per trigger this costs one aggregation pass over the micro-batch (the
suite compiles to a single agg — N constraints never re-scan), so the
monitor adds O(batch) work per trigger regardless of table size.
Reports land in per-batch directories keyed by batch id, so
at-least-once foreachBatch replay overwrites the same directory
instead of duplicating report rows (the replay discipline every
foreach_batch arm in this engine follows)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dmds_spark.operators.quality import Check, constraint_report


def quality_monitor_sink(checks: list[Check], out_dir: str):
    """``writeStream.foreachBatch`` sink: validate each micro-batch
    against the suite and write its report (constraint, column, ok_ppm,
    passed, plus batch_id and n_rows) to ``{out_dir}/qc-batch-{id}``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # ONE pass over the micro-batch: the suite's single aggregate
        # already computes the row count (with_rows), and collecting
        # the report (one row PER CHECK, never per data row) both
        # detects the idle trigger and feeds the write — the previous
        # shape executed the batch three times (isEmpty, count, agg)
        rep_rows = constraint_report(
            batch_df, checks, with_rows=True
        ).collect()
        if not rep_rows or rep_rows[0]["n_rows"] == 0:
            return  # idle trigger: no rows, no report
        rep = batch_df.sparkSession.createDataFrame(rep_rows).select(
            F.lit(int(batch_id)).alias("batch_id"),
            "n_rows",
            "constraint",
            "column",
            "ok_ppm",
            "passed",
        )
        rep.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"qc-batch-{batch_id}")
        )

    return _sink


def monitor_reports(spark, out_dir: str) -> DataFrame:
    """All per-batch reports so far; empty frame with the report schema
    when no batch has produced one yet (quiet stream)."""
    import glob

    if not glob.glob(os.path.join(out_dir, "qc-batch-*")):
        return spark.createDataFrame(
            [],
            "batch_id bigint, n_rows bigint, constraint string, "
            "column string, ok_ppm bigint, passed bigint",
        )
    return spark.read.parquet(os.path.join(out_dir, "qc-batch-*"))


def failing_batches(spark, out_dir: str) -> DataFrame:
    """Alerting view: batches with at least one failing constraint,
    with the failing constraints aggregated per batch."""
    rep = monitor_reports(spark, out_dir)
    return (
        rep.filter(F.col("passed") == 0)
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_failing"),
            F.concat_ws(
                ";", F.sort_array(F.collect_list("constraint"))
            ).alias("failing_constraints"),
        )
    )
