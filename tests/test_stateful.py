"""Custom stateful operator test: per-key state survives micro-batch
boundaries and the final snapshot equals the batch aggregate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dmds_spark.sources.registry import load_events
from dmds_spark.streaming.stateful import running_user_totals

SF = "/root/testdata/sf0.001"


def test_running_totals_match_batch(spark, tmp_path):
    d = str(tmp_path / "ev")
    load_events(spark, SF).repartition(5).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # 5 micro-batches: state must carry over
        .parquet(d)
    )
    q = (
        running_user_totals(sdf)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode re-emits a key's snapshot every batch that touches it;
    # n_events grows monotonically, so the row with the max n_events per
    # key IS the final state (no reliance on sink row order)
    emitted = spark.table("running_totals").toPandas()
    final = emitted.sort_values("n_events").groupby("user_id").last()
    batch = (
        spark.read.parquet(d)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    final = final.sort_index()
    assert (final["n_events"] == batch["n_events"]).all()
    assert (final["total_value"] - batch["total_value"]).abs().max() < 1e-6
