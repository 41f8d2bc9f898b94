"""Stream==batch pin for the survivorship store: drive it from a real
micro-batched file stream through streaming/survivorship.py and
compare the accumulated golden records with the one-shot batch query."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

from .test_survivorship_store import GOLDEN_COLS, _golden_rows  # noqa: E402


def test_streamed_store_equals_batch_query(spark, tmp_path):
    from dmds_spark.queries import all_queries
    from dmds_spark.queries.round15 import (
        _survivorship_obs,
        _survivorship_store,
    )
    from dmds_spark.streaming.survivorship import survivorship_sink

    obs = _survivorship_obs(spark, SF)
    src = str(tmp_path / "src")
    obs.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    store = _survivorship_store(spark, str(tmp_path / "store"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part-*.parquet")
    )
    q = (
        sdf.writeStream.foreachBatch(survivorship_sink(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert store._state()["version"] >= 2  # really micro-batched
    want = _golden_rows(
        all_queries()["survivorship_golden_record"](spark, SF)
    )
    assert _golden_rows(store.golden()) == want
    # late REPLAY of an already-folded batch id is a no-op
    assert store.fold_batch(
        obs.limit(50), store._state()["last_batch_id"]
    )["skipped"]
    assert _golden_rows(store.golden()) == want
