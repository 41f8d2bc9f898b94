"""Event-time streaming operators (SURVEY.md §2b "streaming" row).

The reference's only streaming behavior is the periodic flush daemon
(tokio-fs/src/lib.rs:207-235); the analytics surface adds event-time
windows, watermarks, streaming dedup, and a foreachBatch upsert sink.
Every builder here accepts either a batch or a streaming DataFrame —
the logical plan is identical, which is what the batch-equivalence
tests assert (stream output over the same files == batch output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame, ts_col: str, width: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Tumbling event-time window with count + sum(value) — the
    streaming mirror of queries.streaming_batch.window_tumbling_1h."""
    # group on the window struct itself (not .start) — event-time
    # tracking and watermark-based state eviction key off the window
    # column; .start is projected after the aggregation
    extra = [F.col(c) for c in (group_cols or [])]
    return (
        df.groupBy(F.window(ts_col, width).alias("__w"), *extra)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("__w").start.alias("ws"),
            *[c for c in (group_cols or [])],
            "n",
            "total",
        )
    )


def sliding_window_agg(df: DataFrame, ts_col: str, width: str, slide: str) -> DataFrame:
    """Sliding event-time window (each event lands in width/slide
    windows — Spark expands them JVM-side)."""
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(F.col("__w").start.alias("ws"), "n", "total")
    )


def session_window_agg(df: DataFrame, ts_col: str, gap: str, key: str) -> DataFrame:
    """Session window with an inactivity gap (built-in
    ``session_window`` — the streaming-native form of
    queries.streaming_batch.sessionize_10m)."""
    return df.groupBy(F.session_window(ts_col, gap), F.col(key)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def watermarked(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Attach a watermark: events later than ``delay`` behind the max
    observed event time are dropped from stateful aggregations — the
    late-data policy declared in SURVEY.md §2b."""
    return df.withWatermark(ts_col, delay)


def streaming_dedup(df: DataFrame, keys: list[str], ts_col: str, delay: str) -> DataFrame:
    """Exactly-once-by-key within the watermark horizon
    (``dropDuplicates`` keeps per-key state bounded by the watermark)."""
    return df.withWatermark(ts_col, delay).dropDuplicates(keys)


def run_stream_to_memory(
    sdf: DataFrame, query_name: str, timeout_sec: float = 120.0,
    output_mode: str = "complete",
):
    """Execute a streaming DataFrame with availableNow (process all
    available input, then stop) into an in-memory table; returns the
    result as a batch DataFrame. Default complete mode — windows close
    when the input is exhausted; stateless streams (projections,
    stream-static joins) pass output_mode="append"."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return sdf.sparkSession.table(query_name)


def world_upsert_sink(sdf: DataFrame, world, checkpoint_dir: str, mode: str = "update"):
    """The flush-daemon analogue (reference ``daemon``,
    tokio-fs/src/lib.rs:207-235): every micro-batch is upserted into a
    World and flushed — dirty-chunk rewrite per trigger interval, exactly
    the reference's write-behind persistence re-expressed as
    foreachBatch."""

    def _sink(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        world.upsert(batch_df)
        world.flush()

    return (
        sdf.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension
    table. Spark re-plans the static side per micro-batch (so a
    refreshed dim parquet is picked up) and broadcasts it when small —
    the standard streaming-enrichment shape; no state store involved."""
    return stream.join(dim, on, how)
