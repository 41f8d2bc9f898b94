from dmds_spark.streaming.stateful import running_user_totals
from dmds_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_static_enrich,
    streaming_dedup,
    tumbling_window_agg,
    watermarked,
    world_upsert_sink,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "watermarked",
    "streaming_dedup",
    "run_stream_to_memory",
    "world_upsert_sink",
    "stream_static_enrich",
    "running_user_totals",
]
