from dmds_spark.streaming.anomaly import streaming_daily_anomalies
from dmds_spark.streaming.attribution import (
    attribution_candidates,
    last_touch,
    split_touch_streams,
)
from dmds_spark.streaming.decayed_topk import streaming_decayed_topk
from dmds_spark.streaming.decontaminate import contamination_probe
from dmds_spark.streaming.funnel import streaming_funnel
from dmds_spark.streaming.heavy_hitters import streaming_heavy_hitters
from dmds_spark.streaming.quantiles import streaming_quantiles
from dmds_spark.streaming.sessionize import streaming_sessionize
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
    "streaming_funnel",
    "streaming_sessionize",
    "streaming_daily_anomalies",
    "streaming_heavy_hitters",
    "streaming_decayed_topk",
    "contamination_probe",
    "streaming_quantiles",
    "attribution_candidates",
    "last_touch",
    "split_touch_streams",
]
