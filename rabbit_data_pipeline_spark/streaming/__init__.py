from rabbit_data_pipeline_spark.streaming.ops import (
    attribute_stateful,
    parse_json_messages,
    sessionize_stateful,
    session_window_agg,
    stream_dedup,
    stream_interval_join,
    windowed_agg,
)

__all__ = [
    "attribute_stateful",
    "parse_json_messages",
    "sessionize_stateful",
    "session_window_agg",
    "stream_dedup",
    "stream_interval_join",
    "windowed_agg",
]
