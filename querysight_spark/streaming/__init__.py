from querysight_spark.streaming.incremental import (
    compact_pattern_state,
    read_pattern_state,
    start_incremental_merge,
    stream_query_logs,
    streaming_exact_dedup,
    windowed_pattern_counts,
)
from querysight_spark.streaming.stateful import stateful_pattern_counts

__all__ = [
    "compact_pattern_state",
    "read_pattern_state",
    "start_incremental_merge",
    "stateful_pattern_counts",
    "stream_query_logs",
    "streaming_exact_dedup",
    "windowed_pattern_counts",
]
