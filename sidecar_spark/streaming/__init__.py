"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.7) — this module
supplies the Spark-native one per the engine contract: file-source
streams, watermarked event-time windows, streaming dedup, session
windows, and custom stateful processing via applyInPandasWithState.
"""

from sidecar_spark.streaming.ops import (
    chained_join_windowed,
    enriched_windowed_value,
    interval_joined_streams,
    left_joined_streams,
    events_stream,
    run_append_two_pass,
    run_foreach_batch_parquet,
    run_to_memory_sink,
    sessionized_stream,
    stateful_user_stats,
    stream_distinct_keys,
    table_stream,
    windowed_counts,
)

__all__ = [
    "chained_join_windowed",
    "enriched_windowed_value",
    "interval_joined_streams",
    "left_joined_streams",
    "events_stream",
    "run_append_two_pass",
    "run_foreach_batch_parquet",
    "run_to_memory_sink",
    "sessionized_stream",
    "stateful_user_stats",
    "stream_distinct_keys",
    "table_stream",
    "windowed_counts",
]
