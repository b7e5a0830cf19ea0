"""Structured Streaming slice over the ``events`` table (SURVEY §2B
streaming row; §7 step 8).

The driver's events parquet is replayed as a file stream; operators:
watermarked tumbling/sliding/session windows, stateful dedup
(``dropDuplicatesWithinWatermark``), and a run-to-completion helper
(``Trigger.AvailableNow`` + memory sink) that turns a bounded stream
into a queryable batch result — which is how the corpus oracle-checks
streaming semantics against plain SQL.
"""

from etl_global_mobility_spark.streaming.ops import (
    run_stream_to_memory,
    session_window_counts,
    stream_events,
    streaming_dedup_keys,
    tumbling_window_counts,
)

__all__ = [
    "stream_events",
    "tumbling_window_counts",
    "session_window_counts",
    "streaming_dedup_keys",
    "run_stream_to_memory",
]
