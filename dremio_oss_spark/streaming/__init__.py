"""Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming operators — its closest features are
auto-ingest pipes (`sabot/grammar/.../ingestion.ftl:195-222`) and
incremental reflection refresh.  This package is the engine's added
streaming surface, pure Spark Structured Streaming: tumbling/sliding/
session windows with watermarks over the `events` fixture, plus
pipe-style streaming dedup ingestion.
"""

from .lakesink import delta_sink_query, stream_append_delta
from .windows import (
    run_to_table,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    stream_events,
    tumbling_window_agg,
)

__all__ = [
    "delta_sink_query",
    "stream_append_delta",
    "run_to_table",
    "session_window_agg",
    "sliding_window_agg",
    "stream_dedup",
    "stream_events",
    "tumbling_window_agg",
]
