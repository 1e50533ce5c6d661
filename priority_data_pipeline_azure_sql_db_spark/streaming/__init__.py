"""Structured Streaming surface (SURVEY.md §7 phase 6)."""

from .events import (  # noqa: F401
    read_events_stream,
    run_streaming_to_memory,
    sessionized_counts,
    tumbling_counts,
)
