"""Structured Streaming surface for the events stream."""

from .events import (
    run_available_now,
    sessionized_counts,
    stream_events,
    stream_upsert,
    user_running_totals,
    windowed_event_counts,
)

__all__ = [
    "run_available_now",
    "sessionized_counts",
    "stream_events",
    "stream_upsert",
    "user_running_totals",
    "windowed_event_counts",
]
