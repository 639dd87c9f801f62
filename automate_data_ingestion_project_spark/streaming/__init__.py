"""Structured Streaming surface for the events stream."""

from .events import (
    KEYED_EVENT_SCHEMA,
    deduped_events,
    kafka_available,
    parse_kafka_events,
    run_available_now,
    sessionized_counts,
    stream_events,
    stream_events_kafka,
    stream_upsert,
    user_running_totals,
    windowed_event_counts,
)

__all__ = [
    "KEYED_EVENT_SCHEMA",
    "deduped_events",
    "kafka_available",
    "parse_kafka_events",
    "run_available_now",
    "sessionized_counts",
    "stream_events",
    "stream_events_kafka",
    "stream_upsert",
    "user_running_totals",
    "windowed_event_counts",
]
