"""Structured Streaming CORRECTNESS query.

The reference is pure batch (SURVEY.md §2.13) — streaming is part of the
engine's extension surface (streaming/events.py). This registers the
windowed-count stream as a driver-checked query with a FULL value-hash
oracle, exploiting the Dataset-API guarantee that a replayed stream
(``Trigger.AvailableNow``, complete mode) must equal the batch
computation over the same files:

1. the events fixture is materialized into a multi-file scratch source
   (micro-batch replay units);
2. ``readStream`` → watermark → tumbling 1-hour window counts per
   event_type → memory sink, run to completion;
3. the sink table is returned as a plain DataFrame, hash-matched against
   DuckDB's ``date_trunc('hour')`` batch aggregation.

A 1-hour tumbling window starting at the epoch is exactly
``date_trunc('hour', ts)``, so the oracle needs no window arithmetic.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..streaming import run_available_now, stream_events, windowed_event_counts
from .load import scratch_dir
from .registry import register


@register(
    "stream_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    survey_ref="streaming extension (windowed agg + watermark; batch-equivalent)",
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = os.path.join(scratch_dir("stream_windowed_counts"), "events")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "user_id")
    # ≥2 files so AvailableNow actually replays multiple units
    ev.repartition(2).write.mode("overwrite").parquet(src)

    stream = windowed_event_counts(stream_events(spark, src))
    name = f"swc_{uuid.uuid4().hex[:8]}"
    return run_available_now(stream, name, output_mode="complete")
