"""Single-pass pipeline observability — `df.observe` wrappers.

A 100 TB pipeline cannot afford a second scan per health counter: a
separate `df.count()` / null-audit job re-executes the whole upstream
plan. `Dataset.observe` attaches aggregate metrics to the EXISTING
plan — they accumulate on executors while the action runs and cost one
merge per task, so row counts, null rates, and min/max watermarks come
out of the same pass that produced the data.

Batch: read the `Observation` after any action. Streaming: the same
metrics surface per micro-batch through `StreamingQueryProgress
.observedMetrics` — this module is the batch half; the call is
identical on a streaming DataFrame (named `observe(name, ...)` without
an Observation object).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` (aggregate expressions) to ``df``'s plan.

    Returns the instrumented DataFrame and the `Observation`; read
    ``obs.get`` AFTER an action has run. The metrics ride the existing
    job — zero extra scans, one tiny per-task merge.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def quality_metrics(df: DataFrame, *cols: str) -> list[Column]:
    """The standard load-health counter set: total rows plus per-column
    null counts — the free version of a post-load quality_report scan
    for the columns a sink contract cares about."""
    out = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        out.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return out
