"""As-of (backward) join — the canonical time-series enrichment operator.

Spark has no built-in as-of join (pandas ``merge_asof`` does; Flink/
kdb+ call it temporal/aj). The scalable Spark-first construction is the
union + window trick, NOT a range join:

1. tag left rows ``_side=1`` and right rows ``_side=0``;
2. union them on (by-keys, event time);
3. one window per by-key ordered by ``(time, _side)`` carries the most
   recent right-side payload forward (``last(..., ignorenulls=True)``);
4. keep only left rows.

Cost: ONE shuffle on the by-keys (the window), zero range explosion —
each row is touched once, so 100 TB of left rows joins against any
right history without candidate blowup. At equal timestamps the right
row sorts first (``_side``), so the match is INCLUSIVE (right.t <=
left.t), matching DuckDB/pandas backward semantics.

The right payload travels as ONE struct column, so all matched fields
are guaranteed to come from the SAME right row (column-wise ``last``
would mix rows when a payload field is legitimately NULL).

Requirement: ``right`` must be unique per (by-keys, time) — ties there
have no defined "latest". Dedupe upstream (e.g. ``groupBy(keys, ts)``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TIME = "_asof_t"
_PAYLOAD = "_asof_rp"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_payload: Sequence[str],
    prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` within the same by-key group (NULLs when
    no prior right row exists — left-join semantics).

    Output: all left columns + ``{prefix}{col}`` for each
    ``right_payload`` column + ``{prefix}{on}`` (the matched time).
    """
    by = list(by)
    payload_cols = [on, *[c for c in right_payload if c != on]]

    l2 = left.withColumn(_TIME, F.col(on)).withColumn(_SIDE, F.lit(1))
    r2 = (
        right.select(
            *by,
            F.col(on).alias(_TIME),
            F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(_TIME, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        unioned.withColumn(_PAYLOAD, carried)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE, _TIME)
    )
    for c in payload_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_PAYLOAD)
