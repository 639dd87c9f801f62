"""Bucketed range join — points ⋈ intervals WITHOUT a cross product.

A naive point-in-interval join with no equi-key is a nested-loop cross
product (|P|·|I| comparisons) — the shape that dies first at scale.
The bucketed construction turns it into an equi-join:

1. choose a bucket width ``w`` (comparable to typical interval length);
2. each interval explodes into the buckets it overlaps
   (``sequence(floor(start/w), floor((end-ε)/w))`` — an ``Expand``,
   no shuffle);
3. each point maps to its single bucket ``floor(t/w)``;
4. equi-join on the bucket id, then filter the exact range predicate.

Each matching (point, interval) pair meets in EXACTLY one bucket (the
point's), so no dedup is needed. Shuffle cost is |P| + |I|·(avg
buckets/interval); with ``w`` ≈ interval length that factor is ~2.
Long-tail intervals fatten the explode — at production scale split the
interval table by length and use a coarser ``w`` for the long tail.

Times are compared as microseconds since epoch (``unix_micros``), the
same precision the engine's timestamp loader guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_rj_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join of each point to every interval with
    ``start <= t < end`` (half-open). Returns all columns of both
    inputs; the caller aggregates or projects.
    """
    w_us = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        _BUCKET, F.expr(f"unix_micros({point_ts}) div {w_us}")
    )
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.expr(
                # greatest() keeps the sequence non-inverted for empty or
                # inverted intervals (end <= start): sequence(a, b<a) would
                # emit a DESCENDING bucket array — spurious candidate rows
                # the exact-range filter then has to discard.
                f"sequence(unix_micros({start_col}) div {w_us}, "
                f"greatest((unix_micros({end_col}) - 1) div {w_us}, "
                f"unix_micros({start_col}) div {w_us}))"
            )
        ),
    )
    return (
        p.join(i, on=_BUCKET, how="inner")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop(_BUCKET)
    )
