"""Distributed global ranking — ROW_NUMBER over a total order without a
single-partition window.

``Window.orderBy(...)`` with no partition key drags the whole relation
onto ONE task (Spark's WindowExec warns about exactly this). That is
fine for provably tiny inputs, but a global rank over a large relation
(e.g. a web-crawl vocabulary with its 100 M+-term typo long tail) needs
the classic two-phase shape instead:

  phase 1: ``repartitionByRange`` on the rank order — each partition
           holds a contiguous slice of the global order — then rank
           LOCALLY per partition (window partitioned by the range
           partition id: full parallelism);
  phase 2: per-partition row counts (≤ |partitions| rows, bounded by
           config not data) become rank offsets via a broadcast
           self-join (``off(p) = Σ sizes(q < p)``), added to the local
           rank.

No driver collect, no global window, one lazy plan. Deterministic:
range boundaries are computed once per job from seeded sampling, and
the order must be total (unique keys), so every row's partition and
local rank are stable under task retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .caching import tracked_persist


def rank_distributed(
    df: DataFrame,
    order_cols: list[Column],
    name: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``name`` = global ROW_NUMBER() of each row under the total
    order ``order_cols`` (1-based, int), without any single-partition
    stage. ``order_cols`` must be a total order (no ties) for the
    result to be well-defined."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # persisted: both the local ranking and the per-partition sizes read
    # this relation — without the persist each branch re-runs the full
    # upstream plan (aggregation, joins, scans).  Tracked so callers can
    # release_caches() after their action (caching.py).
    parts = tracked_persist(
        df.repartitionByRange(p, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = parts.withColumn("_lrn", F.row_number().over(local_w))
    sizes = parts.groupBy("_pid").agg(F.count("*").alias("_c"))
    a, b = sizes.alias("a"), sizes.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(name, (F.col("_off") + F.col("_lrn")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )
