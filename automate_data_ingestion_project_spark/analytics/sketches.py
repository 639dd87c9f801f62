"""Distinct-counting at scale: exact bitmaps and mergeable HLL sketches.

Two complementary 100 TB patterns the naive ``COUNT(DISTINCT x)``
doesn't survive:

- **Exact via bitmaps** (``bitmap_bucket_number`` /
  ``bitmap_construct_agg`` / ``bitmap_count``): integer keys are split
  into 32768-bit buckets; each (group, bucket) aggregates to a ≤4 KiB
  fixed-width bitmap, counts sum per group. The shuffle carries
  O(|groups| × |key-space|/32768) small binary values instead of every
  raw distinct value — and the result is EXACT, so it hash-matches the
  oracle's COUNT(DISTINCT).

- **Approximate via mergeable sketches** (``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate``): per-partition (here
  per-day) sketches are built ONCE and re-merged for any coarser
  rollup without rescanning the raw data — the sketch-store pattern
  behind "distinct users last month" dashboards over append-only
  lakes. Estimates can't hash-match, so the query publishes
  tolerance BOOLEANS against the exact counts (same contract style as
  ``table_profile_approx``), plus the exact values themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register


@register(
    "bitmap_exact_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY event_type
    """,
    survey_ref="exact distinct via two-level bitmap aggregation (engine ext; A5 twin)",
)
def bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users and events per event_type, computed with
    Spark 4's bitmap aggregates instead of COUNT(DISTINCT).

    Why at 100 TB: two COUNT(DISTINCT)s in one aggregate trigger
    Expand (every input row duplicated per distinct column — the same
    blow-up ``table_profile`` works around), and each distinct still
    shuffles every raw value. The bitmap form maps each key to
    (bucket, bit), partial-aggregates to a fixed ≤4 KiB bitmap per
    (group, bucket) MAP-SIDE, shuffles only those bitmaps, and sums
    popcounts. Both distincts run in the SAME two-level plan with no
    Expand and no raw-value shuffle — and the answer is exact, which
    the DuckDB COUNT(DISTINCT) oracle hash-checks.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id", "event_id")
    )

    def pyramid(key: str, out: str) -> DataFrame:
        # Each key gets its OWN bucket grouping: sharing one groupBy
        # across two keys would repeat key A's bits once per key-B
        # bucket and overcount the popcount sum.
        per_bucket = ev.groupBy(
            "event_type", F.bitmap_bucket_number(key).alias("bkt")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(key)).alias("bm"))
        return per_bucket.groupBy("event_type").agg(
            F.sum(F.bitmap_count("bm")).alias(out)
        )

    return pyramid("user_id", "n_users").join(
        pyramid("event_id", "n_events"), "event_type"
    )


@register(
    "hll_sketch_rollup",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, user_id
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tolerance
    FROM daily
    GROUP BY event_type
    """,
    survey_ref="mergeable HLL sketch store: build daily, union to rollup (engine ext)",
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type computed by MERGING per-day HLL
    sketches, checked against the exact count computed in the same
    query.

    The sketch-store pattern: at 100 TB the daily sketches are built
    once at ingest (tiny, mergeable, stored next to the partition) and
    any coarser rollup — weekly, monthly, all-time — is a union of
    sketches, never a rescan of raw events. ``hll_union_agg`` at the
    second level is the merge; lgConfigK=14 gives ~0.8% relative
    standard error, and the published contract is
    ``|estimate − exact| ≤ 5·rse·exact`` per group (the same
    driver-checkable tolerance-boolean convention as
    ``table_profile_approx``; the estimate itself can't hash-match).

    Exact and sketch sides run as SEPARATE aggregates joined at the
    end — fusing a distinct with wide sketch buffers in one aggregate
    is the OOM shape ``_profile`` documents.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "user_id")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    tol = 5 * 0.008  # 5 × rse(lgConfigK=14)
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.lit(tol) * F.col("exact_users")
            ).alias("within_tolerance"),
        )
    )
