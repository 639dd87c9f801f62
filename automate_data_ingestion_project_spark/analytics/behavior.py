"""User-behavior analytics: SCD2 dimension history, conversion funnel,
cohort retention.

These extend the reference's warehouse surface with the three classic
event-warehouse shapes its dbt layer stops short of (the reference's
models end at filters/unions, ``dbt_core/models``): versioned dimension
history (the SCD2 twin of its type-1 ``INSERT OR REPLACE`` load),
ordered multi-stage funnels, and cohort × month-offset retention.

Scale notes
-----------
- ``scd2_history``: one window over one shuffle on the dimension key
  (see operators/scd.py).
- ``event_funnel``: every stage is a per-user aggregate or a key join
  on ``user_id`` — one partitioning reused end-to-end, no window, no
  collect. Stage joins shrink monotonically (stage-k users ⊆ stage-k-1
  users), so AQE broadcasts the later stages automatically.
- ``cohort_retention``: first-event aggregate + key join + group — the
  cohort table is |users| rows, aggregated before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.scd import scd2_from_changelog
from .registry import register


@register(
    "scd2_history",
    oracle="""
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey_ref="SCD2 history build (L1 type-2 twin; engine extension)",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event versions its user's state: valid until the next event,
    open-ended (current) for the last one. event_id breaks timestamp
    ties so version boundaries are total and deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd2_from_changelog(
        ev, key_cols=["user_id"], ts_col="ts", tiebreak_cols=["event_id"]
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        "is_current",
    )


@register(
    "event_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, MIN(e.ts) AS v_ts
        FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
        WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS users FROM (
        SELECT '1_signup' AS stage, user_id FROM s
        UNION ALL SELECT '2_view_after_signup', user_id FROM v
        UNION ALL SELECT '3_purchase_after_view', user_id FROM p
    ) GROUP BY stage
    """,
    survey_ref="ordered conversion funnel (event analytics; engine extension)",
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → first view strictly after it → first purchase strictly
    after that; one row per stage with the surviving user count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")

    def first_after(prev: DataFrame, etype: str, prev_ts: str, out_ts: str):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = first_after(s, "view", "s_ts", "v_ts")
    p = first_after(v, "purchase", "v_ts", "p_ts")
    stages = (
        s.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionByName(v.select(F.lit("2_view_after_signup").alias("stage"), "user_id"))
        .unionByName(
            p.select(F.lit("3_purchase_after_view").alias("stage"), "user_id")
        )
    )
    return stages.groupBy("stage").agg(F.count("*").alias("users"))


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort_month
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_month,
           CAST(datediff('month', f.cohort_month,
                         CAST(date_trunc('month', e.ts) AS DATE)) AS INT)
               AS month_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    survey_ref="cohort retention matrix (event analytics; engine extension)",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users grouped by first-event month; active_users counts the
    cohort's distinct users seen at each month offset."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("cohort_month")
    )
    return (
        ev.join(firsts, "user_id")
        .withColumn(
            "month_offset",
            F.months_between(
                F.date_trunc("month", F.col("ts")).cast("date"),
                F.col("cohort_month"),
            ).cast("int"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
