"""Temporal-join CORRECTNESS queries: as-of join and bucketed range join.

Beyond-the-reference operators (the custom-operator family the engine
adds for time-series/training-data work), both oracle-checked:

- ``asof_purchase_last_click``: for every purchase event, the latest
  click at-or-before it per user (:mod:`..operators.asof` union+window
  construction) — DuckDB verifies with a native ``ASOF LEFT JOIN``.
- ``range_join_signup_errors``: errors-within-7-days-of-signup counts
  via the bucketed point-in-interval join
  (:mod:`..operators.rangejoin`) — DuckDB verifies with the plain
  inequality join (its IEJoin handles the small fixture; the bucketed
  plan is the shape that scales).

Both CAST the event time to microsecond precision on the oracle side,
matching the engine's TIMESTAMP(NANOS) → µs loader truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum, dsum_expr
from ..io import load_table
from ..operators.asof import asof_join_backward
from ..operators.rangejoin import bucketed_range_join
from .registry import register

_EV = "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events"


@register(
    "asof_purchase_last_click",
    oracle=f"""
    WITH ev AS ({_EV}),
    clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM ev WHERE event_type = 'click' GROUP BY 1, 2
    ),
    purch AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.ts, c.ts AS click_ts, c.click_id
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    survey_ref="custom temporal op: as-of join (union+window, one shuffle)",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")  # unique per (key, time): defined "latest"
        .agg(F.max("event_id").alias("click_id"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join_backward(
        purch, clicks, on="ts", by=["user_id"], right_payload=["click_id"],
        prefix="click_",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "ts",
        "click_ts",
        F.col("click_click_id").alias("click_id"),
    )


@register(
    "range_join_signup_errors",
    oracle=f"""
    WITH ev AS ({_EV}),
    s AS (
        SELECT event_id AS signup_id, ts AS t0, ts + INTERVAL 7 DAY AS t1
        FROM ev WHERE event_type = 'signup'
    ),
    e AS (SELECT ts FROM ev WHERE event_type = 'error')
    SELECT s.signup_id, COUNT(e.ts) AS n_errors
    FROM s LEFT JOIN e ON e.ts >= s.t0 AND e.ts < s.t1
    GROUP BY s.signup_id
    """,
    survey_ref="custom temporal op: bucketed point-in-interval range join",
)
def range_join_signup_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("t1"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("err_ts")
    )
    matched = bucketed_range_join(errors, signups, "err_ts", "t0", "t1")
    counts = matched.groupBy("signup_id").agg(F.count("*").alias("n"))
    return signups.select("signup_id").join(counts, "signup_id", "left").select(
        "signup_id", F.coalesce("n", F.lit(0)).cast("long").alias("n_errors")
    )


@register(
    "events_hypertable_rollup",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE ts IS NOT NULL
    ),
    b AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(date_trunc('month', ts) AS TIMESTAMP) AS m,
               value
        FROM ev
    )
    SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                WHEN d IS NOT NULL THEN 'day'
                ELSE 'month' END AS grain,
           coalesce(h, d, m) AS bucket_start,
           COUNT(*) AS n_events,
           {dsum_expr('value')} AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((h), (d), (m))
    """,
    survey_ref="custom temporal op: hypertable-style multi-grain time rollup",
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month continuous-aggregate levels in ONE pass.

    The hypertable pattern (TimescaleDB-style continuous aggregates):
    every grain is materialized from a single scan via GROUPING SETS —
    an ``Expand`` + one shuffle, not one job per grain. Incremental
    maintenance at scale = this query over the fresh partition upserted
    into the rollup table keyed on (grain, bucket_start) (the
    streaming ``foreachBatch`` upsert is the live variant).
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    b = ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "value",
    )
    rolled = b.groupingSets([["h"], ["d"], ["m"]], "h", "d", "m").agg(
        F.count("*").alias("n_events"), dsum("value").alias("sum_value")
    )
    return rolled.select(
        F.when(F.col("h").isNotNull(), "hour")
        .when(F.col("d").isNotNull(), "day")
        .otherwise("month")
        .alias("grain"),
        F.coalesce("h", "d", "m").alias("bucket_start"),
        "n_events",
        "sum_value",
    )


_INTERP_WIN = "PARTITION BY user_id ORDER BY ts, event_id"


@register(
    "events_value_interpolate",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    w AS (
        SELECT *,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   {_INTERP_WIN}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                   OVER ({_INTERP_WIN}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts,
               FIRST_VALUE(v IGNORE NULLS) OVER (
                   {_INTERP_WIN}
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                   OVER ({_INTERP_WIN}
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nts
        FROM p
    )
    SELECT event_id, user_id, ts,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * ((us - pts) / (nts - pts))
                ELSE COALESCE(pv, nv) END AS value_filled,
           (v IS NULL) AS was_interpolated
    FROM w
    """,
    survey_ref="time series: linear interpolation of missing values (engine ext)",
)
def events_value_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation over an event series: every 5th reading
    is PLANTED null, then filled by time-weighted linear interpolation
    between the nearest non-null neighbors per user (forward/backward
    fill at series edges) — the sensor-gap repair step feature
    pipelines run before windowed aggregation.

    Spark shape (inside :func:`operators.timeseries.
    interpolate_time_weighted`, the reusable form — property-tested
    against a Python reference on arbitrary gappy series): all four
    carried values evaluate in ONE Window node over ONE hash shuffle
    on user_id, so no self-join and no per-gap explode. Cross-engine
    float parity: the fill is ``pv + (nv − pv) · ((us − pts)/
    (nts − pts))`` on microsecond integers with ONE double division —
    identical operand tree in DuckDB, bit-identical fills.
    """
    from ..operators.timeseries import interpolate_time_weighted

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    p = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_time_weighted(
        p, ["user_id"], ts_col="ts", value_col="v", order_cols=("event_id",)
    )
    return out.select(
        "event_id", "user_id", "ts", "value_filled", "was_interpolated"
    )
