"""Time-series repair operators.

``interpolate_time_weighted`` fills missing values in an ordered
series by linear interpolation between the nearest non-null neighbors
per key, forward/backward-filling at series edges — the sensor-gap
repair step feature pipelines run before windowed aggregation
(registered as ``events_value_interpolate``; cf. the reference's
normalized long-form metric series, ``scripts/extract_load.py`` —
repair runs between normalize and aggregate).

Scale shape (plan-pinned by ``tests/test_plans.py``
``test_interpolation_shares_one_window_exchange``): all four carried
values (prev/next value and their timestamps) evaluate in ONE Window
node over ONE hash exchange on the key — both frame directions share
the same partitioning + ordering, so Catalyst fuses them. No
self-join, no per-gap explode: cost is one shuffle of the series
regardless of gap density, which is the property that matters when
the series is 100 TB of telemetry.

Float parity: the fill is ``pv + (nv − pv) · ((us − pts)/(nts − pts))``
over microsecond INTEGERS with one double division at the end — the
identical operand tree in DuckDB (oracle) and IEEE Python (property
test) yields bit-identical fills.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_time_weighted(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "v",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Append ``value_filled`` and ``was_interpolated`` to ``df``.

    ``value_col`` rows that are NULL are filled by time-weighted linear
    interpolation between the nearest non-null neighbors within the
    ``key_cols`` group ordered by ``(ts_col, *order_cols)``; a missing
    neighbor on one side degrades to carry from the other side; a
    series with no non-null value at all fills NULL. ``order_cols``
    breaks timestamp ties so the *ordering* is replay-stable — but the
    interpolation weight is purely time-based, so when the bracketing
    non-null neighbors share one timestamp (a tied-gap, only possible
    when timestamps are not strictly increasing per key) there is no
    time axis to weight along and the fill degrades to carry from the
    previous neighbor instead of dividing by zero.

    Reserved names: the operator appends ``value_filled`` and
    ``was_interpolated`` and internally uses ``_us/_pv/_pts/_nv/_nts``;
    raises ``ValueError`` if ``df`` already has any of them.
    """
    reserved = {"_us", "_pv", "_pts", "_nv", "_nts",
                "value_filled", "was_interpolated"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with reserved names: {sorted(clash)}"
        )
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    prev = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    us = F.unix_micros(F.col(ts_col))
    v = F.col(value_col)
    v_ts = F.when(v.isNotNull(), us)
    w = df.select(
        "*",
        us.alias("_us"),
        F.last(v, ignorenulls=True).over(prev).alias("_pv"),
        F.last(v_ts, ignorenulls=True).over(prev).alias("_pts"),
        F.first(v, ignorenulls=True).over(nxt).alias("_nv"),
        F.first(v_ts, ignorenulls=True).over(nxt).alias("_nts"),
    )
    frac = (F.col("_us") - F.col("_pts")) / (F.col("_nts") - F.col("_pts"))
    filled = (
        F.when(v.isNotNull(), v)
        .when(
            F.col("_pv").isNotNull()
            & F.col("_nv").isNotNull()
            # tied-gap guard: bracketing neighbors at one timestamp
            # have no time axis to weight along — carry instead of a
            # NULL from the 0/0 division (ANSI off)
            & (F.col("_nts") != F.col("_pts")),
            F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac,
        )
        .otherwise(F.coalesce("_pv", "_nv"))
    )
    return w.select(
        *df.columns,
        filled.alias("value_filled"),
        v.isNull().alias("was_interpolated"),
    )
