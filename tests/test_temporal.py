"""As-of join and bucketed range join: edge semantics the oracle
fixture may not exercise — equal-timestamp inclusivity, no-prior-row
NULLs, half-open interval boundaries, exactly-once pair matching."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.operators.asof import asof_join_backward
from automate_data_ingestion_project_spark.operators.rangejoin import (
    bucketed_range_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_inclusive_equal_ts_and_null_when_no_prior(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "early"),  # before any right row
            (1, _ts("2024-01-01 10:00:00"), "equal"),  # ties a right row
            (1, _ts("2024-01-01 11:30:00"), "after"),
            (2, _ts("2024-01-01 12:00:00"), "other-key"),  # key with no rights
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 200),
        ],
        "k long, ts timestamp, v long",
    )
    out = {
        r.tag: (r.matched_ts, r.matched_v)
        for r in asof_join_backward(
            left, right, on="ts", by=["k"], right_payload=["v"]
        ).collect()
    }
    assert out["early"] == (None, None)  # no prior right row → NULLs
    assert out["equal"] == (_ts("2024-01-01 10:00:00"), 100)  # inclusive
    assert out["after"] == (_ts("2024-01-01 11:00:00"), 200)  # latest prior
    assert out["other-key"] == (None, None)  # keys never mix


def test_asof_payload_fields_come_from_same_row(spark):
    """A NULL payload field must NOT be patched from an older row."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-02 00:00:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 7, "old"),
            (1, _ts("2024-01-01 12:00:00"), None, "new"),
        ],
        "k long, ts timestamp, v int, lbl string",
    )
    row = asof_join_backward(
        left, right, on="ts", by=["k"], right_payload=["v", "lbl"]
    ).collect()[0]
    assert row.matched_lbl == "new" and row.matched_v is None


def test_bucketed_range_join_half_open_and_exactly_once(spark):
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00")),
            (20, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 06:00:00")),
        ],
        "iid long, t0 timestamp, t1 timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == t0 of 10: IN (closed start)
            (2, _ts("2024-01-03 00:00:00")),  # == t1 of 10: OUT (open end)
            (3, _ts("2024-01-02 03:00:00")),  # inside BOTH intervals
            (4, _ts("2024-01-05 00:00:00")),  # outside everything
        ],
        "pid long, t timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(points, intervals, "t", "t0", "t1").collect()
    )
    assert got == [(1, 10), (3, 10), (3, 20)]


def test_bucketed_range_join_matches_naive_join(spark, sf_dir):
    """Bucketed ≡ naive inequality join on a real slice (exactly-once:
    counts, not just membership)."""
    from automate_data_ingestion_project_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("t1"),
    )
    pts = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("pid"), F.col("ts").alias("t")
    )
    bucketed = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(pts, iv, "t", "t0", "t1", 3600).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pts.join(
            iv, (F.col("t") >= F.col("t0")) & (F.col("t") < F.col("t1"))
        ).collect()
    )
    assert bucketed == naive and len(bucketed) > 0


def test_interpolation_tied_gap_carries_instead_of_null(spark):
    """When a NULL row's bracketing non-null neighbors share one
    timestamp (only possible with non-strictly-increasing series),
    there is no time axis to weight along: the fill must carry the
    previous value, not return NULL from the 0/0 division (ANSI off).
    order_cols makes the tie ordering — and hence which neighbor is
    'previous' — deterministic."""
    from automate_data_ingestion_project_spark.operators.timeseries import (
        interpolate_time_weighted,
    )

    t = _ts("2024-01-01 10:00:00")
    df = spark.createDataFrame(
        [
            (1, 1, t, 2.0),
            (1, 2, t, None),  # gap bracketed by two rows AT t
            (1, 3, t, 8.0),
        ],
        "k long, seq long, ts timestamp, v double",
    )
    out = {
        r.seq: (r.value_filled, r.was_interpolated)
        for r in interpolate_time_weighted(
            df, ["k"], "ts", "v", order_cols=["seq"]
        ).collect()
    }
    assert out == {1: (2.0, False), 2: (2.0, True), 3: (8.0, False)}


def test_interpolation_rejects_reserved_column_names(spark):
    import pytest

    from automate_data_ingestion_project_spark.operators.timeseries import (
        interpolate_time_weighted,
    )

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0, 0.0)],
        "k long, ts timestamp, v double, value_filled double",
    )
    with pytest.raises(ValueError, match="value_filled"):
        interpolate_time_weighted(df, ["k"], "ts", "v")
