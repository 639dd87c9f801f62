"""Single-pass observability: metrics must come out of the SAME job
that produced the data — no second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.operators.observe import (
    observed,
    quality_metrics,
)


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    inst, obs = observed(
        orders, "load_health", *quality_metrics(orders, "o_custkey", "o_orderdate")
    )
    # ONE action drives both the data and the metrics
    n_direct = inst.count()
    got = obs.get
    assert got["n_rows"] == n_direct
    assert got["n_null_o_custkey"] == orders.filter(F.col("o_custkey").isNull()).count()
    assert got["n_null_o_orderdate"] == 0


def test_observed_metrics_see_post_filter_rows_only(spark, sf_dir):
    """Metrics attach at a PLAN POINT: observing after a filter counts
    surviving rows — placing the probe is choosing what it measures."""
    orders = load_table(spark, sf_dir, "orders")
    filtered = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    inst, obs = observed(filtered, "post_filter", F.count(F.lit(1)).alias("n_rows"))
    expect = inst.count()
    assert obs.get["n_rows"] == expect
    assert expect < orders.count()
