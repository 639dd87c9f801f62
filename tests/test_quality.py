"""Q1-Q4 assertion operators: empty on clean data, counting on poisoned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.quality import (
    QualityError,
    assert_empty,
    checks_from_schema,
    max_length_check,
    not_null_check,
    not_null_violation_rows,
    range_check,
    unique_check,
    unique_violation_rows,
    violation_counts,
)
from automate_data_ingestion_project_spark.schemas import ColumnSpec, TableSchema


def test_clean_table_passes_all_checks(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    assert unique_violation_rows(orders, ["o_orderkey"]).count() == 0
    assert not_null_violation_rows(orders, ["o_orderkey", "o_orderdate"]).count() == 0
    assert_empty(unique_violation_rows(orders, ["o_orderkey"]), "orders pk")


def test_poisoned_table_counts_violations(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2014", 10),
            ("k1", "2015", 20),  # duplicate key
            (None, "20145", -3),  # null key, overlong, negative
        ],
        "uid string, annee string, nbtrans int",
    )
    report = {
        (r.column_name, r.rule): r.violations
        for r in violation_counts(
            df,
            [
                unique_check("uid"),
                not_null_check("uid"),
                max_length_check("annee", 4),
                range_check("nbtrans", 0, 1000),
            ],
        ).collect()
    }
    assert report[("uid", "unique")] == 1
    assert report[("uid", "not_null")] == 1
    assert report[("annee", "max_length")] == 1
    assert report[("nbtrans", "range")] == 1

    assert unique_violation_rows(df, ["uid"]).count() == 1
    assert not_null_violation_rows(df, ["uid"]).count() == 1
    with pytest.raises(QualityError):
        assert_empty(unique_violation_rows(df, ["uid"]), "pk")


def test_checks_compiled_from_declared_schema(spark):
    schema = TableSchema(
        name="t",
        database="dev",
        columns=(
            ColumnSpec("uid", "string", nullable=False),
            ColumnSpec("annee", "string", max_length=4),
            ColumnSpec("nbtrans", "int64", min=0, max=100),
        ),
        primary_key=("uid",),
    )
    checks = checks_from_schema(schema)
    assert {(c.column, c.rule) for c in checks} == {
        ("uid", "unique"),
        ("uid", "not_null"),
        ("annee", "max_length"),
        ("nbtrans", "range"),
    }
    df = spark.createDataFrame(
        [("a", "2014", 5), ("a", "2015", 101)], "uid string, annee string, nbtrans int"
    )
    report = {
        (r.column_name, r.rule): r.violations
        for r in violation_counts(df, checks).collect()
    }
    assert report[("uid", "unique")] == 1
    assert report[("nbtrans", "range")] == 1
    assert report[("annee", "max_length")] == 0


def test_violation_counts_is_single_pass(spark):
    """The report must be ONE aggregation over ONE scan — k rules may
    not trigger k jobs at 100 TB."""
    df = spark.range(100).select(
        F.col("id").cast("string").alias("uid"), F.lit("2014").alias("annee")
    )
    plan = violation_counts(
        df, [unique_check("uid"), not_null_check("uid"), max_length_check("annee", 4)]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2  # partial+final of a single agg
    assert plan.count("Generate") <= 1  # one stack() expansion
