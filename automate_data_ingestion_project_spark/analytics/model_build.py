"""Model-layer CORRECTNESS query: the reference's dbt project, built.

Replays the reference's dbt DAG end-to-end through the model layer
(:mod:`..models`): the two example models
(``/root/reference/dbt_core/models/example/``) with their declared
``unique``/``not_null`` column tests
(``ref schema.yml:10-21``) plus a table-materialized month rollup over
a registered source (the ``{{ source(...) }}`` pattern,
``ref sources.yml:3-9``; materializations ``ref dbt_project.yml:32-36``).

The returned relation is the build report: one row per dbt test
(model, check, violation count — the reference's first model
INTENTIONALLY fails ``not_null`` with exactly one NULL id, which dbt
reports and we must reproduce) plus one ``row_count`` row per
materialized model. The month-rollup count is data-derived, so the
oracle recomputes it from the orders parquet — the report hash checks
the whole chain, not just constants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models import Model, register_sources, run_models
from ..models import test_models as run_model_tests
from .load import scratch_dir
from .registry import register


def _first(s: SparkSession) -> DataFrame:
    return s.sql("SELECT 1 AS id UNION ALL SELECT NULL AS id")


def _second(s: SparkSession) -> DataFrame:
    return _first(s).filter(F.col("id") == 1)  # ref() = function call


def _orders_monthly(s: SparkSession) -> DataFrame:
    return (
        s.table("src_orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").alias("n"))
    )


_MODELS = [
    Model(
        name="my_first_dbt_model",
        fn=_first,
        materialization="ephemeral",
        tests={"id": ["unique", "not_null"]},
    ),
    Model(
        name="my_second_dbt_model",
        fn=_second,
        materialization="table",
        tests={"id": ["unique", "not_null"]},
    ),
    Model(name="orders_monthly", fn=_orders_monthly, materialization="table"),
]


@register(
    "model_layer_build",
    oracle="""
    SELECT * FROM (VALUES
        ('my_first_dbt_model', 'test unique:id', CAST(0 AS BIGINT)),
        ('my_first_dbt_model', 'test not_null:id', CAST(1 AS BIGINT)),
        ('my_second_dbt_model', 'test unique:id', CAST(0 AS BIGINT)),
        ('my_second_dbt_model', 'test not_null:id', CAST(0 AS BIGINT)),
        ('my_first_dbt_model', 'row_count', CAST(2 AS BIGINT)),
        ('my_second_dbt_model', 'row_count', CAST(1 AS BIGINT))
    ) AS t(model, check_name, n)
    UNION ALL
    SELECT 'orders_monthly' AS model, 'row_count' AS check_name,
           COUNT(DISTINCT date_trunc('month', o_orderdate)) AS n
    FROM orders
    """,
    survey_ref="S4,S5,P3,Q1,Q2,U1 as a system: dbt-analog DAG + test runner",
)
def model_layer_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sources(
        spark, {"src_orders": os.path.join(sf_dir, "orders.parquet")}
    )
    table_dir = scratch_dir("model_layer_build")
    built = run_models(spark, _MODELS, table_dir=table_dir)

    results = run_model_tests(spark, _MODELS, built)
    test_rows = [
        (r.model, f"test {r.rule}:{r.column}", r.violations) for r in results
    ]
    report = spark.createDataFrame(test_rows, "model string, check_name string, n long")
    for name, df in built.items():
        report = report.unionByName(
            df.agg(
                F.lit(name).alias("model"),
                F.lit("row_count").alias("check_name"),
                F.count("*").alias("n"),
            )
        )
    return report
