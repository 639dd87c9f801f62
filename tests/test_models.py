"""Model layer: source registry, the reference's example model DAG with
all three materializations, and the dbt-test runner (including the
reference's intentionally-failing not_null)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.load import scratch_dir
from automate_data_ingestion_project_spark.models import (
    Model,
    register_sources,
    run_models,
)
from automate_data_ingestion_project_spark.models import (
    test_models as run_model_tests,  # alias: keep pytest from collecting it
)


@pytest.fixture()
def example_models(spark):
    """The reference's example DAG (my_first/my_second_dbt_model):
    first = literal UNION ALL (ephemeral), second = ref(first) WHERE
    id = 1 — plus a table-materialized month rollup over a source."""

    def first(s):
        return s.sql("SELECT 1 AS id UNION ALL SELECT NULL AS id")

    def second(s):
        return first(s).filter(F.col("id") == 1)  # ref() = function call

    def orders_monthly(s):
        return (
            s.table("src_orders")
            .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
            .agg(F.count("*").alias("n"))
        )

    return [
        Model(
            "my_first_model",
            first,
            "ephemeral",
            tests={"id": ["unique", "not_null"]},
        ),
        Model("my_second_model", second, "view", tests={"id": ["unique", "not_null"]}),
        Model("orders_monthly", orders_monthly, "table", tests={"month": ["unique"]}),
    ]


def test_model_layer_end_to_end(spark, sf_dir, example_models):
    register_sources(spark, {"src_orders": os.path.join(sf_dir, "orders.parquet")})
    assert spark.catalog.tableExists("src_orders")

    table_dir = scratch_dir("test_models")
    built = run_models(spark, example_models, table_dir=table_dir)

    # ephemeral: nothing in the catalog, plan inlined
    assert not spark.catalog.tableExists("my_first_model")
    assert built["my_first_model"].count() == 2
    # view: catalog-registered, SQL surface sees it
    assert spark.catalog.tableExists("my_second_model")
    assert spark.sql("SELECT * FROM my_second_model").collect()[0].id == 1
    # table: physically written and re-read from parquet
    assert os.path.isdir(os.path.join(table_dir, "orders_monthly"))
    assert built["orders_monthly"].count() > 0

    results = run_model_tests(spark, example_models, built)
    by_key = {(r.model, r.column, r.rule): r for r in results}
    # the reference's schema.yml declares not_null on a model holding a
    # NULL row — the runner must DETECT it (FIXTURES.md §5)
    assert not by_key[("my_first_model", "id", "not_null")].passed
    assert by_key[("my_first_model", "id", "unique")].passed
    assert by_key[("my_second_model", "id", "not_null")].passed
    assert by_key[("orders_monthly", "month", "unique")].passed


def test_unknown_materialization_rejected():
    with pytest.raises(ValueError, match="materialization"):
        Model("m", lambda s: None, "matview")


def test_table_without_dir_rejected(spark, example_models):
    with pytest.raises(ValueError, match="table_dir"):
        run_models(spark, [example_models[2]], table_dir=None)
