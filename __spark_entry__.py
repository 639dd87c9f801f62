"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``automate_data_ingestion_project_spark``;
this file only adapts the package's query registry to the driver's
calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automate_data_ingestion_project_spark.analytics import QUERIES

# Importing these modules populates the registry (decorator side effect).
import automate_data_ingestion_project_spark.analytics.contamination  # noqa: F401
import automate_data_ingestion_project_spark.analytics.core  # noqa: F401
import automate_data_ingestion_project_spark.analytics.centroids  # noqa: F401
import automate_data_ingestion_project_spark.analytics.checks  # noqa: F401
import automate_data_ingestion_project_spark.analytics.curation  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dedup  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dv3f  # noqa: F401
import automate_data_ingestion_project_spark.analytics.events_ext  # noqa: F401
import automate_data_ingestion_project_spark.analytics.grouped_pandas  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ingest_replay  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ivf  # noqa: F401
import automate_data_ingestion_project_spark.analytics.load  # noqa: F401
import automate_data_ingestion_project_spark.analytics.media  # noqa: F401
import automate_data_ingestion_project_spark.analytics.mixing  # noqa: F401
import automate_data_ingestion_project_spark.analytics.model_build  # noqa: F401
import automate_data_ingestion_project_spark.analytics.quantize  # noqa: F401
import automate_data_ingestion_project_spark.analytics.similarity  # noqa: F401
import automate_data_ingestion_project_spark.analytics.skew_queries  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sources_surface  # noqa: F401
import automate_data_ingestion_project_spark.analytics.stream_query  # noqa: F401
import automate_data_ingestion_project_spark.analytics.temporal  # noqa: F401
import automate_data_ingestion_project_spark.analytics.terms  # noqa: F401
import automate_data_ingestion_project_spark.analytics.textstats  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_ext  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (orders_by_month) on sf0.001; driver checks rows>0."""
    return QUERIES["orders_by_month"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
