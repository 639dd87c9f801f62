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
import automate_data_ingestion_project_spark.analytics.behavior  # noqa: F401
import automate_data_ingestion_project_spark.analytics.centroids  # noqa: F401
import automate_data_ingestion_project_spark.analytics.checks  # noqa: F401
import automate_data_ingestion_project_spark.analytics.curation  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dedup  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dv3f  # noqa: F401
import automate_data_ingestion_project_spark.analytics.events_ext  # noqa: F401
import automate_data_ingestion_project_spark.analytics.gates  # noqa: F401
import automate_data_ingestion_project_spark.analytics.grouped_pandas  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ingest_replay  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ivf  # noqa: F401
import automate_data_ingestion_project_spark.analytics.load  # noqa: F401
import automate_data_ingestion_project_spark.analytics.media  # noqa: F401
import automate_data_ingestion_project_spark.analytics.mixing  # noqa: F401
import automate_data_ingestion_project_spark.analytics.model_build  # noqa: F401
import automate_data_ingestion_project_spark.analytics.profiling  # noqa: F401
import automate_data_ingestion_project_spark.analytics.quantize  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sampling  # noqa: F401
import automate_data_ingestion_project_spark.analytics.similarity  # noqa: F401
import automate_data_ingestion_project_spark.analytics.skew_queries  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sources_surface  # noqa: F401
import automate_data_ingestion_project_spark.analytics.splits  # noqa: F401
import automate_data_ingestion_project_spark.analytics.stream_query  # noqa: F401
import automate_data_ingestion_project_spark.analytics.temporal  # noqa: F401
import automate_data_ingestion_project_spark.analytics.terms  # noqa: F401
import automate_data_ingestion_project_spark.analytics.textstats  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_ext  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver caps each round at 50 checked queries of the 73+ registered.
# Order the registry so the weakest driver evidence comes first: the r3
# verdict's four evidence-gap queries (dataset_split / bigram_counts never
# checked; the multimodal pair's code changed after its last green row),
# then new queries added this round, then everything whose last green row
# is r02 or older.  r03-green queries follow in registration order.
_CHECK_FIRST = [
    # never driver-checked / changed since last green row (VERDICT r3 §1)
    "dataset_split",
    "bigram_counts",
    "multimodal_manifest",
    "multimodal_features",
    # new in round 4
    "commune_enrichment",
    "quality_gates",
    "stratified_sample_exact",
    "customer_value_quartiles",
    "orders_rolling_revenue",
    "leakage_safe_split",
    "orders_monthly_gapfill",
    "nation_revenue_share",
    "kmeans_step",
    "multimodal_chunks",
    "table_profile",
    "parts_bought_together",
    "nation_revenue_pareto",
    "referential_integrity",
    # dedup internals re-expressed codegen-side this round — fresh rows
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "incremental_neardup_filter",
    # last green row r02 or earlier — refresh
    "upsert_idempotent",
    "rest_ingest_dv3f",
    "rest_datasource_scan",
    "pipeline_etl_replay",
    "dbf_commune",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "model_layer_build",
    "embedding_quantize",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "skew_salted_agg",
    "skew_salted_join",
    "source_registry_sql",
    "csv_roundtrip_region",
    "json_roundtrip_nation",
    "stream_windowed_counts",
    "stream_session_counts",
    "stream_stateful_totals",
    # touched this round (scale-shape fixes) — want fresh rows
    "vocab_encode",
    "top_terms_per_doc",
]


def _ordered_specs():
    first = [QUERIES[n] for n in _CHECK_FIRST if n in QUERIES]
    rest = [s for n, s in QUERIES.items() if n not in _CHECK_FIRST]
    return first + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (orders_by_month) on sf0.001; driver checks rows>0."""
    return QUERIES["orders_by_month"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }
