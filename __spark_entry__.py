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

# The driver caps each round at 50 checked queries of the 87 registered.
# Order the registry so the weakest driver evidence comes first:
# (1) queries with NO driver row ever (all round-4 additions + the r3
# verdict's evidence-gap four), (2) queries whose CODE changed since
# their last green row (dedup/textstats rewrites, the checkpointed
# components, the events-loader µs adaptation touching every
# events-based query, the sink/pipeline upsert routing), then (3) the
# oldest still-green refreshes. Unchanged r02/r03-green queries follow
# in registration order and rotate in as slots allow.
_CHECK_FIRST = [
    # never driver-checked (VERDICT r3 §1 + all round-4 additions)
    "dataset_split",
    "bigram_counts",
    "multimodal_manifest",
    "multimodal_features",
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
    "events_weekly_heatmap",
    # code changed this round: shingling/verification rewrite + persists
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "incremental_neardup_filter",
    "dedup_components",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    # code changed this round: textops.analysis codegen fragments
    "text_stats",
    "lang_confusion",
    "lang_length_zscores",
    # code changed this round: events loader µs adaptation
    "asof_purchase_last_click",
    "range_join_signup_errors",
    "events_hypertable_rollup",
    "event_sessions",
    "events_json_props",
    "events_by_type",
    "scd2_history",
    "event_funnel",
    "cohort_retention",
    "stream_windowed_counts",
    "stream_session_counts",
    "stream_stateful_totals",
    # code changed this round: sink VOID fix + upsert_auto routing
    "upsert_idempotent",
    "pipeline_etl_replay",
    # touched last session (scale-shape fixes) — fresh rows wanted
    "vocab_encode",
    "top_terms_per_doc",
    # oldest refresh (r02 vintage, untouched)
    "rest_ingest_dv3f",
    "rest_datasource_scan",
    "dbf_commune",
    "ann_ivf_topk",
    "model_layer_build",
    "embedding_quantize",
    "source_registry_sql",
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
