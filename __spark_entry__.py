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
import automate_data_ingestion_project_spark.analytics.pq  # noqa: F401
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
import automate_data_ingestion_project_spark.analytics.warehouse_subq  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver caps each round at 50 checked queries of the ~89
# registered. Order the registry so the weakest driver evidence comes
# first: (1) the eight queries whose most recent green row is ROUND 2 —
# two fixture regenerations old (the r4 verdict's #1 ask; fixtures
# demonstrably drift under unchanged code), (2) queries NEW or with
# CODE CHANGED in round 5 (materialized fingerprint-keyed artifacts
# rewiring the near-dup compositions, the mega-basket cap, the
# multimodal ASCII parity guards, the profile refactor, the
# upsert_auto routing fix feeding the pipeline), then (3) the oldest
# still-green refreshes (r3 vintage). Unchanged green queries follow in
# registration order and rotate in as slots allow.
_CHECK_FIRST = [
    # (1) stalest evidence: last green in round 2
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_ivf_multiprobe",
    "csv_roundtrip_region",
    "json_roundtrip_nation",
    "skew_salted_agg",
    "skew_salted_join",
    "source_registry_sql",
    # (2a) new in round 5
    "table_profile_approx",
    "ann_recall_eval",
    "minhash_estimate_error",
    "customer_order_histogram",
    "promo_revenue_share",
    "order_priority_exists",
    "small_qty_revenue_by_brand",
    "important_revenue_nations",
    "big_ticket_orders",
    "cheapest_supplier_per_part",
    "customer_interarrival",
    "stream_dedup_events",
    "dedup_canonical_keep",
    "incremental_daily_rollup",
    "sales_cube",
    "events_value_histogram",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_pq_recall_eval",
    "cumulative_new_customers",
    "median_order_by_nation",
    "disjunctive_promo_revenue",
    "local_supplier_revenue",
    # (2b) code or oracle changed in round 5
    "parts_bought_together",  # MAX_BASKET cap (both sides)
    "incremental_neardup_filter",  # fingerprint-keyed NearDupIndex
    "dedup_components",  # reads materialized pair evidence
    "leakage_safe_split",  # reads materialized pair evidence
    "dedup_minhash_pairs",  # pair-evidence artifact builder
    "multimodal_chunks",  # ASCII parity guard + encode() oracle
    "multimodal_features",  # ASCII parity guard + encode() oracle
    "multimodal_manifest",  # encode() oracle
    "table_profile",  # refactored through _profile
    "upsert_idempotent",  # upsert routing fix in io layer
    "pipeline_etl_replay",  # pipeline uses upsert_auto
    # (3) oldest refresh (r3 vintage, untouched) — fill remaining slots
    "smoke_select_star",
    "nations_in_region1",
    "not_null_filter",
    "orders_by_month",
    "orders_by_category",
    "orders_per_year",
    "pricing_summary",
    "categories",
    "normalize_dv3f",
    "dbt_first_model",
    "dbt_second_model",
    "top10_orders",
    "top_brands_by_quantity",
    "quality_report",
    "dedup_exact",
    "price_quantiles",
    "revenue_by_nation",
    "top3_orders_per_priority",
    "doc_fingerprints",
    "doc_chunks",
    "lang_confusion",
    "decontaminate_overlap",
    "doc_repetition",
    "corpus_sample_mix",
    "pack_sequences",
    "label_centroids",
    "centroid_purity",
    "corpus_curation_pipeline",
    "orders_rolling_revenue",
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
