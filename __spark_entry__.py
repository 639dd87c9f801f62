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
import automate_data_ingestion_project_spark.analytics.bpe  # noqa: F401
import automate_data_ingestion_project_spark.analytics.centroids  # noqa: F401
import automate_data_ingestion_project_spark.analytics.checks  # noqa: F401
import automate_data_ingestion_project_spark.analytics.curation  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dedup  # noqa: F401
import automate_data_ingestion_project_spark.analytics.dv3f  # noqa: F401
import automate_data_ingestion_project_spark.analytics.events_ext  # noqa: F401
import automate_data_ingestion_project_spark.analytics.fuzzy  # noqa: F401
import automate_data_ingestion_project_spark.analytics.gates  # noqa: F401
import automate_data_ingestion_project_spark.analytics.grouped_pandas  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ingest_replay  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ivf  # noqa: F401
import automate_data_ingestion_project_spark.analytics.ivf_train  # noqa: F401
import automate_data_ingestion_project_spark.analytics.load  # noqa: F401
import automate_data_ingestion_project_spark.analytics.media  # noqa: F401
import automate_data_ingestion_project_spark.analytics.mixing  # noqa: F401
import automate_data_ingestion_project_spark.analytics.model_build  # noqa: F401
import automate_data_ingestion_project_spark.analytics.pq  # noqa: F401
import automate_data_ingestion_project_spark.analytics.pq_train  # noqa: F401
import automate_data_ingestion_project_spark.analytics.profiling  # noqa: F401
import automate_data_ingestion_project_spark.analytics.quantize  # noqa: F401
import automate_data_ingestion_project_spark.analytics.recursive  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sampling  # noqa: F401
import automate_data_ingestion_project_spark.analytics.scripting  # noqa: F401
import automate_data_ingestion_project_spark.analytics.graph  # noqa: F401
import automate_data_ingestion_project_spark.analytics.semdedup  # noqa: F401
import automate_data_ingestion_project_spark.analytics.similarity  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sketches  # noqa: F401
import automate_data_ingestion_project_spark.analytics.skew_queries  # noqa: F401
import automate_data_ingestion_project_spark.analytics.sources_surface  # noqa: F401
import automate_data_ingestion_project_spark.analytics.spans  # noqa: F401
import automate_data_ingestion_project_spark.analytics.splits  # noqa: F401
import automate_data_ingestion_project_spark.analytics.stream_query  # noqa: F401
import automate_data_ingestion_project_spark.analytics.temporal  # noqa: F401
import automate_data_ingestion_project_spark.analytics.terms  # noqa: F401
import automate_data_ingestion_project_spark.analytics.textstats  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_ext  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_subq  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_q2  # noqa: F401
import automate_data_ingestion_project_spark.analytics.warehouse_q3  # noqa: F401

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver caps each round at 50 checked queries of the registered
# set (it checks the first 50 in this ordering; the count rotates
# round to round). Order the registry so the weakest driver evidence
# comes first. Round-15 ordering: (1) the nine rows with ZERO driver
# evidence — the two r14 late additions deferred past that round's
# window (the r14 verdict's #1 item) plus the seven queries ADDED this
# round (the trained-codebook IVF search, the real-container decode,
# the two CDF consumers, and the three BPE tokenizer-training rows);
# (2) the eight rows whose behavior-bearing code changed in
# r15 — the streaming takedown drain (epoch sequences now allocated at
# drain time), the erasure/compaction family (the compactor now keeps
# the tombstone mask when a rescue moves unmasked rows), and the two
# multimodal rows rerouted through the real netpbm decode chain;
# (3) the 33 stalest rows — r11-vintage evidence, in their r11 check
# order (the 15 r11 rows that don't fit this window lead r16's tail:
# customer_value_quartiles, duckdb_federated_scan,
# duckdb_parquet_handoff, dataset_split, bigram_counts,
# events_hypertable_rollup, events_value_interpolate,
# top_terms_per_doc, vocab_encode, text_stats, lang_confusion,
# orders_rolling_revenue, orders_monthly_gapfill, nation_revenue_share,
# nation_revenue_pareto).
# 9 + 8 + 33 = 50 fills the window exactly.
_CHECK_FIRST = [
    # (1) zero driver evidence
    "bpe_pair_counts",
    "bpe_merge_step",
    "bpe_two_merge_steps",
    "shard_store_changes",
    "shard_store_ledger_checkpoint",
    "ann_ivf_trained_topk",
    "multimodal_decode",
    "cdf_incremental_consumer",
    "cdf_consumer_erasure_propagation",
    # (2) code changed in r15
    "stream_shard_store_delete",
    "shard_store_asof_erasure",
    "multimodal_features",
    "multimodal_resize",
    "shard_store_delete",
    "ivf_store_delete",
    "ivfpq_store_delete",
    "neardup_store_delete",
    # (3) the 33 stalest rows (r11-vintage), in their r11 check order
    "orders_by_month",
    "categories",
    "orders_by_category",
    "not_null_filter",
    "events_by_type",
    "scd2_history",
    "event_funnel",
    "cohort_retention",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "kmeans_step",
    "referential_integrity",
    "shard_manifest",
    "curated_shard_export",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "incremental_neardup_filter",
    "neardup_ingest_replay",
    "stream_neardup_ingest_replay",
    "event_sessions",
    "events_json_props",
    "events_weekly_heatmap",
    "quality_gates",
    "lang_length_zscores",
    "zorder_pruned_scan",
    "rest_ingest_dv3f",
    "rest_datasource_scan",
    "dbf_commune",
    "commune_enrichment",
    "model_layer_build",
    "embedding_quantize",
    "stratified_sample_exact",
]


def _ordered_specs():
    """Registry in driver-check order: _CHECK_FIRST (deduped, first
    occurrence wins) then the remaining specs in registration order."""
    seen: set[str] = set()
    ordered = []
    for n in _CHECK_FIRST:
        if n in QUERIES and n not in seen:
            seen.add(n)
            ordered.append(QUERIES[n])
    ordered.extend(s for n, s in QUERIES.items() if n not in seen)
    return ordered


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
