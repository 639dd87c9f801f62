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
# comes first. Round-16 ordering (an OPTIMIZATION round — nothing new
# was registered, so the window is rotation + re-verification):
# (1) the 15 r11-vintage rows the r15 ordering promised would lead
# this window (the last evidence predating r12 anywhere in the
# registry — after this round the histogram minimum is r12);
# (2) 35 rows whose behavior-bearing code changed in r16: the
# tombstone legacy-replay recognition and consumer-state retirement
# (stream takedown + CDF consumers), the store-protocol internals
# (footer-derived ledger stats, one-pass masked compaction rewrites,
# staging-swap bucketed compaction, concurrent independent appends,
# persist_scope cache release), and representative rows from every
# family routed through spread_for_compute's new leaf-file probe
# (minhash/jaccard/semdedup/BPE/contamination/centroids/chunking/
# mixing). Every one of these ran green against its oracle in the
# round's two changed-since drives; this window turns that local
# evidence into driver evidence.
# 15 + 35 = 50 fills the window exactly.
_CHECK_FIRST = [
    # (1) the 15 stalest rows (r11-vintage evidence)
    "customer_value_quartiles",
    "duckdb_federated_scan",
    "duckdb_parquet_handoff",
    "dataset_split",
    "bigram_counts",
    "events_hypertable_rollup",
    "events_value_interpolate",
    "top_terms_per_doc",
    "vocab_encode",
    "text_stats",
    "lang_confusion",
    "orders_rolling_revenue",
    "orders_monthly_gapfill",
    "nation_revenue_share",
    "nation_revenue_pareto",
    # (2) behavior-bearing code changed in r16
    "stream_shard_store_delete",
    "cdf_incremental_consumer",
    "cdf_consumer_erasure_propagation",
    "neardup_store_delete",
    "neardup_ingest_replay",
    "neardup_compacted_ingest_replay",
    "stream_neardup_ingest_replay",
    "incremental_neardup_filter",
    "shard_store_delete",
    "shard_store_compaction",
    "shard_store_asof",
    "shard_store_asof_compacted",
    "shard_store_asof_erasure",
    "shard_store_changes",
    "shard_store_ledger_checkpoint",
    "ivf_store_delete",
    "ivfpq_store_delete",
    "ivf_store_compaction",
    "ann_ivf_ingest_replay",
    "stream_ann_ivf_ingest_replay",
    "ann_ivfpq_ingest_replay",
    "stream_ann_ivfpq_ingest_replay",
    "curated_shard_export",
    "incremental_shard_export",
    "stream_shard_export",
    "export_token_shards",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "semantic_dedup_clusters",
    "bpe_two_merge_steps",
    "decontaminate_overlap",
    "label_centroids",
    "doc_chunks",
    "zorder_pruned_scan",
    "pack_sequences",
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
