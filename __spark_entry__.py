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

_SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver caps each round at 50 checked queries of the registered
# set (it checks the first 50 in this ordering; the count rotates
# round to round). Order the registry so the weakest driver evidence
# comes first. Round-12 ordering: (1) the ten queries ADDED this round;
# (2) the two queries whose code changed this round (empty-batch
# short-circuit + Hadoop-FS self-heal in append_token_shard_batch;
# the streaming twin's empty-epoch guard removed), so their official
# rows are post-change; (3) the full 25-row r8-vintage tail (the r11
# verdict's declared r12 front-load — after this round no surviving
# evidence predates round 9); (4) the oldest 13 r9-vintage rows in
# their r9 check order (10 + 2 + 25 + 13 = 50); the remaining 33 r9
# rows below the boundary marker roll to round 13.
_CHECK_FIRST = [
    # (1) NEW in r12: incremental IVF ingest (per-batch cell assignment
    # against the frozen codebook, ledger commit marker, replayed batch
    # a no-op, search over the appended store — the r11 verdict's
    # requested maintained-store capability for the ANN tier), its
    # Structured Streaming twin (foreachBatch, same oracle), and the
    # content-preserving compaction of both maintained stores (the
    # OPTIMIZE counterpart the ledger protocol needs at epoch counts)
    # plus the partition-pruned as-of generation read (time travel)
    # and the near-dup index's mid-loop compaction replay.
    "ann_ivf_ingest_replay",
    "stream_ann_ivf_ingest_replay",
    "ann_ivfpq_ingest_replay",
    "stream_ann_ivfpq_ingest_replay",
    "ann_pq_refined_topk",
    "ann_refined_recall_eval",
    "shard_store_compaction",
    "ivf_store_compaction",
    "shard_store_asof",
    "neardup_compacted_ingest_replay",
    # (2) code changed in r12, so the official rows land post-change:
    # the empty-batch fix + Hadoop-FS store ops touch the incremental
    # shard append and its streaming twin. Behavior-neutral on the
    # green path (the two-batch %3 split never produces an empty batch).
    "incremental_shard_export",
    "stream_shard_export",
    # (3) the 25 remaining r8-vintage rows (the r11 verdict's declared
    # r12 front-load), in their r8 check order — after this round no
    # surviving evidence predates round 9. 1 + 2 + 25 = 28 so far.
    "smoke_select_star",
    "nations_in_region1",
    "dedup_minhash_pairs",
    "dedup_components",
    "dedup_canonical_keep",
    "minhash_estimate_error",
    "upsert_idempotent",
    "incremental_daily_rollup",
    "pipeline_etl_replay",
    "multimodal_manifest",
    "multimodal_features",
    "multimodal_chunks",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_recall_eval",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_pq_recall_eval",
    "skew_salted_agg",
    "skew_salted_join",
    "source_registry_sql",
    "csv_roundtrip_region",
    "json_roundtrip_nation",
    "leakage_safe_split",
    "pricing_summary",
    # (4) the oldest 22 r9-vintage rows in their r9 check order —
    # 28 + 22 = 50 fills the window.
    "weighted_systematic_sample",
    "source_doc_cap",
    "source_token_budget_cap",
    "orders_per_year",
    "customer_order_histogram",
    "parts_bought_together",
    "sales_cube",
    "events_value_histogram",
    "cumulative_new_customers",
    "order_priority_exists",
    "big_ticket_orders",
    "cheapest_supplier_per_part",
    "customer_interarrival",
    # ---- round-12 window boundary (positions 1-50 above) ----
    # r13 front-load starts here: the remaining 33 r9-vintage rows in
    # their r9 check order.
    "promo_revenue_share",
    "median_order_by_nation",
    "small_qty_revenue_by_brand",
    "important_revenue_nations",
    "disjunctive_promo_revenue",
    "local_supplier_revenue",
    "table_profile_approx",
    "pq_train_distortion",
    "ann_pq_trained_recall_eval",
    "shipping_priority_topk",
    "volume_shipping_pairs",
    "nation_market_share",
    "returned_item_losses",
    "lapsed_customer_balance",
    "sales_grouping_sets",
    "quantile_sketch_calibration",
    "pii_redaction",
    "multimodal_resize",
    "stream_stream_join",
    "peak_concurrent_sessions",
    "discount_revenue_delta",
    "part_supplier_variety",
    "orders_trailing_30d_revenue",
    "null_safe_join_semantics",
    "stream_late_data_drop",
    "semantic_dedup_clusters",
    "heavy_hitters_sketch",
    "stream_upsert_foreachbatch",
    "pagerank_step",
    "orc_roundtrip_supplier",
    "xml_roundtrip_part",
    "top_supplier_revenue",
    "events_variant_props",
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
