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
# comes first. Round-8 ordering: (1) the three queries ADDED this
# round plus the five whose code changed this round, so their official
# CORRECTNESS rows are post-change; (2) the 13 rows whose most recent
# green check is ROUND 4 (after this round no surviving evidence
# predates round 5 — fixture drift under unchanged code is proven,
# the r3→r4 timestamp-dtype incident); (3) round-5-vintage rows in
# driver order up to the window boundary; the tail rolls to round 9.
_CHECK_FIRST = [
    # (1) code changed in round 8, front-loaded so their official rows
    # are post-change (all re-verified vs oracle at sf0.01 pre-commit):
    # events_value_interpolate — tied-gap carry guard in
    #   operators/timeseries.py (no-op on strictly-increasing fixtures);
    # incremental_neardup_filter / neardup_ingest_replay — NearDupIndex
    #   grew the bucketed band-table layout (probe/_decisions signature
    #   change; parquet default path behavior unchanged);
    # ann_ivf_topk / ann_ivf_multiprobe — candidate scans now read the
    #   cell-PARTITIONED vector artifact pruned to the probed cells;
    # stream_neardup_ingest_replay — NEW in r8 (the ingestion loop
    #   driven by Structured Streaming foreachBatch, hash-checked
    #   against the same oracle as the batch replay).
    # zorder_pruned_scan — NEW in r8 (Z-order-clustered scan, L4 twin).
    # weighted_systematic_sample — NEW in r8 (proportional-to-size
    #   sample via the two-phase prefix sum, integer-exact).
    "weighted_systematic_sample",
    "zorder_pruned_scan",
    "stream_neardup_ingest_replay",
    "events_value_interpolate",
    "incremental_neardup_filter",
    "neardup_ingest_replay",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    # (2) oldest evidence: the 13 remaining r4-vintage rows (the r7
    # window covered the other 22; ann_ivf_topk above was the 14th).
    # 8 + 13 = 21 so far.
    "customer_value_quartiles",
    "orders_rolling_revenue",
    "orders_monthly_gapfill",
    "nation_revenue_share",
    "kmeans_step",
    "nation_revenue_pareto",
    "referential_integrity",
    "events_weekly_heatmap",
    "rest_ingest_dv3f",
    "rest_datasource_scan",
    "dbf_commune",
    "model_layer_build",
    "embedding_quantize",
    # (3) r5 vintage — the first 29 fill this round's 50-query window
    # (8 + 13 + 29 = 50); the 10-row tail below the marker rolls to
    # round 9. Bookkeeping: r5 vintage was 41 rows = 2 in section (1)
    # (incremental_neardup_filter, ann_ivf_multiprobe changed this
    # round) + these 29 + the 10-row tail.
    "orders_by_month",
    "categories",
    "orders_by_category",
    "not_null_filter",
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
    # ---- round-8 window boundary (positions 1-50 above) ----
    # r5 tail — next round's front-load starts here
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
