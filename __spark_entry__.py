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
# comes first. Round-9 ordering: (1) the one red r8 row, now fixed;
# (2) the three queries ADDED this round; (3) the three queries whose
# code changed this round, so their official CORRECTNESS rows are
# post-change; (4) the 10-row r5-vintage tail (after this round no
# surviving evidence predates round 6); (5) the oldest 33 r6-vintage
# rows in their r6 check order; the remaining 15 r6 rows (below the
# boundary marker, after the r9-registered jdbc_roundtrip_nation) roll
# to round 10.
_CHECK_FIRST = [
    # (1) the only red row in CORRECTNESS_r08: the oracle's windowed
    # SUM over BIGINT returned HUGEINT (float64 through the driver's
    # pandas conversion) vs Spark's bigint — values identical, dtype
    # not. Fixed by CAST(... AS BIGINT) in the oracle; the local
    # harness (tests/oracle.py + drive_driver) is now dtype-sensitive
    # so this class cannot pass locally again. Re-verified vs the
    # strict harness at sf0.01 pre-commit.
    "weighted_systematic_sample",
    # (2) NEW in r9 — domain capping, the curation ops between
    # corpus_sample_mix (rates) and pack_sequences (packing):
    # source_doc_cap — per-source top-K in deterministic scrambled
    #   order via the two-phase (salted) top-K;
    # source_token_budget_cap — per-source token budget walk via the
    #   two-phase prefix sum in scramble space.
    "source_doc_cap",
    "source_token_budget_cap",
    # duckdb_federated_scan — the reference's primary local engine as a
    #   live executable connector (federated pushdown → Arrow handoff,
    #   io/vendors.py).
    "duckdb_federated_scan",
    # (3) code changed in round 9: NearDupIndex grew the id/content
    # collision guard (check_id_collisions, default off) and the
    # bucketed build's persist cleanup — behavior-neutral for these
    # queries, but the official rows must be post-change.
    "incremental_neardup_filter",
    "neardup_ingest_replay",
    "stream_neardup_ingest_replay",
    # (4) oldest evidence: the 10-row r5 tail (r5 vintage closes out
    # this round). 6 + 10 = 16 so far.
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
    # (5) r6 vintage in r6 check order — the first 33 fill the window
    # (17 + 33 = 50); the 15-row tail below the marker rolls to r10.
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
    # ---- round-9 window boundary (positions 1-50 above) ----
    # r10 front-load starts here: the r9-registered JDBC round-trip
    # (locally strict-hash green, no official row yet), then the r6 tail
    "jdbc_roundtrip_nation",
    "fuzzy_name_pairs",
    "bitmap_exact_distinct",
    "hll_sketch_rollup",
    "duplicate_text_spans",
    "span_dedup_mask",
    "neardup_blast_radius",
    "neardup_triangles",
    "profile_drift",
    "event_sessions_udtf",
    "normalize_dv3f_pandas_api",
    "scripted_quality_gate",
    "pipe_syntax_revenue",
    "ann_truncated_recall_eval",
    "snapshot_diff",
    "value_outliers_mad",
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
