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
# set (it checks the first 50 in this ordering; the count below rotates
# round to round). Order the registry so the weakest driver evidence
# comes first: (1) queries whose CODE or ORACLE changed this round —
# the six de-hinted SF-scaled-broadcast queries, the profile
# aggregate-split + DataSketches swap — plus queries NEW this round;
# (2) the queries whose most recent green row is ROUND 3 (oldest
# evidence on file; fixture drift under unchanged code is proven —
# the r3→r4 timestamp-dtype incident); (3) the r4-vintage rows in
# driver order. NOTE (round 6): section (1) alone is ~46 entries, so
# only the first few r3 rows fit this round's 50 — round 7 should put
# the REMAINING r3/r4 rows first (there should be few or no new
# queries to front-load by then).
_CHECK_FIRST = [
    # (1a) code changed in round 6: forced broadcasts on SF-scaled
    # customer/part/supplier removed (AQE now chooses) — hashes must
    # not change
    "promo_revenue_share",
    "median_order_by_nation",
    "small_qty_revenue_by_brand",
    "important_revenue_nations",
    "disjunctive_promo_revenue",
    "local_supplier_revenue",
    # (1b) new/changed contract in round 6
    "table_profile_approx",  # hash-checkable sketch-tolerance contract
    "pq_train_distortion",  # new: k-means codebook training curve
    "ann_pq_trained_recall_eval",  # new: trained-vs-sampled recall
    "neardup_ingest_replay",  # new: two-batch ingest loop, cross-batch
    "shipping_priority_topk",  # new: Q3 shape
    "volume_shipping_pairs",  # new: Q7 shape
    "nation_market_share",  # new: Q8 shape
    "returned_item_losses",  # new: Q10 shape
    "lapsed_customer_balance",  # new: Q22 shape
    "sales_grouping_sets",  # new: explicit GROUPING SETS + GROUPING_ID
    "quantile_sketch_calibration",  # new: approx-percentile contract
    "pii_redaction",  # new: planted-PII scrub, cross-engine regex
    "multimodal_resize",  # new: downsample through the Arrow decode seam
    "stream_stream_join",  # new: watermarked stream-stream interval join
    "peak_concurrent_sessions",  # new: per-day interval sweep-line
    "discount_revenue_delta",  # new: Q6 shape (fully-pushed scan)
    "part_supplier_variety",  # new: Q16 shape (distinct-agg + anti-join)
    "orders_trailing_30d_revenue",  # new: value-based RANGE interval frame
    "null_safe_join_semantics",  # new: <=> vs = with planted NULL keys
    "stream_late_data_drop",  # new: watermark eviction proven by replay
    # (1c) new in round 6's second session
    "semantic_dedup_clusters",  # new: SemDeDup cluster-scoped cosine dedup
    "heavy_hitters_sketch",  # new: approx_top_k frequent-items contract
    "stream_upsert_foreachbatch",  # new: foreachBatch -> keyed upsert sink
    "pagerank_step",  # new: integer-exact PageRank iteration (dup graph)
    "orc_roundtrip_supplier",  # new: ORC connector round-trip
    "xml_roundtrip_part",  # new: XML connector round-trip (Spark-4 built-in)
    # (1d) new/changed in round 6's third session
    "top_supplier_revenue",  # new: Q15 shape (argmax vs global scalar MAX)
    "events_variant_props",  # new: Spark-4 VARIANT semi-structured path
    "fuzzy_name_pairs",  # new: q-gram-blocked fuzzy join + exact short stratum
    "bitmap_exact_distinct",  # new: two-level bitmap exact-distinct, no Expand
    "hll_sketch_rollup",  # new: mergeable daily HLL sketches -> rollup contract
    "duplicate_text_spans",  # new: exact-substring dedup, cross-doc spans
    "span_dedup_mask",  # new: per-doc duplicated-text ratio gate
    "neardup_blast_radius",  # new: WITH RECURSIVE bounded BFS (Spark 4)
    "neardup_triangles",  # new: oriented wedge-join triangle counts
    "profile_drift",  # new: snapshot-vs-snapshot stats drift monitor
    "event_sessions_udtf",  # new: Python UDTF over TABLE PARTITION BY
    "normalize_dv3f_pandas_api",  # new: reference chain via pyspark.pandas
    "scripted_quality_gate",  # new: SQL-scripting gate-then-publish
    "pipe_syntax_revenue",  # new: SQL pipe-syntax star join
    "ann_truncated_recall_eval",  # new: prefix-dim recall tradeoff
    "events_value_interpolate",  # new: time-weighted linear gap fill
    "snapshot_diff",  # new: row-level CDC diff by key
    "value_outliers_mad",  # new: robust MAD outlier gate
    "table_profile",  # changed: split counts/extremes aggregates
    # replay harness rewired this session (cached sources, 8-part state;
    # stream_stream_join / stream_late_data_drop already listed above)
    "stream_dedup_events",
    "stream_windowed_counts",
    "stream_session_counts",
    "stream_stateful_totals",
    # (2) oldest evidence: last green in round 3
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
    "decontaminate_overlap",
    "doc_repetition",
    "corpus_sample_mix",
    "pack_sequences",
    "label_centroids",
    "centroid_purity",
    "corpus_curation_pipeline",
    "nation_only_keys_except",
    "repeat_customers_intersect",
    "sales_rollup",
    # (3) r4 vintage — fill remaining slots in driver order
    "asof_purchase_last_click",
    "range_join_signup_errors",
    "events_hypertable_rollup",
    "lang_confusion",
    "text_stats",
    "top_terms_per_doc",
    "vocab_encode",
    "events_by_type",
    "scd2_history",
    "event_funnel",
    "cohort_retention",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "event_sessions",
    "events_json_props",
    "lang_length_zscores",
    "dataset_split",
    "bigram_counts",
    "commune_enrichment",
    "quality_gates",
    "stratified_sample_exact",
    "customer_value_quartiles",
    "orders_rolling_revenue",
    "orders_monthly_gapfill",
    "nation_revenue_share",
    "kmeans_step",
    "nation_revenue_pareto",
    "referential_integrity",
    "events_weekly_heatmap",
    "stream_windowed_counts",
    "stream_session_counts",
    "stream_stateful_totals",
    "rest_ingest_dv3f",
    "rest_datasource_scan",
    "dbf_commune",
    "ann_ivf_topk",
    "model_layer_build",
    "embedding_quantize",
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
