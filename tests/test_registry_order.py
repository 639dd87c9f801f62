"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-13 window composition — the round's deliverable — must hold:
the fourteen r13 additions lead (deletion lifecycle, watermarked time
travel, IVF-PQ+refine, coarse-quantizer training, the Q9/Q12/Q20/Q21
shapes), then the three most structurally changed store rows
(committed-read isolation routing, ordered-commit validation, the
driver-side ledger), then the full 33-row r9-vintage tail (closing out
the r9 vintage; the oldest surviving driver evidence after this round
is r10)."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R13_HEAD = [
    "shard_store_delete",  # NEW in r13 (takedown tombstones, shard store)
    "ivf_store_delete",  # NEW in r13 (takedown tombstones, ANN store)
    "ivfpq_store_delete",  # NEW in r13 (takedown tombstones, codes store)
    "neardup_store_delete",  # NEW in r13 (takedown tombstones, near-dup index)
    "stream_shard_store_delete",  # NEW in r13 (streaming takedown drain)
    "shard_store_asof_compacted",  # NEW in r13 (watermarked time travel)
    "ann_ivfpq_refined_topk",  # NEW in r13 (full production ANN stack)
    "ann_ivfpq_refined_recall_eval",  # NEW in r13 (measured lift)
    "ivf_train_distortion",  # NEW in r13 (coarse k-means, monotone)
    "ann_ivf_trained_recall_eval",  # NEW in r13 (sampled vs trained)
    "nation_profit_by_year",  # NEW in r13 (Q9 shape)
    "late_lines_by_priority_class",  # NEW in r13 (Q12 shape)
    "promotable_part_suppliers",  # NEW in r13 (Q20 shape)
    "waiting_suppliers",  # NEW in r13 (Q21 shape)
    # code changed in r13: isolation routing / refactor touch these
    # queries' execution paths
    "incremental_shard_export",
    "shard_store_asof",
    "ann_ivfpq_ingest_replay",
]

R9_VINTAGE = {
    "promo_revenue_share", "median_order_by_nation",
    "small_qty_revenue_by_brand", "important_revenue_nations",
    "disjunctive_promo_revenue", "local_supplier_revenue",
    "table_profile_approx", "pq_train_distortion",
    "ann_pq_trained_recall_eval", "shipping_priority_topk",
    "volume_shipping_pairs", "nation_market_share",
    "returned_item_losses", "lapsed_customer_balance",
    "sales_grouping_sets", "quantile_sketch_calibration",
    "pii_redaction", "multimodal_resize", "stream_stream_join",
    "peak_concurrent_sessions", "discount_revenue_delta",
    "part_supplier_variety", "orders_trailing_30d_revenue",
    "null_safe_join_semantics", "stream_late_data_drop",
    "semantic_dedup_clusters", "heavy_hitters_sketch",
    "stream_upsert_foreachbatch", "pagerank_step",
    "orc_roundtrip_supplier", "xml_roundtrip_part",
    "top_supplier_revenue", "events_variant_props",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round13_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:17] == R13_HEAD
    assert R9_VINTAGE <= set(first50)
    assert len(R9_VINTAGE) == 33 and len(first50) == 50


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
