"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-14 window composition — the round's deliverable — must hold:
the three r14 additions lead (the as-of x tombstone erasure contract
and the multiprobe refined IVF-PQ pair), then the one most
behavior-changed store row (the streaming takedown drain, whose epochs
now offset past committed sequences), then the full 46-row r10-vintage
tail in its r10 check order (the oldest surviving driver evidence
after this round is r11)."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R14_HEAD = [
    "shard_store_asof_erasure",  # NEW in r14 (erasure wins over time travel)
    "ann_ivfpq_multiprobe_refined_topk",  # NEW in r14 (nprobe on the stack)
    "ann_ivfpq_multiprobe_recall_eval",  # NEW in r14 (honest measured lift)
    # code changed in r14: the stream tombstone drain's epoch base
    "stream_shard_store_delete",
]

R10_VINTAGE = {
    "jdbc_roundtrip_nation", "export_token_shards", "fuzzy_name_pairs",
    "bitmap_exact_distinct", "hll_sketch_rollup", "duplicate_text_spans",
    "span_dedup_mask", "neardup_blast_radius", "neardup_triangles",
    "profile_drift", "event_sessions_udtf", "normalize_dv3f_pandas_api",
    "scripted_quality_gate", "pipe_syntax_revenue",
    "ann_truncated_recall_eval", "snapshot_diff", "value_outliers_mad",
    "table_profile", "stream_dedup_events", "stream_windowed_counts",
    "stream_session_counts", "stream_stateful_totals", "normalize_dv3f",
    "dbt_first_model", "dbt_second_model", "top10_orders",
    "top_brands_by_quantity", "quality_report", "dedup_exact",
    "price_quantiles", "revenue_by_nation", "top3_orders_per_priority",
    "doc_fingerprints", "doc_chunks", "decontaminate_overlap",
    "doc_repetition", "corpus_sample_mix", "pack_sequences",
    "label_centroids", "centroid_purity", "corpus_curation_pipeline",
    "nation_only_keys_except", "repeat_customers_intersect",
    "sales_rollup", "asof_purchase_last_click", "range_join_signup_errors",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round14_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:4] == R14_HEAD
    assert R10_VINTAGE <= set(first50)
    assert len(R10_VINTAGE) == 46 and len(first50) == 50


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))


def test_default_driver_memory_is_host_sized(monkeypatch):
    """The driver-heap default adapts to the host: half of physical
    memory, capped at 8g, floored at 1g — a flat 8g launch request
    would fail outright on a small container. The env override wins."""
    import automate_data_ingestion_project_spark.session as sess

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    got = sess.default_driver_memory()
    assert got.endswith("m") or got == "8g"
    if got.endswith("m"):
        assert 1024 <= int(got[:-1]) <= 8192

    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert sess.default_driver_memory() == "3g"
