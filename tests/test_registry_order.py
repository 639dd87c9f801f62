"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-15 window composition — the round's deliverable — must hold:
the nine zero-evidence rows lead (the two r14 late additions the r14
verdict flagged, plus the seven r15 additions — trained-IVF search,
container decode, the CDF consumer pair, the BPE trainer trio), then
the eight rows whose behavior-bearing code changed in r15 (the
drain-time epoch allocation, the compactor's mask-preserving rescue,
the real decode chain), then the 33 stalest (r11-vintage) rows in
their r11 check order."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R15_HEAD = [
    # zero driver evidence (r14 verdict item 1 + the seven r15 additions)
    "bpe_pair_counts",
    "bpe_merge_step",
    "bpe_two_merge_steps",
    "shard_store_changes",
    "shard_store_ledger_checkpoint",
    "ann_ivf_trained_topk",
    "multimodal_decode",
    "cdf_incremental_consumer",
    "cdf_consumer_erasure_propagation",
    # code changed in r15
    "stream_shard_store_delete",
    "shard_store_asof_erasure",
    "multimodal_features",
    "multimodal_resize",
    "shard_store_delete",
    "ivf_store_delete",
    "ivfpq_store_delete",
    "neardup_store_delete",
]

R11_VINTAGE = {
    "orders_by_month", "categories", "orders_by_category",
    "not_null_filter", "events_by_type", "scd2_history", "event_funnel",
    "cohort_retention", "ann_ivf_topk", "ann_ivf_multiprobe",
    "kmeans_step", "referential_integrity", "shard_manifest",
    "curated_shard_export", "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "incremental_neardup_filter",
    "neardup_ingest_replay", "stream_neardup_ingest_replay",
    "event_sessions", "events_json_props", "events_weekly_heatmap",
    "quality_gates", "lang_length_zscores", "zorder_pruned_scan",
    "rest_ingest_dv3f", "rest_datasource_scan", "dbf_commune",
    "commune_enrichment", "model_layer_build", "embedding_quantize",
    "stratified_sample_exact",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round15_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:17] == R15_HEAD
    assert R11_VINTAGE <= set(first50)
    assert len(R11_VINTAGE) == 33 and len(first50) == 50


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
