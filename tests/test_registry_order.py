"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-16 window composition — the round's deliverable — must hold:
the 15 r11-vintage rows the r15 ordering promised would lead this
window (the last pre-r12 evidence in the registry), then 35 rows whose
behavior-bearing code changed in the r16 optimization round (tombstone
legacy-replay recognition, consumer-state retirement, store-protocol
internals, and the spread_for_compute probe families), all re-verified
against their oracles in the round's changed-since drives."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R11_VINTAGE_HEAD = [
    # the 15 rows whose latest driver evidence was r11 — named as the
    # r16 leads by the r15 ordering comment and the r15 verdict (#2)
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
]

R16_CODE_TOUCHED = {
    # tombstone allocation + consumer retirement (this round's edits)
    "stream_shard_store_delete",
    "cdf_incremental_consumer",
    "cdf_consumer_erasure_propagation",
    # store-protocol internals (footer stats, one-pass masked rewrites,
    # staging-swap compaction, concurrent appends, persist_scope)
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
    # spread_for_compute probe families
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "semantic_dedup_clusters",
    "bpe_two_merge_steps",
    "decontaminate_overlap",
    "label_centroids",
    "doc_chunks",
    "zorder_pruned_scan",
    "pack_sequences",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round16_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:15] == R11_VINTAGE_HEAD
    assert set(first50[15:]) == R16_CODE_TOUCHED
    assert len(R16_CODE_TOUCHED) == 35 and len(first50) == 50


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
