"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-11 window composition — the round's deliverable — must hold:
the four r11 additions lead, then the five queries whose code changed
this round, then the full 20-row r7-vintage tail (closing out the r7
vintage; the oldest surviving evidence after this round is r8), then
the oldest 21 r8-vintage rows."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R11_HEAD = [
    "curated_shard_export",  # NEW in r11
    "incremental_shard_export",  # NEW in r11
    "stream_shard_export",  # NEW in r11 (streaming twin)
    "shard_manifest",  # NEW in r11 (content-fingerprint manifest)
    "duckdb_federated_scan",  # path-literal escaping (io/vendors.py)
    "duckdb_parquet_handoff",
    "incremental_neardup_filter",  # roster-last append (commit marker)
    "neardup_ingest_replay",
    "stream_neardup_ingest_replay",
]

R7_VINTAGE = {
    "events_hypertable_rollup", "lang_confusion", "text_stats",
    "top_terms_per_doc", "vocab_encode", "events_by_type",
    "scd2_history", "event_funnel", "cohort_retention",
    "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "event_sessions", "events_json_props",
    "lang_length_zscores", "dataset_split", "bigram_counts",
    "commune_enrichment", "quality_gates", "stratified_sample_exact",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round11_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:9] == R11_HEAD
    assert R7_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
