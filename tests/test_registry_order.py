"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-12 window composition — the round's deliverable — must hold:
the ten r12 additions lead, then the two queries whose code changed
this round, then the full 25-row r8-vintage tail (closing out the r8
vintage; the oldest surviving evidence after this round is r9), then
the oldest 13 r9-vintage rows."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R12_HEAD = [
    "ann_ivf_ingest_replay",  # NEW in r12 (incremental IVF ingest)
    "stream_ann_ivf_ingest_replay",  # NEW in r12 (streaming twin)
    "ann_ivfpq_ingest_replay",  # NEW in r12 (codes-only IVF-PQ ingest)
    "stream_ann_ivfpq_ingest_replay",  # NEW in r12 (streaming twin)
    "ann_pq_refined_topk",  # NEW in r12 (ADC shortlist + exact refine)
    "ann_refined_recall_eval",  # NEW in r12 (refine vs ADC, measured)
    "shard_store_compaction",  # NEW in r12 (OPTIMIZE counterpart)
    "ivf_store_compaction",  # NEW in r12 (OPTIMIZE counterpart)
    "shard_store_asof",  # NEW in r12 (time-travel generation read)
    "neardup_compacted_ingest_replay",  # NEW in r12 (mid-loop compaction)
    "incremental_shard_export",  # empty-batch fix + Hadoop-FS store ops
    "stream_shard_export",  # streaming twin (empty-epoch guard removed)
]

R8_VINTAGE = {
    "smoke_select_star", "nations_in_region1", "dedup_minhash_pairs",
    "dedup_components", "dedup_canonical_keep", "minhash_estimate_error",
    "upsert_idempotent", "incremental_daily_rollup", "pipeline_etl_replay",
    "multimodal_manifest", "multimodal_features", "multimodal_chunks",
    "ann_topk_cosine", "ann_lsh_topk", "ann_recall_eval", "ann_pq_topk",
    "ann_ivfpq_topk", "ann_pq_recall_eval", "skew_salted_agg",
    "skew_salted_join", "source_registry_sql", "csv_roundtrip_region",
    "json_roundtrip_nation", "leakage_safe_split", "pricing_summary",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round12_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:12] == R12_HEAD
    assert R8_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
