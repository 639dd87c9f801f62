"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-10 window composition — the round's deliverable — must hold:
the one never-driver-checked row leads (jdbc_roundtrip_nation, which
sat one slot past the r9 window), then the two r10 additions, then the
three queries whose code changed this round, and every row whose
latest green check is round 6 sits inside the driver's 50-query window
(closing out the r6 vintage; the oldest surviving evidence after this
round is r7)."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R10_HEAD = [
    "jdbc_roundtrip_nation",  # only registered query with no driver row
    "duckdb_parquet_handoff",  # NEW in r10
    "export_token_shards",  # NEW in r10
    "incremental_neardup_filter",  # index layout v2 (content-hash roster)
    "neardup_ingest_replay",
    "stream_neardup_ingest_replay",
]

R6_VINTAGE = {
    "fuzzy_name_pairs", "bitmap_exact_distinct", "hll_sketch_rollup",
    "duplicate_text_spans", "span_dedup_mask", "neardup_blast_radius",
    "neardup_triangles", "profile_drift", "event_sessions_udtf",
    "normalize_dv3f_pandas_api", "scripted_quality_gate",
    "pipe_syntax_revenue", "ann_truncated_recall_eval", "snapshot_diff",
    "value_outliers_mad",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round10_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:6] == R10_HEAD
    assert R6_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
