"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-7 window composition — the round's deliverable — must hold:
the five changed-in-r6 queries lead, and every round-3-vintage row
sits inside the driver's 50-query window."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R6_CHANGED = [
    "table_profile",
    "stream_dedup_events",
    "stream_windowed_counts",
    "stream_session_counts",
    "stream_stateful_totals",
]

R3_VINTAGE = {
    "normalize_dv3f", "dbt_first_model", "dbt_second_model", "top10_orders",
    "top_brands_by_quantity", "quality_report", "dedup_exact",
    "price_quantiles", "revenue_by_nation", "top3_orders_per_priority",
    "doc_fingerprints", "doc_chunks", "decontaminate_overlap",
    "doc_repetition", "corpus_sample_mix", "pack_sequences",
    "label_centroids", "centroid_purity", "corpus_curation_pipeline",
    "nation_only_keys_except", "repeat_customers_intersect", "sales_rollup",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round7_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:5] == R6_CHANGED
    assert R3_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
