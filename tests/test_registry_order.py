"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-8 window composition — the round's deliverable — must hold:
the eight round-8 rows (3 new queries + 5 changed) lead, and every row
whose latest green check is round 4 sits inside the driver's 50-query
window (closing out the r4 vintage; the oldest surviving evidence
after this round is r5)."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R8_CHANGED = [
    "weighted_systematic_sample",  # NEW in r8
    "zorder_pruned_scan",  # NEW in r8
    "stream_neardup_ingest_replay",  # NEW in r8
    "events_value_interpolate",
    "incremental_neardup_filter",
    "neardup_ingest_replay",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
]

R4_VINTAGE = {
    "customer_value_quartiles", "orders_rolling_revenue",
    "orders_monthly_gapfill", "nation_revenue_share", "kmeans_step",
    "nation_revenue_pareto", "referential_integrity",
    "events_weekly_heatmap", "rest_ingest_dv3f", "rest_datasource_scan",
    "dbf_commune", "ann_ivf_topk", "model_layer_build",
    "embedding_quantize",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round8_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:8] == R8_CHANGED
    assert R4_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
