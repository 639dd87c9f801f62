"""Pins on the driver-check ordering contract (__spark_entry__):
every _CHECK_FIRST name must resolve to a registered query (a typo
silently demotes that query to registration order and wastes the
round's check slot), the ordered registry must be duplicate-free, and
the round-9 window composition — the round's deliverable — must hold:
the fixed r8 red row leads, then the three r9 additions, then the three
queries whose code changed this round, and every row whose latest
green check is round 5 sits inside the driver's 50-query window
(closing out the r5 vintage; the oldest surviving evidence after this
round is r6)."""

import __spark_entry__ as entrymod
from automate_data_ingestion_project_spark.analytics import QUERIES

R9_HEAD = [
    "weighted_systematic_sample",  # r8's only red row, oracle fixed
    "source_doc_cap",  # NEW in r9
    "source_token_budget_cap",  # NEW in r9
    "duckdb_federated_scan",  # NEW in r9
    "incremental_neardup_filter",  # NearDupIndex changed in r9
    "neardup_ingest_replay",
    "stream_neardup_ingest_replay",
]

R5_VINTAGE = {
    "orders_per_year", "customer_order_histogram", "parts_bought_together",
    "sales_cube", "events_value_histogram", "cumulative_new_customers",
    "order_priority_exists", "big_ticket_orders",
    "cheapest_supplier_per_part", "customer_interarrival",
}


def test_check_first_names_all_registered():
    missing = [n for n in entrymod._CHECK_FIRST if n not in QUERIES]
    assert not missing, missing


def test_ordered_registry_has_no_duplicates_and_covers_everything():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(QUERIES)


def test_round9_window_composition():
    first50 = list(entrymod.queries())[:50]
    assert first50[:7] == R9_HEAD
    assert R5_VINTAGE <= set(first50)


def test_oracles_cover_every_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # current state: full value-hash oracle coverage; a query added
    # without one should be a conscious decision, not an accident
    assert set(o) == set(q), sorted(set(q) - set(o))
