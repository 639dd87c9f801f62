"""Replay the driver's correctness gate locally: every registered query
with an oracle must hash-match DuckDB on the same parquet fixtures.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to replicate the driver's exact scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def _oracle_cases():
    oracles = entrymod.oracle_sql()
    return sorted(oracles.keys())


def test_dtype_drift_fails_parity(spark, duck):
    """The r8 escape class: equal Python values, drifted column dtype.

    DuckDB's uncast SUM over BIGINT yields HUGEINT (float64 through the
    driver's pandas conversion) while Spark returns bigint — the values
    compare equal cell-by-cell, so a dtype-blind harness passes a query
    the driver's dtype-sensitive hash fails. compare() must flag it.
    """
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.col("id").cast("long").alias("v"))
    hugeint = "SELECT CAST(v AS HUGEINT) AS v FROM (VALUES (0),(1),(2)) t(v)"
    report = compare(df, duck, hugeint)
    assert not report["types_ok"], report
    assert not report["ok"], report
    # values alone would have matched — exactly the blind spot
    assert report["values_ok"], report

    bigint = "SELECT CAST(v AS BIGINT) AS v FROM (VALUES (0),(1),(2)) t(v)"
    assert compare(df, duck, bigint)["ok"]

    # the r3→r4 escape class: date vs timestamp
    ddf = spark.sql("SELECT DATE'2024-01-02' AS d")
    ts = "SELECT TIMESTAMP '2024-01-02 00:00:00' AS d"
    assert not compare(ddf, duck, ts)["types_ok"]
    assert compare(ddf, duck, "SELECT DATE '2024-01-02' AS d")["ok"]


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = entrymod.queries()[name]
    df = q(spark, sf_dir)
    report = compare(df, duck, entrymod.oracle_sql()[name])
    assert report["ok"], f"{name}: {report}"
    # the fixture must actually exercise the query: zero rows would
    # hash-match a zero-row oracle while proving nothing
    assert report["spark_rows"] > 0, f"{name} returned no rows"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "month",
        "number_of_orders",
        "sales_usd",
        "average_order_value",
    ]


def test_every_query_runs_and_returns_rows(spark, sf_dir):
    """Runs-and-returns-rows coverage for queries WITHOUT an oracle.

    Every oracle-backed query is already executed (and rows>0
    asserted) by ``test_query_matches_oracle`` above; re-running all
    of them here doubled the whole registry's execution per suite run
    (measured 142 s — the single most expensive test) for zero added
    coverage. Today every registered query carries an oracle, so this
    is a guard that only starts costing if a future oracle-less query
    is registered."""
    oracles = entrymod.oracle_sql()
    for name, q in entrymod.queries().items():
        if name in oracles:
            continue
        df = q(spark, sf_dir)
        assert df.count() > 0, f"{name} returned no rows"
