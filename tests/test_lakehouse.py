"""Delta MERGE backend (io/lakehouse.py).

The container ships no delta-spark, so the MERGE execution tests are
skip-gated on the import; the routing + condition-builder logic (the
part that decides WHICH backend runs) is tested unconditionally, and
``upsert_auto`` must behave identically to ``upsert_parquet`` when
Delta is absent.
"""

from __future__ import annotations

import pytest

from automate_data_ingestion_project_spark.io.lakehouse import (
    delta_available,
    merge_condition,
    upsert_auto,
)


def test_merge_condition_null_safe_and_quoted():
    cond = merge_condition(["k", "year"])
    assert cond == "t.`k` <=> s.`k` AND t.`year` <=> s.`year`"


def test_merge_condition_rejects_empty_keys():
    with pytest.raises(ValueError):
        merge_condition([])


def test_delta_unavailable_in_this_session(spark):
    # This container has no delta-spark; the probe must say so rather
    # than raise (the graceful-degradation contract).
    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; probe covered by merge tests")
    except ImportError:
        pass
    assert delta_available(spark) is False


def test_upsert_auto_falls_back_to_parquet(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    used = upsert_auto(spark, df1, path, keys=["k"])
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    used2 = upsert_auto(spark, df2, path, keys=["k"])
    # read back via the backend actually used — a raw parquet read of a
    # Delta dir would also see superseded data files
    assert used == used2
    fmt = "delta" if used == "delta" else "parquet"
    got = {(r.k, r.v) for r in spark.read.format(fmt).load(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    if not delta_available(spark):
        assert used == "parquet"


def test_upsert_auto_keeps_existing_parquet_on_parquet_backend(
    spark, tmp_path, monkeypatch
):
    """A pre-existing plain-parquet warehouse must stay on the parquet
    backend even when the session could run Delta: MERGE cannot target a
    non-Delta location, and overwriting would drop the existing rows."""
    from automate_data_ingestion_project_spark.io import lakehouse

    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upsert_auto(spark, df1, path, keys=["k"])  # plain parquet target

    monkeypatch.setattr(lakehouse, "delta_available", lambda _s: True)
    monkeypatch.setattr(lakehouse, "is_delta_table", lambda _s, _p: False)
    df2 = spark.createDataFrame([(2, "B")], "k int, v string")
    used = lakehouse.upsert_auto(spark, df2, path, keys=["k"])
    assert used == "parquet"
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B")}


def test_upsert_auto_rejects_unknown_backend(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError):
        upsert_auto(spark, df, str(tmp_path / "t"), keys=["k"], backend="bogus")


class TestDeltaMerge:
    """Executed only where delta-spark + a delta-configured session exist."""

    @pytest.fixture(autouse=True)
    def _need_delta(self, spark):
        pytest.importorskip("delta")
        if not delta_available(spark):
            pytest.skip("session not built with Delta extensions")

    def test_merge_idempotent(self, spark, tmp_path):
        from automate_data_ingestion_project_spark.io.lakehouse import (
            upsert_delta,
        )

        path = str(tmp_path / "dtbl")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        upsert_delta(spark, df1, path, keys=["k"])
        df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
        upsert_delta(spark, df2, path, keys=["k"])
        upsert_delta(spark, df2, path, keys=["k"])  # idempotent re-run
        got = {
            (r.k, r.v)
            for r in spark.read.format("delta").load(path).collect()
        }
        assert got == {(1, "a"), (2, "B"), (3, "c")}
