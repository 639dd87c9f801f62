"""Behavioral pins for SemDeDup-style cluster-scoped semantic dedup
(the oracle-parity test covers the hash contract; these pin the
SEMANTICS the hash encodes)."""

from __future__ import annotations

from automate_data_ingestion_project_spark.analytics.semdedup import (
    _PLANT_OFF,
    semantic_dedup_clusters,
)


def test_planted_scaled_copies_flagged_originals_kept(spark, sf_dir):
    rows = {r["vec_id"]: r for r in semantic_dedup_clusters(spark, sf_dir).collect()}
    planted = [r for v, r in rows.items() if v >= _PLANT_OFF]
    assert planted, "fixture produced no planted copies"
    # every scaled copy is byte-different from its original (exact dedup
    # would MISS it) but direction-identical — semantic dedup must flag
    # each one, and each copy's original (smaller id, same cluster) must
    # be among its counted earlier-neighbors
    for r in planted:
        assert r["is_semantic_dup"], r
        assert r["n_earlier_dups"] >= 1, r
    # the originals themselves are the KEEP side of greedy-by-id: the
    # planted copy can never flag its own original (copy ids are larger)
    for r in planted:
        orig = rows[r["vec_id"] - _PLANT_OFF]
        assert orig["cluster"] == r["cluster"], (orig, r)


def test_semantic_dup_flag_consistent_with_count(spark, sf_dir):
    for r in semantic_dedup_clusters(spark, sf_dir).collect():
        assert r["is_semantic_dup"] == (r["n_earlier_dups"] > 0)
