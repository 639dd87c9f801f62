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


def test_quantize_int8_rows_equals_exploded_array_form(spark):
    """quantize_int8_rows (the r17 codegen'd exploded form) must emit
    exactly the rows posexplode(quantize_int8(...).q) emits — same
    codes, same NULL/edge semantics — across the edge shapes: normal
    vectors, a constant vector (codes all 0), an all-NULL-elements
    vector (min/max NULL -> codes 0), a NULL element inside a normal
    vector (code NULL), an empty array and a NULL array (no rows)."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.textops.quantize import (
        quantize_int8,
        quantize_int8_rows,
    )

    data = [
        (1, [0.25, -1.5, 3.75, 2.0]),
        (2, [7.0, 7.0, 7.0]),          # constant: all zeros
        (3, [None, None]),             # all-NULL elements: zeros
        (4, [1.0, None, 5.0]),         # NULL element: NULL code
        (5, []),                       # empty: no rows
        (6, None),                     # NULL array: no rows
        (7, [-3.5]),                   # single element: constant
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    want = sorted(
        (r.vec_id, r.pos, r.code)
        for r in quantize_int8(df)
        .select("vec_id", F.posexplode("q").alias("pos", "code"))
        .collect()
    )
    got = sorted(
        (r.vec_id, r.pos, r.code)
        for r in quantize_int8_rows(df)
        .select("vec_id", "pos", "code")
        .collect()
    )
    assert got == want and len(got) == 4 + 3 + 2 + 3 + 1
