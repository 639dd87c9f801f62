"""SimHash + inverted-index Jaccard: fingerprint properties, banding
completeness, hot-shingle guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.textops.simhash import (
    SIM_BANDS,
    jaccard_index_join,
    simhash_fingerprints,
    simhash_near_pairs,
)


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r.simhash for r in simhash_fingerprints(df).collect()}


def test_identical_docs_identical_fingerprints(spark):
    fps = _fps(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    assert fps[1] == fps[2]


def test_similar_docs_closer_than_different(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    fps = _fps(
        spark,
        [(1, base), (2, "x " + base), (3, " ".join(f"zz{i}" for i in range(60)))],
    )
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fps[1], fps[2]) < ham(fps[1], fps[3])
    assert ham(fps[1], fps[2]) <= 3


def test_banding_finds_all_close_pairs(spark):
    """Pigeonhole: hamming ≤ SIM_BANDS-1 pairs MUST surface as band
    candidates — verified by comparing against brute force."""
    base = " ".join(f"w{i}" for i in range(40))
    rows = [(i, base + f" extra{i % 4}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps_df = simhash_fingerprints(df)
    fps = {r.doc_id: r.simhash for r in fps_df.collect()}
    brute = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= SIM_BANDS - 1
    }
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in simhash_near_pairs(fps_df, max_hamming=SIM_BANDS - 1).collect()
    }
    assert got == brute


def test_jaccard_index_join_exact_values(spark):
    rows = [
        (1, "a b c d e"),  # shingles: abc bcd cde
        (2, "a b c d x"),  # shingles: abc bcd cdx → shared 2, union 4
        (3, "p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from automate_data_ingestion_project_spark.textops.dedup import shingle

    sh = shingle(df).select("doc_id", F.explode("shingles").alias("s"))
    got = {
        (r.doc_id_a, r.doc_id_b): (r.n_shared, r.jaccard)
        for r in jaccard_index_join(sh, threshold=0.4).collect()
    }
    assert got == {(1, 2): (2, 0.5)}


def test_jaccard_hot_shingle_guard(spark):
    """A shingle present in every doc must not create candidates by
    itself when its document frequency exceeds the cap."""
    common = "same same same"
    rows = [(i, f"{common} uniq{i} u{i}x v{i}y") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from automate_data_ingestion_project_spark.textops.dedup import shingle

    sh = shingle(df).select("doc_id", F.explode("shingles").alias("s"))
    out = jaccard_index_join(sh, threshold=0.1, max_doc_freq=3).collect()
    assert out == []  # the only shared shingle is over the df cap
