"""Inverted-index top terms: known-value checks + oracle parity."""

from __future__ import annotations

import __spark_entry__ as entry
from automate_data_ingestion_project_spark.analytics.terms import (
    DF_CAP_PCT,
    TOP_K,
    top_terms_per_doc,
)
from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_df_cap_and_ranking(spark, tmp_path):
    # 'common' is in 3/3 docs (df 100% > cap) → always excluded;
    # doc 1 ranks rare terms by tf desc then term asc.
    rows = [
        (1, "common zz zz yy yy xx", "en", "s0", 1),
        (2, "common zz aa", "en", "s0", 1),
        (3, "common bb", "en", "s0", 1),
    ]
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out = {}
    for r in top_terms_per_doc(spark, str(d)).collect():
        out.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"]))
    for v in out.values():  # collect order is arbitrary; rank order isn't
        v.sort(key=lambda t: (-t[1], t[0]))
    assert all("common" not in [t for t, _, _ in v] for v in out.values())
    # doc 1: tf(zz)=2, tf(yy)=2, tf(xx)=1 → ties break alphabetically
    assert out[1] == [("yy", 2, 1), ("zz", 2, 2), ("xx", 1, 1)]
    assert out[3] == [("bb", 1, 1)]


def test_fixture_shape(spark):
    rows = top_terms_per_doc(spark, SF_DIR).collect()
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert rows and max(per_doc.values()) <= TOP_K
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for r in rows:
        assert r["df"] * 100 <= DF_CAP_PCT * n_docs


def test_oracle_parity(spark):
    con = duckdb_connection(SF_DIR)
    name = "top_terms_per_doc"
    res = compare(
        entry.queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    assert res["ok"], res


def test_vocab_encode_known_values(spark, tmp_path):
    # counts: zz=3, aa=2, bb=1 → ids: zz=1, aa=2, bb=3
    rows = [
        (1, "zz aa zz", "en", "s0", 8),
        (2, "aa bb zz", "en", "s0", 8),
    ]
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    from automate_data_ingestion_project_spark.analytics.terms import vocab_encode

    out = {r["doc_id"]: r for r in vocab_encode(spark, str(d)).collect()}
    # doc1 ids by pos: [1, 2, 1] → pos-weighted 1*1 + 2*2 + 1*3 = 8
    assert out[1]["pos_weighted_sum"] == 8 and out[1]["id_sum"] == 4
    # doc2 ids by pos: [2, 3, 1] → 2*1 + 3*2 + 1*3 = 11
    assert out[2]["pos_weighted_sum"] == 11 and out[2]["id_sum"] == 6
    assert out[2]["min_id"] == 1 and out[2]["max_id"] == 3


def test_vocab_encode_oracle_parity(spark):
    con = duckdb_connection(SF_DIR)
    res = compare(
        entry.queries()["vocab_encode"](spark, SF_DIR),
        con,
        entry.oracle_sql()["vocab_encode"],
    )
    assert res["ok"], res
