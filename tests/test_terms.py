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
