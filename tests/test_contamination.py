"""Decontamination + repetition signals: known-value checks on
hand-built corpora plus oracle parity on the fixtures."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from automate_data_ingestion_project_spark.analytics.contamination import (
    EVAL_MOD,
    decontaminate_overlap,
    doc_repetition,
)
from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_decontaminate_flags_only_overlapping_docs(spark, tmp_path):
    # doc 0 (eval: 0 % EVAL_MOD == 0) shares the 5-gram "a b c d e"
    # with train doc 1; train doc 2 shares nothing.
    rows = [
        (0, "a b c d e f", "en", "s0", 12),
        (1, "x a b c d e", "en", "s0", 12),
        (2, "p q r s t u", "en", "s1", 12),
    ]
    d = tmp_path / "docs"
    _docs(spark, rows).write.parquet(str(d / "documents.parquet"))
    out = {
        r["source"]: r
        for r in decontaminate_overlap(spark, str(d)).collect()
    }
    assert out["s0"]["n_train_docs"] == 1
    assert out["s0"]["n_contaminated_docs"] == 1
    assert out["s0"]["n_hit_grams_total"] == 1  # one shared 5-gram
    assert out["s1"]["n_contaminated_docs"] == 0
    assert out["s1"]["n_hit_grams_total"] == 0


def test_repetition_known_values(spark, tmp_path):
    # "x y x y x y": 6 tokens, 2 unique, 5 bigrams, "x y" appears 3×
    # → 3*5 > 5 → repetitive. "a b c d e f" has max bigram 1 → clean.
    rows = [
        (1, "x y x y x y", "en", "s0", 11),
        (2, "a b c d e f", "en", "s0", 11),
    ]
    d = tmp_path / "docs"
    _docs(spark, rows).write.parquet(str(d / "documents.parquet"))
    out = {r["doc_id"]: r for r in doc_repetition(spark, str(d)).collect()}
    r1, r2 = out[1], out[2]
    assert (r1["n_tokens"], r1["n_unique_tokens"]) == (6, 2)
    assert (r1["n_bigrams"], r1["max_bigram_n"]) == (5, 3)
    assert r1["is_repetitive"] is True
    assert (r2["n_bigrams"], r2["max_bigram_n"]) == (5, 1)
    assert r2["is_repetitive"] is False


@pytest.mark.parametrize("name", ["decontaminate_overlap", "doc_repetition"])
def test_oracle_parity(spark, name):
    con = duckdb_connection(SF_DIR)
    res = compare(
        entry.queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    assert res["ok"], res


def test_eval_set_is_nonempty_on_fixture(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert docs.filter(f"doc_id % {EVAL_MOD} = 0").count() > 0
