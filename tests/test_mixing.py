"""Corpus mixing: determinism/known-value checks plus oracle parity."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from automate_data_ingestion_project_spark.analytics.mixing import (
    SEQ_BUDGET,
    corpus_sample_mix,
    pack_sequences,
)
from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_sampling_is_deterministic_and_rate_shaped(spark):
    a = {r["source"]: r for r in corpus_sample_mix(spark, SF_DIR).collect()}
    b = {r["source"]: r for r in corpus_sample_mix(spark, SF_DIR).collect()}
    assert a == b  # rerun keeps the identical sample
    for r in a.values():
        assert 10 <= r["rate_pct"] <= 94
        assert 0 <= r["n_sampled"] <= r["n_docs"]
    # at least one source samples strictly, at least one keeps docs
    assert any(r["n_sampled"] < r["n_docs"] for r in a.values())
    assert any(r["n_sampled"] > 0 for r in a.values())


def test_pack_sequences_partitions_every_doc_once(spark):
    out = pack_sequences(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        # a sequence never holds more docs than fit at 1 token each
        assert 1 <= r["n_docs"] <= SEQ_BUDGET
        assert r["first_doc_id"] <= r["last_doc_id"]
    # seq ids are dense enough: every source starts at sequence 0
    sources = {r["source"] for r in out}
    zero = {r["source"] for r in out if r["seq_id"] == 0}
    assert zero == sources


def test_pack_known_values(spark, tmp_path):
    # one source, docs of 3 tokens each, budget 256 → first 86 docs
    # start under offset 256 (85*3=255 < 256), doc 87 starts seq 1
    rows = [(i, "a b c", "en", "s0", 5) for i in range(1, 91)]
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    out = {r["seq_id"]: r for r in pack_sequences(spark, str(d)).collect()}
    assert out[0]["n_docs"] == 86 and out[0]["seq_tokens"] == 258
    assert out[1]["n_docs"] == 4
    assert out[1]["first_doc_id"] == 87


@pytest.mark.parametrize("name", ["corpus_sample_mix", "pack_sequences"])
def test_oracle_parity(spark, name):
    con = duckdb_connection(SF_DIR)
    res = compare(
        entry.queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    assert res["ok"], res
