"""End-to-end curation pipeline: composition invariants + oracle parity."""

from __future__ import annotations

import __spark_entry__ as entry
from automate_data_ingestion_project_spark.analytics.curation import (
    corpus_curation_pipeline,
)
from automate_data_ingestion_project_spark.analytics.mixing import (
    corpus_sample_mix,
)
from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_only_shrinks_the_corpus(spark):
    out = {r["source"]: r for r in corpus_curation_pipeline(spark, SF_DIR).collect()}
    mix = {r["source"]: r for r in corpus_sample_mix(spark, SF_DIR).collect()}
    for src, r in out.items():
        # every pipeline stage filters: final docs ≤ standalone sample
        # count (the standalone op samples WITHOUT dedup/decontam/eval
        # removal, so it upper-bounds the composed result)
        assert 0 < r["n_docs"] <= mix[src]["n_sampled"]
        assert 1 <= r["n_sequences"] <= r["n_docs"]
        assert r["total_tokens"] > 0


import pytest


@pytest.mark.parametrize(
    "name", ["corpus_curation_pipeline", "curated_shard_export"]
)
def test_oracle_parity(spark, name):
    con = duckdb_connection(SF_DIR)
    res = compare(
        entry.queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    assert res["ok"], res
