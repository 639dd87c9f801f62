"""Centroid/assignment queries: structural checks plus oracle parity."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from automate_data_ingestion_project_spark.analytics.centroids import (
    centroid_purity,
    label_centroids,
)
from tests.oracle import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.001"


def test_centroids_cover_every_label_and_dim(spark):
    rows = label_centroids(spark, SF_DIR).collect()
    labels = {r["label"] for r in rows}
    dims = {r["pos"] for r in rows}
    assert len(rows) == len(labels) * len(dims)  # full grid
    assert dims == set(range(64))
    for r in rows:
        assert 0 <= r["sum_code"] <= 255 * r["n_vecs"]


def test_purity_assigns_every_vector_once(spark):
    rows = centroid_purity(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert -1.0 <= r["min_cos"] <= r["max_cos"] <= 1.0
    # clusters are real: the diagonal far exceeds the 1/k chance level
    # (~50 of 500 for 10 labels; measured 183 on the fixture)
    diag = sum(r["n_vecs"] for r in rows if r["true_label"] == r["assigned_label"])
    assert diag > 2 * emb.count() // 10


@pytest.mark.parametrize("name", ["label_centroids", "centroid_purity"])
def test_oracle_parity(spark, name):
    con = duckdb_connection(SF_DIR)
    res = compare(
        entry.queries()[name](spark, SF_DIR), con, entry.oracle_sql()[name]
    )
    assert res["ok"], res
