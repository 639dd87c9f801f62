"""Python Data Source (executor-side REST) + compaction maintenance."""

from __future__ import annotations

import json
import os

import pytest

from automate_data_ingestion_project_spark.analytics.load import scratch_dir
from automate_data_ingestion_project_spark.ingest.datasource import RestApiDataSource
from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.io.sink import compact_parquet, read_parquet


@pytest.fixture(scope="module")
def replay_dir():
    d = scratch_dir("test_ds_replay")
    for page in (1, 2, 3):
        payload = {
            "count": 6,
            "next": "x" if page < 3 else None,
            "results": [
                {"annee": f"201{page}", "dep": "01", "meta": {"n": page * 10 + i}}
                for i in range(2)
            ],
        }
        with open(os.path.join(d, f"page-{page}.json"), "w") as fh:
            json.dump(payload, fh)
    return d


def test_rest_datasource_reads_pages_as_partitions(spark, replay_dir):
    spark.dataSource.register(RestApiDataSource)
    df = (
        spark.read.format("rest_api")
        .option("replay_dir", replay_dir)
        .option("pages", "3")
        .option("schema_ddl", "annee string, dep string, `meta.n` bigint")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one executor partition per page
    rows = sorted((r["annee"], r["meta.n"]) for r in df.collect())
    assert len(rows) == 6
    assert rows[0] == ("2011", 10) and rows[-1] == ("2013", 31)


def test_rest_datasource_requires_schema(spark):
    spark.dataSource.register(RestApiDataSource)
    with pytest.raises(Exception, match="schema_ddl"):
        spark.read.format("rest_api").load().collect()


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir):
    path = os.path.join(scratch_dir("test_compact"), "orders")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(32).write.parquet(path)
    n_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert n_before >= 32
    rows_before = orders.count()
    n_after = compact_parquet(spark, path, target_file_bytes=512 * 1024 * 1024)
    assert n_after < n_before
    assert read_parquet(spark, path).count() == rows_before
