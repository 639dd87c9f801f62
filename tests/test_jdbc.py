"""S6 JDBC connector, exercised for real against embedded Derby (the
one database whose driver ships inside the Spark distribution, so the
test needs no network and no installs).

The reference's BI layer lists five database connector types
(evidence-workspace/package.json:17-28); Spark's JDBC source covers
them all given a driver jar — Derby here stands in for the family:
same code path (``spark.read.format("jdbc")``), same partitioned-read
and pushdown options.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.io.sources import read_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    df = spark.range(0, 100).withColumn("v", (F.col("id") * 2).cast("long"))
    (
        df.write.format("jdbc")
        .options(url=url, dbtable="t", driver=DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_roundtrip(spark, derby_url):
    out = read_jdbc(spark, derby_url, "t", driver=DERBY_DRIVER)
    rows = sorted((r.id, r.v) for r in out.collect())
    assert rows == [(i, 2 * i) for i in range(100)]


def test_jdbc_partitioned_read(spark, derby_url):
    """The scale path: numPartitions parallel range-bounded queries, one
    per executor slot, instead of one connection dragging the table."""
    out = read_jdbc(
        spark,
        derby_url,
        "t",
        driver=DERBY_DRIVER,
        partitionColumn="id",
        lowerBound=0,
        upperBound=100,
        numPartitions=4,
    )
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 100


def test_jdbc_filter_pushdown(spark, derby_url):
    """Predicate reaches the database: the JDBC relation's pushed
    filters appear in the physical plan, so the DB — not Spark —
    discards the rows."""
    out = read_jdbc(spark, derby_url, "t", driver=DERBY_DRIVER).filter(
        F.col("id") < 10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan
    assert out.count() == 10
