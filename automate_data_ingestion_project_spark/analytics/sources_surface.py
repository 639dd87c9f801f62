"""Source-layer CORRECTNESS queries: the dbt-style SQL surface over
registered views (S4) and the non-parquet connector round-trips (S6).

The round-trip queries write a fixture table out in the connector
format (deterministically, scratch-dir overwrite) and read it back with
an explicit schema — the oracle reads the ORIGINAL table, so the check
proves the format round-trip is lossless, not just self-consistent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table, register_views
from ..io.sources import read_csv, read_json, read_orc, read_xml
from .load import scratch_dir
from .registry import register


@register(
    "source_registry_sql",
    oracle="""
    SELECT r.r_name AS region, COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    survey_ref="S4 (sources.yml registry → SQL surface over views)",
)
def source_registry_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt pattern end-to-end: sources registered as views, a model
    written in pure SQL against them."""
    register_views(spark, sf_dir, ("region", "nation"))
    return spark.sql(
        """
        SELECT r.r_name AS region, COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


@register(
    "csv_roundtrip_region",
    oracle="SELECT * FROM region",
    survey_ref="S6 (csv connector; write+read round-trip vs original)",
)
def csv_roundtrip_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    path = os.path.join(scratch_dir("csv_roundtrip"), "region_csv")
    region.write.mode("overwrite").option("header", "true").csv(path)
    return read_csv(spark, path, schema=region.schema)


@register(
    "json_roundtrip_nation",
    oracle="SELECT * FROM nation",
    survey_ref="S6 (json connector; write+read round-trip vs original)",
)
def json_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    path = os.path.join(scratch_dir("json_roundtrip"), "nation_json")
    nation.write.mode("overwrite").json(path)
    return read_json(spark, path, schema=nation.schema)


@register(
    "orc_roundtrip_supplier",
    oracle="SELECT * FROM supplier",
    survey_ref="S6 (orc connector; write+read round-trip vs original)",
)
def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    path = os.path.join(scratch_dir("orc_roundtrip"), "supplier_orc")
    supplier.write.mode("overwrite").orc(path)
    return read_orc(spark, path)


@register(
    "xml_roundtrip_part",
    oracle="SELECT * FROM part",
    survey_ref="S6 (xml connector, Spark-4 built-in; round-trip vs original)",
)
def xml_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    path = os.path.join(scratch_dir("xml_roundtrip"), "part_xml")
    part.write.mode("overwrite").format("xml").option("rowTag", "part").save(
        path
    )
    # explicit schema: XML carries no types, so the read declares them —
    # doubles round-trip exactly (Java shortest-round-trip formatting)
    return read_xml(spark, path, row_tag="part", schema=part.schema)


@register(
    "duckdb_federated_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey IN (0, 1)
    """,
    survey_ref="S6 (duckdb connector, executable; federated query → Arrow handoff)",
)
def duckdb_federated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary local engine as a live connector
    (``@evidence-dev/duckdb``, package.json:22): the predicate and
    projection run INSIDE DuckDB (federated pushdown) and the result
    crosses into Spark once, through Arrow (`io/vendors.read_duckdb`).
    Driver-side by design — dimension-scale data; the fact-scale
    handoff is DuckDB ``COPY TO (FORMAT PARQUET)`` + a native Spark
    scan (module docstring of ``io/vendors.py``)."""
    from ..io.vendors import duckdb_path_literal, read_duckdb

    src = duckdb_path_literal(f"{sf_dir}/nation.parquet")
    return read_duckdb(
        spark,
        ":memory:",
        f"""
        SELECT n_nationkey, n_name, n_regionkey
        FROM read_parquet({src})
        WHERE n_regionkey IN (0, 1)
        """,
    )


@register(
    "duckdb_parquet_handoff",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    survey_ref="S6 (duckdb connector, fact-scale handoff: COPY TO PARQUET → native Spark scan)",
)
def duckdb_parquet_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FACT-SCALE half of the DuckDB connector story
    (``duckdb_federated_scan`` is the dimension-scale half): the DuckDB
    query's result is COPY'd to parquet inside DuckDB
    (``io/vendors.duckdb_copy_to_parquet``, one file per writer thread)
    and Spark scans those files NATIVELY — no Arrow hop, no rows
    through the driver, and the scan is an ordinary distributed
    parquet read (plan-pinned in ``tests/test_vendors.py``: a
    ``FileScan parquet``, not a ``LocalTableScan``). The oracle reads
    the ORIGINAL table, so a hash match proves the DuckDB→parquet→Spark
    round-trip is lossless, not merely self-consistent."""
    from ..io.vendors import duckdb_copy_to_parquet, duckdb_path_literal

    dest = os.path.join(scratch_dir("duckdb_handoff"), "orders_urgent")
    src = duckdb_path_literal(f"{sf_dir}/orders.parquet")
    duckdb_copy_to_parquet(
        ":memory:",
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM read_parquet({src})
        WHERE o_orderpriority = '1-URGENT'
        """,
        dest,
    )
    return spark.read.parquet(dest)


@register(
    "jdbc_roundtrip_nation",
    oracle="SELECT * FROM nation",
    survey_ref="S6 (jdbc connector via the vendor registry; write+read round-trip vs original, embedded Derby)",
)
def jdbc_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JDBC connector as a registered round-trip (same proof shape
    as the csv/json/orc/xml rows): ``nation`` lands in an embedded
    Derby database through Spark's JDBC sink and comes back through
    ``io/vendors.read_vendor`` — the identical dispatch every vendor
    dialect uses; only the jar + URL recipe differ (io/vendors.py).
    Derby is single-process; the scratch dir is PID-scoped, so a
    concurrent pytest and driver run cannot contend on one database.

    Rerun-in-process safety: embedded Derby keeps a database BOOTED
    per-JVM keyed by path, and ``scratch_dir`` wipes the tree on every
    call — so a second invocation in one process (repeated bench
    iterations) would delete files under a still-booted database.
    The previous invocation's database is therefore shut down FIRST
    (``derby_shutdown``), via the non-wiping ``scratch_path``, before
    the wipe."""
    from ..io.vendors import VENDORS, derby_shutdown, read_vendor
    from .load import scratch_path

    nation = load_table(spark, sf_dir, "nation")
    derby_shutdown(spark, os.path.join(scratch_path("jdbc_roundtrip"), "derby_db"))
    db = os.path.join(scratch_dir("jdbc_roundtrip"), "derby_db")
    (
        nation.write.format("jdbc")
        .options(
            url=f"jdbc:derby:{db};create=true",
            dbtable="nation",
            driver=VENDORS["derby"].driver,
        )
        .mode("overwrite")
        .save()
    )
    return read_vendor(
        spark,
        "derby",
        "nation",
        database=db,
        partitionColumn="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
    )
