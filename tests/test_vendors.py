"""Vendor connector registry (S6 family closure): URL/driver/quoting
recipes for the reference's connector set, with the dispatch path
executed for REAL against the two engines this sandbox ships — embedded
Derby (JDBC) and in-process DuckDB (Arrow handoff)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.io.vendors import (
    VENDORS,
    duckdb_copy_to_parquet,
    duckdb_path_literal,
    quote_identifier,
    read_duckdb,
    read_vendor,
    vendor_url,
)

REFERENCE_CONNECTORS = {
    # evidence-workspace/package.json:17-28, minus csv (io/sources.py)
    # and bigquery (non-JDBC, documented gate)
    "databricks",
    "mssql",
    "mysql",
    "postgres",
    "snowflake",
    "sqlite",
    "trino",
}


def test_registry_covers_the_reference_connector_set():
    assert REFERENCE_CONNECTORS <= set(VENDORS)


def test_vendor_urls_and_drivers():
    cases = {
        "postgres": (
            vendor_url("postgres", "h", 5433, "db", sslmode="require"),
            "jdbc:postgresql://h:5433/db?sslmode=require",
        ),
        "mysql": (
            vendor_url("mysql", "h", database="db"),
            "jdbc:mysql://h:3306/db",
        ),
        "mssql": (
            vendor_url("mssql", "h", database="db", encrypt="true"),
            "jdbc:sqlserver://h:1433;databaseName=db;encrypt=true",
        ),
        "sqlite": (
            vendor_url("sqlite", database="/tmp/x.db"),
            "jdbc:sqlite:/tmp/x.db",
        ),
        "snowflake": (
            vendor_url("snowflake", "acct.snowflakecomputing.com",
                       database="db", warehouse="wh"),
            "jdbc:snowflake://acct.snowflakecomputing.com:443/"
            "?db=db&warehouse=wh",
        ),
        "snowflake-proxy": (
            vendor_url("snowflake", "proxy.internal", 8443, "db"),
            "jdbc:snowflake://proxy.internal:8443/?db=db",
        ),
        "trino": (
            vendor_url("trino", "h", 8443, "hive/web"),
            "jdbc:trino://h:8443/hive/web",
        ),
        "databricks": (
            vendor_url("databricks", "ws.cloud.databricks.com",
                       database="default", httpPath="/sql/1.0/x"),
            "jdbc:databricks://ws.cloud.databricks.com:443/default"
            ";httpPath=/sql/1.0/x",
        ),
    }
    for vendor, (got, want) in cases.items():
        assert got == want, vendor
        assert VENDORS[vendor.split("-")[0]].driver  # dialect names its jar


def test_identifier_quoting_per_dialect():
    assert quote_identifier("postgres", "order") == '"order"'
    assert quote_identifier("postgres", 'we"ird') == '"we""ird"'
    assert quote_identifier("mysql", "order") == "`order`"
    assert quote_identifier("mysql", "we`ird") == "`we``ird`"
    assert quote_identifier("mssql", "order") == "[order]"
    assert quote_identifier("mssql", "we]ird") == "[we]]ird]"
    assert quote_identifier("trino", "order") == '"order"'


def test_bigquery_is_a_documented_non_jdbc_gate(spark):
    with pytest.raises(ValueError, match="spark-bigquery"):
        read_vendor(spark, "bigquery", "t")


def test_read_vendor_executes_through_derby(spark, tmp_path):
    """The dispatch path runs for real: dialect URL + driver + options
    reach Spark's JDBC source and rows come back — including the
    partitioned-read scale options."""
    db = f"{tmp_path}/db"
    df = spark.range(0, 50).withColumn("v", (F.col("id") * 3).cast("long"))
    (
        df.write.format("jdbc")
        .options(
            url=f"jdbc:derby:{db};create=true",
            dbtable="t",
            driver=VENDORS["derby"].driver,
        )
        .mode("overwrite")
        .save()
    )
    out = read_vendor(
        spark,
        "derby",
        "t",
        database=db,
        partitionColumn="id",
        lowerBound=0,
        upperBound=50,
        numPartitions=4,
    )
    assert out.rdd.getNumPartitions() == 4
    assert sorted((r.id, r.v) for r in out.collect()) == [
        (i, 3 * i) for i in range(50)
    ]


def test_read_vendor_caller_options_override_scan_defaults(spark, tmp_path):
    """Caller options must win over dialect scan defaults (credentials,
    tuned fetchsize) — asserted through the real Derby path by passing
    an option Spark validates: a bogus driver class must be USED (and
    fail), proving it overrode the dialect default."""
    import py4j.protocol
    import pytest as _pytest

    with _pytest.raises(py4j.protocol.Py4JJavaError):
        read_vendor(
            spark,
            "derby",
            "t",
            database=f"{tmp_path}/nope",
            driver="com.example.NoSuchDriver",
        ).collect()


def test_duckdb_copy_to_parquet_native_scan(spark, sf_dir, tmp_path):
    """Fact-scale handoff: DuckDB COPY TO PARQUET + native Spark scan.
    Losslessness vs a direct Spark read of the same source, AND the
    plan must be an ordinary distributed parquet FileScan — no Arrow /
    LocalTableScan / driver hop anywhere."""
    dest = str(tmp_path / "nation_pq")
    duckdb_copy_to_parquet(
        ":memory:",
        f"""
        SELECT n_nationkey, n_name, n_regionkey
        FROM read_parquet('{sf_dir}/nation.parquet')
        WHERE n_regionkey <= 2
        """,
        dest,
    )
    got = spark.read.parquet(dest)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan
    assert "LocalTableScan" not in plan
    direct = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_regionkey") <= 2)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_duckdb_copy_per_thread_output_writes_a_directory(tmp_path):
    """PER_THREAD_OUTPUT must produce a DIRECTORY of parquet files (the
    layout a parallel scan wants); single-file mode must produce one
    file — both scannable."""
    import os

    import duckdb

    d1 = str(tmp_path / "multi")
    duckdb_copy_to_parquet(":memory:", "SELECT range AS r FROM range(10)", d1)
    assert os.path.isdir(d1) and any(
        f.endswith(".parquet") for f in os.listdir(d1)
    )
    f1 = str(tmp_path / "single.parquet")
    duckdb_copy_to_parquet(
        ":memory:",
        "SELECT range AS r FROM range(10)",
        f1,
        per_thread_output=False,
    )
    assert os.path.isfile(f1)
    assert duckdb.sql(f"SELECT count(*) c FROM read_parquet('{f1}')").fetchone()[0] == 10


def test_duckdb_path_literal_quotes_survive(tmp_path):
    """Path literals embedded in DuckDB statements go through
    ``duckdb_path_literal`` — a path containing a single quote must
    round-trip through COPY TO and read_parquet instead of breaking
    the statement (the r10 ADVICE trust-boundary finding)."""
    import os

    import duckdb

    assert duckdb_path_literal("/a/b'c") == "'/a/b''c'"
    quoted_dir = tmp_path / "o'quote"
    quoted_dir.mkdir()
    dest = str(quoted_dir / "out")
    duckdb_copy_to_parquet(":memory:", "SELECT range AS r FROM range(5)", dest)
    assert os.path.isdir(dest)
    src = duckdb_path_literal(os.path.join(dest, "*.parquet"))
    assert (
        duckdb.sql(f"SELECT count(*) c FROM read_parquet({src})").fetchone()[0]
        == 5
    )


def test_jdbc_roundtrip_rerun_in_process(spark):
    """Regression for the Derby rerun hazard: ``scratch_dir`` wipes the
    database directory on every invocation, and embedded Derby keeps a
    database booted per-JVM keyed by path — without the pre-wipe
    ``derby_shutdown`` a second run in the same process deletes files
    under a still-booted database (boot/lock errors or undefined
    state). Three consecutive runs must all round-trip."""
    from automate_data_ingestion_project_spark.analytics.sources_surface import (
        jdbc_roundtrip_nation,
    )

    sf = "/root/testdata/sf0.001"
    for _ in range(3):
        assert jdbc_roundtrip_nation(spark, sf).count() == 25


def test_read_duckdb_arrow_handoff(spark, sf_dir):
    """The executable DuckDB connector: a federated DuckDB query over
    the same parquet fixture must round-trip into Spark exactly."""
    got = read_duckdb(
        spark,
        ":memory:",
        f"""
        SELECT n_nationkey, n_name
        FROM read_parquet('{sf_dir}/nation.parquet')
        WHERE n_regionkey = 1
        ORDER BY n_nationkey
        """,
    )
    direct = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_regionkey") == 1)
        .select("n_nationkey", "n_name")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert [f.name for f in got.schema.fields] == ["n_nationkey", "n_name"]
