"""Vendor database connectors — the engine-side counterpart of the
reference's BI connector set (bigquery / databricks / duckdb / mssql /
mysql / postgres / snowflake / sqlite / trino,
``evidence-workspace/package.json:17-28``).

Spark's generic JDBC source (``io.sources.read_jdbc``, exercised for
real against embedded Derby) already covers every one of these given
the vendor's driver jar; what a user switching from the reference
actually needs is the PER-VENDOR CONFIGURATION that the reference's
connector packages encapsulate: driver class, URL shape, identifier
quoting, and sane scan defaults. :data:`VENDORS` records exactly that,
:func:`read_vendor` dispatches through the generic JDBC path, and
:func:`read_duckdb` is a fully EXECUTABLE connector (duckdb ships in
this runtime) for the reference's primary local engine.

Scale notes:

- Every JDBC vendor scan should use partitioned reads
  (``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``)
  past dimension size — one connection dragging a fact table serializes
  the cluster behind a single socket. :func:`read_vendor` passes these
  straight through to Spark, which issues one range-bounded query per
  partition.
- ``fetchsize`` defaults are per-vendor: the JDBC default of a few
  hundred rows round-trips the network per fetch; 10k is the common
  production setting (MySQL instead streams row-by-row unless
  ``useCursorFetch=true``).
- DuckDB is an in-process engine, so :func:`read_duckdb` materializes
  driver-side through Arrow — correct for dimension-scale data and
  federated pushdown results (the same rationale as the driver-side
  DBF parser, ``io/dbf.py``). Fact-scale handoff goes through
  :func:`duckdb_copy_to_parquet` instead: DuckDB ``COPY (…) TO 'dir'
  (FORMAT PARQUET)`` + a native Spark scan of the result — zero
  serialization through one process.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources import read_jdbc


@dataclass(frozen=True)
class VendorDialect:
    """Connection recipe for one vendor through Spark's JDBC source."""

    name: str
    driver: str  # JDBC driver class (jar supplied by the deployment)
    url: Callable[..., str]  # (host, port, database, **params) -> url
    default_port: int | None
    quote: str = '"'  # identifier quote character (ANSI default)
    scan_defaults: dict = field(default_factory=dict)


def _params(extra: dict) -> str:
    return "".join(f";{k}={v}" for k, v in sorted(extra.items()))


def _qparams(extra: dict) -> str:
    if not extra:
        return ""
    return "?" + "&".join(f"{k}={v}" for k, v in sorted(extra.items()))


VENDORS: dict[str, VendorDialect] = {
    d.name: d
    for d in (
        VendorDialect(
            name="postgres",
            driver="org.postgresql.Driver",
            url=lambda host, port, database, **p: (
                f"jdbc:postgresql://{host}:{port}/{database}{_qparams(p)}"
            ),
            default_port=5432,
            scan_defaults={"fetchsize": "10000"},
        ),
        VendorDialect(
            name="mysql",
            driver="com.mysql.cj.jdbc.Driver",
            url=lambda host, port, database, **p: (
                f"jdbc:mysql://{host}:{port}/{database}{_qparams(p)}"
            ),
            default_port=3306,
            quote="`",
            # without cursor fetch the Connector/J client buffers the
            # ENTIRE result set in executor memory
            scan_defaults={"fetchsize": "10000", "useCursorFetch": "true"},
        ),
        VendorDialect(
            name="mssql",
            driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
            url=lambda host, port, database, **p: (
                f"jdbc:sqlserver://{host}:{port};databaseName={database}"
                f"{_params(p)}"
            ),
            default_port=1433,
            quote="[",  # closes with ]; quote_identifier handles it
            scan_defaults={"fetchsize": "10000"},
        ),
        VendorDialect(
            name="sqlite",
            driver="org.sqlite.JDBC",
            url=lambda host, port, database, **p: f"jdbc:sqlite:{database}",
            default_port=None,
        ),
        VendorDialect(
            name="snowflake",
            driver="net.snowflake.client.jdbc.SnowflakeDriver",
            url=lambda host, port, database, **p: (
                f"jdbc:snowflake://{host}:{port}/?db={database}"
                + ("&" + "&".join(f"{k}={v}" for k, v in sorted(p.items()))
                   if p else "")
            ),
            default_port=443,
            scan_defaults={"fetchsize": "10000"},
        ),
        VendorDialect(
            name="trino",
            driver="io.trino.jdbc.TrinoDriver",
            # database = catalog[/schema]
            url=lambda host, port, database, **p: (
                f"jdbc:trino://{host}:{port}/{database}{_qparams(p)}"
            ),
            default_port=8080,
            scan_defaults={"fetchsize": "10000"},
        ),
        VendorDialect(
            name="databricks",
            driver="com.databricks.client.jdbc.Driver",
            url=lambda host, port, database, **p: (
                f"jdbc:databricks://{host}:{port}/{database}{_params(p)}"
            ),
            default_port=443,
            quote="`",
            scan_defaults={"fetchsize": "10000"},
        ),
        # Derby ships inside the Spark distribution — the one vendor the
        # sandbox can execute end-to-end; it stands in for the family in
        # tests (same dispatch, same options path).
        VendorDialect(
            name="derby",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            url=lambda host, port, database, **p: (
                f"jdbc:derby:{database}{_params(p)}"
            ),
            default_port=None,
        ),
    )
}

# BigQuery is NOT a JDBC source: Spark reads it through the dedicated
# spark-bigquery connector (format "bigquery"), whose jar this sandbox
# does not ship — same documented gate as Delta/Avro.
BIGQUERY_FORMAT = "bigquery"


def quote_identifier(vendor: str, name: str) -> str:
    """Vendor-correct identifier quoting (for dbtable/query strings
    Spark passes through verbatim). Embedded quote chars are doubled,
    the one injection-safe escape every listed dialect shares."""
    d = VENDORS[vendor]
    if d.quote == "[":
        return "[" + name.replace("]", "]]") + "]"
    return d.quote + name.replace(d.quote, d.quote * 2) + d.quote


def vendor_url(
    vendor: str,
    host: str = "localhost",
    port: int | None = None,
    database: str = "",
    **params,
) -> str:
    d = VENDORS[vendor]
    return d.url(host, port if port is not None else d.default_port,
                 database, **params)


def read_vendor(
    spark: SparkSession,
    vendor: str,
    table: str,
    host: str = "localhost",
    port: int | None = None,
    database: str = "",
    url_params: dict | None = None,
    **options,
) -> DataFrame:
    """Vendor scan through the generic JDBC path: dialect driver + URL
    + scan defaults, with caller ``options`` (credentials, partitioned-
    read bounds, pushed predicates) overriding defaults. Exercised
    end-to-end against the ``derby`` dialect in ``tests/test_vendors.py``;
    every other vendor differs only by jar + URL, which is exactly what
    this module encodes."""
    if vendor == "bigquery":
        raise ValueError(
            "bigquery is not a JDBC source — use "
            "spark.read.format('bigquery') with the spark-bigquery "
            "connector jar (absent in this runtime; documented gate)"
        )
    d = VENDORS[vendor]
    opts = {"driver": d.driver, **d.scan_defaults, **options}
    return read_jdbc(
        spark,
        vendor_url(vendor, host, port, database, **(url_params or {})),
        table,
        **opts,
    )


def duckdb_path_literal(path: str) -> str:
    """``path`` as a single-quoted DuckDB SQL string literal, with
    embedded single quotes doubled. DuckDB's table functions
    (``read_parquet``/``read_csv``/…) and ``COPY … TO`` take paths as
    literals, not bind parameters — every path interpolated into a
    DuckDB statement in this repo goes through here, so a path
    containing ``'`` cannot break out of the literal."""
    return "'" + path.replace("'", "''") + "'"


def duckdb_copy_to_parquet(
    database: str, query: str, dest_dir: str, per_thread_output: bool = True
) -> str:
    """Fact-scale DuckDB→Spark handoff: execute ``query`` in DuckDB and
    ``COPY`` its result to parquet under ``dest_dir``, for Spark to scan
    NATIVELY. This is the path the module docstring prescribes past
    dimension scale: :func:`read_duckdb` materializes the result
    driver-side through Arrow (one process holds the whole result), while
    here DuckDB streams straight to parquet files and the cluster reads
    them with the ordinary distributed scan — zero rows ever transit the
    driver, and Spark's predicate pushdown / column pruning / partition
    sizing all apply as if the data had been born in the lake.

    ``per_thread_output=True`` has DuckDB write one file per writer
    thread instead of a single file — the parquet layout a parallel
    Spark scan wants (one task per file/row-group instead of one task
    splitting a monolith).

    Returns ``dest_dir`` (the path to hand to ``spark.read.parquet``).
    Counterpart of the reference's duckdb connector
    (``evidence-workspace/package.json:22``) for result sets too large
    to hand over in memory.

    Trust boundary: ``query`` is interpolated RAW into the COPY
    statement (it IS SQL) — it must be a trusted literal, and any path
    it embeds should be quoted via :func:`duckdb_path_literal`.
    ``dest_dir`` is escaped here (COPY takes no parameter binding for
    the target)."""
    import duckdb

    opts = "FORMAT PARQUET" + (
        ", PER_THREAD_OUTPUT TRUE" if per_thread_output else ""
    )
    con = duckdb.connect(database)
    try:
        con.sql(f"COPY ({query}) TO {duckdb_path_literal(dest_dir)} ({opts})")
    finally:
        con.close()
    return dest_dir


def derby_shutdown(spark: SparkSession, db: str) -> None:
    """Shut down one embedded Derby database so its files can be
    deleted safely. Embedded Derby keeps a database BOOTED per-JVM
    keyed by path: deleting files under a booted database (e.g. a
    scratch wipe between reruns in one process) leaves the engine
    holding pages of a table that no longer exists — boot/lock errors
    or undefined state on the next connect. The shutdown URL is the
    documented remedy, and Derby reports a SUCCESSFUL single-database
    shutdown by THROWING SQLException 08006 — so every outcome that
    matters here (shut down, never booted, driver not yet loaded)
    arrives as an exception, and all are equally "safe to delete now":
    swallow them. Issued through the JVM, where the embedded engine
    actually lives (a Python-side driver would boot a second engine)."""
    try:
        spark._jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{db};shutdown=true"
        )
    except Exception:
        pass


def read_duckdb(
    spark: SparkSession, database: str, query: str
) -> DataFrame:
    """Executable DuckDB connector: run ``query`` in DuckDB (in-process,
    ``database`` = file path or ``:memory:``) and hand the result to
    Spark through Arrow. Driver-side by design — dimension-scale data
    and federated pushdown results; see the module docstring for the
    fact-scale parquet handoff."""
    import duckdb

    con = duckdb.connect(database)
    try:
        tbl = con.sql(query).arrow()
    finally:
        con.close()
    try:
        return spark.createDataFrame(tbl)  # Arrow Table (Spark 4)
    except TypeError:  # older PySpark: go through pandas
        return spark.createDataFrame(tbl.to_pandas())
