"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each ``queries()`` entry against ``oracle_sql()``
at sf0.01: row count + schema + order-insensitive value hash, with
columns sorted by name before hashing. Crucially the driver's value
hash is DTYPE-SENSITIVE — it sees both result sets through pandas, so
a DuckDB HUGEINT (pandas float64, e.g. an uncast ``SUM`` over BIGINT)
hashes as ``382.0`` against Spark's bigint ``382`` and FAILS even
though the Python values compare equal. This module therefore checks
three things: column names, column-level type KINDS (int/float/
decimal/str/bool/date/datetime/bytes/list — the granularity at which
the driver's pandas conversion distinguishes values), and normalized
values. A query that passes here and still fails the driver would be
a new escape class; both known escapes (r3→r4 date-vs-timestamp, r8
HUGEINT-vs-bigint) are kind-level mismatches this check catches.
"""

from __future__ import annotations

import math
import re
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# Type-kind lattice: the granularity at which pandas (and therefore the
# driver's value hash) distinguishes column values.

_DUCK_SCALAR_KIND = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    # pandas renders HUGEINT as float64 — the r8 escape. An oracle that
    # produces one (any uncast SUM over an integer column) only matches
    # a Spark double, never a bigint.
    "HUGEINT": "float",
    "UHUGEINT": "float",
    "FLOAT": "float",
    "REAL": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "datetime",
    "TIMESTAMP_S": "datetime",
    "TIMESTAMP_MS": "datetime",
    "TIMESTAMP_NS": "datetime",
    "TIMESTAMP WITH TIME ZONE": "datetime",
    "BLOB": "bytes",
    "INTERVAL": "interval",
}

_SPARK_SCALAR_KIND = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "datetime",
    "timestamp_ntz": "datetime",
    "binary": "bytes",
    "interval": "interval",
}


def duck_kind(type_str: str) -> Any:
    """Kind of a DuckDB type string (e.g. 'BIGINT', 'DECIMAL(18,3)',
    'VARCHAR[]')."""
    t = type_str.strip()
    if t.endswith("[]"):
        return ("list", duck_kind(t[:-2]))
    if t.upper().startswith("DECIMAL"):
        return "decimal"
    return _DUCK_SCALAR_KIND.get(t.upper(), t.upper())


def spark_kind(simple: str) -> Any:
    """Kind of a Spark simpleString type (e.g. 'bigint',
    'decimal(18,3)', 'array<double>')."""
    t = simple.strip()
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return ("list", spark_kind(m.group(1)))
    if t.startswith("decimal"):
        return "decimal"
    return _SPARK_SCALAR_KIND.get(t, t)


def type_report(spark_df, d_rel) -> dict:
    """Pair columns by sorted name and compare type kinds."""
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    d_types = dict(zip(d_rel.columns, [str(t) for t in d_rel.types]))
    mismatches = []
    for name in sorted(set(s_types) & set(d_types)):
        sk, dk = spark_kind(s_types[name]), duck_kind(d_types[name])
        if sk != dk:
            mismatches.append(
                {"col": name, "spark": s_types[name], "duck": d_types[name],
                 "spark_kind": sk, "duck_kind": dk}
            )
    return {"types_ok": not mismatches, "type_mismatches": mismatches}


def _norm(v: Any) -> Any:
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 9 significant-ish decimals to absorb float repr noise
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_key(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Return a comparison report; ``report['ok']`` is the verdict."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_rel = con.sql(sql)
    d_rows = [tuple(r) for r in d_rel.fetchall()]
    d_cols = list(d_rel.columns)

    report: dict[str, Any] = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    report["cols_ok"] = sorted(s_cols) == sorted(d_cols)
    report["count_ok"] = len(s_rows) == len(d_rows)
    report.update(type_report(spark_df, d_rel))
    if report["cols_ok"] and report["count_ok"]:
        sk = rows_key(s_rows, s_cols)
        dk = rows_key(d_rows, d_cols)
        report["values_ok"] = sk == dk
        if not report["values_ok"]:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
            report["first_diffs"] = diffs
    else:
        report["values_ok"] = False
    report["ok"] = (
        report["cols_ok"]
        and report["count_ok"]
        and report["types_ok"]
        and report["values_ok"]
    )
    return report
