"""Local replica of the driver's DuckDB-oracle comparison.

The driver compares each ``queries()`` entry against ``oracle_sql()``
at sf0.01: row count + schema + order-insensitive value hash, with
columns sorted by name before hashing. This module reproduces a strict
version of that check so parity failures surface in pytest before the
driver ever runs.
"""

from __future__ import annotations

import math
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
    if report["cols_ok"] and report["count_ok"]:
        sk = rows_key(s_rows, s_cols)
        dk = rows_key(d_rows, d_cols)
        report["values_ok"] = sk == dk
        if not report["values_ok"]:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
            report["first_diffs"] = diffs
    else:
        report["values_ok"] = False
    report["ok"] = report["cols_ok"] and report["count_ok"] and report["values_ok"]
    return report
