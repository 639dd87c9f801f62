"""Table profiling — the data-quality summary every warehouse ships
(dbt docs / AWS Deequ / Great Expectations profilers): per-column null
counts, exact distinct counts, and min/max, in ONE pass over the table.

Shape: a single aggregate computes every column's metrics simultaneously
(Spark evaluates all aggregate expressions in one scan — no per-column
jobs), then the wide 1-row result unpivots to long (column, metric)
form driver-side-free via the stack expression. At 100 TB the scan is
the only data-sized work; exact COUNT(DISTINCT) over many columns
expands via Spark's single-pass Expand rewrite, and production swaps it
for approx_count_distinct with a documented error (SCALE.md percentile
precedent) without changing the output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "table_profile",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders'''
        for c in _COLS
    )}
    """,
    survey_ref="data-quality profiling: per-column null/distinct/min/max in one pass",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_nulls"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n_nulls, {c}__n_distinct, {c}__min, {c}__max"
        for c in _COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )
