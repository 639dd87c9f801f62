"""SQL-procedural pipelines: Spark 4 SQL scripting (BEGIN…END).

The reference's orchestration is Python around SQL (Dagster ops calling
DuckDB); warehouse-native deployments express the same control flow IN
SQL — compound statements with DECLARE'd variables and IF/ELSE
branching (the stored-procedure idiom). Spark 4 executes these
natively, which matters operationally: the gate-then-publish decision
runs where the data runs, with no driver round-trip between the check
and the publish, and the script is portable to any SQL-scripting
warehouse.

The D-family twin of this module is ``pipeline.py`` (config-driven
Python orchestration with per-branch failure isolation); this is the
same gate discipline for teams whose pipeline language is SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import dsum_expr
from ..io import load_table
from .registry import register

_GATE_PREDICATE = "o_totalprice <= 0 OR o_custkey IS NULL OR o_orderdate IS NULL"

_PUBLISH_SQL = f"""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           {dsum_expr("o_totalprice")} AS total_value,
           0 AS n_violations
    FROM {{rel}}
    GROUP BY o_orderpriority
"""


@register(
    "scripted_quality_gate",
    oracle=_PUBLISH_SQL.format(rel="orders"),
    survey_ref="SQL-procedural gate-then-publish (Spark 4 scripting; D/Q engine ext)",
)
def scripted_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-then-publish as ONE SQL compound statement: DECLARE a
    violation count, fill it with the quality probe, and IF/ELSE
    between the published aggregate and a quarantine marker row. The
    fixture is clean, so the oracle is the published aggregate; the
    quarantine branch is exercised by ``tests/test_scripting.py`` with
    a planted-bad relation — both engines would agree on either branch
    because the branch CONDITION is an integer count.

    Scale shape: the probe is one fully-pushed-filter count; the
    publish is one bounded-key aggregate (|priorities| groups,
    partial-aggregated). The script adds control flow, not data
    movement — the two statements' plans are exactly what the
    standalone queries would produce.
    """
    ev = load_table(spark, sf_dir, "orders")
    view = "orders_for_scripted_gate"
    ev.createOrReplaceTempView(view)
    return spark.sql(f"""
    BEGIN
      DECLARE n_bad BIGINT DEFAULT 0;
      SET n_bad = (SELECT COUNT(*) FROM {view} WHERE {_GATE_PREDICATE});
      IF n_bad = 0 THEN
        {_PUBLISH_SQL.format(rel=view)};
      ELSE
        SELECT 'QUARANTINED' AS priority,
               CAST(0 AS BIGINT) AS n_orders,
               CAST(0.0 AS DOUBLE) AS total_value,
               CAST(n_bad AS INT) AS n_violations;
      END IF;
    END
    """)
