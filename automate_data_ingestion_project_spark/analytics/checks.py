"""Quality-assertion CORRECTNESS query (Q1-Q4 as a driver-checked entry).

Replays the reference's ``dbt test`` + config-constraint behavior
(``/root/reference/dbt_core/models/example/schema.yml:10-21``,
``scripts/config/config.yaml:24-39``) over a deliberately poisoned
fixture: the normalized DV3F table plus two bad rows (a duplicate uid /
over-long ``annee`` / negative ``nbtrans``, and a NULL uid /
out-of-range ``nbtrans``). The report must count exactly the planted
violations — and count zero for rules the clean part satisfies.

The Spark side compiles all four rules into ONE aggregation pass
(:func:`..quality.violation_counts`); the oracle recomputes each count
with plain SQL aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..quality import (
    max_length_check,
    not_null_check,
    range_check,
    unique_check,
    violation_counts,
)
from .dv3f import METRICS, _oracle_sql as _dv3f_oracle_sql, normalize_dv3f
from .registry import register

_NBTRANS_LO, _NBTRANS_HI = 0, 1_000_000


def _poison_rows_sql(dialect: str) -> str:
    """Two bad rows, emitted for either engine (sha2 vs sha256)."""
    dup_concat = "concat('2014', '01', '111')"
    dup_uid = (
        f"sha2({dup_concat}, 256)" if dialect == "spark" else f"sha256({dup_concat})"
    )
    null_metrics = ", ".join(
        f"CAST(NULL AS DOUBLE) AS {m}" for m in METRICS if m != "nbtrans"
    )
    row_a = (
        f"SELECT {dup_uid} AS uid, '2014X' AS annee, '01' AS dep, 'Ain' AS libdep, "
        f"'111' AS cod, CAST(-5.0 AS DOUBLE) AS nbtrans, {null_metrics}"
    )
    row_b = (
        "SELECT CAST(NULL AS STRING) AS uid, '2014' AS annee, '99' AS dep, "
        "'Nowhere' AS libdep, '121' AS cod, CAST(2000000.0 AS DOUBLE) AS nbtrans, "
        f"{null_metrics}"
    )
    if dialect != "spark":
        row_a = row_a.replace("CAST(NULL AS STRING)", "CAST(NULL AS VARCHAR)")
        row_b = row_b.replace("CAST(NULL AS STRING)", "CAST(NULL AS VARCHAR)")
    return f"{row_a} UNION ALL {row_b}"


@register(
    "quality_report",
    oracle=f"""
    WITH base AS (
        SELECT uid, annee, nbtrans FROM ({_dv3f_oracle_sql()})
        UNION ALL
        SELECT uid, annee, nbtrans FROM ({_poison_rows_sql("duckdb")})
    )
    SELECT 'uid' AS column_name, 'unique' AS rule,
           CAST(COUNT(uid) - COUNT(DISTINCT uid) AS BIGINT) AS violations
    FROM base
    UNION ALL
    SELECT 'uid', 'not_null',
           CAST(SUM(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM base
    UNION ALL
    SELECT 'annee', 'max_length',
           CAST(SUM(CASE WHEN length(annee) > 4 THEN 1 ELSE 0 END) AS BIGINT)
    FROM base
    UNION ALL
    SELECT 'nbtrans', 'range',
           CAST(SUM(CASE WHEN nbtrans < {_NBTRANS_LO} OR nbtrans > {_NBTRANS_HI}
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM base
    """,
    survey_ref="Q1,Q2,Q3,Q4 (schema.yml:10-21, config.yaml:24-39)",
)
def quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = normalize_dv3f(spark, sf_dir).unionByName(
        spark.sql(_poison_rows_sql("spark"))
    )
    checks = [
        unique_check("uid"),
        not_null_check("uid"),
        max_length_check("annee", 4),
        range_check("nbtrans", _NBTRANS_LO, _NBTRANS_HI),
    ]
    return violation_counts(base, checks)


_RELATIONSHIPS = (
    # (child table, fk column, parent table, pk column)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@register(
    "referential_integrity",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{child}.{fk} -> {parent}.{pk}' AS relation,
               (SELECT COUNT(*) FROM {child}) AS n_child_rows,
               (SELECT COUNT(*) FROM {child} c
                LEFT JOIN {parent} p ON c.{fk} = p.{pk}
                WHERE p.{pk} IS NULL AND c.{fk} IS NOT NULL)
                   AS n_orphans,
               (SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL)
                   AS n_null_fk'''
        for child, fk, parent, pk in _RELATIONSHIPS
    )}
    """,
    survey_ref="dbt relationships test analog: FK orphan counts per relation",
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's ``relationships`` test over the star schema: for each
    declared FK edge, count child rows whose key has no parent (orphans)
    and NULL foreign keys, alongside the child row count.

    Scale shape: each check is a LEFT-ANTI join on the key — AQE
    broadcasts the dimension side for the small parents
    (nation/region) and shuffle-joins fact⋈fact; nothing collects
    driver-side, and the per-relation outputs are single aggregate
    rows unioned together. A clean warehouse returns all zeros — the
    fixture is clean, so the oracle also proves the checks themselves
    don't false-positive.
    """
    from pyspark.sql import functions as F

    from ..io import load_table

    out = None
    for child, fk, parent, pk in _RELATIONSHIPS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = (
            c.filter(F.col(fk).isNotNull())
            .join(p, c[fk] == p[pk], "left_anti")
            .agg(F.count("*").alias("n"))
        )
        row = (
            c.agg(
                F.count("*").alias("n_child_rows"),
                F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_null_fk"),
            )
            .crossJoin(F.broadcast(orphans))
            .select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("relation"),
                "n_child_rows",
                F.col("n").cast("bigint").alias("n_orphans"),
                "n_null_fk",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
