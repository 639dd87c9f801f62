"""Data-quality assertion operators (SURVEY.md §2.10 Q1-Q4).

The reference has two assertion surfaces:

- dbt column tests ``unique`` / ``not_null``
  (``/root/reference/dbt_core/models/example/schema.yml:10-21``), run as
  "this SELECT must return zero rows";
- declarative constraints in the ingest config — ``nullable``,
  ``maxLength``, int64 ``min``/``max``
  (``/root/reference/scripts/config/config.yaml:24-39``) — plus PK
  uniqueness enforced physically by ``INSERT OR REPLACE``
  (Q4; our upsert's ``dropDuplicates`` twin lives in io/sink.py).

Two consumption styles, both provided:

1. **Violation-row relations** (`unique_violation_rows`,
   `not_null_violation_rows`) — the dbt style: empty ⇒ pass. Useful in
   tests and pipelines that want the offending rows.
2. **A one-pass violation-count report** (`violation_counts`) — every
   declared rule compiled into a conditional counter inside a SINGLE
   aggregation over a SINGLE scan, then unpivoted to
   ``(column_name, rule, violations)`` rows. At 100 TB this is the only
   acceptable shape: k rules cost one pass, not k passes; the shuffle
   carries one row per partition.

Uniqueness inside the same single pass uses
``count(col) - count(DISTINCT col)`` (= number of surplus duplicate
rows among non-null keys) rather than a groupBy-filter, so it composes
with the other counters.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schemas import TableSchema


@dataclass(frozen=True)
class Check:
    """One compiled rule: a named conditional counter."""

    column: str
    rule: str
    counter: Column  # aggregate expression counting violations


def _n(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def not_null_check(col: str) -> Check:
    return Check(col, "not_null", _n(F.col(col).isNull()))


def unique_check(col: str) -> Check:
    surplus = (F.count(F.col(col)) - F.count_distinct(F.col(col))).cast("long")
    return Check(col, "unique", surplus)


def max_length_check(col: str, n: int) -> Check:
    return Check(col, "max_length", _n(F.length(F.col(col)) > n))


def range_check(col: str, lo: float | None, hi: float | None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Check(col, "range", _n(cond))


def checks_from_schema(schema: TableSchema) -> list[Check]:
    """Compile a declared TableSchema's constraints into checks (Q3),
    including PK uniqueness (Q1/Q4) and nullability (Q2)."""
    checks: list[Check] = []
    for pk in schema.primary_key:
        checks.append(unique_check(pk))
    for c in schema.columns:
        if not c.nullable:
            checks.append(not_null_check(c.name))
        if c.max_length is not None:
            checks.append(max_length_check(c.name, c.max_length))
        if c.min is not None or c.max is not None:
            checks.append(range_check(c.name, c.min, c.max))
    return checks


def violation_counts(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One-pass report: ``(column_name, rule, violations)`` per check."""
    aliases = [f"__chk_{i}" for i in range(len(checks))]
    agged = df.agg(
        *[c.counter.alias(a) for c, a in zip(checks, aliases)]
    )
    cells = ", ".join(
        f"'{c.column}', '{c.rule}', {a}" for c, a in zip(checks, aliases)
    )
    return agged.select(
        F.expr(
            f"stack({len(checks)}, {cells}) AS (column_name, rule, violations)"
        )
    )


def unique_violation_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """Q1 — dbt ``unique``: keys appearing more than once (must be empty)."""
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def not_null_violation_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    """Q2 — dbt ``not_null``: rows with a NULL in any listed column."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return df.filter(cond)


class QualityError(AssertionError):
    pass


def assert_empty(df: DataFrame, name: str, sample: int = 5) -> None:
    """The dbt-test runner behavior: fail loudly with offending rows."""
    rows = df.take(sample)
    if rows:
        raise QualityError(f"quality check '{name}' failed; sample: {rows}")
