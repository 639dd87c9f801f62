"""dbt-analog model layer (SURVEY.md §3.2): declarative sources →
views, models as composable DataFrame functions, three
materializations, and a declarative test runner.

Reference mapping:

- ``sources.yml`` registry (``/root/reference/dbt_core/models/sources.yml:3-9``)
  → :func:`register_sources`: named tables become temp views so the SQL
  surface sees them (S4);
- a model (``models/**/*.sql``) → a Python function
  ``(SparkSession) -> DataFrame``; ``ref('other_model')`` → calling the
  other model's function (the dependency edge is the call graph);
- materializations (``dbt_project.yml:32-36``):
  * ``ephemeral`` — the DataFrame is returned unmaterialized and
    inlined into consumers (dbt's compiled-CTE behavior IS Spark's lazy
    plan — this materialization is free);
  * ``view``      — ``createOrReplaceTempView`` (catalog-only);
  * ``table``     — written to parquet and re-read (the only one that
    executes at build time);
- ``schema.yml`` column tests (``schema.yml:10-21``) → the Q1/Q2
  operators from :mod:`.quality`, run by :func:`test_models`.

At scale the layer is free: everything except ``table`` is metadata;
``table`` models write once and downstream reads prune/push down
against parquet like any other source.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .quality import not_null_violation_rows, unique_violation_rows

ModelFn = Callable[[SparkSession], DataFrame]

MATERIALIZATIONS = ("ephemeral", "view", "table")


@dataclass
class Model:
    name: str
    fn: ModelFn
    materialization: str = "ephemeral"
    # dbt schema.yml column tests: {column: ["unique", "not_null"]}
    tests: dict[str, list[str]] = field(default_factory=dict)

    def __post_init__(self):
        if self.materialization not in MATERIALIZATIONS:
            raise ValueError(f"unknown materialization {self.materialization!r}")


def register_sources(
    spark: SparkSession, sources: dict[str, str], fmt: str = "parquet"
) -> None:
    """S4 — named source registry → temp views (name → path)."""
    for name, path in sources.items():
        spark.read.format(fmt).load(path).createOrReplaceTempView(name)


def run_models(
    spark: SparkSession,
    models: list[Model],
    table_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Materialize models in list order (callers order by dependency —
    the call graph enforces correctness anyway since ``ref`` is a
    function call). Returns name → DataFrame as consumers see it."""
    out: dict[str, DataFrame] = {}
    for m in models:
        df = m.fn(spark)
        if m.materialization == "view":
            df.createOrReplaceTempView(m.name)
        elif m.materialization == "table":
            if table_dir is None:
                raise ValueError("table materialization requires table_dir")
            path = os.path.join(table_dir, m.name)
            df.write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(m.name)
        out[m.name] = df
    return out


@dataclass
class TestResult:
    model: str
    column: str
    rule: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def test_models(
    spark: SparkSession, models: list[Model], built: dict[str, DataFrame]
) -> list[TestResult]:
    """The ``dbt test`` runner: every declared column test executes as
    a must-be-empty relation (Q1/Q2)."""
    results: list[TestResult] = []
    for m in models:
        df = built[m.name]
        for col, rules in m.tests.items():
            for rule in rules:
                if rule == "unique":
                    n = unique_violation_rows(df, [col]).count()
                elif rule == "not_null":
                    n = not_null_violation_rows(df, [col]).count()
                else:
                    raise ValueError(f"unknown test rule {rule!r}")
                results.append(TestResult(m.name, col, rule, n))
    return results
