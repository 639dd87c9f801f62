"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here with a
(Spark builder, DuckDB oracle SQL) pair. ``__spark_entry__.py`` exposes
the registry to the driver; tests replay the same comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver records rows-only check
    survey_ref: str  # which SURVEY.md §2 inventory rows this covers


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco
