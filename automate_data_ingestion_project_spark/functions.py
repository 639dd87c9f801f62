"""Scalar/aggregate helper expressions shared across operators.

Maps SURVEY.md §2.7 (F1-F5) plus determinism helpers for the oracle
comparison. Everything is a native Column expression — JVM-side,
whole-stage-codegen'd; no Python UDFs (reference's row-wise pandas
``apply`` at ``scripts/extract_load.py:159-189`` is replaced by these,
per SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-accumulation decimal for double sums. Summing doubles is
# order-sensitive, and Spark's partial-aggregation order varies with
# partitioning/scheduling — at 1000 executors a plain double SUM is not
# run-to-run reproducible. Casting to a decimal makes accumulation exact
# (associative), so results are bit-stable at any scale AND match the
# DuckDB oracle.
#
# Scale 6, not wider: fixture values carry at most 6 true decimal places
# (2dp monetary × 2dp rates), so the cast is lossless — and DuckDB's
# DECIMAL→DOUBLE cast is only correctly rounded while the scaled integer
# fits double's 53-bit mantissa (measured: DECIMAL(38,10) sums came back
# off by ~2 ulp vs Spark's BigDecimal cast). sum×10^6 < 2^53 holds
# through sf0.1 with huge margin.
_DECIMAL = "decimal(27,6)"


def dsum(col: str | Column) -> Column:
    """Deterministic SUM over a double column (exact decimal accumulation),
    returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast("double")


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sha256_uid(*cols: str | Column) -> Column:
    """F3 — SHA-256 surrogate key over raw concatenation, NO separator.

    Reference: ``hashlib.sha256(str(a)+str(b)+str(c)).hexdigest()``
    (``/root/reference/scripts/extract_load.py:171-193``). The
    no-separator concat is replicated exactly (SURVEY.md §2.7 F3),
    including Python's ``str(None) == 'None'`` coercion: a NULL key
    column contributes the literal string ``'None'`` instead of
    nulling the whole concat (``F.concat`` is NULL-propagating).
    """
    cs = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("None"))
        for c in cols
    ]
    return F.sha2(F.concat(*cs), 256)
