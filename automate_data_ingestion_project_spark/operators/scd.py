"""Slowly-changing-dimension type-2 history from a change log.

The reference's load layer replaces rows in place (``INSERT OR REPLACE``,
scripts/extract_load.py:233-240) — type-1 semantics that lose history.
The SCD2 twin keeps every version with a validity interval: given a
change log (one row per state change per key), each row becomes a
version valid from its own timestamp until the key's next change
(``lead`` over the key's timeline), open-ended for the current version.

Scale shape: ONE window over ONE shuffle on the dimension key. No
joins, no collect; the change log can be arbitrarily large as long as a
single key's history fits a task (dimension keys have bounded history —
this is the same assumption every MERGE-based SCD2 build makes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Turn a change log into SCD2 history rows.

    Every input row survives with three added columns: ``valid_from``
    (its own timestamp), ``valid_to`` (the key's next change, NULL when
    open-ended) and ``is_current``. ``tiebreak_cols`` must make the
    per-key ordering total or version boundaries are nondeterministic.
    """
    order: list[Column] = [F.col(ts_col)] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
        .withColumn(current_flag, F.col(valid_to).isNull())
    )
