"""Grouped-map pandas operator (``applyInPandas``) with a full oracle.

Per-language z-scores of document length: each language group arrives
as one Arrow-backed pandas DataFrame, is normalized in vectorized
NumPy, and returns typed rows. This is the template for per-group
Python logic the built-ins can't express (per-group model scoring,
custom normalization) — the group is the unit of Python work, so cost
scales with |groups|, and Arrow keeps the transfer columnar.

The oracle recomputes the same z-score with SQL window functions
(AVG / STDDEV_SAMP over the lang partition — pandas ``std`` defaults to
ddof=1 = sample stddev, matching STDDEV_SAMP). Values round-trip within
1e-12, inside the compare harness's 9-decimal normalization.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from .registry import register


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["n_chars"].astype("float64")
    std = x.std(ddof=1)
    if pd.isna(std) or std == 0:
        # Degenerate group (one row, or all-equal lengths): STDDEV_SAMP is
        # NULL / 0 in SQL, so emit NULL rather than 0.0 to match the oracle.
        z = pd.array([None] * len(x), dtype="Float64")
    else:
        z = ((x - x.mean()) / std).round(9)
    return pd.DataFrame(
        {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "len_z": z}
    )


@register(
    "lang_length_zscores",
    oracle="""
    SELECT doc_id, lang,
           CASE
               WHEN COALESCE(
                   STDDEV_SAMP(CAST(n_chars AS DOUBLE))
                       OVER (PARTITION BY lang), 0) = 0
               THEN NULL
               ELSE round(
                   (CAST(n_chars AS DOUBLE) - AVG(CAST(n_chars AS DOUBLE))
                        OVER (PARTITION BY lang))
                   / STDDEV_SAMP(CAST(n_chars AS DOUBLE))
                         OVER (PARTITION BY lang),
                   9
               )
           END AS len_z
    FROM documents
    """,
    survey_ref="applyInPandas grouped-map operator (north star; Arrow per-group)",
)
def lang_length_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        _zscore, schema="doc_id bigint, lang string, len_z double"
    )
