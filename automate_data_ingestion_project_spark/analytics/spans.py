"""Exact duplicate TEXT SPANS across documents.

Whole-document dedup (exact hash, MinHash, SimHash — ``dedup.py``)
misses the dominant contamination mode in web-scale corpora: long
passages repeated across otherwise-distinct pages (boilerplate,
licenses, quoted chains). The exact-substring discipline (the
"deduplicating training data" line of work) finds fixed-length token
windows that occur in ≥2 documents, then scores each document by how
much of it is duplicated text.

Relational form — no suffix array needed:

    docs → explode L-token windows (codegen'd, same explode(sequence)
    trick as ``textops.dedup.shingle_rows``) → groupBy span →
    doc-frequency ≥ 2

Cost: one shuffle keyed on the span. At 100 TB the span STRING is a
heavy shuffle key; production would key on a 128-bit fingerprint
(``md5`` halves) and carry the text only through the final report —
kept as plain text here because the fixture spans are short and the
oracle checks exact values, and noted so the scale path is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..textops.dedup import spread_for_compute
from .registry import register

_L = 8  # span length in tokens
_DUP_RATIO = 0.5  # doc flagged when ≥ half its windows are duplicated


def _spans(docs: DataFrame) -> DataFrame:
    """ALL (doc_id, span) L-token windows — NOT distinct-per-doc (the
    occurrence count is part of the report). Every expression is
    whole-stage-codegen'd: explode(sequence) + array-index concat, no
    interpreted HOF lambda (the ``shingle_rows`` lesson)."""
    words = ", ".join(f"w[i+{k}]" for k in range(_L))
    return (
        spread_for_compute(docs)
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= _L)
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, size(w) - {_L})")).alias("i"),
            "w",
        )
        .select("doc_id", F.expr(f"concat_ws(' ', {words})").alias("span"))
    )


_SPAN_CTE = f"""
    tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    st AS (SELECT doc_id, w, unnest(range(0, greatest(len(w) - {_L}, -1) + 1)) AS s
           FROM tok WHERE len(w) >= {_L}),
    sp AS (SELECT doc_id, array_to_string(w[s + 1 : s + {_L}], ' ') AS span
           FROM st)
"""


@register(
    "duplicate_text_spans",
    oracle=f"""
    WITH {_SPAN_CTE}
    SELECT span,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM sp
    GROUP BY span
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    survey_ref="exact-substring dedup: cross-doc repeated L-token spans (north star)",
)
def duplicate_text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 8-token span occurring in ≥2 documents, with document
    frequency and total occurrences — the detection half of
    exact-substring dedup.

    Scale shape: windows explode to ~|tokens| rows (linear, codegen'd,
    scan-speed); ONE shuffle on the span key with map-side partial
    aggregation; the ≥2 filter runs in the final aggregate. No
    suffix-array construction, no driver-side state — the relational
    rewrite is what makes this operator survive 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        _spans(docs)
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "span_dedup_mask",
    oracle=f"""
    WITH {_SPAN_CTE},
    freq AS (
        SELECT span FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
        SELECT sp.doc_id,
               COUNT(*) AS n_spans,
               COUNT(*) FILTER (WHERE freq.span IS NOT NULL) AS n_dup_spans
        FROM sp LEFT JOIN freq ON sp.span = freq.span
        GROUP BY sp.doc_id
    )
    SELECT doc_id, n_spans, CAST(n_dup_spans AS BIGINT) AS n_dup_spans,
           (n_dup_spans >= {_DUP_RATIO} * n_spans) AS flagged
    FROM per_doc
    """,
    survey_ref="exact-substring dedup: per-doc duplicated-text ratio gate (north star)",
)
def span_dedup_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation DECISION built on span detection: per document, how
    many of its 8-token windows are globally duplicated, and a flag at
    ≥50% — the "mostly boilerplate / mostly quoted" removal gate.

    The ratio compares INTEGER counts (n_dup_spans vs ratio·n_spans on
    integers both engines compute exactly) — no float boundary to
    flap. Two shuffles total: span-keyed (frequency + the membership
    probe share it) and doc-keyed (the per-doc rollup). The dup-span
    set is joined back as a plain equi-join — no broadcast hint, its
    size scales with the corpus."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = _spans(docs)
    dup_spans = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("span", F.lit(True).alias("is_dup"))
    )
    return (
        spans.join(dup_spans, "span", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            (
                F.col("n_dup_spans")
                >= F.lit(_DUP_RATIO) * F.col("n_spans")
            ).alias("flagged"),
        )
    )
