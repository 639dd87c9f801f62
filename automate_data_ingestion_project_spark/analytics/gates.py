"""Gopher/C4-style document quality gates (LLM pipeline north star).

Pretraining corpora are filtered by a battery of cheap per-document
heuristics before any expensive dedup/decontamination runs (Gopher's
"quality filtering" table, C4's line/document rules). The engine's form:
every gate is a boolean over the per-doc text statistics from
:mod:`..textops.analysis`, the whole battery is ONE narrow map — native
string/array expressions inside whole-stage codegen, zero shuffles, so
at 100 TB the gate pass runs at parquet scan speed and its selectivity
feeds straight into Catalyst (a downstream ``WHERE keep = 1`` prunes
before any join/shuffle in the same stage).

Gate thresholds are fixture-tuned so each gate actually rejects some
documents (a gate that never fires is untested); production swaps the
constants, not the shape. Flags are emitted as INT 0/1 — the driver
hash-compares values across engines and integer flags are
representation-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..textops import analysis as ta
from .registry import register


def _gate_exprs(dialect: str) -> dict[str, str]:
    """Gate predicates, identical operand tree in both dialects."""
    t = "text"
    uniq_ratio = (
        f"(cast({ta.n_unique_tokens(t, dialect)} as double) / "
        f"cast({ta.n_tokens(t, dialect)} as double))"
    )
    return {
        # Gopher: drop too-short / absurdly long documents
        "pass_len": f"({ta.n_tokens(t, dialect)} BETWEEN 40 AND 100000)",
        # Gopher: mean word length within natural-language bounds
        "pass_word_len": f"({ta.avg_token_len(t, dialect)} BETWEEN 2.0 AND 12.0)",
        # C4/Gopher: natural prose contains stopwords
        "pass_stopword": f"({ta.stopword_ratio(t, dialect)} >= 0.02)",
        # repetition: distinct-token fraction (boilerplate/spam collapses it)
        "pass_repetition": f"({uniq_ratio} >= 0.45)",
    }


@register(
    "quality_gates",
    oracle=f"""
    SELECT doc_id, lang,
           {", ".join(
               f"CAST({e} AS INT) AS {n}"
               for n, e in _gate_exprs("duckdb").items()
           )},
           CAST({" AND ".join(_gate_exprs("duckdb").values())} AS INT) AS keep
    FROM documents
    """,
    survey_ref="LLM curation: Gopher/C4-style quality gate battery (narrow map)",
)
def quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gates = _gate_exprs("spark")
    keep = " AND ".join(gates.values())
    return docs.select(
        "doc_id",
        "lang",
        *[F.expr(e).cast("int").alias(n) for n, e in gates.items()],
        F.expr(keep).cast("int").alias("keep"),
    )
