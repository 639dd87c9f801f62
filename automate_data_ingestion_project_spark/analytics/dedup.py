"""Dedup CORRECTNESS queries over the ``documents`` fixture.

The fixture has no duplicate texts, so both queries first plant
duplicates deterministically (same construction in Spark and the
oracle):

- ``dedup_exact``: every ``doc_id % 10 == 0`` document re-appears
  verbatim under ``doc_id + 100000`` → exact dedup must collapse it;
- ``dedup_minhash_pairs``: every ``doc_id % 20 == 0`` document
  re-appears with one token prepended (``'xqzv '``) under
  ``doc_id + 100000`` → a near-duplicate with shingle-Jaccard
  ≈ (s−2)/(s−1), which MinHash banding must surface and exact Jaccard
  verification must keep.

The MinHash oracle re-executes the IDENTICAL integer pipeline in DuckDB
(md5-prefix base hash, the same (a,b) coefficients mod 2³¹−1, the same
banding) — the fuzzy path is hash-match checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..textops.dedup import (
    A_COEF,
    B_COEF,
    BANDS,
    K,
    P,
    ROWS_PER_BAND,
    candidate_pairs,
    exact_dedup_summary,
    lsh_band_keys,
    minhash_signatures,
    shingle,
    verified_near_duplicates,
)
from .registry import register

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS kept_doc_id,
           COUNT(*) AS n_copies
    FROM base
    GROUP BY 1
    """,
    survey_ref="exact dedup (north star; Q4 generalized to corpora)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return exact_dedup_summary(docs.unionByName(dupes))


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate pairs
# ---------------------------------------------------------------------------


def _minhash_oracle_sql() -> str:
    a_list = "[" + ", ".join(str(x) for x in A_COEF) + "]"
    b_list = "[" + ", ".join(str(x) for x in B_COEF) + "]"
    band_parts = ", ".join(
        f"sigs[{ROWS_PER_BAND}*j+{k + 1}]" for k in range(ROWS_PER_BAND)
    )
    return f"""
    WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, concat('xqzv ', text) AS text
        FROM documents WHERE doc_id % 20 = 0
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(0, len(w) - 2),
                   i -> concat_ws(' ', w[i+1], w[i+2], w[i+3]))) AS shingles
        FROM tok WHERE len(w) >= 3
    ),
    hs AS (
        SELECT doc_id, shingles,
               list_transform(shingles,
                   s -> CAST(concat('0x', substr(md5(s), 1, 14)) AS BIGINT) % {P}
               ) AS h0
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               list_transform(range(0, {K}),
                   i -> list_min(list_transform(h0,
                        h -> ({a_list}[i+1] * h + {b_list}[i+1]) % {P}))) AS sigs
        FROM hs
    ),
    bands AS (
        SELECT doc_id,
               unnest(list_transform(range(0, {BANDS}),
                   j -> concat_ws(':', j, {band_parts}))) AS band_key
        FROM sig
    ),
    pairs AS (
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    verified AS (
        SELECT p.doc_id_a, p.doc_id_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
                   AS n_shared,
               CAST(len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                   AS BIGINT) AS n_union
        FROM pairs p
        JOIN sh sa ON p.doc_id_a = sa.doc_id
        JOIN sh sb ON p.doc_id_b = sb.doc_id
    )
    SELECT doc_id_a, doc_id_b, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
    FROM verified
    WHERE CAST(n_shared AS DOUBLE) / CAST(n_union AS DOUBLE) >= 0.5
    """


@register(
    "dedup_minhash_pairs",
    oracle=_minhash_oracle_sql(),
    survey_ref="fuzzy dedup: MinHash+LSH banded near-dup (north star)",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("xqzv "), F.col("text")).alias("text"),
    )
    base = docs.unionByName(variants)
    # persist the two relations every downstream join branch reuses —
    # without this, both sides of the band self-join and both sides of
    # the verification join would recompute shingling + signatures
    shingled = shingle(base).persist()
    sigs = minhash_signatures(shingled)
    bands = lsh_band_keys(sigs).persist()
    pairs = candidate_pairs(bands)
    return verified_near_duplicates(shingled, pairs)
