"""Similarity-search CORRECTNESS queries over the ``embeddings`` fixture.

Both the exact brute-force baseline and the LSH-bucketed scale path are
deterministic (strict left-fold double arithmetic + md5-seeded
hyperplanes), so BOTH get full DuckDB oracles — the fuzzy path is
hash-match checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..textops.similarity import (
    bucket_sql,
    dot_sql,
    exact_topk,
    lsh_topk,
    norm_sql,
)
from .registry import register

QUERY_IDS = [0, 1, 2, 3, 4]
TOP_K = 5

_QID_LIST = ", ".join(str(i) for i in QUERY_IDS)


def _exact_oracle() -> str:
    d = "duckdb"
    return f"""
    WITH base AS (
        SELECT vec_id, embedding, {norm_sql("embedding", d)} AS nrm
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_norm
        FROM base WHERE vec_id IN ({_QID_LIST})
    ),
    c AS (SELECT vec_id, embedding AS c_emb, nrm AS c_norm FROM base),
    scored AS (
        SELECT query_id, vec_id,
               {dot_sql("q_emb", "c_emb", d)} / (q_norm * c_norm) AS score
        FROM q CROSS JOIN c
        WHERE query_id != vec_id
    ),
    ranked AS (
        SELECT query_id, vec_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS INTEGER) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


@register(
    "ann_topk_cosine",
    oracle=_exact_oracle(),
    survey_ref="similarity search: exact cosine top-k baseline (north star)",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return exact_topk(emb, QUERY_IDS, k=TOP_K)


def _lsh_oracle() -> str:
    d = "duckdb"
    return f"""
    WITH base AS (
        SELECT vec_id, embedding,
               {norm_sql("embedding", d)} AS nrm,
               {bucket_sql("embedding", d)} AS bucket
        FROM embeddings
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_norm, bucket
        FROM base WHERE vec_id IN ({_QID_LIST})
    ),
    c AS (
        SELECT vec_id, embedding AS c_emb, nrm AS c_norm, bucket FROM base
    ),
    scored AS (
        SELECT q.query_id, c.vec_id,
               {dot_sql("q.q_emb", "c.c_emb", d)} / (q.q_norm * c.c_norm) AS score
        FROM q JOIN c USING (bucket)
        WHERE q.query_id != c.vec_id
    ),
    counted AS (
        SELECT *, CAST(COUNT(*) OVER (PARTITION BY query_id) AS BIGINT)
                      AS n_candidates
        FROM scored
    ),
    ranked AS (
        SELECT query_id, vec_id, score, n_candidates,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS INTEGER) AS rnk
        FROM counted
    )
    SELECT query_id, vec_id, score, rnk, n_candidates
    FROM ranked WHERE rnk <= {TOP_K}
    """


@register(
    "ann_lsh_topk",
    oracle=_lsh_oracle(),
    survey_ref="similarity search: hyperplane-LSH bucketed top-k (scale path)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, QUERY_IDS, k=TOP_K)
