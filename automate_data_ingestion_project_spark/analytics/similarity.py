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


def _recall_oracle() -> str:
    return f"""
    WITH ex AS (SELECT * FROM ({_exact_oracle()}) x),
    ls AS (SELECT * FROM ({_lsh_oracle()}) y),
    hit AS (
        SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ex JOIN ls ON ex.query_id = ls.query_id
                       AND ex.vec_id = ls.vec_id
        GROUP BY 1
    ),
    cand AS (
        SELECT query_id, MAX(n_candidates) AS n_candidates
        FROM ls GROUP BY 1
    )
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_at_k,
           CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hit h USING (query_id)
    LEFT JOIN cand c USING (query_id)
    """


@register(
    "ann_recall_eval",
    oracle=_recall_oracle(),
    survey_ref="similarity search: recall@k evaluation of the ANN scale path",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured speed/quality tradeoff of the LSH scale path: per query,
    recall@k against the brute-force ground truth, next to how many
    candidates the bucket join actually scored — the evaluation loop
    any production ANN deployment runs before trusting an index
    ("measure, don't guess" applied to the index itself).

    Scale shape: both sides are the already-bounded top-k relations
    (Q·k rows), so the comparison join and the per-query aggregate are
    driver-trivial at any corpus size; the expensive inputs reuse the
    exact/LSH plans unchanged. A query whose bucket contained no other
    vector scores recall 0 with n_candidates 0 (left join + coalesce),
    surfacing empty-bucket degradation instead of hiding it.
    """
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    exact = exact_topk(emb, QUERY_IDS, k=TOP_K).select("query_id", "vec_id")
    lsh = lsh_topk(emb, QUERY_IDS, k=TOP_K).select(
        "query_id", "vec_id", "n_candidates"
    )
    hits = (
        lsh.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    cand = lsh.groupBy("query_id").agg(
        F.max("n_candidates").alias("n_candidates")
    )
    base = exact.select("query_id").distinct()
    return (
        base.join(hits, "query_id", "left")
        .join(cand, "query_id", "left")
        .select(
            "query_id",
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K
            ).alias("recall_at_k"),
            F.coalesce("n_candidates", F.lit(0))
            .cast("long")
            .alias("n_candidates"),
        )
    )


_TRUNC_DIM = 16  # prefix kept by the truncated (matryoshka-style) index


def _truncated_recall_oracle() -> str:
    d = "duckdb"
    trunc = f"""
    WITH base AS (
        SELECT vec_id, embedding[1:{_TRUNC_DIM}] AS emb,
               {norm_sql(f"embedding[1:{_TRUNC_DIM}]", d)} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_norm
          FROM base WHERE vec_id IN ({_QID_LIST})),
    c AS (SELECT vec_id, emb AS c_emb, nrm AS c_norm FROM base),
    scored AS (
        SELECT query_id, vec_id,
               {dot_sql("q_emb", "c_emb", d)} / (q_norm * c_norm) AS score
        FROM q CROSS JOIN c WHERE query_id != vec_id
    ),
    ranked AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id FROM ranked WHERE rnk <= {TOP_K}
    """
    return f"""
    WITH ex AS (SELECT query_id, vec_id FROM ({_exact_oracle()}) x),
    tr AS ({trunc}),
    hit AS (
        SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ex JOIN tr ON ex.query_id = tr.query_id AND ex.vec_id = tr.vec_id
        GROUP BY 1
    )
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_at_k,
           CAST({_TRUNC_DIM} AS INTEGER) AS kept_dims
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hit h USING (query_id)
    """


@register(
    "ann_truncated_recall_eval",
    oracle=_truncated_recall_oracle(),
    survey_ref="similarity search: dimension-truncation recall tradeoff (engine ext)",
)
def ann_truncated_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of a PREFIX-truncated embedding search (first 16 of 64
    dims) against the full-dimension ground truth — the
    matryoshka-style cost lever: a 4× narrower index whose quality
    loss is MEASURED per query, same calibration discipline as
    ``ann_recall_eval``/``ann_pq_recall_eval``.

    Why it matters at 100 TB: embedding storage and dot-product cost
    scale linearly in dims, and prefix truncation needs NO retraining
    or re-encoding — but only a recall measurement says whether 16
    dims suffice for THIS corpus. The truncated scorer reuses the
    exact-top-k operator on a sliced column (strict left-fold doubles,
    so the oracle hash-matches bit-for-bit); at scale the truncated
    side would be served by the IVF/PQ index over the prefix."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    truncated = emb.select(
        "vec_id", F.slice("embedding", 1, _TRUNC_DIM).alias("embedding")
    )
    exact = exact_topk(emb, QUERY_IDS, k=TOP_K).select("query_id", "vec_id")
    trunc = exact_topk(truncated, QUERY_IDS, k=TOP_K).select(
        "query_id", "vec_id"
    )
    hits = (
        trunc.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_at_k"
            ),
            F.lit(_TRUNC_DIM).cast("int").alias("kept_dims"),
        )
    )
