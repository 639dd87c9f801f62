"""Embedding-quantization CORRECTNESS query.

``embedding_quantize`` runs int8 scalar quantization over the
embeddings fixture and returns integer-exact per-vector summaries
(sum/min/max of the quantized codes + the float quantization params,
which are raw data values). Integer outputs make the hash immune to
float-fold ordering; the DuckDB oracle recomputes the identical
``floor(r + 0.5)`` arithmetic tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..textops.quantize import quantize_int8
from .registry import register


@register(
    "embedding_quantize",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    p AS (
        SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v
    ),
    q AS (
        SELECT vec_id, mn, mx,
               CASE WHEN mx > mn THEN
                   list_transform(e, x ->
                       CAST(floor(((x - mn) * 255.0) / (mx - mn) + 0.5)
                            AS BIGINT))
               ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS codes
        FROM p
    )
    SELECT vec_id,
           CAST(len(codes) AS INTEGER) AS n_dims,
           mn AS q_min,
           mx AS q_max,
           list_reduce(codes, (a, x) -> a + x) AS sum_codes,
           list_min(codes) AS min_code,
           list_max(codes) AS max_code
    FROM q
    """,
    survey_ref="LLM pipeline: int8 embedding quantization (north star, storage path)",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qd = quantize_int8(emb)
    return qd.select(
        "vec_id",
        F.size("q").alias("n_dims"),
        "q_min",
        "q_max",
        F.expr("aggregate(q, 0L, (a, x) -> a + x)").alias("sum_codes"),
        F.array_min("q").alias("min_code"),
        F.array_max("q").alias("max_code"),
    )
