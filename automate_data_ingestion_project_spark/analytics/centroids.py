"""Embedding-cluster queries: integer-exact label centroids and the
k-means assignment step (nearest-centroid purity matrix).

The cross-engine determinism trick: quantize vectors to int8 codes
first (``textops.quantize``), then every aggregation is an INTEGER
sum — order-independent, so partial-agg order can't flap the hash.
Floats appear only AFTER aggregation (cosine = exact-int dot over
sqrt of exact-int norms: one conversion, one product, one division —
identical IEEE rounding in both engines).

- ``label_centroids`` — long-form (label, pos, sum_code, n_vecs):
  the per-label centroid numerator/denominator. Explode + codegen'd
  sums (HOF lambdas are interpreted); the (label, pos) shuffle is
  |labels|·dim rows regardless of corpus size.
- ``centroid_purity`` — assign every vector to its nearest label
  centroid by cosine, tie-broken by label, and report the
  (true_label × assigned_label) confusion matrix. The O(N·k·d)
  brute-force assign is THE k-means assignment shape at any scale
  (centroids broadcast; the per-(vec, cand) integer sums partial-
  aggregate map-side before the vec_id shuffle). For huge k, the
  IVF cell routing in ``analytics/ivf.py`` is the prune.

Beyond-reference family (north star: LLM-pipeline embeddings);
fixtures: ``embeddings.parquet`` (64-dim, labels 0-9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..textops.dedup import spread_for_compute
from ..textops.quantize import quantize_int8_rows
from .registry import register
from ..operators.caching import tracked_persist

# shared DuckDB CTE: quantized codes exploded to (vec_id, label, pos, code)
_EX_CTE = """
    WITH base AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    p AS (
        SELECT vec_id, label, e,
               list_min(e) AS mn, list_max(e) AS mx FROM base
    ),
    q AS (
        SELECT vec_id, label,
               CASE WHEN mx > mn THEN
                   list_transform(e, x ->
                       CAST(floor(((x - mn) * 255.0) / (mx - mn) + 0.5)
                            AS BIGINT))
               ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS codes
        FROM p
    ),
    ex AS (
        SELECT vec_id, label, CAST(i AS INTEGER) AS pos, codes[i+1] AS code
        FROM q, UNNEST(range(0, len(codes))) AS t(i)
    )
"""


def _exploded_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread_for_compute(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
    )
    # exploded-form quantization (r17): codegen'd, no interpreted
    # transform() lambdas (textops.quantize.quantize_int8_rows)
    return quantize_int8_rows(emb).select("vec_id", "label", "pos", "code")


@register(
    "label_centroids",
    oracle=_EX_CTE
    + """
    SELECT label, pos,
           COUNT(*) AS n_vecs,
           CAST(SUM(code) AS BIGINT) AS sum_code
    FROM ex
    GROUP BY 1, 2
    """,
    survey_ref="LLM pipeline: per-label embedding centroids (north star)",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _exploded_codes(spark, sf_dir)
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("code").alias("sum_code"),
        )
    )


@register(
    "centroid_purity",
    oracle=_EX_CTE
    + """
    , cent AS (
        SELECT label AS cand_label, pos, CAST(SUM(code) AS BIGINT) AS s
        FROM ex GROUP BY 1, 2
    ),
    j AS (
        SELECT ex.vec_id, ex.label AS true_label, c.cand_label,
               CAST(SUM(ex.code * c.s) AS BIGINT) AS dot_qs,
               CAST(SUM(ex.code * ex.code) AS BIGINT) AS qq,
               CAST(SUM(c.s * c.s) AS BIGINT) AS ss
        FROM ex JOIN cent c ON ex.pos = c.pos
        GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT *, CASE WHEN qq > 0 AND ss > 0
                       THEN dot_qs / (sqrt(qq) * sqrt(ss))
                       ELSE 0.0 END AS cos FROM j
    ),
    best AS (
        SELECT * FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, cand_label) = 1
    )
    SELECT true_label, cand_label AS assigned_label,
           COUNT(*) AS n_vecs, MIN(cos) AS min_cos, MAX(cos) AS max_cos
    FROM best GROUP BY 1, 2
    """,
    survey_ref="LLM pipeline: k-means assignment / cluster purity (north star)",
)
def centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = tracked_persist(_exploded_codes(spark, sf_dir))  # feeds both join sides
    cent = (
        ex.groupBy(F.col("label").alias("cand_label"), "pos")
        .agg(F.sum("code").alias("s"))
    )
    j = (
        ex.select(
            "vec_id", F.col("label").alias("true_label"), "pos", "code"
        )
        .join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "true_label", "cand_label")
        .agg(
            F.sum(F.col("code") * F.col("s")).alias("dot_qs"),
            F.sum(F.col("code") * F.col("code")).alias("qq"),
            F.sum(F.col("s") * F.col("s")).alias("ss"),
        )
    )
    cos = F.when(
        (F.col("qq") > 0) & (F.col("ss") > 0),
        F.col("dot_qs") / (F.sqrt("qq") * F.sqrt("ss")),
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cand_label").asc()
    )
    best = (
        j.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    return (
        best.groupBy("true_label", F.col("cand_label").alias("assigned_label"))
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("cos").alias("min_cos"),
            F.max("cos").alias("max_cos"),
        )
    )


def _kmeans_step_oracle_sql() -> str:
    from .ivf import N_CELLS

    from ..textops.similarity import dot_sql

    return f"""
    WITH base AS (
        SELECT vec_id, embedding FROM embeddings
    ),
    centroids AS (
        SELECT vec_id AS cell, embedding AS c_emb FROM base
        WHERE vec_id < {N_CELLS}
    ),
    assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT b.vec_id, b.embedding, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY b.vec_id
                       ORDER BY {dot_sql("b.embedding", "c.c_emb", "duckdb")} DESC,
                                c.cell
                   ) AS _r
            FROM base b CROSS JOIN centroids c
        ) WHERE _r = 1
    ),
    v AS (
        SELECT vec_id, cell,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM assigned
    ),
    p AS (
        SELECT vec_id, cell, e, list_min(e) AS mn, list_max(e) AS mx FROM v
    ),
    q AS (
        SELECT vec_id, cell,
               CASE WHEN mx > mn THEN
                   list_transform(e, x ->
                       CAST(floor(((x - mn) * 255.0) / (mx - mn) + 0.5)
                            AS BIGINT))
               ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS codes
        FROM p
    ),
    ex AS (
        SELECT cell, i AS dim, codes[i+1] AS code
        FROM q, UNNEST(range(0, len(codes))) AS u(i)
    )
    SELECT cell, CAST(dim AS INTEGER) AS dim,
           COUNT(*) AS n_members,
           CAST(SUM(code) AS BIGINT) AS sum_code,
           CAST(SUM(code) AS DOUBLE) / COUNT(*) AS c_new
    FROM ex GROUP BY 1, 2
    """


@register(
    "kmeans_step",
    oracle=_kmeans_step_oracle_sql(),
    survey_ref="iterative ML primitive: one quantized Lloyd update (assign + recompute)",
)
def kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration over the IVF codebook: assign every
    vector to its nearest centroid (broadcast join — the same
    ``assign_cells`` the IVF search uses), then recompute each cell's
    centroid as the per-dimension mean of its members.

    Cross-engine determinism: the update sums int8-quantized codes —
    INTEGER accumulation is order-independent, so 1000-executor partial
    aggregation cannot flap the result, and the mean converts to double
    exactly once (same IEEE division both engines). Production k-means
    sums floats with tolerance; the quantized update is the
    oracle-grade variant of the identical dataflow (and is itself real
    practice — PQ/SQ codebook training).

    Scale shape: codebook broadcasts; the only data-sized shuffle is
    the (cell, dim) partial-aggregated sum — |cells|·dim result rows
    regardless of corpus size. Iterating = re-running with the output
    fed back as the codebook (the driver loop pattern of
    ``textops.components``).
    """
    from .ivf import N_CELLS, assign_cells

    from ..textops.similarity import norm_sql

    emb = spread_for_compute(
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", F.expr(norm_sql("embedding")).alias("nrm")
        )
    )
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    assigned = assign_cells(emb, centroids)
    ex = quantize_int8_rows(assigned, pos_col="dim").select(
        "cell", "dim", "code"
    )
    return (
        ex.groupBy("cell", "dim")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("code").cast("bigint").alias("sum_code"),
        )
        .select(
            "cell",
            "dim",
            "n_members",
            "sum_code",
            (
                F.col("sum_code").cast("double") / F.col("n_members")
            ).alias("c_new"),
        )
    )
