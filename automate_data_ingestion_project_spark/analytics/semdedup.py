"""Semantic deduplication (SemDeDup-style): cluster the embedding
space, then detect near-duplicates ONLY within each cluster.

The LLM-corpus problem this solves (Abbas et al., "SemDeDup", 2023,
public): web-scale corpora carry *semantic* duplicates — rewordings,
boilerplate variants, re-encodings — that exact (hash) and lexical
(MinHash) dedup both miss because the bytes differ.  Embedding cosine
finds them, but all-pairs cosine is O(n²) and impossible at 100 TB.
SemDeDup's bound is clustering: k-means the embeddings with k ∝ n,
then compare pairs only inside each cluster — Σ|cluster|² work, with
|cluster| held roughly constant by scaling k.  (The sign-LSH variant
of the same bound is ``dedup_embedding_cosine``; this is the
cluster-scoped variant, which catches pairs LSH bucket boundaries can
split.)

Spark shape, and why it survives 1000 executors:

- centroids are a broadcast (k·dim rows — small by construction even
  for k in the millions, and trainable at scale with the existing
  ``kmeans_step`` / ``pq_train`` machinery);
- assignment is one map-side broadcast join + per-vector integer
  aggregate — no shuffle of the corpus;
- the ONLY corpus-sized shuffle is the within-cluster pair join,
  hash-partitioned on (cluster, pos) — every pair's work is local to
  its cluster's partition, so skew is bounded by the largest cluster,
  which k ∝ n keeps constant;
- the keep/drop rule is greedy-by-id, declaratively: a vector is a
  semantic dup iff some SMALLER-id vector in its cluster scores
  ≥ τ.  No iteration, no window over the corpus — one aggregate.

Cross-engine determinism (the ``centroids.py`` trick): vectors are
min-max int8-quantized, every aggregation is an INTEGER sum, and the
single float op (dot/(√·√)) has an identical operand tree in Spark and
DuckDB — bit-identical cosines, so the τ comparison can never flap.
The planted dups are SCALED copies (×2 per element): byte-different
(exact dedup misses them), direction-identical (cosine 1.0) — and
min-max quantization is scale-invariant, so both engines derive the
same codes for them.

Fixture: ``embeddings.parquet`` (64-dim, labels 0-9).  The 10 label
centroids stand in for the trained k-means codebook (k ∝ n at scale);
reference has no counterpart (beyond-reference LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.caching import tracked_persist
from ..textops.dedup import spread_for_compute
from ..textops.quantize import quantize_int8_rows
from .registry import register

_TAU = 0.999
_PLANT_MOD = 25  # vec_id % 25 == 7 gets a scaled copy planted
_PLANT_OFF = 100000

_ORACLE = f"""
    WITH base0 AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
        UNION ALL
        SELECT vec_id + {_PLANT_OFF} AS vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0) AS e
        FROM embeddings WHERE vec_id % {_PLANT_MOD} = 7
    ),
    p AS (
        SELECT vec_id, label, e,
               list_min(e) AS mn, list_max(e) AS mx FROM base0
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
    ),
    cent AS (
        SELECT label AS cand_label, pos, CAST(SUM(code) AS BIGINT) AS s
        FROM ex WHERE vec_id < {_PLANT_OFF} GROUP BY 1, 2
    ),
    j AS (
        SELECT ex.vec_id, c.cand_label,
               CAST(SUM(ex.code * c.s) AS BIGINT) AS dot_qs,
               CAST(SUM(ex.code * ex.code) AS BIGINT) AS qq,
               CAST(SUM(c.s * c.s) AS BIGINT) AS ss
        FROM ex JOIN cent c ON ex.pos = c.pos
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT *, CASE WHEN qq > 0 AND ss > 0
                       THEN dot_qs / (sqrt(qq) * sqrt(ss))
                       ELSE 0.0 END AS cos FROM j
    ),
    assigned AS (
        SELECT vec_id, cand_label AS cluster FROM scored
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cos DESC, cand_label) = 1
    ),
    m AS (
        SELECT ex.vec_id, a.cluster, ex.pos, ex.code
        FROM ex JOIN assigned a USING (vec_id)
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(SUM(a.code * b.code) AS BIGINT) AS dot_ab,
               CAST(SUM(a.code * a.code) AS BIGINT) AS aa,
               CAST(SUM(b.code * b.code) AS BIGINT) AS bb
        FROM m a JOIN m b
          ON a.cluster = b.cluster AND a.pos = b.pos
         AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    ),
    dups AS (
        SELECT id_b AS vec_id, COUNT(*) AS n_earlier_dups
        FROM pairs
        WHERE aa > 0 AND bb > 0
          AND dot_ab / (sqrt(aa) * sqrt(bb)) >= {_TAU}
        GROUP BY 1
    )
    SELECT a.vec_id, a.cluster,
           COALESCE(d.n_earlier_dups, 0) AS n_earlier_dups,
           COALESCE(d.n_earlier_dups, 0) > 0 AS is_semantic_dup
    FROM assigned a LEFT JOIN dups d USING (vec_id)
"""


@register(
    "semantic_dedup_clusters",
    oracle=_ORACLE,
    survey_ref="fuzzy dedup: SemDeDup cluster-scoped semantic near-dup (north star)",
)
def semantic_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector semantic-dedup decision table: (vec_id, cluster,
    n_earlier_dups, is_semantic_dup).  See module docstring for the
    scale argument; every planted scaled copy must flag TRUE and the
    originals (smaller ids) must stay FALSE w.r.t. their copies."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    planted = emb.filter(F.col("vec_id") % _PLANT_MOD == 7).select(
        (F.col("vec_id") + _PLANT_OFF).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    both = spread_for_compute(emb.unionByName(planted))
    # ex feeds three consumers (centroid build, assignment, pair join
    # sides) — persist or each branch re-runs quantization
    # exploded-form quantization (r17): stays in whole-stage codegen —
    # the array form's three interpreted transform() lambdas dominated
    # this stage (see textops.quantize.quantize_int8_rows)
    ex = tracked_persist(
        quantize_int8_rows(both).select("vec_id", "label", "pos", "code")
    )
    cent = (
        ex.filter(F.col("vec_id") < _PLANT_OFF)
        .groupBy(F.col("label").alias("cand_label"), "pos")
        .agg(F.sum("code").alias("s"))
    )
    j = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cand_label")
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
    assigned = tracked_persist(
        j.withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", F.col("cand_label").alias("cluster"))
    )
    # within-cluster pair join: the only corpus-sized shuffle, keyed
    # (cluster, pos) so each cluster's pairwise work is partition-local
    m = tracked_persist(ex.join(assigned, "vec_id").select(
        "vec_id", "cluster", "pos", "code"
    ))
    a = m.select(
        F.col("vec_id").alias("id_a"),
        "cluster",
        "pos",
        F.col("code").alias("code_a"),
    )
    b = m.select(
        F.col("vec_id").alias("id_b"),
        F.col("cluster").alias("cluster_b"),
        F.col("pos").alias("pos_b"),
        F.col("code").alias("code_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("pos") == F.col("pos_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("code_a") * F.col("code_b")).alias("dot_ab"),
            F.sum(F.col("code_a") * F.col("code_a")).alias("aa"),
            F.sum(F.col("code_b") * F.col("code_b")).alias("bb"),
        )
    )
    dups = (
        pairs.filter(
            (F.col("aa") > 0)
            & (F.col("bb") > 0)
            & (
                F.col("dot_ab") / (F.sqrt("aa") * F.sqrt("bb"))
                >= F.lit(_TAU)
            )
        )
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.count("*").alias("n_earlier_dups"))
    )
    return assigned.join(dups, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce("n_earlier_dups", F.lit(0)).alias("n_earlier_dups"),
        (F.coalesce("n_earlier_dups", F.lit(0)) > 0).alias("is_semantic_dup"),
    )
