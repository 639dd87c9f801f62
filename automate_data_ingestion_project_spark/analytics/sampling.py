"""Deterministic sampling + distribution bucketing operators.

Two shapes a training-data pipeline needs constantly:

- ``stratified_sample_exact`` — take EXACTLY k documents per stratum
  (here: language), chosen by a deterministic hash order so reruns,
  retries and corpus growth don't reshuffle the sample (``rand()``
  can't give any of that). Rate-based sampling is already covered by
  ``corpus_sample_mix``; this is the exact-count form (eval set
  construction, per-class budgets).
- ``customer_value_quartiles`` — bucket entities into quartiles of a
  computed measure. The naive form is ``NTILE(4) OVER (ORDER BY rev)``
  — a GLOBAL ordered window, i.e. every row through one task; the
  scale form computed here derives the three quartile boundaries with
  an exact percentile aggregate and assigns buckets with broadcast
  comparisons — one aggregate + one narrow map, no global window.
  (At 100 TB swap `percentile` → `percentile_approx` with a documented
  error bound, per SCALE.md; the assignment shape is unchanged.)

Sampling skew note: the per-stratum rank has the same ~10-key skew
shape as the bigram top-k (`splits.py`), so it reuses the salted
two-phase prune — phase 1 ranks within (lang, salt) and keeps ≤ k per
salt bucket (lossless: the global top-k by hash order survives any
bucket's local top-k), phase 2 ranks the ≤ k·n_salts survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, dsum_expr
from ..io import load_table
from .registry import register

SAMPLE_K = 20
_N_SALTS = 32


@register(
    "stratified_sample_exact",
    oracle=f"""
    WITH h AS (
        SELECT lang, doc_id,
               CAST(concat('0x', substr(
                   md5(concat('sample:', CAST(doc_id AS VARCHAR))), 1, 14))
                   AS BIGINT) AS hkey
        FROM documents
    )
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY hkey, doc_id
           ) AS sample_rank
    FROM h
    QUALIFY sample_rank <= {SAMPLE_K}
    """,
    survey_ref="LLM curation: exact-k-per-stratum deterministic sample",
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint")
    salt = (F.crc32(F.col("doc_id").cast("string")) % _N_SALTS).cast("int")
    local_w = Window.partitionBy("lang", "_salt").orderBy("hkey", "doc_id")
    survivors = (
        docs.withColumn("hkey", hkey)
        .withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= SAMPLE_K)
        .drop("_salt", "_lr")
    )
    final_w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        survivors.withColumn("sample_rank", F.row_number().over(final_w))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .select("lang", "doc_id", "sample_rank")
    )


@register(
    "customer_value_quartiles",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey, {dsum_expr('o_totalprice')} AS rev
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT quantile_cont(rev, 0.25) AS q1,
               quantile_cont(rev, 0.50) AS q2,
               quantile_cont(rev, 0.75) AS q3
        FROM rev
    )
    SELECT CASE WHEN rev <= q1 THEN 'q1'
                WHEN rev <= q2 THEN 'q2'
                WHEN rev <= q3 THEN 'q3'
                ELSE 'q4' END AS quartile,
           COUNT(*) AS n_customers,
           {dsum_expr('rev')} AS revenue
    FROM rev, q
    GROUP BY 1
    """,
    survey_ref="distribution bucketing: quartiles via percentile boundaries, no global window",
)
def customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(dsum("o_totalprice").alias("rev"))
    bounds = rev.agg(
        F.expr("percentile(rev, 0.25)").alias("q1"),
        F.expr("percentile(rev, 0.50)").alias("q2"),
        F.expr("percentile(rev, 0.75)").alias("q3"),
    )
    quartile = (
        F.when(F.col("rev") <= F.col("q1"), "q1")
        .when(F.col("rev") <= F.col("q2"), "q2")
        .when(F.col("rev") <= F.col("q3"), "q3")
        .otherwise("q4")
    )
    return (
        rev.crossJoin(F.broadcast(bounds))
        .select(quartile.alias("quartile"), "rev")
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("rev").alias("revenue"),
        )
    )
