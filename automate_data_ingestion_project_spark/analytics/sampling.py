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


_SYS_STEP = 97  # prime sampling interval over cumulative token weight
_SYS_BUCKET = 1000  # doc_id range per prefix-sum bucket


@register(
    "weighted_systematic_sample",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               -- DuckDB widens SUM(BIGINT) to HUGEINT (float64 via
               -- pandas); CAST back so the dtype-sensitive value hash
               -- sees bigint on both sides (pattern: centroids.py)
               CAST(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_weight
        FROM w
    )
    SELECT doc_id, n_tokens, cum_weight
    FROM cum
    WHERE (cum_weight - n_tokens) // {_SYS_STEP} < cum_weight // {_SYS_STEP}
    """,
    survey_ref="LLM curation: weighted (proportional-to-size) systematic sample",
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling proportional to token weight: walk the
    corpus's cumulative token count and keep every document whose
    weight interval crosses a multiple of the step — each doc selected
    with probability ≈ n_tokens/step, EXACTLY deterministic (reruns,
    retries, and replication all reproduce the same sample; the
    rand()-based form can't), and integer-exact end to end so the
    oracle hash-matches (positive weights ⇒ Spark's `div` and DuckDB's
    `//` truncation agree; no transcendental weight keys to flap
    low bits, unlike Efraimidis-Spirtakis u^(1/w)).

    Scale shape — the oracle's global ordered window would squeeze
    100 TB through ONE task; this computes the same cumulative weight
    with the two-phase prefix sum: (1) per-bucket token totals
    (doc_id div 1000 ranges — one partial-aggregated groupBy over
    ~N/1000 rows), (2) running offsets over the TINY bucket relation
    (window over bucket count, not row count), broadcast back,
    (3) within-bucket cumulative sums under a PARTITIONED window. No
    global window anywhere; the selection predicate is a narrow map.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    w = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        (F.col("doc_id") / _SYS_BUCKET).cast("long").alias("_bucket"),
    )
    totals = w.groupBy("_bucket").agg(F.sum("n_tokens").alias("_total"))
    # running offset of each bucket = sum of all EARLIER buckets' totals;
    # this window orders ~N/_SYS_BUCKET rows, bounded by corpus/1000
    off_w = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_total").over(off_w), F.lit(0)).alias("_offset"),
    )
    in_bucket = (
        Window.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        w.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "cum_weight",
            F.col("_offset") + F.sum("n_tokens").over(in_bucket),
        )
    )
    return cum.filter(
        F.expr(f"(cum_weight - n_tokens) div {_SYS_STEP}")
        < F.expr(f"cum_weight div {_SYS_STEP}")
    ).select("doc_id", "n_tokens", "cum_weight")
