"""End-to-end corpus curation pipeline: exact dedup → benchmark
decontamination → mixture sampling → sequence packing, composed into
ONE declarative plan and checked by ONE oracle.

This is the capstone of the LLM-pipeline family: the individual
operators (``dedup_exact``, ``decontaminate_overlap``,
``corpus_sample_mix``, ``pack_sequences``) each have their own
CORRECTNESS entry; this query proves they COMPOSE — the way a real
100 TB training-data build runs them, as stages of a single lineage
Catalyst optimizes end-to-end (the dedup window, the broadcast
decontamination semi-join, and the sampling filter all execute before
the packing shuffle; nothing materializes in between).

Per-stage scale shapes (all inherited from the component operators):
dedup = one hash window; decontamination = broadcast anti-join
against eval grams (corpus side never shuffles); sampling = pure
narrow filter; packing = one window shuffle reused by the final
aggregate.

Output: per-source final corpus stats (docs kept, packed sequences,
total tokens) — integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..textops import analysis as ta
from ..textops.dedup import content_hash
from .contamination import EVAL_MOD, NGRAM, doc_grams
from .mixing import SEQ_BUDGET, _hash_pct, _rate, _scramble
from .registry import register
from ..operators.caching import tracked_persist


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH dedup AS (
        SELECT * FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY sha256(text) ORDER BY doc_id) = 1
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM dedup
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+{NGRAM - 1}], ' ') AS g
        FROM toks, UNNEST(range(1, len(w) - {NGRAM - 2})) AS t(i)
    ),
    eval_g AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0
    ),
    contaminated AS (
        SELECT DISTINCT gr.doc_id
        FROM grams gr JOIN eval_g e ON gr.g = e.g
        WHERE gr.doc_id % {EVAL_MOD} <> 0
    ),
    sampled AS (
        SELECT d.doc_id, d.source,
               {ta.n_tokens("d.text", "duckdb")} AS n_tokens
        FROM dedup d
        WHERE d.doc_id % {EVAL_MOD} <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
          AND {_hash_pct("duckdb").replace("doc_id", "d.doc_id")}
              < {_rate("duckdb").replace("source", "d.source")}
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM sampled
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT (cum_tokens - n_tokens) // {SEQ_BUDGET})
               AS n_sequences,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM cum
    GROUP BY 1
    """,
    survey_ref="LLM curation: composed dedup→decontaminate→sample→pack (north star)",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup — keep the min-doc_id copy per content hash
    dw = Window.partitionBy(content_hash()).orderBy("doc_id")
    dedup = (
        docs.withColumn("_rn", F.row_number().over(dw))
        .filter("_rn = 1")
        .drop("_rn")
    )

    # 2. decontamination — drop train docs sharing a 5-gram with eval
    # (persisted: the gram stream feeds both the eval and train branches)
    grams = tracked_persist(doc_grams(dedup))
    eval_g = grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_g), "g")
        .select("doc_id")
        .distinct()
    )
    clean = dedup.filter(F.col("doc_id") % EVAL_MOD != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    # 3. mixture sampling — deterministic hash rule
    sampled = clean.filter(
        F.expr(_hash_pct("spark")) < F.expr(_rate("spark"))
    ).select(
        "doc_id",
        "source",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
    )

    # 4. packing + final stats
    pw = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sampled.withColumn("cum_tokens", F.sum("n_tokens").over(pw))
    return (
        cum.withColumn(
            "seq_id", F.expr(f"(cum_tokens - n_tokens) div {SEQ_BUDGET}")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("seq_id").alias("n_sequences"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


CURATED_SOURCE_TOKENS = 400  # per-source token cap in the composed recipe
CURATED_SHARD_TOKENS = 1500  # tokens per exported shard in the recipe


@register(
    "curated_shard_export",
    oracle=f"""
    WITH dedup AS (
        SELECT * FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY sha256(text) ORDER BY doc_id) = 1
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM dedup
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+{NGRAM - 1}], ' ') AS g
        FROM toks, UNNEST(range(1, len(w) - {NGRAM - 2})) AS t(i)
    ),
    eval_g AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0
    ),
    contaminated AS (
        SELECT DISTINCT gr.doc_id
        FROM grams gr JOIN eval_g e ON gr.g = e.g
        WHERE gr.doc_id % {EVAL_MOD} <> 0
    ),
    sampled AS (
        SELECT d.doc_id, d.source,
               {ta.n_tokens("d.text", "duckdb")} AS n_tokens
        FROM dedup d
        WHERE d.doc_id % {EVAL_MOD} <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
          AND {_hash_pct("duckdb").replace("doc_id", "d.doc_id")}
              < {_rate("duckdb").replace("source", "d.source")}
    ),
    capped AS (
        SELECT doc_id, source, n_tokens FROM (
            SELECT doc_id, source, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY {_scramble("duckdb", "cap")}, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_src
            FROM sampled)
        WHERE cum_src <= {CURATED_SOURCE_TOKENS}
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY {_scramble("duckdb", "shard")}, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_all
        FROM capped
    )
    SELECT (cum_all - n_tokens) // {CURATED_SHARD_TOKENS} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM cum
    GROUP BY 1
    """,
    survey_ref=(
        "LLM curation: the FULL terminal path composed — "
        "dedup→decontaminate→sample→domain-cap→shard export (north star)"
    ),
)
def curated_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The entire production recipe as ONE lineage, ending in real
    files: exact dedup → benchmark decontamination → mixture sampling
    (the ``corpus_curation_pipeline`` front half) → per-source token
    cap (``source_token_budget_cap``'s two-phase scramble-space prefix
    sum, via :func:`mixing.scrambled_cum_tokens`) → token-bounded shard
    export (``export_token_shards``'s global form, via
    :func:`mixing.assign_token_shards`), written shard-clustered and
    read BACK for the returned per-shard stats — the driver hash-checks
    the whole pipeline end-to-end, not its halves.

    Scale notes are inherited per stage: hash-window dedup, broadcast
    decontamination semi-join, narrow sampling filter, no window whose
    partition grows with the corpus in either prefix sum, and a
    repartition(shard_id)-then-partitionBy write (tasks own their
    shards)."""
    import os

    from .load import scratch_dir
    from .mixing import assign_token_shards, scrambled_cum_tokens

    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup — keep the min-doc_id copy per content hash
    dw = Window.partitionBy(content_hash()).orderBy("doc_id")
    dedup = (
        docs.withColumn("_rn", F.row_number().over(dw))
        .filter("_rn = 1")
        .drop("_rn")
    )

    # 2. decontamination — drop train docs sharing a 5-gram with eval
    grams = tracked_persist(doc_grams(dedup))
    eval_g = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_g), "g")
        .select("doc_id")
        .distinct()
    )
    clean = dedup.filter(F.col("doc_id") % EVAL_MOD != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    # 3. mixture sampling — deterministic hash rule
    sampled = clean.filter(
        F.expr(_hash_pct("spark")) < F.expr(_rate("spark"))
    ).select(
        "doc_id",
        "source",
        "text",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
    )

    # 4. domain cap — per-source token budget in scramble space
    capped = (
        scrambled_cum_tokens(sampled, "cap", by=("source",))
        .filter(F.col("cum_tokens") <= CURATED_SOURCE_TOKENS)
        .drop("_hkey", "cum_tokens")
    )

    # 5. terminal shard export — write, read back, report
    assigned = assign_token_shards(
        capped, "shard", CURATED_SHARD_TOKENS
    )
    out = os.path.join(scratch_dir("curated_shards"), "shards")
    (
        assigned.select("doc_id", "source", "text", "n_tokens", "shard_id")
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out)
    )
    exported = spark.read.parquet(out)
    return exported.groupBy(
        F.col("shard_id").cast("bigint").alias("shard_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )
