"""Corpus-mixing queries: deterministic per-source sampling, domain
capping, and token-budget sequence packing over ``documents``.

The shapes every LLM training-data build runs:

- ``corpus_sample_mix`` — per-source sampling at per-source rates
  (the "mixture weights" step). Random sampling is useless at
  100 TB — reruns must keep the SAME documents — so the keep/drop
  decision is a pure function of ``doc_id``: 56-bit md5 hash mod
  100 compared to the source's rate. Narrow map + one tiny
  aggregate; runs at parquet scan speed and is trivially
  re-entrant (append-only corpora keep their prior decisions).
- ``pack_sequences`` — pack documents into fixed token-budget
  training sequences by contiguous concatenation: cumulative token
  count per source (ordered by ``doc_id``), sequence id =
  starting-offset ``div`` budget. One shuffle: the window's
  ``source`` partitioning also satisfies the (source, seq_id)
  groupBy.
- ``source_doc_cap`` / ``source_token_budget_cap`` (r9) — domain
  capping by document count and by token budget, in deterministic
  scrambled-hash order; both avoid any window whose partition grows
  with a source (two-phase salted top-K; two-phase prefix sum in
  scramble space — see each docstring).
- ``export_token_shards`` (r10) — the terminal materialization:
  write the corpus as token-bounded shards in deterministic global
  scrambled order (global two-phase prefix sum; hash-clustered
  partitionBy write; stats recomputed from the WRITTEN files).

100 TB note for packing: a single ordered window per source
serializes that source on one task. At real scale the same operator
runs per (source, shard) with shard base offsets from a two-phase
prefix-sum (count tokens per shard, broadcast the running totals) —
the binning arithmetic is unchanged. The fixture-scale query keeps
the one-window form because it is the semantics being checked.

Beyond-reference family (north star: LLM-pipeline curation);
fixtures: ``documents.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..textops import analysis as ta
from .registry import register

SEQ_BUDGET = 256  # tokens per packed training sequence


def _scramble(dialect: str, tag: str) -> str:
    """56-bit md5 scramble of doc_id — the deterministic stand-in for
    'uniformly random order', identical value in both engines, so the
    capped selection is a pure function of the corpus (reruns and the
    oracle pick the SAME documents)."""
    if dialect == "spark":
        s = f"concat('{tag}:', cast(doc_id as string))"
        return f"cast(conv(substr(md5({s}), 1, 14), 16, 10) as bigint)"
    s = f"concat('{tag}:', cast(doc_id as varchar))"
    return f"CAST(concat('0x', substr(md5({s}), 1, 14)) AS BIGINT)"


def _hash_pct(dialect: str) -> str:
    """hash56(doc_id) % 100 — identical value in both engines (one
    recipe: the shared :func:`_scramble`, so the engine pair cannot
    drift apart)."""
    return f"{_scramble(dialect, 'mix')} % 100"


def _rate(dialect: str) -> str:
    """Per-source mixture rate in [10, 94], derived from the numeric
    source suffix so the config needs no side table."""
    return f"10 + 7 * (cast(substr(source, 4) as integer) % 13)"


@register(
    "corpus_sample_mix",
    oracle=f"""
    SELECT source,
           {_rate("duckdb")} AS rate_pct,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER ({_hash_pct("duckdb")} < {_rate("duckdb")})
               AS n_sampled,
           CAST(COALESCE(SUM(n_chars) FILTER (
               {_hash_pct("duckdb")} < {_rate("duckdb")}), 0) AS BIGINT)
               AS chars_sampled
    FROM documents
    GROUP BY 1
    """,
    survey_ref="LLM curation: deterministic corpus mixing weights (north star)",
)
def corpus_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weight sampling report: docs kept per source when each
    source samples at its own rate via the deterministic hash rule.

    Plan: scan → narrow hash/compare map → 20-group aggregate. No
    joins, no window, nothing that grows with corpus size except the
    scan itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = F.expr(_hash_pct("spark")) < F.expr(_rate("spark"))
    return (
        docs.select(
            "source",
            "n_chars",
            F.expr(_rate("spark")).alias("rate_pct"),
            kept.alias("kept"),
        )
        .groupBy("source", "rate_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).alias("n_sampled"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("n_chars"))), F.lit(0)
            ).alias("chars_sampled"),
        )
        .select(
            "source", "rate_pct", "n_docs", "n_sampled", "chars_sampled"
        )
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               {ta.n_tokens("text", "duckdb")} AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM sized
    )
    SELECT source,
           (cum_tokens - n_tokens) // {SEQ_BUDGET} AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM cum
    GROUP BY 1, 2
    """,
    survey_ref="LLM curation: token-budget sequence packing (north star)",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-concatenation packing: per source, documents in
    ``doc_id`` order fill 256-token sequences; a document belongs to
    the sequence its starting offset falls in.

    Plan: one shuffle (window hash partition on ``source``); the
    (source, seq_id) groupBy reuses that partitioning, so count/sum/
    min/max aggregate shuffle-free on top of the window.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cum_tokens", F.sum("n_tokens").over(win))
    return (
        cum.withColumn(
            "seq_id",
            F.expr(f"(cum_tokens - n_tokens) div {SEQ_BUDGET}"),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


DOC_CAP = 10  # max documents kept per source (domain cap)
TOKEN_BUDGET = 600  # max tokens kept per source (token-budget cap)
_CAP_SALTS = 8  # phase-1 fan-out of the two-phase per-group top-K
SHARD_BUDGET = 20_000  # tokens per exported corpus shard
_HBUCKET_DIV = 35184372088832  # 2^45: top 11 bits of the 56-bit scramble


@register(
    "source_doc_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {_scramble("duckdb", "cap")}, doc_id
               ) AS keep_rank
        FROM documents
    )
    SELECT doc_id, source, keep_rank
    FROM ranked WHERE keep_rank <= {DOC_CAP}
    """,
    survey_ref="LLM curation: per-source document cap (domain capping, north star)",
)
def source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping by document count: keep at most ``DOC_CAP`` docs
    per source, chosen in deterministic scrambled-hash order (every
    real corpus build caps its dominant domains — CommonCrawl-style
    sources would otherwise drown the mixture).

    Scale shape — the naive per-source ROW_NUMBER window sorts each
    source's FULL document set on one task (a 10 PB crawl source =
    one task). This runs the two-phase top-K instead: phase 1 ranks
    within (source, salt) cells — ``_CAP_SALTS``× smaller sorts, any of
    which may hold at most the whole top-K — and keeps only each
    cell's top-``DOC_CAP``; phase 2 re-ranks the ≤ salts·K survivors per
    source, a bounded relation regardless of corpus size. Every
    global top-K member is a cell top-K member, so the result is
    exactly the one-window answer (the oracle computes that form).
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.expr(_scramble("spark", "cap")).alias("_hkey"),
        (F.col("doc_id") % _CAP_SALTS).alias("_salt"),
    )
    cell = Window.partitionBy("source", "_salt").orderBy("_hkey", "doc_id")
    survivors = keyed.withColumn(
        "_cell_rank", F.row_number().over(cell)
    ).filter(F.col("_cell_rank") <= DOC_CAP)
    final = Window.partitionBy("source").orderBy("_hkey", "doc_id")
    return (
        survivors.withColumn("keep_rank", F.row_number().over(final))
        .filter(F.col("keep_rank") <= DOC_CAP)
        .select("doc_id", "source", "keep_rank")
    )


@register(
    "source_token_budget_cap",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source,
               {ta.n_tokens("text", "duckdb")} AS n_tokens,
               {_scramble("duckdb", "budget")} AS hkey
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM sized
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
    survey_ref="LLM curation: per-source token budget cap (north star)",
)
def source_token_budget_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping by token budget: walk each source's documents in
    deterministic scrambled order and keep documents while the
    source's running token count stays within ``TOKEN_BUDGET`` (the
    "cap source X at N tokens" rule in every published data recipe —
    token budgets, not doc counts, are what mixture specs are written
    in).

    Scale shape — same objection as :func:`source_doc_cap`: a
    per-source ordered window serializes the source. This computes the
    running count with the two-phase prefix sum IN SCRAMBLE SPACE:
    hash-range buckets (top bits of the 56-bit scramble key) are
    contiguous in the walk order, so (1) per-(source, bucket) token
    totals partial-aggregate map-side, (2) running offsets need a
    window over the tiny (source, bucket) relation only, (3)
    within-bucket cumulative sums run under a partitioned window whose
    partitions are 1/2048th of a source. No window anywhere whose
    partition grows with the full source. (Pattern proven by
    ``weighted_systematic_sample``; here it composes with a scrambled
    — not natural-key — walk order.)
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
        F.expr(_scramble("spark", "budget")).alias("_hkey"),
    ).withColumn("_hbucket", F.expr(f"_hkey div {_HBUCKET_DIV}"))
    totals = sized.groupBy("source", "_hbucket").agg(
        F.sum("n_tokens").alias("_total")
    )
    off_w = (
        Window.partitionBy("source")
        .orderBy("_hbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "source",
        "_hbucket",
        F.coalesce(F.sum("_total").over(off_w), F.lit(0)).alias("_offset"),
    )
    in_bucket = (
        Window.partitionBy("source", "_hbucket")
        .orderBy("_hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sized.join(F.broadcast(offsets), ["source", "_hbucket"]).withColumn(
        "cum_tokens", F.col("_offset") + F.sum("n_tokens").over(in_bucket)
    )
    return cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET).select(
        "doc_id", "source", "n_tokens", "cum_tokens"
    )


@register(
    "export_token_shards",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               {ta.n_tokens("text", "duckdb")} AS n_tokens,
               {_scramble("duckdb", "shard")} AS hkey
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   ORDER BY hkey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM sized
    )
    SELECT (cum_tokens - n_tokens) // {SHARD_BUDGET} AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM cum
    GROUP BY 1
    """,
    survey_ref="LLM curation: token-bounded shard export (north star)",
)
def export_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's LAST step: materialize the corpus as token-bounded
    output shards (every training-data build ends by writing "shard
    files of ~N tokens each" for the loader to stream). A document
    belongs to the shard its starting offset falls in, in a
    deterministic GLOBAL scrambled order — reruns produce byte-identical
    shards, and the returned stats are computed from the WRITTEN files
    (the read-back proves the materialization, not just the plan).

    Scale shape — the naive form is a single global ordered window: one
    task sorts the whole corpus, the worst window in this module. This
    runs the two-phase prefix sum in scramble space GLOBALLY: the only
    unpartitioned window is over the ≤2^11-row bucket-totals relation
    (constant-bounded, broadcast back); the row-scale cumulative sum is
    partitioned by hash-range bucket. The write hash-clusters by
    ``shard_id`` BEFORE ``partitionBy`` so each task writes only its
    own shards' files (the repartition(n, cols)-then-partitionBy rule —
    without it every task holds every shard and the layout explodes to
    tasks×shards files).
    """
    import os

    from .load import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "text",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
        F.expr(_scramble("spark", "shard")).alias("_hkey"),
    ).withColumn("_hbucket", F.expr(f"_hkey div {_HBUCKET_DIV}"))
    totals = sized.groupBy("_hbucket").agg(F.sum("n_tokens").alias("_total"))
    off_w = Window.orderBy("_hbucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_hbucket",
        F.coalesce(F.sum("_total").over(off_w), F.lit(0)).alias("_offset"),
    )
    in_bucket = (
        Window.partitionBy("_hbucket")
        .orderBy("_hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        sized.join(F.broadcast(offsets), "_hbucket")
        .withColumn(
            "cum_tokens", F.col("_offset") + F.sum("n_tokens").over(in_bucket)
        )
        .withColumn(
            "shard_id", F.expr(f"(cum_tokens - n_tokens) div {SHARD_BUDGET}")
        )
    )
    out = os.path.join(scratch_dir("token_shards"), "shards")
    (
        assigned.select("doc_id", "text", "n_tokens", "shard_id")
        .repartition("shard_id")
        # deterministic file CONTENTS, not just membership: shuffle
        # fetch order varies run to run, so without the in-task sort
        # two reruns write the same rows in different orders and the
        # byte-identity contract (checksum-based shard caching) breaks
        .sortWithinPartitions("shard_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out)
    )
    exported = spark.read.parquet(out)
    return (
        exported.groupBy(F.col("shard_id").cast("bigint").alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )
