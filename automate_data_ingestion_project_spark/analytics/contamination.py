"""Training-data hygiene queries: benchmark decontamination and
repetition (Gopher-style) quality signals over ``documents``.

Two shapes a 100 TB curation pipeline runs on every corpus build:

- ``decontaminate_overlap`` — flag training documents that share any
  5-gram with a held-out benchmark/eval set (the GPT-3/Llama
  "n-gram overlap" decontamination rule). The eval side is distinct
  n-grams of a tiny document subset, so the join is a BROADCAST
  hash join against the exploded training gram stream — the corpus
  side never shuffles; only matched hits (a vanishing fraction)
  shuffle for the per-doc count.
- ``doc_repetition`` — per-document duplicate-token and
  most-frequent-bigram fractions (the repetition filters from the
  Gopher/MassiveText quality pipeline), kept integer-exact
  (counts + an integer-compare flag) so the oracle hash-matches
  without float folds. One shuffle total: the window partitioning
  on ``doc_id`` also satisfies both downstream groupBys (grouping
  keys are supersets of the partitioning key).

Beyond-reference family (north star: LLM-pipeline text analysis);
fixtures: ``documents.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..textops import analysis as ta
from ..textops.dedup import spread_for_compute
from .registry import register
from ..operators.caching import tracked_persist

# every 50th doc_id plays the held-out benchmark set
EVAL_MOD = 50
NGRAM = 5


def doc_grams(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """DISTINCT (doc_id, g) word n-grams via posexplode + window
    ``lead`` — compiled operators only (HOF ``transform`` shingling is
    interpreted; measured ~4× slower on this query at sf0.1). The
    distinct aggregate reuses the window's ``doc_id`` partitioning, so
    the whole gram build costs ONE shuffle."""
    tok = spread_for_compute(docs).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    sh = tok.select(
        "doc_id",
        "w",
        *[F.lead("w", k).over(win).alias(f"w{k}") for k in range(1, n)],
    )
    return (
        sh.filter(F.col(f"w{n - 1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(
                " ", "w", *[f"w{k}" for k in range(1, n)]
            ).alias("g"),
        )
        .distinct()
    )


@register(
    "decontaminate_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+{NGRAM - 1}], ' ') AS g
        FROM toks, UNNEST(range(1, len(w) - {NGRAM - 2})) AS t(i)
    ),
    eval_g AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0
    ),
    hits AS (
        SELECT gr.doc_id, COUNT(*) AS n_hit_grams
        FROM grams gr JOIN eval_g e ON gr.g = e.g
        WHERE gr.doc_id % {EVAL_MOD} <> 0
        GROUP BY 1
    )
    SELECT d.source,
           COUNT(*) AS n_train_docs,
           COUNT(h.n_hit_grams) AS n_contaminated_docs,
           CAST(COALESCE(SUM(h.n_hit_grams), 0) AS BIGINT) AS n_hit_grams_total
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {EVAL_MOD} <> 0
    GROUP BY 1
    """,
    survey_ref="text analysis: benchmark n-gram decontamination (north star)",
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination report: training docs sharing a 5-gram
    with the eval subset (``doc_id % 50 == 0``).

    100 TB plan: eval n-grams are distinct grams of a fixture-scale
    benchmark set — always broadcastable (real eval suites are MBs
    against a 100 TB corpus). The training gram stream stays narrow
    (scan → shingle → explode → broadcast semi-side join); the only
    shuffles carry matched hits and the per-source 4-int summary.
    """
    docs = load_table(spark, sf_dir, "documents")
    # persisted: both the eval and train branches read the gram stream,
    # and without it each branch re-runs the whole shingling stage
    grams = tracked_persist(doc_grams(docs))
    eval_g = (
        grams.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_g), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    base = docs.filter(F.col("doc_id") % EVAL_MOD != 0).select(
        "doc_id", "source"
    )
    return (
        base.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.count("n_hit_grams").alias("n_contaminated_docs"),
            F.coalesce(F.sum("n_hit_grams"), F.lit(0)).alias(
                "n_hit_grams_total"
            ),
        )
    )


@register(
    "doc_repetition",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    big AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS b
        FROM toks, UNNEST(range(1, len(w))) AS t(i)
    ),
    cnt AS (
        SELECT doc_id, b, COUNT(*) AS n FROM big GROUP BY 1, 2
    ),
    agg AS (
        SELECT doc_id,
               MAX(n) AS max_bigram_n,
               CAST(SUM(n) AS BIGINT) AS n_bigrams
        FROM cnt GROUP BY 1
    )
    SELECT d.doc_id,
           {ta.n_tokens("d.text", "duckdb")} AS n_tokens,
           {ta.n_unique_tokens("d.text", "duckdb")} AS n_unique_tokens,
           a.n_bigrams,
           a.max_bigram_n,
           (a.max_bigram_n * 5 > a.n_bigrams) AS is_repetitive
    FROM documents d JOIN agg a ON d.doc_id = a.doc_id
    """,
    survey_ref="text analysis: repetition quality signals (north star)",
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals: token/unique-token counts, bigram
    total, most-frequent-bigram count, and a 20 %-threshold flag
    (``max_bigram_n * 5 > n_bigrams`` — integer compare, no floats).

    Plan: one shuffle. ``posexplode`` + ``lead`` builds bigrams with
    compiled operators (HOF lambdas are interpreted — measured slower;
    see ``doc_fingerprints``); the window's hash partitioning on
    ``doc_id`` already satisfies both downstream groupBys, so the
    (doc_id, bigram) count and the per-doc max/sum run shuffle-free
    on top of it. Per-doc scalars ride through the explode and
    aggregate with ``first`` instead of re-joining the scan.
    """
    docs = spread_for_compute(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.expr(ta.n_tokens("text", "spark")).alias("n_tokens"),
        F.expr(ta.n_unique_tokens("text", "spark")).alias("n_unique_tokens"),
        F.split("text", " ").alias("w"),
    ).filter(F.size("w") >= 2)
    tok = base.select(
        "doc_id",
        "n_tokens",
        "n_unique_tokens",
        F.posexplode("w").alias("pos", "word"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("w1", F.lead("word", 1).over(win))
        .filter(F.col("w1").isNotNull())
        .select(
            "doc_id",
            "n_tokens",
            "n_unique_tokens",
            F.concat_ws(" ", "word", "w1").alias("b"),
        )
    )
    cnt = big.groupBy("doc_id", "b").agg(
        F.count("*").alias("n"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("n_unique_tokens").alias("n_unique_tokens"),
    )
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.first("n_unique_tokens").alias("n_unique_tokens"),
            F.sum("n").alias("n_bigrams"),
            F.max("n").alias("max_bigram_n"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_unique_tokens",
            "n_bigrams",
            "max_bigram_n",
            (F.col("max_bigram_n") * 5 > F.col("n_bigrams")).alias(
                "is_repetitive"
            ),
        )
    )
