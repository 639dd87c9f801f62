"""Inverted-index term statistics over ``documents``.

``top_terms_per_doc`` is the TF-IDF/BM25 building block kept
integer-exact: per-document term frequencies, corpus document
frequencies, a df-cap that suppresses stopword-like terms (the same
hot-key guard the n-gram Jaccard join uses), and a deterministic
top-3 ranking by (tf DESC, term ASC). No logs or float weights —
cross-engine log() rounding is NOT guaranteed identical, so ranking
on raw (tf, df) integers is both the deterministic choice and what
an index builder actually materializes.

Scale shape: explode → (doc_id, term) count with map-side partials;
document frequency is a second aggregate over the SAME shuffled
relation (term df from distinct doc-term rows, not raw tokens); the
df table joins back on ``term`` — a plain shuffle equi-join at
vocabulary scale (broadcast only if the vocab is known-small; it is
not at 100 TB, so no hint). The final per-doc top-3 reuses the
window pattern: partition by doc_id over ≤|terms-per-doc| rows.

Beyond-reference family (north star: LLM-pipeline text analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.ranking import rank_distributed
from ..textops.dedup import spread_for_compute
from .registry import register
from ..operators.caching import tracked_persist

DF_CAP_PCT = 80  # drop terms appearing in > 80% of documents
TOP_K = 3


@register(
    "top_terms_per_doc",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ),
    n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ),
    ranked AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df
        FROM tf JOIN df ON tf.term = df.term, n
        WHERE df.df * 100 <= {DF_CAP_PCT} * n.n_docs
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.term) <= {TOP_K}
    )
    SELECT doc_id, term, tf, df FROM ranked
    """,
    survey_ref="text analysis: inverted-index top terms w/ df cap (north star)",
)
def top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "documents")
    tok = spread_for_compute(raw).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    # persisted: tf feeds both the df aggregate and the ranking join —
    # without it each branch re-runs the tokenize+count stage
    tf = tracked_persist(
        tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    # lazy scalar: a broadcast 1-row aggregate joined in, so the whole query
    # stays ONE plan (an eager raw.count() here would run a separate job at
    # build time)
    n_docs = raw.agg(F.count("*").alias("_n_docs"))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("term").asc()
    )
    return (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .filter(F.col("df") * 100 <= DF_CAP_PCT * F.col("_n_docs"))
        .withColumn("_rn", F.row_number().over(win))
        .filter(f"_rn <= {TOP_K}")
        .select("doc_id", "term", "tf", "df")
    )


@register(
    "vocab_encode",
    oracle="""
    WITH tok AS (
        SELECT doc_id, i - 1 AS pos, w[i] AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             UNNEST(range(1, len(w) + 1)) AS t(i)
    ),
    counts AS (
        SELECT term, COUNT(*) AS n FROM tok GROUP BY 1
    ),
    vocab AS (
        SELECT term,
               ROW_NUMBER() OVER (ORDER BY n DESC, term) AS token_id
        FROM counts
    ),
    enc AS (
        SELECT tok.doc_id, tok.pos, v.token_id
        FROM tok JOIN vocab v ON tok.term = v.term
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(token_id * (pos + 1)) AS BIGINT) AS pos_weighted_sum,
           CAST(SUM(token_id) AS BIGINT) AS id_sum,
           MIN(token_id) AS min_id,
           MAX(token_id) AS max_id
    FROM enc GROUP BY 1
    """,
    survey_ref="text analysis: vocab construction + doc encoding (north star)",
)
def vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-to-ids: rank terms into a vocabulary by (frequency
    DESC, term ASC) and encode every document, summarized as
    position-weighted integer checksums (the checksum pins the exact
    id-at-position assignment without shipping the arrays).

    The vocab ranking is DISTRIBUTED two-phase (no global window — a
    web-crawl vocab with its typo long tail can be 100 M+ terms, which
    breaks the "ranks on one task" assumption): range-partition the
    aggregated counts on the rank order, rank locally per range
    partition, then add per-partition offsets computed from the tiny
    (≤ |partitions| rows) per-partition sizes via a broadcast self-join
    — no single-partition WindowExec anywhere in the plan.
    The encode join is a plain shuffle equi-join on ``term``: the same
    100 M+-term vocab that rules out the global window also rules out a
    forced broadcast (it would ship the full vocab to every executor).
    AQE converts it to a broadcast join at runtime when the vocab
    actually is small — no hint needed in either regime.
    """
    raw = load_table(spark, sf_dir, "documents")
    tok = spread_for_compute(raw).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("n"))
    vocab = rank_distributed(
        counts, [F.col("n").desc(), F.col("term").asc()], "token_id"
    ).select("term", "token_id")
    return (
        tok.join(vocab, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("token_id") * (F.col("pos") + 1)).alias(
                "pos_weighted_sum"
            ),
            F.sum("token_id").alias("id_sum"),
            F.min("token_id").alias("min_id"),
            F.max("token_id").alias("max_id"),
        )
    )
