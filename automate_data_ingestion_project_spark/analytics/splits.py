"""Training-data set construction: deterministic stratified splits and
per-language bigram statistics.

``dataset_split`` is the canonical train/validation/test assignment for
a 100 TB corpus: a salted 56-bit md5 hash of the document id modulo 100
buckets (80/10/10). Hash-based assignment is rerun-stable, needs no
global coordination, and keeps a document in the same split when the
corpus grows — properties a ``rand()``-based split lacks. The id_sum
checksum pins the exact membership of every (lang, split) cell, not
just its size.

``bigram_counts`` is the n-gram statistics pass of a language-model
data pipeline (top-10 bigrams per language). Tokens explode to rows and
pair up via ``lead`` over a per-document window — explode + codegen'd
window, not an interpreted array lambda, per the repo's HOF rule — then
one aggregate and a SALTED two-phase top-k: ``lang`` has ~10 distinct
values, so a plain per-language window would drag billions of
aggregated bigram rows onto ~10 tasks at 100 TB. Phase 1 ranks within
(lang, crc32(bigram)%32) and keeps ≤ k rows per salt bucket — the
global top-k must survive its bucket's top-k, so the prune is lossless
— phase 2 runs the real window over ≤ k·32 rows per language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..textops.dedup import spread_for_compute
from .registry import register

TOP_K = 10


def split_bucket(col, salt: str = "split:"):
    """Deterministic 0-99 bucket: 56-bit md5 prefix of the salted id
    (the cross-engine hash recipe used throughout the repo)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 14), 16, 10
    ).cast("bigint")
    return h % 100


@register(
    "dataset_split",
    oracle="""
    WITH h AS (
        SELECT lang, doc_id,
               CAST(concat('0x', substr(
                   md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 14))
                   AS BIGINT) % 100 AS b
        FROM documents
    )
    SELECT lang,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'validation'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM h GROUP BY 1, 2
    """,
    survey_ref="deterministic stratified train/val/test split (LLM pipeline)",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "validation").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
    )


@register(
    "bigram_counts",
    oracle=f"""
    WITH tok AS (
        SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    bi AS (
        SELECT lang,
               unnest(list_transform(range(0, len(w) - 1),
                   i -> concat_ws(' ', w[i+1], w[i+2]))) AS bigram
        FROM tok
    ),
    c AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY 1, 2)
    SELECT lang, bigram, n FROM c
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY lang ORDER BY n DESC, bigram
    ) <= {TOP_K}
    """,
    survey_ref="n-gram statistics: top bigrams per language (LLM pipeline)",
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    tok = docs.select(
        "doc_id", "lang", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    seq = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        tok.withColumn("nxt", F.lead("term").over(seq))
        .filter(F.col("nxt").isNotNull())
        .select("lang", F.concat_ws(" ", "term", "nxt").alias("bigram"))
    )
    counts = bi.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    # Skew-proof two-phase top-k (same shape as warehouse.top3_orders_per_
    # priority): ~10 langs would otherwise serialize the whole aggregated
    # bigram table onto ~10 window tasks.  Salt is deterministic
    # (crc32 of the bigram), so retries/replays are stable.
    n_salts = 32
    salt = (F.crc32(F.col("bigram")) % n_salts).cast("int")
    local_w = Window.partitionBy("lang", "_salt").orderBy(
        F.col("n").desc(), F.col("bigram")
    )
    survivors = (
        counts.withColumn("_salt", salt)
        .withColumn("_local_rank", F.row_number().over(local_w))
        .filter(F.col("_local_rank") <= TOP_K)
        .drop("_salt", "_local_rank")
    )
    top = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        survivors.withColumn("_rn", F.row_number().over(top))
        .filter(F.col("_rn") <= TOP_K)
        .select("lang", "bigram", "n")
    )


def _leakage_safe_oracle_sql() -> str:
    from .dedup import _VARIANTS_SQL, _minhash_oracle_sql

    return f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
    edges AS (
        SELECT doc_id_a AS a, doc_id_b AS b FROM pairs
        UNION
        SELECT doc_id_b AS a, doc_id_a AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS component_id
        FROM reach GROUP BY a
    ),
    base AS ({_VARIANTS_SQL}),
    canon AS (
        SELECT b.doc_id, COALESCE(c.component_id, b.doc_id) AS canonical_id
        FROM base b LEFT JOIN comp c ON b.doc_id = c.node
    ),
    h AS (
        SELECT doc_id, canonical_id,
               CAST(concat('0x', substr(
                   md5(concat('split:', CAST(canonical_id AS VARCHAR))), 1, 14))
                   AS BIGINT) % 100 AS bkt
        FROM canon
    )
    SELECT CASE WHEN bkt < 80 THEN 'train'
                WHEN bkt < 90 THEN 'validation'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           COUNT(DISTINCT canonical_id) AS n_groups
    FROM h GROUP BY 1
    """


@register(
    "leakage_safe_split",
    oracle=_leakage_safe_oracle_sql(),
    survey_ref="LLM curation: leakage-safe split (near-dup components share a split)",
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment where near-duplicate documents land in
    the SAME split — hash-splitting each doc independently leaks
    training text into eval whenever near-dups straddle the boundary,
    silently inflating eval scores. Composition: verified MinHash pairs
    → connected components → every doc keyed by its component canonical
    (docs in no component are their own canonical) → the deterministic
    split hash applied to the CANONICAL id, so the whole component
    moves together.

    Scale shape: pair evidence comes from the materialized
    :func:`..analytics.dedup.minhash_pairs_evidence` artifact (banded
    generation, Σ|bucket|², built once per corpus content — the oracle
    still re-derives it from scratch, so staleness cannot pass);
    O(diameter)-round label propagation; the canonical assignment is
    one left join on doc_id; the split itself stays a narrow hash map.
    id_sum pins exact membership; n_groups counts the distinct
    components per split (the leakage-evidence metric).
    """
    from .dedup import _docs_with_variants, minhash_pairs_evidence
    from ..textops.components import connected_components

    docs = _docs_with_variants(spark, sf_dir).select("doc_id")
    pairs = minhash_pairs_evidence(spark, sf_dir).select(
        "doc_id_a", "doc_id_b"
    )
    comp = connected_components(pairs)
    canon = docs.join(comp, docs["doc_id"] == comp["node"], "left").select(
        "doc_id",
        F.coalesce("component_id", F.col("doc_id")).alias("canonical_id"),
    )
    b = split_bucket(F.col("canonical_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "validation").otherwise("test")
    )
    return (
        canon.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.countDistinct("canonical_id").alias("n_groups"),
        )
    )
