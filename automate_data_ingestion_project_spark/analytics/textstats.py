"""Text-analysis CORRECTNESS queries over ``documents``.

Three shapes:

- ``text_stats`` — per-document token/quality metrics (pure narrow map;
  at 100 TB this runs at parquet scan speed);
- ``lang_confusion`` — the language-ID heuristic aggregated into a
  (labelled lang × predicted lang) confusion matrix — narrow map + one
  tiny shuffle;
- ``doc_fingerprints`` — order-independent sha256 bag-of-words id +
  min-shingle-hash (k=1 MinHash) per document.

All expressions come from :mod:`..textops.analysis` which emits the
identical fragment in Spark and DuckDB dialects — the oracles run the
same computation tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..textops import analysis as ta
from .registry import register


def _stats_exprs(dialect: str) -> dict[str, str]:
    t = "text"
    return {
        "n_tokens": ta.n_tokens(t, dialect),
        "n_unique_tokens": ta.n_unique_tokens(t, dialect),
        "n_bpe_tokens": ta.regex_token_count(t, dialect),
        "avg_token_len": ta.avg_token_len(t, dialect),
        "stopword_ratio": ta.stopword_ratio(t, dialect),
        "quality_score": ta.quality_score(t, dialect),
    }


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           {", ".join(f"{e} AS {n}" for n, e in _stats_exprs("duckdb").items())}
    FROM documents
    """,
    survey_ref="text analysis: token counting + quality scoring (north star)",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *[F.expr(e).alias(n) for n, e in _stats_exprs("spark").items()],
    )


@register(
    "lang_confusion",
    oracle=f"""
    SELECT lang, {ta.predicted_lang("text", "duckdb")} AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    survey_ref="text analysis: n-gram/stopword language-ID heuristic (north star)",
)
def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang", F.expr(ta.predicted_lang("text", "spark")).alias("predicted_lang")
        )
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           {ta.fingerprint_sha("text", "duckdb")} AS fp_sha,
           {ta.fingerprint_minhash("text", "duckdb")} AS fp_minshingle
    FROM documents
    WHERE {ta.n_tokens("text", "duckdb")} >= 3
    """,
    survey_ref="text analysis: document fingerprinting (north star)",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark computes both fingerprints via explode + codegen'd
    aggregates rather than the oracle's per-row list lambdas — Spark's
    higher-order functions are interpreted (no codegen), measured ~5×
    slower at sf0.1. Shingles come from window ``lead`` over exploded
    (pos, word) rows: pure compiled operators, one shuffle. Values are
    identical either way: sorting fixes collect_set order, and min over
    the shingle MULTISET equals min over the distinct set."""
    from pyspark.sql import Window

    from ..textops.dedup import P, spread_for_compute

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").filter(
            F.expr(ta.n_tokens("text", "spark")) >= 3
        )
    )
    tok = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    sha_rel = tok.groupBy("doc_id").agg(
        F.sha2(F.concat_ws("|", F.sort_array(F.collect_set("w"))), 256).alias(
            "fp_sha"
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .withColumn("w2", F.lead("w", 2).over(win))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w1", "w2").alias("s"))
    )
    min_rel = sh.groupBy("doc_id").agg(
        F.min(
            F.expr(f"cast(conv(substr(md5(s), 1, 14), 16, 10) as bigint) % {P}")
        ).alias("fp_minshingle")
    )
    return sha_rel.join(min_rel, "doc_id").select(
        "doc_id", "fp_sha", "fp_minshingle"
    )


_CHUNK, _OVERLAP = 32, 8
_STRIDE = _CHUNK - _OVERLAP


@register(
    "doc_chunks",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    st AS (
        SELECT doc_id, w,
               unnest(range(0,
                   (greatest(len(w) - {_CHUNK}, 0) + {_STRIDE - 1}) // {_STRIDE}
                       * {_STRIDE} + 1,
                   {_STRIDE})) AS s
        FROM tok
    )
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(w[s + 1 : s + {_CHUNK}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(w[s + 1 : s + {_CHUNK}], ' ') AS chunk_text
    FROM st
    """,
    survey_ref="LLM pipeline: overlapping token-window chunking (north star)",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus → overlapping 32-token windows (stride 24) — the sharding
    step before embedding/training. Narrow map, scan-speed at any size."""
    from ..textops.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=_CHUNK, overlap=_OVERLAP)


_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]+"


@register(
    "pii_redaction",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               concat(text,
                   CASE WHEN doc_id % 3 = 0
                        THEN concat(' contact user', doc_id, '@example.com')
                        ELSE '' END,
                   CASE WHEN doc_id % 2 = 0
                        THEN concat(' phone 555-', doc_id)
                        ELSE '' END) AS t2
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t2, '{_EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(t2, '{_PHONE_RE}')) AS INTEGER)
               AS n_phones,
           CAST(concat('0x', substr(md5(
               regexp_replace(regexp_replace(t2, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')), 1, 14))
               AS BIGINT) AS redacted_hash
    FROM t
    """,
    survey_ref="LLM pipeline: PII detection + redaction (regex scrub; north star)",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection counts and the redacted text's hash —
    the scrubbing pass every training-data pipeline runs before
    anything else sees the text. The fixture corpus is synthetic and
    PII-free, so the query PLANTS deterministic PII first (the same
    planted-ground-truth discipline as the near-dup variants): docs
    ≡0 (mod 3) gain an email, ≡0 (mod 2) a phone number; expected
    counts are therefore known per doc and the redacted-text hash
    proves the replacement ran byte-identically in both engines.

    Scale shape: a pure narrow map — regex extraction and replacement
    are whole-row expressions evaluated at parquet-scan speed, no
    shuffle, no Python. The patterns live in the restricted regex
    subset Java's engine and DuckDB's RE2 interpret identically
    (character classes + literals; no lookaround, no backreferences) —
    the portability boundary a cross-engine scrubber must respect.
    The Spark side passes patterns through the COLUMN API, never an
    ``F.expr`` SQL string: the SQL parser applies string-literal escape
    processing that would silently turn the pattern's ``\\.`` into a
    match-anything ``.`` (verified: the expr form matched
    ``user@exampleXcom``; DuckDB's literal did not — two different
    regexes hiding behind one source string). The 56-bit hash is the
    repo's standard cross-engine text id (``conv(substr(md5))`` ==
    ``CAST(concat('0x',...))``).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(" phone 555-"), F.col("doc_id")),
            ).otherwise(""),
        ).alias("t2"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t2"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("t2", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t2", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.conv(F.substring(F.md5(redacted), 1, 14), 16, 10)
        .cast("long")
        .alias("redacted_hash"),
    )
