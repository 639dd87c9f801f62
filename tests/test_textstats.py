"""Text-analysis operators: known-value checks on hand-built docs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.textops import analysis as ta


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(F.expr(expr).alias("v")).collect()[0].v


def test_token_counts(spark):
    assert _one(spark, "a b c", ta.n_tokens("text")) == 3
    assert _one(spark, "a b a", ta.n_unique_tokens("text")) == 2
    # BPE-ish: 'ab12!' → 'ab', '12', '!'  + 'cd' = 4
    assert _one(spark, "ab12! cd", ta.regex_token_count("text")) == 4


def test_avg_token_len_and_stopwords(spark):
    assert _one(spark, "ab cdef", ta.avg_token_len("text")) == 3.0
    # 'the' and 'a' are EN markers → 2 of 4 tokens
    assert _one(spark, "the cat a dog", ta.stopword_ratio("text")) == 0.5


def test_quality_score_monotone_in_length(spark):
    short = _one(spark, "the cat", ta.quality_score("text"))
    long = _one(spark, " ".join(["the cat"] * 60), ta.quality_score("text"))
    assert 0.0 <= short <= 1.0 and 0.0 <= long <= 1.0
    assert long > short


def test_predicted_lang_markers(spark):
    assert _one(spark, "der hund und die katze", ta.predicted_lang("text")) == "de"
    assert _one(spark, "the cat of the house", ta.predicted_lang("text")) == "en"
    assert _one(spark, "le chat et la maison", ta.predicted_lang("text")) == "fr"
    # tie (zero hits everywhere) → alphabetical first
    assert _one(spark, "zzz qqq", ta.predicted_lang("text")) == "de"


def test_fingerprint_sha_is_order_independent(spark):
    a = _one(spark, "x y z", ta.fingerprint_sha("text"))
    b = _one(spark, "z y x", ta.fingerprint_sha("text"))
    assert a == b == hashlib.sha256(b"x|y|z").hexdigest()
    c = _one(spark, "x y w", ta.fingerprint_sha("text"))
    assert c != a


def test_fingerprint_minshingle_stable_under_suffix_change(spark):
    """k=1 MinHash: equal unless the minimal shingle itself changes."""
    base = "q w e r t y u i o p"
    a = _one(spark, base, ta.fingerprint_minhash("text"))
    b = _one(spark, base + " zzz", ta.fingerprint_minhash("text"))
    assert isinstance(a, int)
    assert b <= a  # superset of shingles can only lower the min


def test_chunking_tail_coverage_and_short_docs(spark):
    from automate_data_ingestion_project_spark.textops.chunking import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # tail needs round-up
            (2, " ".join(f"t{i}" for i in range(32))),  # exactly one chunk
            (3, "a b c"),  # shorter than one chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap=8)
    rows = {(r.doc_id, r.chunk_start): r for r in out.collect()}

    # doc 1: starts 0,24,48,72 — last window reaches token 99
    assert sorted(s for d, s in rows if d == 1) == [0, 24, 48, 72]
    assert rows[(1, 72)].n_chunk_tokens == 28
    assert rows[(1, 72)].chunk_text.endswith("t99")
    # every token of doc 1 appears in some chunk
    covered = set()
    for (d, s), r in rows.items():
        if d == 1:
            covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(100)}

    assert sorted(s for d, s in rows if d == 2) == [0]
    assert rows[(2, 0)].n_chunk_tokens == 32

    assert sorted(s for d, s in rows if d == 3) == [0]
    assert rows[(3, 0)].chunk_text == "a b c"
