"""Exact-substring span dedup: planted-duplicate behavior."""

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.spans import (
    _L,
    _spans,
    duplicate_text_spans,
    span_dedup_mask,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spans_window_count_and_short_doc_dropped(spark):
    ten = " ".join(f"w{i}" for i in range(10))
    short = " ".join(f"s{i}" for i in range(_L - 1))
    out = _spans(_docs(spark, [(1, ten), (2, short)])).collect()
    # 10 tokens → 10-L+1 windows; the short doc contributes none
    assert len(out) == 10 - _L + 1
    assert all(r.doc_id == 1 for r in out)


def test_planted_shared_span_detected(spark):
    shared = " ".join(f"c{i}" for i in range(_L))
    d1 = shared + " xa xb xc"
    d2 = "ya yb " + shared
    d3 = " ".join(f"z{i}" for i in range(12))
    df = _docs(spark, [(1, d1), (2, d2), (3, d3)])

    spark.sparkContext.setLogLevel("ERROR")
    spans = (
        _spans(df)
        .groupBy("span")
        .agg(F.countDistinct("doc_id").alias("n_docs"), F.count("*").alias("n_occurrences"))
        .filter(F.col("n_docs") >= 2)
        .collect()
    )
    assert [(r.span, r.n_docs, r.n_occurrences) for r in spans] == [(shared, 2, 2)]


def test_mask_flags_mostly_duplicated_doc(spark):
    shared = " ".join(f"c{i}" for i in range(_L))
    # doc 1 IS the shared span (1 window, 100% duplicated) → flagged;
    # doc 2 embeds it among unique text (minority) → not flagged
    d2 = " ".join(f"u{i}" for i in range(3 * _L)) + " " + shared
    df = _docs(spark, [(1, shared), (2, d2)])
    # span_dedup_mask loads from sf_dir; exercise the same logic inline
    spans = _spans(df)
    dup = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span", F.lit(True).alias("is_dup"))
    )
    rows = {
        r.doc_id: r
        for r in (
            spans.join(dup, "span", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_spans"),
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
            )
            .collect()
        )
    }
    assert rows[1].n_dup == rows[1].n_spans  # fully duplicated
    assert rows[2].n_dup < 0.5 * rows[2].n_spans  # mostly unique


def test_registered_queries_nonempty_on_fixture(spark, sf_dir):
    assert duplicate_text_spans(spark, sf_dir).limit(1).count() == 1
    assert span_dedup_mask(spark, sf_dir).limit(1).count() == 1
