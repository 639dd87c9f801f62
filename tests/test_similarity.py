"""Similarity search: exact top-k sanity, LSH bucketing properties,
and LSH recall measured against the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.textops.similarity import (
    exact_topk,
    lsh_topk,
)

QIDS = [0, 1, 2, 3, 4]


def test_exact_topk_finds_identical_vector_first(spark):
    v = [float(i % 7) + 0.5 for i in range(8)]
    w = [x * 2.0 for x in v]  # same direction → cosine 1
    other = [float((i * 3) % 5) - 2.0 for i in range(8)]
    df = spark.createDataFrame(
        [(0, v), (1, w), (2, other)], "vec_id long, embedding array<float>"
    )
    rows = exact_topk(df, [0], k=2).collect()
    assert rows[0].vec_id == 1 and abs(rows[0].score - 1.0) < 1e-6
    assert rows[0].rnk == 1


def test_exact_topk_shape_and_ordering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = exact_topk(emb, QIDS, k=5).collect()
    assert len(out) == 5 * len(QIDS)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        scores = [r.score for r in sorted(rows, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)
        assert all(r.vec_id != q for r in rows)


def test_lsh_scans_sublinear_candidate_sets(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    out = lsh_topk(emb, QIDS, k=5).collect()
    assert out, "every query bucket should contain at least one candidate"
    # each query scored only its bucket-mates, not the whole corpus
    assert all(r.n_candidates < n for r in out)


def test_lsh_join_is_equi_on_bucket(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    plan = lsh_topk(emb, QIDS, k=5)._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_recall_vs_exact(spark, sf_dir):
    """Recall@5 of single-probe 4-bit hyperplane LSH against the exact
    baseline — on random-ish fixture vectors expect imperfect but real
    recall; the assertion guards 'bucketing is not degenerate'."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = exact_topk(emb, QIDS, k=5).collect()
    approx = lsh_topk(emb, QIDS, k=5).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.0
    # buckets must actually partition: no query scans everything
    assert all(r.n_candidates < emb.count() for r in approx)
