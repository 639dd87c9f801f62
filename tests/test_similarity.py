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


def _ivf_file_md5s(root):
    """{relative parquet path: md5} under the vectors tree."""
    import hashlib
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_ivf_append_protocol(spark, sf_dir, tmp_path):
    """The incremental IVF store's ledger protocol: appends only ADD
    files under the batch's own batch_seq leaves (earlier inverted
    lists byte-stable), a replayed committed batch is a no-op, batches
    are UNORDERED (frozen codebook ⇒ independent assignment — unlike
    the token-shard store), an empty batch commits (batch_seq, 0) with
    no vector files, and a crash before the ledger commit self-heals on
    retry with no duplicated vectors."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        N_CELLS,
        append_ivf_batch,
        ivf_store_paths,
    )
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.textops.similarity import norm_sql

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    root = str(tmp_path / "ivf")
    vectors_path, ledger_path = ivf_store_paths(root)

    b0 = emb.filter(F.col("vec_id") % 3 == 1)
    b1 = emb.filter(F.col("vec_id") % 3 == 2)
    b2 = emb.filter(F.col("vec_id") % 3 == 0)

    # out-of-order batch_seq is legal: 5 before 2
    append_ivf_batch(spark, b0, centroids, root, 5)
    before = _ivf_file_md5s(vectors_path)
    assert before and all("batch_seq=5" in p for p in before)

    append_ivf_batch(spark, b1, centroids, root, 2)
    after = _ivf_file_md5s(vectors_path)
    assert {p: after[p] for p in before} == before  # batch-5 files untouched
    assert all("batch_seq=2" in p for p in set(after) - set(before))

    # replay of committed batch 5: nothing changes
    append_ivf_batch(spark, b0, centroids, root, 5)
    assert _ivf_file_md5s(vectors_path) == after

    # empty batch: ledger row, no files
    empty = spark.createDataFrame([], b0.schema)
    append_ivf_batch(spark, empty, centroids, root, 7)
    assert _ivf_file_md5s(vectors_path) == after
    ledger = {
        r.batch_seq: r.n_vectors
        for r in spark.read.parquet(ledger_path).collect()
    }
    assert ledger[7] == 0 and set(ledger) == {2, 5, 7}

    # crash before the ledger commit, then retry: self-heal, no dupes
    import automate_data_ingestion_project_spark.io.maintenance as maint

    real_append = maint.append_ledger_row

    def crash_on_ledger(spark_, lp, batch_seq, counts):
        if lp == ledger_path:
            raise RuntimeError("injected crash before ledger commit")
        return real_append(spark_, lp, batch_seq, counts)

    import pytest as _pytest

    try:
        maint.append_ledger_row = crash_on_ledger
        with _pytest.raises(RuntimeError, match="injected crash"):
            append_ivf_batch(spark, b2, centroids, root, 9)
    finally:
        maint.append_ledger_row = real_append
    # orphans exist, ledger has no batch-9 row
    assert any("batch_seq=9" in p for p in _ivf_file_md5s(vectors_path))
    assert 9 not in {
        r.batch_seq for r in spark.read.parquet(ledger_path).collect()
    }
    append_ivf_batch(spark, b2, centroids, root, 9)
    spark.catalog.refreshByPath(vectors_path)
    stored = spark.read.parquet(vectors_path)
    assert stored.count() == stored.select("vec_id").distinct().count()
    assert stored.count() == emb.count()
    # assignment over the appended store matches a from-scratch pass:
    # every vector's stored cell equals its nearest frozen centroid
    from automate_data_ingestion_project_spark.analytics.ivf import assign_cells

    fresh = assign_cells(
        emb.select(
            "vec_id", "embedding", F.expr(norm_sql("embedding")).alias("nrm")
        ),
        centroids,
    )
    mismatch = (
        stored.select("vec_id", F.col("cell").alias("got"))
        .join(fresh.select("vec_id", F.col("cell").alias("want")), "vec_id")
        .filter("got != want")
    )
    assert mismatch.count() == 0


def test_ivf_store_asof_reads_generations(spark, sf_dir, tmp_path):
    """read_store_asof is store-agnostic: on the IVF store it returns
    exactly the generations up to the asked batch, and raises once
    compaction collapsed history — the same contract the shard store
    registers."""
    import pytest
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        N_CELLS,
        append_ivf_batch,
        ivf_store_paths,
    )
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.io.maintenance import (
        compact_store_tree,
        read_store_asof,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    root = str(tmp_path / "ivf")
    b0, b1 = emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")
    append_ivf_batch(spark, b0, centroids, root, 0)
    append_ivf_batch(spark, b1, centroids, root, 1)
    vectors_path, _ = ivf_store_paths(root)

    assert read_store_asof(spark, vectors_path, 0).count() == b0.count()
    assert read_store_asof(spark, vectors_path, 1).count() == emb.count()

    compact_store_tree(spark, vectors_path, "cell", "vec_id")
    with pytest.raises(ValueError, match="compacted"):
        read_store_asof(spark, vectors_path, 0)


def test_ivf_search_is_orphan_invariant(spark, tmp_path, sf_dir):
    """The r12 verdict's read_committed done-criterion, verbatim at the
    SEARCH level: write an orphan batch_seq=7 leaf (files, no ledger
    row) into an appended IVF store and prove the registered search's
    results are hash-identical with and without the orphan present —
    a reader racing a dead appender can never see its vectors."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        _frozen_codebook,
        _search_appended_ivf,
        append_ivf_batch,
        assign_cells,
        ivf_store_paths,
    )
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.textops.similarity import (
        norm_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    centroids = _frozen_codebook(emb)
    root = str(tmp_path / "store")
    append_ivf_batch(spark, emb.filter("vec_id % 3 != 0"), centroids, root, 0)
    append_ivf_batch(spark, emb.filter("vec_id % 3 = 0"), centroids, root, 1)
    vectors_path, ledger_path = ivf_store_paths(root)

    def fingerprint():
        return sorted(
            tuple(r)
            for r in _search_appended_ivf(
                spark, vectors_path, ledger_path
            ).collect()
        )

    clean = fingerprint()

    # dead appender: perturbed copies of real vectors under batch_seq=7
    # leaves in the PROBED cells, no ledger row — a raw scan WOULD rank
    # them into the candidate lists
    orphan = (
        assign_cells(
            emb.filter("vec_id % 3 = 1")
            .select(
                (F.col("vec_id") + 100000).alias("vec_id"),
                "embedding",
            )
            .select(
                "vec_id",
                "embedding",
                F.expr(norm_sql("embedding")).alias("nrm"),
            ),
            centroids,
        )
        .withColumn("batch_seq", F.lit(7))
    )
    (
        orphan.repartition("cell")
        .write.mode("append")
        .partitionBy("cell", "batch_seq")
        .parquet(vectors_path)
    )
    spark.catalog.refreshByPath(vectors_path)
    raw = spark.read.parquet(vectors_path)
    assert raw.filter("batch_seq = 7").count() > 0  # orphans ARE there

    assert fingerprint() == clean  # ...and the search never sees them


def test_refined_oracle_surgery_guards_its_marker(monkeypatch):
    """_ivfpq_refined_oracle splices the refine tail at the base
    oracle's 'ranked AS (' marker; a reworded base must fail LOUDLY
    (the sibling delete-oracle surgeries assert the same invariant)
    rather than silently emit a malformed refined oracle."""
    import pytest

    from automate_data_ingestion_project_spark.analytics import pq

    assert "shortlist AS (" in pq._ivfpq_refined_oracle()  # intact base
    monkeypatch.setattr(pq, "_ivfpq_oracle", lambda n_probe=1: "SELECT 1")
    with pytest.raises(AssertionError, match="base oracle changed"):
        pq._ivfpq_refined_oracle()
