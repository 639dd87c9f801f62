"""PQ codebook training: the k-means contract (distortion monotone
non-increasing; trained recall not worse than the sampled floor) and
the plan shape (codebook broadcasts, no corpus-sized window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automate_data_ingestion_project_spark.analytics.pq_train import (
    N_TRAIN_ITERS,
    ann_pq_trained_recall_eval,
    pq_train_distortion,
)


def test_distortion_monotone_non_increasing(spark, sf_dir):
    """Lloyd's theorem: each (assign, mean-update) step cannot increase
    total quantization distortion. With exact integer accumulation the
    inequality must hold exactly, every iteration."""
    rows = sorted(pq_train_distortion(spark, sf_dir).collect(), key=lambda r: r.iter)
    assert [r.iter for r in rows] == list(range(N_TRAIN_ITERS + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert cur.mean_distortion <= prev.mean_distortion, (
            prev.iter, prev.mean_distortion, cur.iter, cur.mean_distortion)
    # training must actually move: the seed codebook is an arbitrary
    # sample, so at least the first update strictly improves
    assert rows[-1].mean_distortion < rows[0].mean_distortion


def test_trained_recall_not_worse_than_sampled(spark):
    """Mean recall@k with the trained codebook must be >= the sampled
    floor (ann_pq_recall_eval's documented contract: the untrained
    number is "the FLOOR a trained codebook must beat"). Evaluated at
    the oracle SF so the query set matches the driver's check."""
    from tests.conftest import SF_ORACLE_DIR

    rows = ann_pq_trained_recall_eval(spark, SF_ORACLE_DIR).collect()
    mean_s = sum(r.recall_sampled for r in rows) / len(rows)
    mean_t = sum(r.recall_trained for r in rows) / len(rows)
    assert mean_t >= mean_s, (mean_s, mean_t)


def test_training_plan_broadcasts_codebook(spark, sf_dir):
    """Every Lloyd iteration's assignment joins the corpus against the
    M*K-row codebook — that join must be broadcast (the codebook is
    fixed-size by construction), and no corpus-sized window may appear
    (assignment is the min-struct aggregate, not row_number). Audited
    on the LIVE loop (the artifact builder); the registered queries
    read the materialized artifact, whose plan is just scans."""
    from automate_data_ingestion_project_spark.analytics.pq_train import (
        assign_codes,
        fp_subvectors,
        sampled_codebook,
    )
    from automate_data_ingestion_project_spark.io import load_table

    subs = fp_subvectors(load_table(spark, sf_dir, "embeddings"))
    df = assign_codes(subs, sampled_codebook(subs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_batch_encoding_equals_whole_corpus_codes(spark, sf_dir):
    """encode_pq_batch against the frozen codebook must give every
    vector the SAME codes whether encoded in one pass or in arbitrary
    batches — the invariance the incremental IVF-PQ store rests on."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.pq import (
        _codebook_subs,
        encode_pq_batch,
        pq_codes,
        pq_dists,
    )
    from automate_data_ingestion_project_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = _codebook_subs(emb)

    whole = {
        (r.vec_id, r.s): r.code for r in pq_codes(pq_dists(emb)).collect()
    }
    batched = {}
    for b in range(3):
        got = encode_pq_batch(
            emb.filter(F.col("vec_id") % 3 == b), cb
        ).collect()
        for r in got:
            for s, code in enumerate(r.codes):
                batched[(r.vec_id, s)] = code
    assert batched == whole


def test_ivfpq_store_compaction_preserves_codes(spark, sf_dir, tmp_path):
    """compact_store_tree applies unchanged to the codes-only IVF-PQ
    store: one file per cell afterwards, every (vec_id, codes, cell)
    row preserved, new appends still land beside the compacted
    generation."""
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import N_CELLS
    from automate_data_ingestion_project_spark.analytics.pq import (
        _codebook_subs,
        append_ivfpq_batch,
        ivfpq_store_paths,
    )
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.io.maintenance import (
        compact_store_tree,
        data_file_count,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    cb = _codebook_subs(emb)
    root = str(tmp_path / "store")
    append_ivfpq_batch(
        spark, emb.filter("vec_id % 3 = 1"), centroids, cb, root, 0
    )
    append_ivfpq_batch(
        spark, emb.filter("vec_id % 3 = 2"), centroids, cb, root, 1
    )
    codes_path, _ = ivfpq_store_paths(root)

    def snapshot():
        return {
            r.vec_id: (tuple(r.codes), int(r.cell))
            for r in spark.read.parquet(codes_path).collect()
        }

    before = snapshot()
    n_cells_used = len({c for _, c in before.values()})
    assert data_file_count(spark, codes_path) > n_cells_used

    n = compact_store_tree(spark, codes_path, "cell", "vec_id")
    assert n == len(before)
    assert data_file_count(spark, codes_path) == n_cells_used
    assert snapshot() == before

    append_ivfpq_batch(
        spark, emb.filter("vec_id % 3 = 0"), centroids, cb, root, 2
    )
    spark.catalog.refreshByPath(codes_path)
    assert spark.read.parquet(codes_path).count() == emb.count()
