#!/usr/bin/env python
"""Incremental-ANN scale demo: grow the IVF store through B appended
batches of REP×-replicated embeddings and measure what the maintained
index claims at 100 TB:

1. **Append cost is batch-sized, not store-sized** — per-batch append
   wall time must stay ~flat as the store grows (each batch only
   quantizes its own vectors against the broadcast codebook and adds
   files under its own partition leaves; committed batches are never
   read, except the O(#batches)-row ledger).
2. **Search cost is probe-sized, not store-sized** — the same top-k
   search re-run after every append; its candidate scan partition-
   prunes to the probed cells, so latency tracks cell size (corpus/
   N_CELLS — linear in corpus here because the demo keeps N_CELLS
   fixture-sized; production scales cells ~√N so cell size grows as
   √N, and the demo's per-batch timings expose exactly the quantity
   that rule controls).
3. **Compaction collapses the accumulated small files to one per cell
   and changes no result** — file counts before/after, plus a search
   equality check.

Usage::

    python scripts/ann_ingest_demo.py [REP] [N_BATCHES] [SF_DIR]

    REP        replication factor over the fixture's 2k vectors
               (default 50 → 100k vectors)
    N_BATCHES  appended batches (default 5)

Replica vectors are perturbed with a codegen'd per-replica affine map
(scale by 1 + rep/1000, rotate one coordinate) so replicas are
distinct vectors, not copies; vec_ids offset by rep·|fixture| so the
frozen codebook (fixture vec_id < N_CELLS) and query ids stay the
originals. One JSON line at the end; the recorded run lives in
SCALE.md ("Incremental-ANN scale demo").
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(argv: list[str]) -> int:
    rep = int(argv[1]) if len(argv) > 1 else 50
    n_batches = int(argv[2]) if len(argv) > 2 else 5
    sf_dir = argv[3] if len(argv) > 3 else "/root/testdata/sf0.1"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from automate_data_ingestion_project_spark.analytics.ivf import (
        N_CELLS,
        append_ivf_batch,
        ivf_store_paths,
        _search_appended_ivf,
    )
    from automate_data_ingestion_project_spark.analytics.load import scratch_dir
    from automate_data_ingestion_project_spark.io import load_table
    from automate_data_ingestion_project_spark.io.maintenance import (
        compact_store_tree,
        data_file_count,
    )
    from automate_data_ingestion_project_spark.session import get_spark

    spark = get_spark(app_name="ann-ingest-demo")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_fixture = emb.count()
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )

    # REP× scale-up in-flight: explode a replica sequence, perturb with
    # a codegen'd affine map — one scan, rows multiply in the plan
    scaled = (
        emb.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(rep - 1))).alias("rep"),
        )
        .select(
            (F.col("vec_id") + F.col("rep") * n_fixture).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> cast(x * (1.0 + rep / 1000.0)"
                " + (case when i = rep % 64 then 0.37 else 0.0 end)"
                " as float))"
            ).alias("embedding"),
            "rep",
        )
    )

    root = scratch_dir("ann_ingest_demo")
    vectors_path, _ = ivf_store_paths(root)
    timings: dict[str, float] = {}
    appends: list[float] = []
    searches: list[float] = []
    reps_per_batch = max(1, rep // n_batches)
    for b in range(n_batches):
        hi = (b + 1) * reps_per_batch if b < n_batches - 1 else rep
        batch = scaled.filter(
            (F.col("rep") >= b * reps_per_batch) & (F.col("rep") < hi)
        ).select("vec_id", "embedding")
        t0 = time.perf_counter()
        append_ivf_batch(spark, batch, centroids, root, b)
        appends.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        n_hits = _search_appended_ivf(spark, vectors_path).count()
        searches.append(round(time.perf_counter() - t0, 3))
    stored = spark.read.parquet(vectors_path).count()

    files_before = data_file_count(spark, vectors_path)
    before = sorted(
        map(tuple, _search_appended_ivf(spark, vectors_path).collect())
    )
    t0 = time.perf_counter()
    compact_store_tree(spark, vectors_path, "cell", "vec_id")
    timings["compact_sec"] = round(time.perf_counter() - t0, 3)
    files_after = data_file_count(spark, vectors_path)
    # n_batches column collapses to the compacted generation; compare
    # the search results on the batch-agnostic columns
    after = sorted(
        map(tuple, _search_appended_ivf(spark, vectors_path).collect())
    )
    same = [a[:5] for a in after] == [b[:5] for b in before]

    out = {
        "metric": "ann_ingest_demo",
        "rep": rep,
        "n_vectors": stored,
        "n_batches": n_batches,
        "append_sec": appends,
        "search_sec": searches,
        "files_before_compaction": files_before,
        "files_after_compaction": files_after,
        "search_equal_after_compaction": same,
        **timings,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
