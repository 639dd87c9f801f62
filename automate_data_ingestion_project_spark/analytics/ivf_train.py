"""IVF coarse-quantizer TRAINING — the k-means loop for the cell tree.

`analytics/ivf.py` builds its cell tree from a deterministic sampled
codebook (first ``N_CELLS`` vectors) and notes production would k-means
it; `analytics/pq_train.py` closed that gap for the PQ sub-codebooks
and measured (r9, module docstring) that SPHERICAL k-means of the
coarse cells lowered nprobe=1 recall on the iid fixtures — a note, not
a registered measurement. This module makes the coarse-quantizer
comparison first-class and honest, under the geometry FAISS actually
trains and searches coarse cells with: SQUARED-L2 (``IndexIVFFlat``'s
default metric), not the dot-product routing the registered cosine
searches use for their own pruning.

Two registered, fully hash-checkable rows:

- ``ivf_train_distortion`` — mean L2 quantization distortion of the
  cell codebook per Lloyd iteration. Each (assign, mean-update) step is
  provably non-increasing in total squared distortion, so the row
  sequence is a monotone curve — the contract that training WORKED,
  with no RNG or float-order caveat.
- ``ann_ivf_trained_recall_eval`` — recall@k of L2-IVF search
  (nprobe=1) under the sampled seed codebook NEXT TO the trained
  codebook, against the exact-L2 ground truth. Both variants run the
  identical search machinery; only the centroids differ, so the delta
  attributes to training alone. On iid fixture vectors the lift is
  expected to be small or absent (there is no cluster structure to
  find) — the eval PROVES what training buys instead of assuming it,
  exactly the ``ann_pq_trained_recall_eval`` stance.

Cross-engine determinism (the :mod:`pq_train` contract, full-dim):
vectors fixed-point quantized once (``floor(x * 1e6 + 0.5)``), Lloyd
means are INTEGER sums divided once, assignment argmin is the
(distance, centroid-id) total order, distortions integer-rounded before
the BIGINT accumulation.

Scale shape: the codebook is ``N_CELLS`` rows — broadcast every
iteration; per iteration the data-sized work is one broadcast join +
one integer partial aggregate keyed on (cell, dim) with
``N_CELLS``·D result rows regardless of corpus size. At 100 TB the
loop runs on a bounded sample and the winning codebook is frozen into
:func:`..analytics.ivf.append_ivf_batch`'s add-forever contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.caching import tracked_persist
from ..textops.similarity import dot_sql, norm_sql
from .registry import register
from .ivf import N_CELLS
from .similarity import QUERY_IDS, TOP_K
from .pq import _sqdist_sql
from .pq_train import _FP_LAMBDA

N_IVF_ITERS = 3
_QIDS = ", ".join(str(i) for i in QUERY_IDS)


def fp_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, codes): full vectors fixed-point quantized — the exact
    integer training space both engines share."""
    return emb.select(
        "vec_id", F.expr(f"transform(embedding, {_FP_LAMBDA})").alias("codes")
    )


def seed_centroids(fpv: DataFrame) -> DataFrame:
    """(j, cvec): the deterministic-sample seed codebook — centroid j
    is vector j itself (code space, double)."""
    return fpv.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").cast("int").alias("j"),
        F.expr("transform(codes, x -> CAST(x AS DOUBLE))").alias("cvec"),
    )


def assign_l2(fpv: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, codes, j, dd): nearest-centroid L2 assignment under the
    (distance, j) total order via ONE aggregate — ``dd`` is the winning
    squared distance, the per-point distortion."""
    d = fpv.crossJoin(F.broadcast(cb)).withColumn(
        "dd", F.expr(_sqdist_sql("codes", "cvec"))
    )
    return (
        d.groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("dd"), F.col("j"))).alias("_m"),
            F.first("codes").alias("codes"),
        )
        .select(
            "vec_id", "codes", F.col("_m.j").alias("j"), F.col("_m.dd").alias("dd")
        )
    )


def lloyd_update_l2(assigned: DataFrame) -> DataFrame:
    """(j, cvec): per-centroid mean of member codes — integer sums, one
    exact double division per dimension; member-less centroids drop out
    (mirrored in the oracle)."""
    means = (
        assigned.select("j", F.posexplode("codes").alias("dim", "c"))
        .groupBy("j", "dim")
        .agg((F.sum("c").cast("double") / F.count("*")).alias("m"))
    )
    return means.groupBy("j").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, m))), x -> x.m)"
        ).alias("cvec")
    )


def _train_live(spark: SparkSession, sf_dir: str):
    """(fpv, [assignment_0..assignment_T]): assignment_t is the corpus
    assigned under the codebook after t Lloyd updates (t=0 = seed)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    fpv = tracked_persist(fp_vectors(emb))
    cb = seed_centroids(fpv)
    assignments = []
    for _ in range(N_IVF_ITERS + 1):
        a = tracked_persist(assign_l2(fpv, cb))
        assignments.append(a)
        cb = lloyd_update_l2(a)
    return fpv, assignments


def _ivf_train_ctes(n_iters: int) -> str:
    """DuckDB mirror of the loop, unrolled: fpv, cb0, (d{t}, a{t}) per
    iteration, (m{t+1}, cb{t+1}) between — :func:`pq_train._train_ctes`
    without the subspace dimension."""
    parts = [
        f"""
    fpv AS (
        SELECT vec_id, list_transform(embedding, {_FP_LAMBDA}) AS codes
        FROM embeddings
    ),
    cb0 AS (
        SELECT CAST(vec_id AS INTEGER) AS j,
               list_transform(codes, x -> CAST(x AS DOUBLE)) AS cvec
        FROM fpv WHERE vec_id < {N_CELLS}
    )"""
    ]
    for t in range(n_iters + 1):
        parts.append(
            f""",
    d{t} AS (
        SELECT c.vec_id, c.codes, b.j,
               {_sqdist_sql('c.codes', 'b.cvec', 'duckdb')} AS dd
        FROM fpv c CROSS JOIN cb{t} b
    ),
    a{t} AS (
        SELECT vec_id, codes, j, dd FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY dd, j) AS rn
            FROM d{t}
        ) WHERE rn = 1
    )"""
        )
        if t < n_iters:
            parts.append(
                f""",
    m{t + 1} AS (
        SELECT j, i AS dim,
               CAST(SUM(codes[i + 1]) AS DOUBLE) / COUNT(*) AS m
        FROM a{t}, UNNEST(range(0, len(codes))) AS u(i)
        GROUP BY 1, 2
    ),
    cb{t + 1} AS (
        SELECT j, list(m ORDER BY dim) AS cvec FROM m{t + 1} GROUP BY 1
    )"""
            )
    return "".join(parts)


def _distortion_oracle() -> str:
    rows = " UNION ALL ".join(
        f"""SELECT CAST({t} AS INTEGER) AS iter,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CAST(floor(dd + 0.5) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) AS mean_distortion
        FROM a{t}"""
        for t in range(N_IVF_ITERS + 1)
    )
    return f"WITH {_ivf_train_ctes(N_IVF_ITERS)} {rows}"


@register(
    "ivf_train_distortion",
    oracle=_distortion_oracle(),
    survey_ref="similarity search: IVF coarse-quantizer k-means training (monotone distortion contract)",
)
def ivf_train_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean L2 quantization distortion of the coarse-cell codebook per
    Lloyd iteration — the monotone curve that proves the training loop
    optimizes its objective (per-point distortions integer-rounded so
    the accumulation is an exact BIGINT sum in both engines). The same
    distributed loop at 100 TB trains on a bounded sample; the curve is
    the convergence check a production training job logs."""
    _, assignments = _train_live(spark, sf_dir)
    out = None
    for t, a in enumerate(assignments):
        row = a.agg(
            F.lit(t).cast("int").alias("iter"),
            F.count("*").alias("n_points"),
            (
                F.sum(F.expr("CAST(floor(dd + 0.5) AS BIGINT)")).cast("double")
                / F.count("*")
            ).alias("mean_distortion"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _variant_search_ctes(tag: str, t: int) -> str:
    """Per-variant L2-IVF search CTEs over assignment a{t}: query
    cells, same-cell candidates, exact code-space L2 top-k."""
    return f"""
    q_{tag} AS (
        SELECT a.vec_id AS query_id, a.j AS cell, a.codes AS qcodes
        FROM a{t} a WHERE a.vec_id IN ({_QIDS})
    ),
    top_{tag} AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_sqdist_sql('q.qcodes', 'c.codes', 'duckdb')},
                                c.vec_id
                   ) AS rnk
            FROM q_{tag} q JOIN a{t} c ON q.cell = c.j
            WHERE q.query_id != c.vec_id
        ) WHERE rnk <= {TOP_K}
    ),
    hit_{tag} AS (
        SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM ex JOIN top_{tag} v ON ex.query_id = v.query_id
                                AND ex.vec_id = v.vec_id
        GROUP BY 1
    )"""


def _recall_oracle() -> str:
    return f"""
    WITH {_ivf_train_ctes(N_IVF_ITERS)},
    ex AS (
        SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_sqdist_sql('q.codes', 'c.codes', 'duckdb')},
                                c.vec_id
                   ) AS rnk
            FROM fpv q JOIN fpv c ON q.vec_id != c.vec_id
            WHERE q.vec_id IN ({_QIDS})
        ) WHERE rnk <= {TOP_K}
    ),{_variant_search_ctes('sampled', 0)},{_variant_search_ctes('trained', N_IVF_ITERS)}
    SELECT q.query_id,
           CAST(COALESCE(s.n, 0) AS DOUBLE) / {TOP_K} AS recall_ivf_sampled,
           CAST(COALESCE(t.n, 0) AS DOUBLE) / {TOP_K} AS recall_ivf_trained
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hit_sampled s USING (query_id)
    LEFT JOIN hit_trained t USING (query_id)
    """


def _variant_search(assigned: DataFrame, exact: DataFrame, name: str) -> DataFrame:
    """Spark twin of the per-variant search: nprobe=1 same-cell
    candidates, exact code-space L2, hits against the ground truth."""
    q = assigned.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("j").alias("cell"),
        F.col("codes").alias("qcodes"),
    )
    cand = q.join(
        assigned.select(F.col("j").alias("cell"), "vec_id", "codes"), "cell"
    ).filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.expr(_sqdist_sql("qcodes", "codes")), F.col("vec_id")
    )
    top = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id")
    )
    return (
        top.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias(name))
    )


@register(
    "ann_ivf_trained_recall_eval",
    oracle=_recall_oracle(),
    survey_ref="similarity search: recall@k of the trained vs sampled IVF coarse codebook (measured, not assumed)",
)
def ann_ivf_trained_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@k of L2-IVF search (nprobe=1) under the SAMPLED
    seed codebook and under the TRAINED codebook, side by side against
    the exact-L2 ground truth — identical search machinery, only the
    centroids differ, so the delta attributes to training alone. The
    last "relational, not trained" placeholder in the ANN tier becomes
    a registered measurement: on iid fixtures training buys distortion
    (``ivf_train_distortion``'s monotone curve) but little recall —
    stated by this row per fixture instead of assumed either way."""
    fpv, assignments = _train_live(spark, sf_dir)
    q = fpv.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    c = fpv.select("vec_id", "codes")
    w = Window.partitionBy("query_id").orderBy(
        F.expr(_sqdist_sql("qcodes", "codes")), F.col("vec_id")
    )
    exact = tracked_persist(
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id")
    )
    h_s = _variant_search(assignments[0], exact, "n_s")
    h_t = _variant_search(assignments[N_IVF_ITERS], exact, "n_t")
    return (
        exact.select("query_id")
        .distinct()
        .join(h_s, "query_id", "left")
        .join(h_t, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_s", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_ivf_sampled"
            ),
            (F.coalesce("n_t", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_ivf_trained"
            ),
        )
    )


# ---- the trained codebook WIRED INTO a registered search ------------------


def ivf_trained_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Root of the TRAINED-IVF artifact for a fixture — built once per
    fixture fingerprint, then served from the artifact cache:

    - ``codebook/`` — the (j, cvec) coarse codebook after
      ``N_IVF_ITERS`` Lloyd updates: the frozen artifact a production
      add-path (:func:`..analytics.ivf.append_ivf_batch`) quantizes new
      batches against, FAISS's train-once-add-forever contract.
    - ``vectors/`` — the corpus assigned under that codebook, WRITTEN
      cell-partitioned, so searches prune their candidate scans to the
      probed cells' directories exactly like the sampled-codebook
      layout (``ivf.ivf_cell_table``).

    This closes the "production would k-means them" note in
    ``analytics/ivf.py``: the registered search below serves from the
    trained layout instead of the sampled one."""
    from ..io.artifacts import fixture_artifact

    def _build(tmp: str) -> None:
        import os

        _, assignments = _train_live(spark, sf_dir)
        # the codebook that PRODUCED the final assignment (one Lloyd
        # update past assignment N-1), persisted for the add-path
        cb = lloyd_update_l2(assignments[N_IVF_ITERS - 1])
        cb.coalesce(1).write.parquet(os.path.join(tmp, "codebook"))
        final = assignments[N_IVF_ITERS].select(
            "vec_id", F.col("j").alias("cell")
        )
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id",
            "embedding",
            F.expr(norm_sql("embedding")).alias("nrm"),
        )
        (
            emb.join(final, "vec_id")
            .repartition("cell")
            .write.partitionBy("cell")
            .parquet(os.path.join(tmp, "vectors"))
        )

    return fixture_artifact(sf_dir, "ivf_trained", ("embeddings",), _build)


def _trained_topk_oracle() -> str:
    """From-scratch mirror: unroll the training loop, assign the corpus
    under the final codebook (a{N}), then the same cosine top-k the
    sampled-codebook search runs."""
    n = N_IVF_ITERS
    return f"""
    WITH {_ivf_train_ctes(n)},
    raw AS (
        SELECT vec_id, embedding, {norm_sql("embedding", "duckdb")} AS nrm
        FROM embeddings
    ),
    assigned AS (
        SELECT r.vec_id, r.embedding, r.nrm, a.j AS cell
        FROM raw r JOIN a{n} a USING (vec_id)
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_norm, cell
        FROM assigned WHERE vec_id IN ({_QIDS})
    ),
    scored AS (
        SELECT q.query_id, a.vec_id,
               {dot_sql("q.q_emb", "a.embedding", "duckdb")}
                   / (q.q_norm * a.nrm) AS score
        FROM q JOIN assigned a USING (cell)
        WHERE q.query_id != a.vec_id
    ),
    counted AS (
        SELECT *, CAST(COUNT(*) OVER (PARTITION BY query_id) AS BIGINT)
                      AS n_candidates
        FROM scored
    ),
    ranked AS (
        SELECT query_id, vec_id, score, n_candidates,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, vec_id
               ) AS INTEGER) AS rnk
        FROM counted
    )
    SELECT query_id, vec_id, score, rnk, n_candidates
    FROM ranked WHERE rnk <= {TOP_K}
    """


@register(
    "ann_ivf_trained_topk",
    oracle=_trained_topk_oracle(),
    survey_ref="similarity search: IVF top-k over the TRAINED coarse codebook (k-means wired into the search path)",
)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat cosine top-k served from the TRAINED codebook artifact:
    queries are routed by quantizing against the persisted codebook —
    the path a non-corpus query takes in production, one broadcast join
    against ``N_CELLS`` rows — and the candidate scan reads the
    trained cell-partitioned layout pruned to the probed cells
    (``PartitionFilters`` on ``cell``, pinned by tests/test_plans.py).
    Identical search machinery to ``ann_ivf_topk``; only the centroids
    differ, which is exactly what "wire the trained codebook in" means:
    training (``ivf_train_distortion``'s monotone curve) now feeds the
    registered serving path instead of ending at an eval."""
    import os

    from .ivf import _probed_cells

    root = ivf_trained_artifact(spark, sf_dir)
    cb = spark.read.parquet(os.path.join(root, "codebook"))
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.expr(norm_sql("embedding")).alias("nrm")
    )
    # query routing through the trained codebook (code-space L2 argmin,
    # the same total order training used) — deterministically equal to
    # the stored assignment for corpus members, but computed the way a
    # FRESH query vector would be
    qv = emb.filter(F.col("vec_id").isin(QUERY_IDS))
    qcell = assign_l2(fp_vectors(qv), cb).select(
        F.col("vec_id").alias("query_id"), F.col("j").alias("cell")
    )
    q = qv.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    ).join(F.broadcast(qcell), "query_id")
    q = tracked_persist(q)

    assigned = spark.read.parquet(os.path.join(root, "vectors"))
    c = assigned.filter(F.col("cell").isin(_probed_cells(q))).select(
        "vec_id",
        F.col("embedding").alias("c_emb2"),
        F.col("nrm").alias("c_norm"),
        "cell",
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "score",
            F.expr(dot_sql("q_emb", "c_emb2"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    wq = Window.partitionBy("query_id")
    scored = scored.withColumn(
        "n_candidates", F.count("*").over(wq).cast("long")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "score", "rnk", "n_candidates")
    )
