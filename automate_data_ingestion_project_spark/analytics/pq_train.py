"""PQ codebook TRAINING — the k-means loop the PQ tier was missing.

`analytics/pq.py` concedes its codebook is a deterministic sample and
that "production trains it with k-means". This module closes that gap:
a distributed Lloyd loop over each subspace's vectors, run a FIXED
deterministic number of iterations (`N_TRAIN_ITERS`) from the same
sample seed, with two registered, fully hash-checkable evaluations:

- ``pq_train_distortion`` — mean quantization distortion per training
  iteration. k-means is a quantizer: each (assign, mean-update) step is
  provably non-increasing in total squared distortion, so the row
  sequence is a monotone curve — the contract that training WORKED,
  checkable without any RNG or float-order caveat.
- ``ann_pq_trained_recall_eval`` — recall@k of the trained codebook
  next to the sampled codebook against the exact squared-L2 ground
  truth (the floor `ann_pq_recall_eval` documents). On this synthetic
  corpus (iid vectors, no cluster structure) training buys distortion,
  not much recall — the eval PROVES "not worse" instead of assuming
  improvement. (Measured while building: the IVF coarse quantizer is
  the opposite case — spherical-k-means training of 8 cells LOWERED
  nprobe=1 recall vs the sample codebook on iid data, so the coarse
  codebook deliberately stays sampled; this module trains the tier
  where the objective k-means optimizes — quantization error — is the
  tier's actual bottleneck.)

Cross-engine determinism (what makes the training loop itself
oracle-checkable, not just its mechanics):

- vectors are fixed-point quantized ONCE up front:
  ``code = floor(x * 1e6 + 0.5)`` per element — a per-row expression,
  identical in both engines;
- the Lloyd mean is ``SUM(code) / COUNT`` — INTEGER accumulation, so
  1000-way partial aggregation cannot flap a centroid bit (the same
  argument as ``centroids.kmeans_step``), and the division to double
  happens exactly once;
- assignment argmin is the (distance, centroid-id) TOTAL order, and
  distances are strict left-fold double arithmetic — bit-identical in
  DuckDB;
- distortion means integer-round each per-point distortion
  (``floor(dd + 0.5)`` — lossless at the O(1e11) fixed-point
  magnitude) so the accumulation is an exact BIGINT sum.

Scale shape: the codebook (M·K = 64 rows) broadcasts every iteration;
the only data-sized operations per iteration are one broadcast join +
one integer partial aggregate keyed on (s, code, dim) — M·K·SUBDIM
result rows regardless of corpus size. At 100 TB you train on a
bounded sample (k-means needs ~10⁵-10⁶ points per codebook, not the
corpus) and encode the full corpus once with the trained book; the
loop below IS that training job, pointed at the fixture corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.caching import tracked_persist
from .registry import register
from .similarity import QUERY_IDS, TOP_K
from .pq import (
    KPQ,
    M,
    SUBDIM,
    _CBIDS,
    _QIDS,
    _exact_l2_oracle,
    _rank_adc,
    _sqdist_sql,
    adc_scores,
)

N_TRAIN_ITERS = 3
FP_SCALE = "1000000.0"  # fixed-point scale (6 decimal digits)

_FP_LAMBDA = (
    f"x -> CAST(floor(CAST(x AS DOUBLE) * {FP_SCALE} + 0.5) AS BIGINT)"
)


def fp_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, s, codes): each vector's M subvectors, fixed-point
    quantized — the exact training space both engines share."""
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice("embedding", s * SUBDIM + 1, SUBDIM) for s in range(M)]
            )
        ).alias("s", "subvec"),
    )
    return subs.select(
        "vec_id", "s", F.expr(f"transform(subvec, {_FP_LAMBDA})").alias("codes")
    )


def sampled_codebook(subs: DataFrame) -> DataFrame:
    """(s, j, cvec): the deterministic-sample seed codebook — centroid
    j of subspace s is vector j's s-th subvector (code space)."""
    return subs.filter(F.col("vec_id") < KPQ).select(
        "s",
        F.col("vec_id").cast("int").alias("j"),
        F.expr("transform(codes, x -> CAST(x AS DOUBLE))").alias("cvec"),
    )


def assign_codes(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, s, codes, code, dd): nearest-centroid assignment per
    (vector, subspace) under the (distance, j) total order, via ONE
    aggregate (no window). ``dd`` is the winning squared distance —
    the per-point quantization distortion."""
    d = subs.join(F.broadcast(cb), "s").withColumn(
        "dd", F.expr(_sqdist_sql("codes", "cvec"))
    )
    return (
        d.groupBy("vec_id", "s")
        .agg(
            F.min(F.struct(F.col("dd"), F.col("j"))).alias("_m"),
            # codes is functionally dependent on the group key; first()
            # is deterministic here because every row in the group
            # carries the identical array
            F.first("codes").alias("codes"),
        )
        .select(
            "vec_id",
            "s",
            "codes",
            F.col("_m.j").alias("code"),
            F.col("_m.dd").alias("dd"),
        )
    )


def lloyd_update(assigned: DataFrame) -> DataFrame:
    """(s, j, cvec): per-centroid mean of member codes — integer sums,
    one exact double division per dimension. Centroids that lost every
    member drop out (mirrored in the oracle)."""
    means = (
        assigned.select("s", "code", F.posexplode("codes").alias("dim", "c"))
        .groupBy("s", "code", "dim")
        .agg((F.sum("c").cast("double") / F.count("*")).alias("m"))
    )
    return means.groupBy("s", F.col("code").alias("j")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, m))), x -> x.m)"
        ).alias("cvec")
    )


def _train_live(spark: SparkSession, sf_dir: str):
    """Run the full loop; returns (subs, [assignment_0..assignment_T])
    where assignment_t is the corpus assigned under the codebook after
    t Lloyd updates (t=0 ⇒ the sampled seed)."""
    emb = load_table(spark, sf_dir, "embeddings")
    subs = tracked_persist(fp_subvectors(emb))
    cb = sampled_codebook(subs)
    assignments = []
    for _ in range(N_TRAIN_ITERS + 1):
        a = tracked_persist(assign_codes(subs, cb))
        assignments.append(a)
        cb = lloyd_update(a)
    return subs, assignments


def _train(spark: SparkSession, sf_dir: str):
    """Training outputs as a fingerprint-keyed build-once artifact (the
    production pattern: a training job writes its assignments/codebook
    as tables; downstream evaluation reads them — here, both registered
    evaluation queries share ONE training run per fixture generation
    instead of re-running the loop each). Content is deterministic, so
    artifact reads hash-match the live loop exactly; the live loop
    (:func:`_train_live`) IS the artifact builder."""
    from ..io.artifacts import fixture_artifact

    def _build(tmp: str) -> None:
        _, assignments = _train_live(spark, sf_dir)
        for t, a in enumerate(assignments):
            a.write.mode("overwrite").parquet(os.path.join(tmp, f"a{t}"))

    root = fixture_artifact(sf_dir, "pq_train", ("embeddings",), _build)
    assignments = [
        spark.read.parquet(os.path.join(root, f"a{t}"))
        for t in range(N_TRAIN_ITERS + 1)
    ]
    # the (vec_id, s, codes) relation is embedded in every assignment
    subs = assignments[0].select("vec_id", "s", "codes")
    return subs, assignments


def _train_ctes(n_iters: int) -> str:
    """DuckDB mirror of the training loop, unrolled: CTEs subs, cb0,
    (d{t}, a{t}) per iteration, (m{t+1}, cb{t+1}) between them."""
    parts = [
        f"""
    subs AS (
        SELECT vec_id, CAST(s AS INTEGER) AS s,
               list_transform(
                   list_slice(embedding, s * {SUBDIM} + 1, (s + 1) * {SUBDIM}),
                   {_FP_LAMBDA}
               ) AS codes
        FROM embeddings, (SELECT unnest(range(0, {M})) AS s)
    ),
    cb0 AS (
        SELECT s, CAST(vec_id AS INTEGER) AS j,
               list_transform(codes, x -> CAST(x AS DOUBLE)) AS cvec
        FROM subs WHERE vec_id IN ({_CBIDS})
    )"""
    ]
    for t in range(n_iters + 1):
        parts.append(
            f""",
    d{t} AS (
        SELECT c.vec_id, c.s, c.codes, b.j,
               {_sqdist_sql('c.codes', 'b.cvec', 'duckdb')} AS dd
        FROM subs c JOIN cb{t} b USING (s)
    ),
    a{t} AS (
        SELECT vec_id, s, codes, j, dd FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id, s ORDER BY dd, j) AS rn
            FROM d{t}
        ) WHERE rn = 1
    )"""
        )
        if t < n_iters:
            parts.append(
                f""",
    m{t + 1} AS (
        SELECT s, j, i AS dim,
               CAST(SUM(codes[i + 1]) AS DOUBLE) / COUNT(*) AS m
        FROM a{t}, UNNEST(range(0, len(codes))) AS u(i)
        GROUP BY 1, 2, 3
    ),
    cb{t + 1} AS (
        SELECT s, j, list(m ORDER BY dim) AS cvec FROM m{t + 1} GROUP BY 1, 2
    )"""
            )
    return "".join(parts)


def _distortion_oracle() -> str:
    # Per-point distortions are integer-rounded before summation:
    # dd is O(1e11) in the fixed-point space, so floor(dd + 0.5) loses
    # nothing meaningful while making the accumulation an exact BIGINT
    # sum — DECIMAL(27,6) casts round the 6th decimal HALF_UP in Spark
    # vs HALF_EVEN in DuckDB, which flapped the mean's low bits.
    rows = " UNION ALL ".join(
        f"""SELECT CAST({t} AS INTEGER) AS iter,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CAST(floor(dd + 0.5) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) AS mean_distortion
        FROM a{t}"""
        for t in range(N_TRAIN_ITERS + 1)
    )
    return f"WITH {_train_ctes(N_TRAIN_ITERS)} {rows}"


@register(
    "pq_train_distortion",
    oracle=_distortion_oracle(),
    survey_ref="ANN codebook training: k-means distortion curve (monotone contract)",
)
def pq_train_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean quantization distortion after each Lloyd update, iter 0 =
    the sampled seed codebook. The k-means monotonicity theorem says
    mean_distortion is non-increasing in iter — asserted in
    tests/test_pq_train.py; the values themselves hash-match DuckDB
    because the whole loop is deterministic (module docstring)."""
    _, assignments = _train(spark, sf_dir)
    rows = [
        a.agg(
            F.count("*").cast("long").alias("n_points"),
            (
                F.sum(F.expr("CAST(floor(dd + 0.5) AS BIGINT)")).cast("double")
                / F.count("*")
            ).alias("mean_distortion"),
        ).select(
            F.lit(t).cast("int").alias("iter"), "n_points", "mean_distortion"
        )
        for t, a in enumerate(assignments)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _trained_recall_oracle() -> str:
    adc = " + ".join(f"MAX(CASE WHEN c.s = {s} THEN l.qd END)" for s in range(M))

    def variant(tag: str, t: int) -> str:
        return f"""
    lut_{tag} AS (
        SELECT vec_id AS query_id, s, j, dd AS qd
        FROM d{t} WHERE vec_id IN ({_QIDS})
    ),
    adc_{tag} AS (
        SELECT l.query_id, c.vec_id, {adc} AS adist
        FROM (SELECT vec_id, s, j AS code FROM a{t}) c
        JOIN lut_{tag} l ON c.s = l.s AND c.code = l.j
        GROUP BY l.query_id, c.vec_id
    ),
    topk_{tag} AS (
        SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY adist, vec_id) AS rnk
            FROM adc_{tag} WHERE query_id != vec_id
        ) WHERE rnk <= {TOP_K}
    ),
    hit_{tag} AS (
        SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ex JOIN topk_{tag} p
          ON ex.query_id = p.query_id AND ex.vec_id = p.vec_id
        GROUP BY 1
    )"""

    return f"""
    WITH {_train_ctes(N_TRAIN_ITERS)},
    ex AS ({_exact_l2_oracle()}),
    {variant('s', 0).lstrip().lstrip(',')},
    {variant('t', N_TRAIN_ITERS).lstrip().lstrip(',')}
    SELECT q.query_id,
           CAST(COALESCE(hs.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_sampled,
           CAST(COALESCE(ht.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_trained
    FROM (SELECT DISTINCT query_id FROM ex) q
    LEFT JOIN hit_s hs USING (query_id)
    LEFT JOIN hit_t ht USING (query_id)
    """


@register(
    "ann_pq_trained_recall_eval",
    oracle=_trained_recall_oracle(),
    survey_ref="ANN codebook training: trained-vs-sampled recall@k side by side",
)
def ann_pq_trained_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k against the exact squared-L2 ground truth for BOTH the
    sampled seed codebook (iter 0) and the trained codebook (iter
    ``N_TRAIN_ITERS``), per query — the measured answer to "did
    training help?". Both variants run the identical encode/LUT/ADC
    pipeline in the shared fixed-point space; only the codebook
    differs, so the comparison isolates codebook quality."""
    subs, assignments = _train(spark, sf_dir)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select("vec_id", F.col("embedding").alias("c_emb"))
    from pyspark.sql import Window

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.expr(_sqdist_sql("q_emb", "c_emb")).alias("l2d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("l2d", "vec_id")
    exact = tracked_persist(
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id")
    )

    # Each variant needs the FULL (vector, centroid) distance relation
    # (the LUT is every query-to-centroid distance, not just the
    # winner), so re-derive dists once per codebook, exactly as the
    # oracle's d0/d{T} CTEs do.
    cb_s = sampled_codebook(subs)
    cb_t = lloyd_update(assignments[N_TRAIN_ITERS - 1])

    def recall_for(cb: DataFrame, colname: str) -> DataFrame:
        d = subs.join(F.broadcast(cb), "s").withColumn(
            "dd", F.expr(_sqdist_sql("codes", "cvec"))
        )
        d = tracked_persist(d)
        codes = (
            d.groupBy("vec_id", "s")
            .agg(F.min(F.struct(F.col("dd"), F.col("j"))).alias("_m"))
            .select("vec_id", "s", F.col("_m.j").alias("code"))
        )
        lut = d.filter(F.col("vec_id").isin(QUERY_IDS)).select(
            F.col("vec_id").alias("query_id"), "s", "j", F.col("dd").alias("qd")
        )
        topk = _rank_adc(adc_scores(codes, lut)).select("query_id", "vec_id")
        return (
            topk.join(exact, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias(colname))
        )

    hits_s = recall_for(cb_s, "n_s")
    hits_t = recall_for(cb_t, "n_t")
    return (
        exact.select("query_id")
        .distinct()
        .join(hits_s, "query_id", "left")
        .join(hits_t, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_s", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_sampled"
            ),
            (F.coalesce("n_t", F.lit(0)).cast("double") / TOP_K).alias(
                "recall_trained"
            ),
        )
    )
