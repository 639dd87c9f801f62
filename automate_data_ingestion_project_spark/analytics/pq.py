"""Product-quantization ANN (`ann_pq_topk`) — the memory-bound member
of the similarity stack (exact / LSH / IVF / multiprobe / PQ / recall).

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) splits each D-dim vector into M subvectors, quantizes each
subspace against its own K-entry codebook, and answers queries with
ASYMMETRIC DISTANCE COMPUTATION: per query, precompute the M×K table of
(query-subvector → centroid) distances once, then score every candidate
with M table LOOKUPS instead of D multiply-adds. At 100 TB that turns
the scan from compute-bound (D=64 float ops/vector) into memory-bound
(M=4 lookups over a 64-bit code), is why it composes under IVF
(`analytics/ivf.py` prunes cells, PQ scores the survivors), and shrinks
the resident index 64× (4 bytes/code vs 256 bytes/vector).

Determinism (what makes the full value-hash oracle possible):

- the codebook is RELATIONAL, not trained: centroid j of subspace s is
  the s-th subvector of the vector with ``vec_id = j`` (a deterministic
  sample both engines derive from the same table). Production trains it
  with k-means (`analytics/centroids.kmeans_step` is the update rule) —
  codebook quality moves RECALL, never the ADC mechanics checked here;
- every distance is a squared-L2 fold, strict left-to-right over the
  16-dim subspace, double accumulation — bit-identical in DuckDB
  (``list_reduce``) as proven for the cosine folds;
- encoding argmin is a TOTAL order (distance, then centroid id), so
  equidistant centroids can't flap the code;
- the ADC sum adds the M=4 per-subspace lookups in fixed textual order
  (a pivot, not a groupBy-SUM whose partial order Spark may permute).

Plan shape: codebook (M·K = 64 rows) and the per-query LUT (Q·M·K =
320 rows) broadcast; candidates shuffle once for the per-(vector,
subspace) argmin and once for the per-(query, vector) 4-row pivot; the
final top-k is a per-query window over Q·N scored rows. No Python
anywhere; no join wider than the broadcast LUT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register
from .similarity import QUERY_IDS, TOP_K

M = 4  # subspaces
SUBDIM = 16  # dims per subspace (D = 64)
KPQ = 16  # centroids per subspace
CODEBOOK_IDS = list(range(KPQ))  # deterministic codebook sample

_QIDS = ", ".join(str(i) for i in QUERY_IDS)
_CBIDS = ", ".join(str(i) for i in CODEBOOK_IDS)


def _sqdist_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Strict left-fold squared-L2 over a subvector, double accumulation
    — the PQ analog of :func:`..textops.similarity.dot_sql`."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"(cast(x as double) - cast(y as double)) * "
            f"(cast(x as double) - cast(y as double))), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def _pq_oracle() -> str:
    adc_terms = " + ".join(
        f"MAX(CASE WHEN c.s = {s} THEN l.qd END)" for s in range(M)
    )
    return f"""
    WITH subs AS (
        SELECT vec_id, CAST(s AS INTEGER) AS s,
               list_slice(embedding, s * {SUBDIM} + 1, (s + 1) * {SUBDIM})
                   AS subvec
        FROM embeddings, (SELECT unnest(range(0, {M})) AS s)
    ),
    cb AS (
        SELECT s, CAST(vec_id AS INTEGER) AS j, subvec AS cvec
        FROM subs WHERE vec_id IN ({_CBIDS})
    ),
    dists AS (
        SELECT c.vec_id, c.s, b.j,
               {_sqdist_sql('c.subvec', 'b.cvec', 'duckdb')} AS d
        FROM subs c JOIN cb b USING (s)
    ),
    codes AS (
        SELECT vec_id, s, j AS code
        FROM (
            SELECT vec_id, s, j,
                   row_number() OVER (
                       PARTITION BY vec_id, s ORDER BY d, j) AS rn
            FROM dists
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT vec_id AS query_id, s, j, d AS qd
        FROM dists WHERE vec_id IN ({_QIDS})
    ),
    adc AS (
        SELECT l.query_id, c.vec_id, {adc_terms} AS adist
        FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.j
        GROUP BY l.query_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, vec_id, adist,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY adist, vec_id
               ) AS INTEGER) AS rnk
        FROM adc WHERE query_id != vec_id
    )
    SELECT query_id, vec_id, adist, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


@register(
    "ann_pq_topk",
    oracle=_pq_oracle(),
    survey_ref="similarity search: product-quantization ADC top-k (memory-bound scale path)",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k (see module docstring for why and for
    the determinism contract)."""
    from ..operators.caching import tracked_persist

    emb = load_table(spark, sf_dir, "embeddings")
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.slice("embedding", s * SUBDIM + 1, SUBDIM)
                    for s in range(M)
                ]
            )
        ).alias("s", "subvec"),
    )
    cb = subs.filter(F.col("vec_id").isin(CODEBOOK_IDS)).select(
        "s", F.col("vec_id").cast("int").alias("j"), F.col("subvec").alias("cvec")
    )
    dists = tracked_persist(
        subs.join(F.broadcast(cb), "s").select(
            "vec_id",
            "s",
            "j",
            F.expr(_sqdist_sql("subvec", "cvec")).alias("d"),
        )
    )
    # per-(vector, subspace) argmin under the (d, j) TOTAL order
    codes = (
        dists.groupBy("vec_id", "s")
        .agg(F.min(F.struct("d", "j")).alias("m"))
        .select("vec_id", "s", F.col("m.j").alias("code"))
    )
    lut = dists.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "s", "j", F.col("d").alias("qd")
    )
    # ADC: M lookups per (query, vector); pivot so the 4-term sum adds in
    # fixed order (a plain SUM's partial-agg order is not guaranteed)
    joined = codes.join(
        F.broadcast(lut),
        (codes["s"] == lut["s"]) & (codes["code"] == lut["j"]),
    ).select(
        codes["vec_id"], lut["query_id"], codes["s"].alias("s"), lut["qd"]
    )
    adc = (
        joined.groupBy("vec_id", "query_id")
        .pivot("s", list(range(M)))
        .agg(F.first("qd"))
    )
    adist = sum((F.col(str(s)) for s in range(1, M)), F.col("0"))
    scored = adc.select("query_id", "vec_id", adist.alias("adist")).filter(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy("adist", "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "adist", "rnk")
    )
