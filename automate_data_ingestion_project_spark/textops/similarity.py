"""Vector similarity search over an embedding column (``array<float>``).

Two strategies, mirroring a production ANN stack:

- **Exact top-k** (the baseline): cosine scores for a (small) query set
  against all candidates, ranked per query. The query side broadcasts;
  work is Q·N·d multiply-adds, all inside whole-stage codegen
  (``zip_with`` + ``aggregate`` — no Python, no UDF).
- **LSH-bucketed top-k** (the scale path): random-hyperplane signatures
  (Charikar '02 SimHash for cosine) computed from FIXED deterministic
  hyperplanes; query and candidates equi-join on the bucket key, so
  each query scores only its bucket-mates — sub-linear scanning, and
  the join shuffles on bucket keys instead of building a Q×N cross
  product. At 100 TB you'd add multi-probe (flip one bit) and an IVF
  coarse quantizer; the plumbing below is the same shape.

Determinism: element products and the accumulator are DOUBLE, folded
strictly left-to-right — bit-identical in DuckDB (list_reduce) — and
hyperplanes are md5-seeded literals, so both strategies are
oracle-checkable, not just row-counted.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 4  # 16 buckets over the fixture; more bits at larger N
DIM = 64


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim (md5-seeded
    literals — reproducible in any engine, no RNG state)."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"hp{j}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()


def dot_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Strict left-fold double dot product, identical in both engines."""
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"cast(x as double) * cast(y as double)), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def norm_sql(a: str, dialect: str = "spark") -> str:
    return f"sqrt({dot_sql(a, a, dialect)})"


def plane_literal(plane: list[float], dialect: str = "spark") -> str:
    cells = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in plane)
    return f"array({cells})" if dialect == "spark" else f"[{cells}]"


def bucket_sql(emb: str, dialect: str = "spark") -> str:
    """Sign-bit bucket key: one bit per hyperplane, concatenated."""
    bits = []
    for plane in HYPERPLANES:
        d = dot_sql(emb, plane_literal(plane, dialect), dialect)
        bits.append(f"(CASE WHEN {d} >= 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bits) + ")"


def with_cosine_score(
    joined: DataFrame, q_emb: str, c_emb: str, q_norm: str, c_norm: str
) -> DataFrame:
    score = F.expr(dot_sql(q_emb, c_emb)) / (F.col(q_norm) * F.col(c_norm))
    return joined.withColumn("score", score)


def exact_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, score all
    candidates, rank per query. (query_id, vec_id, score, rnk)."""
    base = emb.select(
        F.col(id_col), F.col(emb_col), F.expr(norm_sql(emb_col)).alias("nrm")
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    c = base.select(
        F.col(id_col),
        F.col(emb_col).alias("c_emb"),
        F.col("nrm").alias("c_norm"),
    )
    scored = with_cosine_score(
        c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col(id_col)),
        "q_emb",
        "c_emb",
        "q_norm",
        "c_norm",
    )
    return _rank_topk(scored, k, id_col)


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Bucketed cosine top-k: equi-join on the hyperplane bucket key —
    each query scores only bucket-mates. Adds n_candidates so results
    expose how much of the corpus was actually scanned."""
    base = emb.select(
        F.col(id_col),
        F.col(emb_col),
        F.expr(norm_sql(emb_col)).alias("nrm"),
        F.expr(bucket_sql(emb_col)).alias("bucket"),
    )
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(emb_col).alias("q_emb"),
        F.col("nrm").alias("q_norm"),
        "bucket",
    )
    c = base.select(
        F.col(id_col),
        F.col(emb_col).alias("c_emb"),
        F.col("nrm").alias("c_norm"),
        "bucket",
    )
    scored = with_cosine_score(
        q.join(c, "bucket").filter(F.col("query_id") != F.col(id_col)),
        "q_emb",
        "c_emb",
        "q_norm",
        "c_norm",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id")
    scored = scored.withColumn(
        "n_candidates", F.count("*").over(w).cast("long")
    )
    return _rank_topk(scored, k, id_col, extra_cols=["n_candidates"])


def _rank_topk(
    scored: DataFrame, k: int, id_col: str, extra_cols: list[str] | None = None
) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "score", "rnk", *(extra_cols or []))
    )
