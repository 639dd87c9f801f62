"""Int8 scalar quantization of embedding vectors — the storage-scale
lever for 100 TB vector tables (float32 → uint8 is a 4× shrink; IVF/LSH
recall barely moves for corpus-dedup workloads).

Per-vector min/max scaling:

    scale = (max - min) / 255
    q_i   = floor((x_i - min) · 255 / (max - min) + 0.5)   ∈ [0, 255]

``floor(r + 0.5)`` instead of ``round(r)`` on purpose: floor has ONE
semantics everywhere, while round's half-tie rule differs across
engines — determinism is part of the operator contract. Elements are
cast float32 → float64 first (exact) so the arithmetic tree is
identical in Spark and DuckDB. A constant vector (max == min)
quantizes to all zeros.

Everything is a narrow map over array columns — scan-speed, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def quantize_int8(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Adds ``q`` (array<bigint> in [0,255]), ``q_min``/``q_max`` (the
    per-vector dequantization params) to ``df``.

    Intermediates (the double-cast vector, min, max) are staged as
    PROJECTED COLUMNS, not repeated subexpressions: higher-order-
    function lambdas are interpreted, and Spark does not common-
    subexpression-eliminate them — inlining ``array_min(transform(...))``
    into the quantize lambda re-casts the vector per reference
    (measured ~2× slower at sf0.1).
    """
    q = (
        "CASE WHEN q_max > q_min THEN "
        "transform(_v, x -> cast(floor(((x - q_min) * 255.0D) /"
        " (q_max - q_min) + 0.5D) as bigint)) "
        "ELSE transform(_v, x -> 0L) END"
    )
    return (
        df.withColumn("_v", F.expr(f"transform({emb_col}, x -> cast(x as double))"))
        .withColumn("q_min", F.expr("array_min(_v)"))
        .withColumn("q_max", F.expr("array_max(_v)"))
        .withColumn("q", F.expr(q))
        .drop("_v")
    )


def quantize_int8_rows(
    df: DataFrame,
    emb_col: str = "embedding",
    pos_col: str = "pos",
    code_col: str = "code",
) -> DataFrame:
    """The EXPLODED form of :func:`quantize_int8`: one row per vector
    element, carrying ``(pos_col, code_col)`` with the exact same code
    values — for the consumers that ``posexplode(q)`` immediately
    anyway (the centroid/purity/kmeans/semantic-dedup family).

    Why it exists (r17): the array form evaluates THREE higher-order
    ``transform`` lambdas per vector, and Spark interprets HOF lambdas
    — no codegen. At D-dimensional vectors that is 3·D interpreted
    expression evaluations per row, and it dominated the quantization
    stage of every exploding consumer (measured ~4.6 s for a 2,080-row
    noop at sf0.1). This form stays entirely inside whole-stage
    codegen: an array CAST (element-wise float→double upcast, exact,
    identical to the per-element lambda cast), codegen'd
    ``array_min``/``array_max``, a ``posexplode`` generator, and plain
    scalar arithmetic per element row — the identical expression tree
    ``floor(((x - min) * 255.0) / (max - min) + 0.5)``, so the codes
    are bit-for-bit the oracle's.

    NULL/edge semantics mirror the array form exactly: a NULL or empty
    array emits no rows (posexplode of the cast array ≡ posexplode of
    ``q``); a constant vector (max == min, incl. the all-NULL-elements
    case where min/max are NULL) codes every element 0; a NULL element
    inside a non-constant vector codes NULL.
    """
    v = (
        df.withColumn("_v", F.col(emb_col).cast("array<double>"))
        .withColumn("_q_min", F.array_min("_v"))
        .withColumn("_q_max", F.array_max("_v"))
    )
    code = F.when(
        F.col("_q_max") > F.col("_q_min"),
        F.floor(
            ((F.col("_x") - F.col("_q_min")) * F.lit(255.0))
            / (F.col("_q_max") - F.col("_q_min"))
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        v.select("*", F.posexplode("_v").alias(pos_col, "_x"))
        .withColumn(code_col, code)
        .drop("_v", "_x", "_q_min", "_q_max")
    )
