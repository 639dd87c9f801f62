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

_V = "transform({col}, x -> cast(x as double))"


def quantize_int8(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Adds ``q`` (array<bigint> in [0,255]), ``q_min``/``q_max`` (the
    per-vector dequantization params) to ``df``."""
    v = _V.format(col=emb_col)
    mn, mx = f"array_min({v})", f"array_max({v})"
    q = (
        f"CASE WHEN {mx} > {mn} THEN "
        f"transform({v}, x -> cast(floor(((x - {mn}) * 255.0D) / ({mx} - {mn})"
        f" + 0.5D) as bigint)) "
        f"ELSE transform({v}, x -> 0L) END"
    )
    return (
        df.withColumn("q", F.expr(q))
        .withColumn("q_min", F.expr(mn))
        .withColumn("q_max", F.expr(mx))
    )
