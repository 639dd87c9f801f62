"""Document chunking: overlapping token windows (the sharding step an
LLM training/embedding pipeline runs before vectorizing a corpus).

Pure narrow map — each document expands independently into
``ceil((n_tokens - overlap) / stride)`` chunks, so the operator runs at
scan speed and parallelizes with the input splits (no shuffle at any
corpus size). Chunk boundaries are token-index arithmetic, identical in
Spark and DuckDB, so the chunk text itself is oracle-checkable:

    start_max = ceil(max(n - chunk, 0) / stride) · stride
    starts    = 0, stride, 2·stride, …, start_max
    chunk i   = tokens[start : start + chunk] joined by ' '

``start_max`` rounds UP so the final window always reaches the last
token (dropping tails would lose data), while never emitting a window
fully contained in the previous one. Documents shorter than one chunk
yield exactly one (short) chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import spread_for_compute


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_start, n_chunk_tokens, chunk_text) — one row per
    overlapping token window."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    start_max = (
        f"((greatest(size(w) - {chunk_tokens}, 0) + {stride - 1}) div {stride})"
        f" * {stride}"
    )
    expr = (
        f"transform(sequence(0, {start_max}, {stride}), "
        f"s -> struct(s AS chunk_start, slice(w, s + 1, {chunk_tokens}) AS toks))"
    )
    return (
        spread_for_compute(df)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("w"))
        .select(id_col, F.explode(F.expr(expr)).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_start").cast("long").alias("chunk_start"),
            F.size("c.toks").cast("long").alias("n_chunk_tokens"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )
