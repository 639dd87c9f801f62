"""Text-pipeline operators for large-scale training-data curation:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), near-dup
clustering (connected components), chunking, embedding quantization,
text statistics, language ID, fingerprints.

These extend the reference per BASELINE.json's north star — the
reference itself has no text operators; all designs here are
Spark-first (native higher-order functions, no Python in the hot
path) and sized for 100 TB corpora.
"""

from .chunking import chunk_documents
from .components import connected_components
from .dedup import (
    candidate_pairs,
    content_hash,
    exact_dedup_summary,
    lsh_band_keys,
    minhash_signatures,
    minhash_signatures_rows,
    pair_jaccard_stats,
    shingle,
    shingle_rows,
    verified_near_duplicates,
    verified_near_duplicates_rows,
)
from .quantize import quantize_int8

__all__ = [
    "candidate_pairs",
    "chunk_documents",
    "connected_components",
    "content_hash",
    "exact_dedup_summary",
    "lsh_band_keys",
    "minhash_signatures",
    "minhash_signatures_rows",
    "pair_jaccard_stats",
    "quantize_int8",
    "shingle",
    "shingle_rows",
    "verified_near_duplicates",
    "verified_near_duplicates_rows",
]
