"""Text-pipeline operators for large-scale training-data curation:
dedup (exact / MinHash-LSH), text statistics, language ID, fingerprints.

These extend the reference per BASELINE.json's north star — the
reference itself has no text operators; all designs here are
Spark-first (native higher-order functions, no Python in the hot
path) and sized for 100 TB corpora.
"""

from .dedup import (
    content_hash,
    exact_dedup_summary,
    minhash_signatures,
    lsh_band_keys,
    candidate_pairs,
    verified_near_duplicates,
    shingle,
)

__all__ = [
    "content_hash",
    "exact_dedup_summary",
    "minhash_signatures",
    "lsh_band_keys",
    "candidate_pairs",
    "verified_near_duplicates",
    "shingle",
]
