"""Multimodal CORRECTNESS queries.

``multimodal_manifest`` is fully oracle-checked: payload bytes are the
documents' UTF-8 text, so DuckDB reproduces checksum/size natively.

``multimodal_features`` runs the Arrow-batched ``mapInPandas`` decode
path (stub codec). A Python decode has no DuckDB-SQL twin, so it
registers WITHOUT an oracle — the driver records the weaker rows-only
check (per the contract for non-SQL-expressible ops); determinism is
covered by pytest against a NumPy re-implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..multimodal import extract_features, manifest, synthesize_media
from .registry import register


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum,
           CAST(16 * (doc_id % 8 + 1) AS INTEGER) AS width,
           CAST(16 * (doc_id % 6 + 1) AS INTEGER) AS height
    FROM documents
    """,
    survey_ref="multimodal: binary payload + typed metadata manifest (north star)",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return manifest(synthesize_media(docs))


@register(
    "multimodal_features",
    oracle=None,  # Python decode path — rows-only check by design
    survey_ref="multimodal: mapInPandas feature extraction (north star)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_media(docs))
    return feats.orderBy("media_id").select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round(F.element_at("histogram", 1), 6).alias("hist_bin0"),
        F.round(F.element_at("histogram", 8), 6).alias("hist_bin7"),
    )
