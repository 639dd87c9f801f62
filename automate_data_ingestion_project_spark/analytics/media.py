"""Multimodal CORRECTNESS queries.

``multimodal_manifest`` is fully oracle-checked: payload bytes are the
documents' UTF-8 text, so DuckDB reproduces checksum/size natively.

``multimodal_features`` and ``multimodal_resize`` run the REAL decode
chain end-to-end: payloads are decodable PGM containers, the
dependency-free netpbm codec behind ``codec_decoder`` strips and
validates the header inside an Arrow-batched ``mapInPandas`` stage,
and feature/resize math runs on the decoded raster. The raster is the
documents' UTF-8 text (pure ASCII on the parity set), so both rows
keep FULL DuckDB oracles (char-split → ``ascii()`` codepoints == the
decoded bytes): decode(encode(x)) == x by construction. A heavier
codec (PIL/ffmpeg) with no SQL twin would degrade its entry to the
driver's rows-only check by setting ``oracle=None``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..multimodal import (
    decode_media,
    extract_features,
    manifest,
    sample_chunks,
    synthesize_media,
    synthesize_pgm_media,
)
from .registry import register


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
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
    oracle="""
    WITH base AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
               text
        FROM documents
        WHERE length(text) = octet_length(encode(text))
    ),
    ch AS (
        SELECT media_id, ascii(c) AS b
        FROM (SELECT media_id, unnest(string_split(text, '')) AS c FROM base)
    ),
    stats AS (
        SELECT media_id,
               COUNT(*) AS n,
               SUM(b) AS sb,
               SUM(CASE WHEN b // 16 = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN b // 16 = 7 THEN 1 ELSE 0 END) AS c7
        FROM ch GROUP BY media_id
    )
    SELECT b.media_id, b.kind,
           CAST(octet_length(encode(b.text)) AS BIGINT) AS n_bytes,
           round(CAST(s.sb AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS mean_byte,
           round(CAST(s.c0 AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS hist_bin0,
           round(CAST(s.c7 AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS hist_bin7
    FROM base b JOIN stats s USING (media_id)
    """,
    survey_ref="multimodal: mapInPandas feature extraction (north star)",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ASCII guard (applied identically in the oracle's base CTE): the
    # DuckDB twin reconstructs byte values from ascii() CODEPOINTS,
    # which equal UTF-8 bytes only for single-byte text. Filtering both
    # sides to char-length == byte-length docs keeps parity exact by
    # construction if a regenerated fixture ever ships multibyte text,
    # instead of silently flipping the hash. The OPERATOR
    # (extract_features) handles arbitrary bytes; only the checked
    # parity set is restricted.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    # the REAL decode chain: each payload is a decodable PGM container
    # (header + the text bytes as raster), the netpbm codec strips and
    # validates the header, and feature extraction runs on the decoded
    # pixels — decode(encode(x)) == x, so the oracle holds unchanged
    feats = extract_features(decode_media(synthesize_pgm_media(docs)))
    return feats.orderBy("media_id").select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round(F.element_at("histogram", 1), 6).alias("hist_bin0"),
        F.round(F.element_at("histogram", 8), 6).alias("hist_bin7"),
    )


@register(
    "multimodal_chunks",
    oracle="""
    WITH base AS (
        SELECT doc_id AS media_id, text,
               octet_length(encode(text)) AS n_bytes
        FROM documents
        WHERE octet_length(encode(text)) > 0
          AND length(text) = octet_length(encode(text))
    ),
    ch AS (
        SELECT media_id,
               CAST(i AS INTEGER) AS chunk_idx,
               substring(text, CAST(i * 64 + 1 AS INTEGER), 64) AS chunk
        FROM base,
             UNNEST(range(0, GREATEST(CAST(ceil(n_bytes / 64) AS BIGINT), 1)))
                 AS u(i)
    )
    SELECT media_id, chunk_idx,
           CAST(octet_length(encode(chunk)) AS BIGINT) AS chunk_bytes,
           sha256(chunk) AS chunk_sha
    FROM ch
    """,
    survey_ref="multimodal: frame-sampling analog — native binary chunking (north star)",
)
def multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payloads sliced into fixed 64-byte windows JVM-side (binary
    ``substring`` — the frame-sampling analog; no Python, no decode)
    with a per-chunk sha256, so downstream per-frame decoders get
    addressable, checksummed units.

    Parity note: Spark slices the payload by BYTES; DuckDB can only
    slice VARCHAR by CHARACTERS (no BLOB substring in 1.0), so both
    sides restrict the checked set to docs whose char length equals
    their byte length — for those the two slicings are identical. The
    guard makes the ASCII assumption explicit instead of letting a
    multibyte doc in a regenerated fixture silently shift chunk
    boundaries and flip the hash. The OPERATOR (sample_chunks) is
    byte-correct for any payload."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    media = synthesize_media(docs)
    chunks = sample_chunks(media, chunk_bytes=64)
    return chunks.select(
        "media_id",
        "chunk_idx",
        F.octet_length("chunk").cast("bigint").alias("chunk_bytes"),
        F.sha2("chunk", 256).alias("chunk_sha"),
    )


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
           CAST(octet_length(encode(text)) AS INTEGER) AS width,
           1 AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_pixels,
           sha256(text) AS pixel_sha
    FROM documents
    WHERE length(text) = octet_length(encode(text))
    """,
    survey_ref="multimodal: REAL container decode (netpbm codec behind the codec_decoder gate)",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECODE stage as its own checked row: every payload is a real
    P5 container, the dependency-free netpbm codec parses and validates
    the header inside the Arrow ``mapInPandas`` stage, and the output
    is the dims the codec FOUND plus a checksum of the decoded raster.
    The raster is the document's bytes by construction, so DuckDB
    states the expected dims/checksum from the text directly — a hash
    match proves the container round-trip (header synthesis JVM-side,
    parse + strip Python-side) is byte-exact."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    decoded = decode_media(synthesize_pgm_media(docs))
    return decoded.select(
        "media_id",
        "kind",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_pixels"),
        F.sha2("payload", 256).alias("pixel_sha"),
    )


from ..multimodal import THUMB_SAMPLES as _THUMB


@register(
    "multimodal_resize",
    oracle=f"""
    WITH base AS (
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][doc_id % 3 + 1] AS kind,
               text, length(text) AS n
        FROM documents
        WHERE length(text) = octet_length(encode(text)) AND length(text) > 0
    )
    SELECT media_id, kind, CAST(n AS BIGINT) AS n_bytes,
           {", ".join(f"CAST(ascii(text[(({j} * n) // {_THUMB}) + 1]) AS INTEGER)"
                      f" AS s{j}" for j in range(_THUMB))}
    FROM base
    """,
    survey_ref="multimodal: resize/downsample via Arrow mapInPandas (north star)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width nearest-neighbor downsample of ACTUALLY-DECODED
    pixels — the RESIZE member of the decode quartet (decode /
    feature-extract / resize / frame-sample). Each payload is a real
    PGM container (``synthesize_pgm_media``), the dependency-free
    netpbm codec (:func:`..multimodal.netpbm_decoder`, behind the
    ``codec_decoder`` gate) strips and validates the header, and the
    downsample runs on the decoded raster through the same Arrow
    ``mapInPandas`` seam as ``multimodal_features``. The raster is the
    text bytes, so the integer index arithmetic is exactly mirrored by
    the oracle on the ASCII parity set; a heavier codec (PIL/ffmpeg)
    plugs into the same gate unchanged."""
    from ..multimodal import THUMB_SAMPLES, downsample_media

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") == F.octet_length("text")) & (F.length("text") > 0)
    )
    thumbs = downsample_media(decode_media(synthesize_pgm_media(docs)))
    return thumbs.select(
        "media_id",
        "kind",
        "n_bytes",
        *[
            F.element_at("thumb", j + 1).alias(f"s{j}")
            for j in range(THUMB_SAMPLES)
        ],
    )
