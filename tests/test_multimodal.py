"""Multimodal plumbing: schema, native manifest, Arrow-batched decode
determinism vs a NumPy reference, chunking, and the codec seam."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from automate_data_ingestion_project_spark.io import load_table
from automate_data_ingestion_project_spark.multimodal import (
    KINDS,
    N_BINS,
    codec_decoder,
    extract_features,
    manifest,
    sample_chunks,
    stub_decoder,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return synthesize_media(docs).cache()


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["kind"] == "string"
    assert fields["meta"].startswith("struct<n_bytes:bigint,width:int,height:int")
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds <= set(KINDS)


def test_manifest_checksum_matches_hashlib(media):
    rows = manifest(media).collect()
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for r in rows[:10]:
        assert r.checksum == hashlib.sha256(payloads[r.media_id]).hexdigest()
        assert r.n_bytes == len(payloads[r.media_id])


def test_extract_features_matches_numpy_reference(media):
    feats = {r.media_id: r for r in extract_features(media).collect()}
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, p in list(payloads.items())[:10]:
        arr = np.frombuffer(p, dtype=np.uint8)
        expected_hist, _ = np.histogram(arr, bins=N_BINS, range=(0, 256))
        got = feats[mid]
        assert got.n_bytes == len(p)
        assert abs(got.mean_byte - arr.mean()) < 1e-9
        np.testing.assert_allclose(
            got.histogram, expected_hist / len(p), rtol=0, atol=1e-12
        )


def test_stub_decoder_deterministic():
    p = b"hello world" * 10
    assert stub_decoder(p, "image") == stub_decoder(p, "image")
    assert abs(sum(stub_decoder(p, "image")) - 1.0) < 1e-9


def test_codec_seam_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="no codec available"):
        codec_decoder(b"\x00", "image")


def test_sample_chunks_cover_payload(media):
    chunks = sample_chunks(media, chunk_bytes=64)
    sizes = (
        chunks.groupBy("media_id")
        .count()
        .join(manifest(media).select("media_id", "n_bytes"), "media_id")
        .collect()
    )
    for r in sizes:
        assert r["count"] == -(-r.n_bytes // 64)  # ceil division
    # chunk bytes reassemble exactly
    one = chunks.filter("media_id = 0").orderBy("chunk_idx").collect()
    payload = b"".join(bytes(r.chunk) for r in one)
    orig = bytes(media.filter("media_id = 0").collect()[0].payload)
    assert payload == orig


def test_sample_chunks_byte_exact_on_multibyte_text(spark):
    """The operator slices BYTES, not characters: a multibyte payload
    must chunk on UTF-8 byte boundaries and reassemble exactly (the
    parity queries exclude such docs only because DuckDB cannot slice
    blobs — the Spark operator itself is byte-correct)."""
    text = "héllo wörld ✓" * 13  # 16 chars, 19 bytes per repeat
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    media = synthesize_media(docs)
    rows = sample_chunks(media, chunk_bytes=64).orderBy("chunk_idx").collect()
    raw = text.encode("utf-8")
    assert len(rows) == -(-len(raw) // 64)
    assert all(len(bytes(r.chunk)) == 64 for r in rows[:-1])
    assert b"".join(bytes(r.chunk) for r in rows) == raw


def test_ascii_guard_excludes_multibyte_docs_identically(spark):
    """The guard predicate used by the multimodal parity queries
    (char length == byte length) keeps ASCII docs and drops multibyte
    ones — in Spark and in DuckDB, on the same inputs."""
    import duckdb
    from pyspark.sql import functions as F

    samples = [(0, "plain ascii"), (1, "héllo"), (2, "a✓b"), (3, "")]
    docs = spark.createDataFrame(samples, "doc_id long, text string")
    kept_spark = {
        r.doc_id
        for r in docs.filter(
            F.length("text") == F.octet_length("text")
        ).collect()
    }
    con = duckdb.connect()
    kept_duck = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM (VALUES (0, 'plain ascii'), (1, 'héllo'), "
            "(2, 'a✓b'), (3, '')) AS t(doc_id, text) "
            "WHERE length(text) = octet_length(encode(text))"
        ).fetchall()
    }
    assert kept_spark == kept_duck == {0, 3}
