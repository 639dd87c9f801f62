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


def test_netpbm_decoder_parses_p5_and_p6():
    """The dependency-free real codec: P5/P6 headers with comments and
    multi-digit dims parse, the raster round-trips byte-exact, and
    malformed containers fail loudly."""
    from automate_data_ingestion_project_spark.multimodal import (
        netpbm_decoder,
    )

    raster = bytes(range(24))
    p5 = b"P5\n# a comment\n24 1\n255\n" + raster
    d = netpbm_decoder(p5, "image")
    assert (d["width"], d["height"], d["channels"]) == (24, 1, 1)
    assert d["pixels"] == raster

    p6 = b"P6 2 4\n255\n" + raster  # 2*4*3 = 24 raster bytes
    d6 = netpbm_decoder(p6, "image")
    assert (d6["width"], d6["height"], d6["channels"]) == (2, 4, 3)
    assert d6["pixels"] == raster

    with pytest.raises(ValueError, match="truncated netpbm raster"):
        netpbm_decoder(b"P5\n24 1\n255\n" + raster[:-1], "image")
    with pytest.raises(ValueError, match="maxval"):
        netpbm_decoder(b"P5\n1 1\n65535\n\x00\x00", "image")


def test_codec_gate_decodes_netpbm_and_still_raises_otherwise():
    """codec_decoder now has one REAL codec (netpbm) behind the gate;
    every other format still raises with the plug-in instructions."""
    d = codec_decoder(b"P5\n3 1\n255\nabc", "image")
    assert d["pixels"] == b"abc"
    with pytest.raises(NotImplementedError, match="no codec available"):
        codec_decoder(b"\x89PNG\r\n", "image")


def test_pgm_container_roundtrips_through_real_decode(spark, sf_dir):
    """The end-to-end decode chain: synthesize_pgm_media wraps every
    document's bytes in a real P5 container JVM-side; decode_media runs
    the netpbm codec in the Arrow mapInPandas stage; the decoded pixels
    equal the original text bytes exactly (decode(encode(x)) == x), and
    the decoded meta carries the dims the codec FOUND."""
    from automate_data_ingestion_project_spark.multimodal import (
        decode_media,
        synthesize_pgm_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    decoded = {
        r.media_id: r for r in decode_media(synthesize_pgm_media(docs)).collect()
    }
    for r in docs.collect():
        raw = r.text.encode("utf-8")
        got = decoded[r.doc_id]
        assert bytes(got.payload) == raw
        assert got.meta.n_bytes == len(raw)
        assert got.meta.width == len(raw) and got.meta.height == 1
