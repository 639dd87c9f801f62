"""Multimodal columns: opaque binary payloads + typed metadata structs.

North-star extension (SURVEY.md §7 Phase 5): image/audio/video content
rides through the engine as ``BinaryType`` payload columns with a typed
metadata struct — the lakehouse pattern for petabyte media corpora.
The Spark-side plumbing here is REAL (schemas, partition-friendly
manifests, Arrow-batched ``mapInPandas`` feature extraction with an
explicit output schema); only the codec itself is stubbed, because
image/audio libraries are not in this container:

- :func:`stub_decoder` — a deterministic fake decode (byte histogram),
  so the full pipeline is testable end-to-end and reproducible;
- :func:`codec_decoder` — the real-codec seam, raising
  ``NotImplementedError`` with instructions (plug PIL/ffmpeg here).

Scale notes: payloads NEVER pass through Python row-at-a-time — feature
extraction is ``mapInPandas`` (Arrow batches, one Python worker per
partition); manifest-level operations (checksum, size, kind routing)
are native JVM expressions on the binary column; media tables partition
by ``kind`` so per-modality pipelines prune at the scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# media kinds routed by modality pipelines
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<n_bytes: long, width: int, height: int, sample_rate: int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_byte double, "
    "histogram array<double>"
)

N_BINS = 16


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text's
    UTF-8 bytes stand in for an encoded payload; metadata is derived
    arithmetic. (Real ingestion would read files into the same shape.)
    """
    payload = F.encode(F.col("text"), "UTF-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % len(KINDS) + 1).cast("int"),
    )
    meta = F.struct(
        F.octet_length(payload).cast("long").alias("n_bytes"),
        (16 * (F.col("doc_id") % 8 + 1)).cast("int").alias("width"),
        (16 * (F.col("doc_id") % 6 + 1)).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 1, 16000).otherwise(None)
        .cast("int")
        .alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def manifest(media: DataFrame) -> DataFrame:
    """Native (JVM-side) manifest over binary payloads: size, checksum,
    declared dimensions. No Python touches the bytes."""
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2("payload", 256).alias("checksum"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


Decoder = Callable[[bytes, str], Any]


def stub_decoder(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake decode: normalized 16-bin byte histogram.
    Stands in for pixel/sample arrays so the pipeline is testable."""
    counts = [0] * N_BINS
    for b in payload:
        counts[b * N_BINS // 256] += 1
    total = len(payload) or 1
    return [c / total for c in counts]


def netpbm_decoder(payload: bytes, kind: str) -> dict[str, Any]:
    """Dependency-free REAL decoder for binary netpbm images — P5
    (grayscale, 1 byte/pixel) and P6 (RGB, 3 bytes/pixel), the trivial
    container every image toolchain can emit. Parses the whitespace-
    separated header (``#`` comments allowed, single whitespace after
    maxval per the spec), validates the raster length against the
    declared dimensions, and returns the decoded pixel buffer + dims.
    This is the codec gate's first real codec: the
    decode→features→resize chain runs on actually-decoded pixels in CI
    instead of raising."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: magic={magic!r}")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    width, height, maxval = vals
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported netpbm maxval {maxval} (1-byte only)")
    channels = 1 if magic == b"P5" else 3
    raster = bytes(payload[pos : pos + width * height * channels])
    if len(raster) != width * height * channels:
        raise ValueError(
            f"truncated netpbm raster: expected {width * height * channels} "
            f"bytes, got {len(raster)}"
        )
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": raster,
    }


def codec_decoder(payload: bytes, kind: str) -> Any:
    """The real-codec seam. Binary netpbm (P5/P6) decodes here with no
    dependencies (:func:`netpbm_decoder`); every other format needs
    PIL (image), soundfile (audio) or ffmpeg (video) plugged in — not
    available in this environment."""
    if payload[:2] in (b"P5", b"P6"):
        return netpbm_decoder(payload, kind)
    raise NotImplementedError(
        f"no codec available for kind={kind!r}: install PIL/soundfile/ffmpeg "
        "and route them through this seam (payload -> ndarray)"
    )


def synthesize_pgm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-container media table: each document's UTF-8
    bytes become the raster of a (n_bytes × 1) grayscale PGM (P5) —
    header prepended JVM-side (binary ``concat``), so every payload is
    a decodable image and the decode stage exercises a real codec
    end-to-end. Because the raster IS the text bytes, the decoded
    signal equals :func:`synthesize_media`'s raw payload exactly —
    downstream feature/resize oracles hold unchanged."""
    base = synthesize_media(docs)
    header = F.encode(
        F.concat(
            F.lit("P5\n"),
            F.col("meta.n_bytes").cast("string"),
            F.lit(" 1\n255\n"),
        ),
        "UTF-8",
    )
    payload = F.concat(header, F.col("payload"))
    return base.select(
        "media_id",
        "kind",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.col("meta.n_bytes").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, decoder: Decoder = codec_decoder) -> DataFrame:
    """The DECODE stage, for real: Arrow-batched ``mapInPandas`` runs
    the codec over every payload and re-emits media rows whose payload
    is the DECODED pixel buffer and whose meta carries the dims the
    codec actually found (not the container's claim). Downstream
    feature/resize/chunk operators consume decoded signal unchanged —
    the chain a production media pipeline runs, with the same
    per-batch (not per-row) Python cost as :func:`extract_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [d["pixels"] for d in decoded],
                    "meta": [
                        {
                            "n_bytes": len(d["pixels"]),
                            "width": d["width"],
                            "height": d["height"],
                            "sample_rate": None,
                        }
                        for d in decoded
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, decoder: Decoder = stub_decoder
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` with an explicit output schema: each Python worker
    receives whole Arrow record batches (payload bytes included),
    decodes, and emits fixed-width feature rows. This is the pattern
    for any real decode — resize, frame-sample, embed — at scale the
    Python cost is per-batch, not per-row, and the shuffle-free plan
    keeps media bytes on their input partitions.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mean_byte": [
                        (sum(p) / len(p)) if len(p) else 0.0 for p in pdf["payload"]
                    ],
                    "histogram": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


THUMB_SAMPLES = 8


def downsample_media(media: DataFrame, n_samples: int = THUMB_SAMPLES) -> DataFrame:
    """The RESIZE analog of the decode pipeline: nearest-neighbor
    downsample of each payload's byte sequence to a fixed number of
    samples (a thumbnail for images, a waveform sketch for audio) —
    the standard pre-embedding normalization step, run through the
    same Arrow ``mapInPandas`` seam as :func:`extract_features`.

    The stub "decode" treats the payload as its raw byte signal;
    sample j of n is byte ``(j * len) // n`` (pure integer arithmetic,
    so the DuckDB oracle reproduces it exactly on ASCII fixtures). A
    real resize (PIL thumbnail, librosa resample) plugs into the same
    function shape: bytes in, fixed-width numeric vector out, schema
    declared up front, cost per Arrow batch not per row.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                n = len(p)
                thumbs.append(
                    [int(p[(j * n) // n_samples]) for j in range(n_samples)]
                    if n
                    else [0] * n_samples
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "thumb": thumbs,
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id long, kind string, n_bytes long, thumb array<int>",
    )


def sample_chunks(media: DataFrame, chunk_bytes: int = 64) -> DataFrame:
    """Frame-sampling analog, fully native: slice the payload into
    fixed windows with binary ``substring`` — no Python, no decode.
    (media_id, chunk_idx, chunk) rows inherit the source partitioning;
    at scale this feeds per-chunk decoders."""
    # greatest(..., 0) guards the empty-payload case: sequence(0, -1) would
    # yield a DESCENDING [0, -1] array (two bogus rows), not an empty one.
    chunks = (
        f"transform(sequence(0, greatest("
        f"cast(ceil(meta.n_bytes / {chunk_bytes}) as int), 1) - 1), "
        f"i -> substring(payload, i * {chunk_bytes} + 1, {chunk_bytes}))"
    )
    return (
        media.filter(F.col("meta.n_bytes") > 0)
        .select(
            "media_id",
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk"),
        )
        .withColumn("chunk_idx", F.col("chunk_idx").cast("int"))
    )
