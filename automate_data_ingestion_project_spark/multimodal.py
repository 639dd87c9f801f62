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


def codec_decoder(payload: bytes, kind: str) -> Any:
    """The real-codec seam. Plug PIL (image), soundfile (audio) or
    ffmpeg (video) here; not available in this environment."""
    raise NotImplementedError(
        f"no codec available for kind={kind!r}: install PIL/soundfile/ffmpeg "
        "and route them through this seam (payload -> ndarray)"
    )


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
