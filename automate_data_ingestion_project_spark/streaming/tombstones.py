"""Streaming takedown ingestion — deletion requests drained into a
maintained store's tombstone ledger by Structured Streaming.

Production takedowns (DMCA, right-to-erasure, opt-out feeds) arrive
continuously, not as batch jobs: a feed of document/vector ids lands as
files, and each micro-batch's ids are appended to the store's tombstone
set (:func:`..io.maintenance.append_tombstones`) with the epoch id —
OFFSET past every previously committed sequence — as the batch
sequence; the same ``foreachBatch`` seam as every other
maintained-store drain here (near-dup ingestion, shard export, IVF
ingest). Readers see each takedown as soon as its epoch's ledger row
commits (the mask is re-read per query); the next full-collapse
compaction completes the erasure physically.

The OFFSET closes a silent-drop window: a tombstone store may also
receive direct :func:`..io.maintenance.append_tombstones` calls with
low sequences (0, 1, ...) — the near-dup index's auto-sequenced
``delete_docs``, an operator's one-off takedown. Raw epoch ids start at
0 too, so a colliding epoch would no-op at the replay guard and a
genuinely NEW deletion batch would silently never apply — an erasure
request dropped on the floor. The first drain therefore records an
epoch BASE (one past the highest sequence committed by anyone) in a
marker file beside the ledger, and every epoch commits as
``base + epoch_id``. The persisted base keeps the epoch→sequence map
stable across drain restarts, so the replay guard still sees a retried
epoch as the SAME batch — exactly-once is preserved, not traded away.
Direct appenders that auto-sequence (``delete_docs``) then naturally
land above the stream's committed sequences; only a direct appender
passing an EXPLICIT sequence into the stream's reserved range can
still collide, which is the caller owning replay semantics by
definition.

Exactly-once shape inherited from the tombstone protocol: a replayed
committed epoch is a ledger no-op, a mid-write crash self-heals on the
epoch's retry, an empty epoch commits ``(base+epoch, 0)``. Tombstone
batches are unordered (deletion is a set union), so the drain needs no
ordering guarantee — the IVF-style independence, not the token-shard
chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.maintenance import _fs, append_tombstones, committed_batch_seqs

_EPOCH_BASE_NAME = "_stream_epoch_base"


def _read_epoch_base(
    spark: SparkSession, tombstone_ledger_path: str
) -> int | None:
    """The persisted stream-epoch base, or None if no drain ever ran.
    Underscore-named inside the ledger dir: invisible to parquet reads
    (Spark skips hidden files; ``_ledger_rows`` filters on suffix)."""
    fs, jpath = _fs(spark, tombstone_ledger_path)
    p = jpath(f"{tombstone_ledger_path}/{_EPOCH_BASE_NAME}")
    if not fs.exists(p):
        return None
    util = spark._jvm.org.apache.commons.io.IOUtils
    stream = fs.open(p)
    try:
        txt = util.toString(stream, "UTF-8")
    finally:
        stream.close()
    return int(txt.strip())


def _ensure_epoch_base(
    spark: SparkSession, tombstone_ledger_path: str
) -> int:
    """Read the persisted epoch base, establishing it on the first
    drain as one past the highest committed sequence (0 on a fresh
    store). Persisting FIRST — before any epoch commits — means a
    crash between base-write and first commit replays with the same
    base, keeping the epoch→sequence map stable."""
    base = _read_epoch_base(spark, tombstone_ledger_path)
    if base is not None:
        return base
    committed = committed_batch_seqs(spark, tombstone_ledger_path)
    base = (max(committed) + 1) if committed else 0
    fs, jpath = _fs(spark, tombstone_ledger_path)
    out = fs.create(
        jpath(f"{tombstone_ledger_path}/{_EPOCH_BASE_NAME}"), True
    )
    try:
        out.write(str(base).encode("utf-8"))
    finally:
        out.close()
    return base


def stream_tombstone_ingest(
    spark: SparkSession,
    source_dir: str,
    tombstones_path: str,
    tombstone_ledger_path: str,
    checkpoint_dir: str,
    id_col: str,
    id_schema: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain all pending takedown-id files (Trigger.AvailableNow) into
    the tombstone store, one epoch per file set, each epoch committed
    as ``base + epoch_id`` (see module docstring for why the base
    exists and how it preserves exactly-once). ``id_schema`` is the
    stream schema (e.g. ``"doc_id long"``)."""
    base = _ensure_epoch_base(spark, tombstone_ledger_path)
    stream = (
        spark.readStream.schema(id_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        append_tombstones(
            spark,
            tombstones_path,
            tombstone_ledger_path,
            batch_df.select(id_col),
            base + int(epoch_id),
            id_col,
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
