"""Streaming takedown ingestion — deletion requests drained into a
maintained store's tombstone ledger by Structured Streaming.

Production takedowns (DMCA, right-to-erasure, opt-out feeds) arrive
continuously, not as batch jobs: a feed of document/vector ids lands as
files, and each micro-batch's ids are appended to the store's tombstone
set (:func:`..io.maintenance.append_tombstones`) with the epoch id as
the batch sequence — the same ``foreachBatch`` seam as every other
maintained-store drain here (near-dup ingestion, shard export, IVF
ingest). Readers see each takedown as soon as its epoch's ledger row
commits (the mask is re-read per query); the next full-collapse
compaction completes the erasure physically.

Exactly-once shape inherited from the tombstone protocol: a replayed
committed epoch is a ledger no-op, a mid-write crash self-heals on the
epoch's retry, an empty epoch commits ``(epoch, 0)``. Tombstone batches
are unordered (deletion is a set union), so the drain needs no ordering
guarantee — the IVF-style independence, not the token-shard chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.maintenance import append_tombstones


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
    the tombstone store, one epoch per file set. ``id_schema`` is the
    stream schema (e.g. ``"doc_id long"``)."""
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
            int(epoch_id),
            id_col,
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
