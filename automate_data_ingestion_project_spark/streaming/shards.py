"""Streaming token-shard export — the terminal materialization driven
by Structured Streaming.

The batch-mode form (``analytics/mixing.append_token_shard_batch``)
appends one document batch to a token-bounded shard set; production
runs it continuously: document files land, each micro-batch is
assigned shard ids starting at the ledger's global token offset and
its files are appended under the batch's own partition leaves, so the
corpus's training shards grow as the corpus does — without ever
rewriting a closed shard. ``foreachBatch`` is the right seam, exactly
as for the near-dup ingestion loop (``streaming/neardup.py``): the
shard append is a keyed, replay-idempotent mutation of a maintained
store.

Exactly-once shape, every leg, inherited from the append's durability
protocol: the epoch id IS the batch_seq (Structured Streaming retries
an epoch under the SAME id), so a replayed committed epoch is a ledger
no-op, and a retry after a mid-write crash self-heals by wiping only
the epoch's own ``batch_seq=<epoch>`` leaves before rewriting — files
from earlier epochs are never candidates. The ledger row is written
last (the commit marker). One micro-batch per input file
(``maxFilesPerTrigger=1``) keeps cross-epoch shard filling honest in
tests; at 100 TB/day the trigger is sized by data volume instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..analytics.mixing import (
    SHARD_BUDGET,
    append_token_shard_batch,
    shard_store_paths,
)

DOC_SCHEMA = "doc_id long, text string"
_SHARD_SCHEMA = (
    "doc_id long, text string, n_tokens bigint, shard_id bigint, "
    "batch_seq int"
)


def stream_shard_export(
    spark: SparkSession,
    source_dir: str,
    root: str,
    checkpoint_dir: str,
    budget: int = SHARD_BUDGET,
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drain all pending document files into the shard store
    (Trigger.AvailableNow) and return the exported shard rows.

    Each micro-batch runs :func:`append_token_shard_batch` with the
    epoch id as the batch sequence: the epoch's docs fill the last
    partial shard from the ledger's running token offset, then open
    new shards — docs exported by an EARLIER micro-batch are never
    rewritten, which is the closed-shard stability property the
    batch-mode tests checksum.

    ``shuffle_partitions`` scopes ``spark.sql.shuffle.partitions`` to
    the drain (restored after) — each micro-batch shuffles a
    batch-sized relation, and default-width exchanges pay task
    overhead on kilobytes (the same knob every streaming harness here
    documents).
    """
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )

    def export(batch_df: DataFrame, epoch_id: int) -> None:
        # no empty-epoch guard: append_token_shard_batch commits an
        # empty epoch as a (batch_seq, 0, 0) ledger row with no shard
        # files, so the ledger records every drained epoch uniformly
        append_token_shard_batch(
            spark,
            batch_df.select("doc_id", "text"),
            root,
            int(epoch_id),
            budget=budget,
        )

    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(export)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, prior)
    shards_path, ledger_path = shard_store_paths(root)
    from ..io.maintenance import read_committed, store_exists

    # Hadoop-FS probe: os.path.isdir is always false on HDFS/S3A
    if not store_exists(spark, shards_path):
        # nothing pending is a normal state for a continuous exporter
        return spark.createDataFrame([], _SHARD_SCHEMA)
    # committed-read isolation: a prior crashed drain's orphan leaves
    # (epoch files without their ledger row) stay invisible
    return read_committed(spark, shards_path, ledger_path)
