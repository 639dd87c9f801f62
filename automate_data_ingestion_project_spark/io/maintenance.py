"""Maintained-store maintenance: small-file compaction for the
ledger-appended stores (token shards, IVF inverted lists).

Every incremental append lands one-or-more files under the batch's own
``batch_seq=B`` partition leaves. That is the durability protocol's
strength — closed batches are never rewritten — and its long-run cost:
after 10k epochs a shard/cell directory holds 10k small files, and at
100 TB the NameNode/object-store listing and per-file open overhead
dominate the scan. Compaction is the OPTIMIZE counterpart (Delta's
``OPTIMIZE``, Iceberg's ``rewrite_data_files``): rewrite the tree with
one file per leading partition value, byte-identical content, without
breaking the ledger's replay guard.

Design decisions, in terms of the append protocol:

- Compacted rows keep the store's partition SCHEMA but move to the
  reserved generation ``batch_seq = -1``: live appends only ever write
  ``batch_seq >= 0`` leaves, and their self-heal globs target
  ``batch_seq=<their own seq>``, so compacted files are never cleanup
  candidates. Mixing partition depths (dropping ``batch_seq``) would
  break parquet partition discovery instead.
- The LEDGER is untouched. Replay idempotency consults only the ledger
  (a committed ``batch_seq`` no-ops regardless of which generation now
  holds its rows), and the token-shard offset chain sums ledger rows,
  not files — so appends continue correctly after any number of
  compactions.
- The rewrite is a crash-safe whole-tree swap: build the compacted
  tree beside the live one, then ``live -> live.old``,
  ``tmp -> live``, drop ``live.old``. Every call first runs recovery
  (restore a half-swapped tree, drop stale tmp), so a crashed
  compaction is repaired by the next one. Compaction is a single-writer
  maintenance operation — run it when no appender is active, exactly
  like OPTIMIZE.
- All listing/rename/delete goes through the Hadoop FileSystem API, so
  the protocol carries to HDFS as written. On S3A a rename is a copy;
  an object-store deployment would swap a manifest pointer instead —
  the one documented seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COMPACTED_BATCH_SEQ = -1


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    p = jpath(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def compact_store_tree(
    spark: SparkSession,
    live_path: str,
    key_col: str,
    sort_col: str,
) -> int:
    """Compact a ``(key_col, batch_seq)``-partitioned store tree to one
    file per ``key_col`` value (hash-clustering by ``key_col`` puts each
    key's rows in exactly one task, so the dynamic-partition write emits
    exactly one file per key — the token-shard exporter's layout trick).

    Returns the number of rows rewritten (0 = store empty or absent,
    nothing done). Content is preserved exactly; tests fingerprint it.
    """
    fs, jpath = _fs(spark, live_path)
    live = jpath(live_path)
    old = jpath(live_path + ".old")
    tmp = jpath(live_path + ".compact")

    # recovery from a crashed prior compaction, in swap order
    if not fs.exists(live) and fs.exists(old):
        fs.rename(old, live)  # crashed between the two renames
    if fs.exists(tmp):
        fs.delete(tmp, True)  # stale build, never swapped in
    if fs.exists(old):
        fs.delete(old, True)  # crashed after the swap, before cleanup

    if not fs.exists(live):
        return 0
    df = spark.read.parquet(live_path)
    n = df.count()
    if n == 0:
        return 0
    (
        df.withColumn("batch_seq", F.lit(COMPACTED_BATCH_SEQ))
        .repartition(key_col)
        .sortWithinPartitions(key_col, sort_col)
        .write.mode("overwrite")
        .partitionBy(key_col, "batch_seq")
        .parquet(live_path + ".compact")
    )
    fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, True)
    # the swap bypassed Spark's write path for the live location
    spark.catalog.refreshByPath(live_path)
    return n


def data_file_count(spark: SparkSession, path: str) -> int:
    """Number of parquet data files under a store tree (metadata-only
    recursive listing through the Hadoop FileSystem API)."""
    fs, jpath = _fs(spark, path)
    p = jpath(path)
    if not fs.exists(p):
        return 0
    it = fs.listFiles(p, True)
    count = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            count += 1
    return count


def read_store_asof(
    spark: SparkSession, data_path: str, batch_seq: int
) -> DataFrame:
    """Time-travel read of a ledger-appended store: the rows as they
    stood after batch ``batch_seq`` committed — i.e. the generations
    ``0..batch_seq``. Because every batch owns its ``batch_seq=B``
    partition leaves and closed batches are never rewritten, an as-of
    read is a pure partition filter: the scan prunes to the wanted
    generations' directories and never opens a newer file (the poor
    man's Delta time travel, priced at zero extra storage).

    Compaction trades this away: the ``batch_seq = -1`` generation
    collapses history, so an as-of read on a compacted store is
    ill-defined and raises — retention policy is "as-of works until
    you compact", stated rather than silently wrong.
    """
    fs, jpath = _fs(spark, data_path)
    compacted = fs.globStatus(
        jpath(f"{data_path}/*/batch_seq={COMPACTED_BATCH_SEQ}")
    )
    if compacted is not None and len(compacted) > 0:
        raise ValueError(
            "as-of read unavailable: this store has a compacted "
            f"generation (batch_seq={COMPACTED_BATCH_SEQ}) that collapsed "
            "its per-batch history"
        )
    return spark.read.parquet(data_path).filter(
        F.col("batch_seq").between(0, batch_seq)
    )


def vacuum_store(
    spark: SparkSession, data_path: str, ledger_path: str
) -> int:
    """Remove orphan partition leaves whose ``batch_seq`` never
    committed — the global form of the append's per-batch self-heal
    (which only cleans the batch being retried). A crashed writer that
    is never retried leaves its files stranded forever otherwise; at
    100 TB that is paid storage and scan-planning noise. Committed
    generations and the compacted generation are never candidates.

    Returns the number of leaves deleted. Safe to run concurrently with
    READERS (their snapshot listed files before the delete) but, like
    compaction, it is a single-writer maintenance op: an appender
    mid-write looks exactly like a crashed one.
    """
    fs, jpath = _fs(spark, data_path)
    ledger_p = jpath(ledger_path)
    committed: set[int] = {COMPACTED_BATCH_SEQ}
    if fs.exists(ledger_p) and any(
        s.getPath().getName().endswith(".parquet")
        for s in fs.listStatus(ledger_p)
    ):
        committed |= {
            r.batch_seq for r in spark.read.parquet(ledger_path).collect()
        }
    leaves = fs.globStatus(jpath(f"{data_path}/*/batch_seq=*")) or []
    dropped = 0
    for s in leaves:
        seq = int(s.getPath().getName().split("=", 1)[1])
        if seq not in committed:
            fs.delete(s.getPath(), True)
            dropped += 1
    if dropped:
        spark.catalog.refreshByPath(data_path)
    return dropped


def compact_flat_tree(
    spark: SparkSession,
    live_path: str,
    sort_cols: list[str],
    target_bytes: int = 128 << 20,
) -> int:
    """Compact an UNPARTITIONED parquet tree (the near-dup index's
    rows/bands/roster dirs, which grow one file set per ingest) down to
    ``ceil(total_bytes / target_bytes)`` sorted files, via the same
    crash-safe swap as :func:`compact_store_tree`. Returns the file
    count after compaction (0 = tree absent/empty, nothing done).

    ``target_bytes`` defaults to the classic 128 MiB split size;
    production passes its ``spark.sql.files.maxPartitionBytes`` so one
    compacted file feeds one scan task.
    """
    import math

    fs, jpath = _fs(spark, live_path)
    live = jpath(live_path)
    old = jpath(live_path + ".old")
    tmp = jpath(live_path + ".compact")

    if not fs.exists(live) and fs.exists(old):
        fs.rename(old, live)
    if fs.exists(tmp):
        fs.delete(tmp, True)
    if fs.exists(old):
        fs.delete(old, True)

    if not fs.exists(live):
        return 0
    total = 0
    it = fs.listFiles(live, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    if total == 0:
        return 0
    n_files = max(1, math.ceil(total / target_bytes))
    (
        spark.read.parquet(live_path)
        .repartition(n_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(live_path + ".compact")
    )
    fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, True)
    spark.catalog.refreshByPath(live_path)
    return n_files


def append_store_batch(
    spark: SparkSession,
    data_path: str,
    ledger_path: str,
    rows: DataFrame,
    batch_seq: int,
    key_col: str,
    sort_col: str,
    count_col: str = "n_rows",
) -> None:
    """The UNORDERED ledger-append protocol, generically: append
    ``rows`` (already derived; no ``batch_seq`` column) under
    ``data_path``'s ``{key_col}=K/batch_seq={batch_seq}`` leaves with
    the ledger row as the commit marker. Shared by every maintained
    store whose batches are independent (IVF cells, IVF-PQ codes —
    any store whose row derivation is a pure function of a frozen
    artifact); the token-shard store keeps its own ordered variant
    because its offset arithmetic chains batches.

    Protocol legs (same as ``mixing.append_token_shard_batch``):
    replayed committed batch → no-op; crash retry → self-heal of this
    batch's own leaves only; empty batch → ``(batch_seq, 0)`` ledger
    row, no data write (a zero-row dynamic-partition write leaves a
    schema-less tree); ledger row written LAST from the read-back of
    the written files. All filesystem ops via the Hadoop FileSystem
    API.
    """
    fs, jpath = _fs(spark, data_path)
    ledger_p = jpath(ledger_path)
    if fs.exists(ledger_p) and any(
        s.getPath().getName().endswith(".parquet")
        for s in fs.listStatus(ledger_p)
    ):
        committed = spark.read.parquet(ledger_path).collect()
        if any(r.batch_seq == batch_seq for r in committed):
            return  # replay of a committed batch: no-op
    leftovers = fs.globStatus(
        jpath(f"{data_path}/{key_col}=*/batch_seq={batch_seq}")
    )
    for s in leftovers or []:
        fs.delete(s.getPath(), True)
    ledger_schema = f"batch_seq int, {count_col} long"
    if rows.isEmpty():
        spark.createDataFrame(
            [(batch_seq, 0)], ledger_schema
        ).coalesce(1).write.mode("append").parquet(ledger_path)
        return
    (
        rows.withColumn("batch_seq", F.lit(batch_seq))
        .repartition(key_col)
        .sortWithinPartitions(key_col, sort_col)
        .write.mode("append")
        .partitionBy(key_col, "batch_seq")
        .parquet(data_path)
    )
    # the self-heal delete bypassed Spark's write path — invalidate any
    # stale FileStatusCache entries before the read-back
    spark.catalog.refreshByPath(data_path)
    n = (
        spark.read.parquet(data_path)
        .filter(F.col("batch_seq") == batch_seq)
        .count()
    )
    spark.createDataFrame(
        [(batch_seq, n)], ledger_schema
    ).coalesce(1).write.mode("append").parquet(ledger_path)


def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Small-file compaction for a bucketed catalog table (the near-dup
    index's band table accumulates one file set per bucket per ingest):
    rewrite through a staging table with the SAME bucket spec, so the
    compacted table still joins exchange-free on ``bucket_col``.

    The staging hop exists because Spark refuses to overwrite a table
    it is reading from; it also means the data is written twice — fine
    for a maintenance window, and the honest local stand-in for what a
    production deployment does with one metadata swap (Delta/Iceberg
    ``REPLACE TABLE`` / ``rewrite_data_files``, the documented seam for
    every catalog-table mutation in this repo).
    """
    from .sink import write_bucketed_table

    staging = f"{table}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    write_bucketed_table(
        spark.table(table), staging, bucket_col, n_buckets, sort_col=sort_col
    )
    write_bucketed_table(
        spark.table(staging), table, bucket_col, n_buckets,
        sort_col=sort_col, mode="overwrite",
    )
    spark.sql(f"DROP TABLE {staging}")
