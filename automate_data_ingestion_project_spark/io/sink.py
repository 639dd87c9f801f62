"""Write path + keyed idempotent upsert (SURVEY.md §2.2 L1/L4).

The reference's load step is ``INSERT OR REPLACE INTO dev.<tbl> BY NAME``
over a PK (``/root/reference/scripts/extract_load.py:233-240``): columns
align by name, rows whose key already exists are replaced — so re-running
an ETL batch is a no-op. On plain parquet Spark has no MERGE, so the
upsert is the classic rewrite:

    source deduped on keys
    → target rows NOT matching a source key survive (left-anti join)
    → unionByName(allowMissingColumns=True)  (the BY NAME alignment)
    → atomic directory swap

Scale design (100 TB):

- the anti-join is a key join — AQE picks broadcast when the source
  batch is small (the common incremental case: daily batch ≪ target);
- ``partition_by`` lets the target be partitioned so an upsert touching
  few partitions could be narrowed to them (dynamic partition overwrite
  is the natural next step; on a lakehouse table format this whole
  function becomes ``MERGE INTO``);
- the swap is metadata-only (rename), never a data copy;
- nothing collects to the driver.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def path_exists(path: str) -> bool:
    """L3 twin for path-backed tables (see schemas.table_exists for
    catalog tables)."""
    return os.path.isdir(path) and bool(os.listdir(path))


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """By-name schema reconciliation (the ``BY NAME`` half of L1).

    Columns are matched by name against the declared target schema:
    present columns are cast to the declared type, absent ones become
    typed NULLs (DuckDB's ``INSERT BY NAME`` default-fill), extra
    columns are dropped. Output column order is the target order.
    """
    have = {c.lower() for c in df.columns}
    cols = []
    for f_ in target.fields:
        if f_.name.lower() in have:
            cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    return df.select(*cols)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """L4 — materialization sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def upsert_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    target_schema: T.StructType | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """L1 — schema-reconciling keyed upsert into a parquet directory.

    Semantics of ``INSERT OR REPLACE ... BY NAME`` (ref
    extract_load.py:233-240): after the call, for every key in
    ``source`` the target holds exactly the source row; all other
    target rows are untouched. Re-running with the same source is a
    no-op (idempotent). Within one source batch, duplicate keys keep
    one arbitrary-but-single row (PK semantics, Q4).
    """
    src = source.dropDuplicates(keys)
    if target_schema is not None:
        src = align_to_schema(src, target_schema)

    if path_exists(path):
        target = spark.read.parquet(path)
        if target_schema is None:
            # align source to the existing table by name; keep target cols
            src = align_to_schema(src, target.schema)
        keep = target.join(src.select(*keys), on=keys, how="left_anti")
        merged = keep.unionByName(src, allowMissingColumns=True)
    else:
        merged = src

    # Write-then-swap: the merged plan reads `path`, so the new data
    # lands in a sibling tmp dir first; the swap is two renames.
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    write_parquet(merged, tmp, partition_by=partition_by)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    # drop cached file listings/footers for the swapped directory so
    # later reads (and any still-live DataFrames) re-list it
    spark.catalog.refreshByPath(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the lakehouse maintenance op.

    Streaming upserts and per-code ingests leave many small files; scans
    then pay per-file open cost and tiny row groups defeat the
    vectorized reader. Rewrite the directory into
    ``ceil(total_bytes / target_file_bytes)`` files (atomic swap).
    Returns the new file count."""
    import math

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    spark.catalog.refreshByPath(path)
    return sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join storage layout.

    Two tables bucketed by the same key and count join WITHOUT a
    shuffle exchange (Spark reads bucket i of both sides into the same
    task). At 100 TB this converts the fact⋈fact join from a full
    2-sided shuffle into a local merge — the single biggest join win
    available from layout alone. Sorting within buckets additionally
    drops the per-task sort of a sort-merge join."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)
