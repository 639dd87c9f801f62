"""Lakehouse MERGE backend for the keyed upsert (SURVEY.md §2.2 L1).

The plain-parquet rewrite in :func:`..io.sink.upsert_parquet` is the
correct portable implementation of the reference's
``INSERT OR REPLACE INTO ... BY NAME`` load step
(``/root/reference/scripts/extract_load.py:233-240``), but at 100 TB the
production path is a transactional table format: Delta Lake's
``MERGE INTO`` gives

- **atomic commits** — readers see the pre- or post-merge snapshot,
  never a half-swapped directory (the parquet path's rename-aside swap
  is single-writer and local-FS only; ``os.rename`` does not exist on
  S3);
- **file-level pruning** — MERGE rewrites only data files containing
  matched keys (with deletion vectors, only the row positions), instead
  of whole partitions;
- **concurrent writers** — optimistic concurrency + conflict detection,
  so parallel ETL branches can upsert disjoint keys safely.

This module is **import-gated**: the ``delta-spark`` package and its
jars are not shipped in every deployment (not in this container), so
:func:`delta_available` probes both the Python import and the Spark
session's extension config, and :func:`upsert_auto` falls back to the
parquet rewrite when the answer is no. The MERGE code itself is plain
public Delta API and is exercised by ``tests/test_lakehouse.py`` when
``delta-spark`` is installed (skipped otherwise); the condition-builder
and routing logic are tested unconditionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_DELTA_EXTENSION = "io.delta.sql.DeltaSparkSessionExtension"


def _import_delta():
    try:
        from delta.tables import DeltaTable  # noqa: PLC0415

        return DeltaTable
    except ImportError:
        return None


def delta_available(spark: SparkSession) -> bool:
    """True iff Delta can actually run MERGE in *this* session.

    Needs both the ``delta-spark`` Python package and the session built
    with the Delta SQL extension + catalog (they must be set at session
    construction; a bare import is not enough to execute MERGE).
    """
    if _import_delta() is None:
        return False
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return _DELTA_EXTENSION in ext


def merge_condition(keys: list[str], left: str = "t", right: str = "s") -> str:
    """Null-safe equi-join condition over the PK columns.

    ``<=>`` (null-safe equals) mirrors the parquet path's
    ``eqNullSafe``: a NULL key in the batch must match a NULL key in the
    target, or re-running the batch would insert a duplicate row instead
    of replacing — breaking L1's idempotency contract.
    """
    if not keys:
        raise ValueError("merge requires at least one key column")
    return " AND ".join(f"{left}.`{k}` <=> {right}.`{k}`" for k in keys)


def is_delta_table(spark: SparkSession, path: str) -> bool:
    DeltaTable = _import_delta()
    if DeltaTable is None:
        return False
    return bool(DeltaTable.isDeltaTable(spark, path))


def upsert_delta(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    target_schema: T.StructType | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Keyed idempotent upsert via Delta ``MERGE INTO``.

    Same contract as :func:`..io.sink.upsert_parquet` (source deduped on
    keys; matched rows replaced whole — the UPDATE-ALL half of
    ``INSERT OR REPLACE``; unmatched inserted; everything else
    untouched), but transactional and file-pruned instead of
    directory-swapped.

    Scale notes (100 TB):

    - the MERGE source is the deduped batch; Delta broadcasts it when
      small (AQE), exactly like the parquet path's anti-join;
    - with a partitioned table Delta prunes the matched-file search to
      partitions the batch's keys can live in when the condition pins
      the partition column — we append partition equality terms for
      partition columns that are part of the key, which is the common
      date-partitioned incremental layout;
    - schema evolution (`mergeSchema`) covers the BY-NAME column-add
      case without a table rewrite.
    """
    DeltaTable = _import_delta()
    if DeltaTable is None:  # pragma: no cover - guarded by callers
        raise RuntimeError("delta-spark is not installed")

    from .sink import align_to_schema

    src = source.dropDuplicates(keys)
    if target_schema is not None:
        src = align_to_schema(src, target_schema)

    if not DeltaTable.isDeltaTable(spark, path):
        writer = src.write.format("delta").mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return

    tgt = DeltaTable.forPath(spark, path)
    spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
    (
        tgt.alias("t")
        .merge(src.alias("s"), merge_condition(keys))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def upsert_auto(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    target_schema: T.StructType | None = None,
    partition_by: list[str] | None = None,
    backend: str = "auto",
) -> str:
    """Route the upsert to the best available backend.

    ``auto`` → Delta MERGE when the session can run it or the target is
    already a Delta table; the parquet rewrite otherwise. Returns the
    backend used (``"delta"`` or ``"parquet"``) so pipelines can log it.
    """
    from .sink import upsert_parquet

    if backend not in ("auto", "delta", "parquet"):
        raise ValueError(f"unknown upsert backend: {backend!r}")
    use_delta = backend == "delta" or (
        backend == "auto"
        and (delta_available(spark) or is_delta_table(spark, path))
    )
    if use_delta:
        upsert_delta(
            spark, source, path, keys,
            target_schema=target_schema, partition_by=partition_by,
        )
        return "delta"
    upsert_parquet(
        spark, source, path, keys,
        target_schema=target_schema, partition_by=partition_by,
    )
    return "parquet"
