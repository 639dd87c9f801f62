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
    - with a partitioned table Delta's MERGE prunes the matched-file
      search via data-file key statistics (partition pinning in the
      condition is a further manual optimization a caller can add
      through its own condition — this function keeps the condition to
      the PK columns);
    - schema evolution (``autoMerge``, scoped to this call) covers the
      BY-NAME column-add case without a table rewrite.

    ``path`` must be empty or already a Delta table: writing Delta over
    a live plain-parquet directory either fails
    (CREATE_TABLE_WITH_NON_EMPTY_LOCATION) or silently shadows the
    existing rows — :func:`upsert_auto` routes such targets to the
    parquet backend instead of here.
    """
    DeltaTable = _import_delta()
    if DeltaTable is None:  # pragma: no cover - guarded by callers
        raise RuntimeError("delta-spark is not installed")

    from .sink import align_to_schema, path_exists

    src = source.dropDuplicates(keys)
    if target_schema is not None:
        src = align_to_schema(src, target_schema)

    if not DeltaTable.isDeltaTable(spark, path):
        if path_exists(path):
            raise ValueError(
                f"target {path!r} exists but is not a Delta table; "
                "refusing to overwrite a non-Delta location "
                "(use upsert_parquet or convert the table first)"
            )
        writer = src.write.format("delta").mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return

    tgt = DeltaTable.forPath(spark, path)
    conf_key = "spark.databricks.delta.schema.autoMerge.enabled"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        (
            tgt.alias("t")
            .merge(src.alias("s"), merge_condition(keys))
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    finally:
        # scope the schema-evolution flag to this merge — leaving it set
        # would leak auto-evolution into every later write on the session
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)


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

    ``auto`` → Delta MERGE when the session can run it AND the target
    is Delta-compatible (already a Delta table, or does not exist yet);
    the parquet rewrite otherwise. A pre-existing PLAIN-PARQUET target
    (e.g. a warehouse built earlier by the fallback) stays on the
    parquet backend even in a delta-enabled session — Delta cannot
    MERGE into a non-Delta location, and overwriting it would drop the
    existing rows instead of merging. Returns the backend used
    (``"delta"`` or ``"parquet"``) so pipelines can log it.
    """
    from .sink import path_exists, upsert_parquet

    if backend not in ("auto", "delta", "parquet"):
        raise ValueError(f"unknown upsert backend: {backend!r}")
    use_delta = backend == "delta" or (
        backend == "auto"
        and (
            is_delta_table(spark, path)
            or (delta_available(spark) and not path_exists(path))
        )
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
