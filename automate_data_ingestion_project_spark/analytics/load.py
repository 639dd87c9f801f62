"""Load-layer CORRECTNESS queries — the keyed idempotent upsert (L1/L4).

The scenario of FIXTURES.md §6, registered as a driver-checked query:

1. batch1 = the normalized DV3F fixture (7 rows, PK ``uid``);
2. batch2 = the ``dep='01'`` rows with a changed metric and one column
   MISSING (``sbati_median`` — exercising BY NAME reconciliation), plus
   one brand-new row;
3. upsert batch1, then batch2, then batch2 AGAIN (idempotence);
4. return the final table.

Expected final state (the DuckDB oracle recomputes it with an anti-join
+ union): batch1-only rows unchanged, batch2 keys replaced (their
``sbati_median`` now NULL — DuckDB ``INSERT OR REPLACE BY NAME``
default-fills missing columns), the new row inserted, and run 3 having
changed nothing. Matches ``/root/reference/scripts/extract_load.py:233-240``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.sink import read_parquet, upsert_parquet
from .dv3f import METRICS, _oracle_sql as _dv3f_oracle_sql, normalize_dv3f
from .registry import register

SCRATCH_ROOT = os.path.join(tempfile.gettempdir(), "adi_spark_warehouse")

# the new row inserted by batch2 (annee, dep, libdep, cod + metric values)
_NEW_KEY = ("2017", "04", "Alpes-de-Haute-Provence", "111")
_NEW_VALS = [float(7000 + i) + 0.5 for i in range(len(METRICS) - 1)]  # no sbati_median

_BATCH2_METRICS = METRICS[:-1]  # sbati_median intentionally absent


def _new_row_sql(dialect: str = "duckdb") -> str:
    annee, dep, libdep, cod = _NEW_KEY
    concat = f"concat('{annee}', '{dep}', '{cod}')"
    uid = f"sha2({concat}, 256)" if dialect == "spark" else f"sha256({concat})"
    cells = ", ".join(
        f"CAST({v!r} AS DOUBLE) AS {m}" for m, v in zip(_BATCH2_METRICS, _NEW_VALS)
    )
    return (
        f"SELECT {uid} AS uid, "
        f"'{annee}' AS annee, '{dep}' AS dep, '{libdep}' AS libdep, "
        f"'{cod}' AS cod, {cells}"
    )


def scratch_dir(name: str) -> str:
    d = os.path.join(SCRATCH_ROOT, name)
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    return d


def cache_dir(name: str) -> str:
    """Like :func:`scratch_dir` but PERSISTENT across calls: for
    build-once artifacts (materialized indexes) keyed by content, where
    a re-run should find the previous build instead of wiping it."""
    d = os.path.join(SCRATCH_ROOT, name)
    os.makedirs(d, exist_ok=True)
    return d


@register(
    "upsert_idempotent",
    oracle=f"""
    WITH batch1 AS ({_dv3f_oracle_sql()}),
    batch2 AS (
        SELECT uid, annee, dep, libdep, cod,
               nbtrans + 10000 AS nbtrans,
               {", ".join(_BATCH2_METRICS[1:])},
               CAST(NULL AS DOUBLE) AS sbati_median
        FROM batch1 WHERE dep = '01'
        UNION ALL
        SELECT uid, annee, dep, libdep, cod, {", ".join(_BATCH2_METRICS)},
               CAST(NULL AS DOUBLE) AS sbati_median
        FROM ({_new_row_sql()})
    )
    SELECT * FROM batch1 WHERE uid NOT IN (SELECT uid FROM batch2)
    UNION ALL
    SELECT * FROM batch2
    """,
    survey_ref="L1,L3,L4,Q4 (extract_load.py:233-240 INSERT OR REPLACE BY NAME)",
)
def upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(scratch_dir("upsert_idempotent"), "src_departement")

    batch1 = normalize_dv3f(spark, sf_dir)
    modified = (
        batch1.filter(F.col("dep") == "01")
        .withColumn("nbtrans", F.col("nbtrans") + 10000)
        .drop("sbati_median")
    )
    batch2 = modified.unionByName(spark.sql(_new_row_sql("spark")))

    upsert_parquet(spark, batch1, path, keys=["uid"])
    upsert_parquet(spark, batch2, path, keys=["uid"])
    upsert_parquet(spark, batch2, path, keys=["uid"])  # idempotence: no-op
    return read_parquet(spark, path)
