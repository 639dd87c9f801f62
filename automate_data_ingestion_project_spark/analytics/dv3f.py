"""DV3F pipeline queries — the reference's signature reshape, CORRECTNESS-checked.

The reference's core transform (``/root/reference/scripts/extract_load.py:119-201``)
turns a wide API payload (id columns + one column per ``<metric>_cod<K>``)
into a normalized staging table keyed by a SHA-256 uid. Here that chain
(:func:`..operators.reshape.normalize_wide`) runs over a literal fixture
shaped exactly like the API payload (FIXTURES.md §1 ``raw_dv3f_api``),
with every edge case the pandas original exhibits:

- a row whose ``dep`` key is NULL       → its groups are dropped
  (pandas ``groupby(dropna=True)``);
- a (row, cod) group whose metrics are all NULL → dropped
  (pandas ``pivot_table`` omits all-NaN groups);
- partially-NULL groups                 → kept, NULL cells;
- metric names containing ``_``         → rsplit takes the LAST separator.

The DuckDB oracle recomputes the same semantics with UNPIVOT (NULLs
excluded — equivalent to Spark's keep-then-filter, see reshape.py
docstring), regexp split, CASE-pivot and ``sha256(concat(...))``.

Scale note: the fixture is literal, but the *plan* is the production
plan — unpivot is a codegen'd expand (no shuffle), the pivot's groupBy
is the single shuffle, hashing is a native expression. At 100 TB this
chain is one scan + one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.reshape import normalize_wide
from .registry import register

# The 10 indicator metrics of the persisted staging schema
# (ref scripts/config/config.yaml:36-67; FIXTURES.md §2).
METRICS = [
    "nbtrans",
    "valeurfonc_sum",
    "valeurfonc_q25",
    "valeurfonc_median",
    "valeurfonc_q75",
    "pxm2_q25",
    "pxm2_median",
    "pxm2_q75",
    "sbati_sum",
    "sbati_median",
]

CODES = ["111", "121"]  # property-type codes exercised by the fixture

ID_VARS = ["annee", "dep", "libdep"]
UID_COLS = ["annee", "dep", "cod"]

# Wide fixture columns: one per metric × cod, e.g. nbtrans_cod111,
# valeurfonc_sum_cod121 ... (names intentionally contain '_' inside the
# metric part so the rsplit-once semantics are actually exercised).
WIDE_COLS = [f"{m}_cod{k}" for k in CODES for m in METRICS]


def _wide_fixture_sql() -> str:
    """Literal wide table, identical SQL for Spark and DuckDB.

    Values are index-derived so each (row, column) cell is unique and
    exactly representable in double — parity cannot hinge on float
    noise.
    """
    # (annee, dep, libdep, pattern) — pattern drives which cells are NULL:
    #   'full'      : all 20 values present
    #   'no111'     : the 10 cod111 cells NULL (all-NULL group → dropped)
    #   'partial'   : every 3rd cell NULL (kept, NULL cells)
    #   'allnull'   : all 20 cells NULL (both groups dropped)
    rows = [
        ("2014", "'01'", "'Ain'", "full"),
        ("2014", "'02'", "'Aisne'", "no111"),
        ("2015", "'01'", "'Ain'", "partial"),
        ("2015", "NULL", "'Mystery'", "full"),  # NULL key → dropped
        ("2016", "'2A'", "'Corse-du-Sud'", "full"),
        ("2016", "'03'", "'Allier'", "allnull"),
    ]
    value_rows = []
    for r_idx, (annee, dep, libdep, pattern) in enumerate(rows):
        vals: list[float | None] = []
        for c_idx in range(len(WIDE_COLS)):
            v: float | None = float(1000 * (r_idx + 1) + c_idx) + 0.25
            if pattern == "allnull":
                v = None
            elif pattern == "no111" and c_idx < len(METRICS):
                v = None
            elif pattern == "partial" and c_idx % 3 == 0:
                v = None
            vals.append(v)
        cells = ", ".join(
            "CAST(NULL AS DOUBLE)" if v is None else f"CAST({v!r} AS DOUBLE)"
            for v in vals
        )
        value_rows.append(f"('{annee}', {dep}, {libdep}, {cells})")
    cols = ", ".join(["annee", "dep", "libdep", *WIDE_COLS])
    body = ",\n ".join(value_rows)
    return f"SELECT * FROM (VALUES\n {body}\n) AS t({cols})"


WIDE_FIXTURE_SQL = _wide_fixture_sql()


def _oracle_sql() -> str:
    unpivot_cols = ", ".join(WIDE_COLS)
    pivot_cells = ",\n       ".join(
        f"MAX(CASE WHEN metric = '{m}' THEN valeur END) AS {m}" for m in METRICS
    )
    return f"""
    WITH wide AS ({WIDE_FIXTURE_SQL}),
    long AS (
        SELECT annee, dep, libdep, cod_full, valeur
        FROM wide UNPIVOT (valeur FOR cod_full IN ({unpivot_cols}))
    ),
    split AS (
        SELECT annee, dep, libdep, valeur,
               regexp_extract(cod_full, '^(.*)_([^_]*)$', 1) AS metric,
               replace(regexp_extract(cod_full, '^(.*)_([^_]*)$', 2), 'cod', '') AS cod
        FROM long
    ),
    keyed AS (
        SELECT * FROM split
        WHERE annee IS NOT NULL AND dep IS NOT NULL
          AND libdep IS NOT NULL AND cod IS NOT NULL
    ),
    rewide AS (
        SELECT annee, dep, libdep, cod,
       {pivot_cells}
        FROM keyed
        GROUP BY annee, dep, libdep, cod
    )
    SELECT sha256(concat(annee, dep, cod)) AS uid,
           annee, dep, libdep, cod, {", ".join(METRICS)}
    FROM rewide
    """


@register(
    "normalize_dv3f",
    oracle=_oracle_sql(),
    survey_ref="R1,R2,A1,F1,F2,F3 (extract_load.py:119-201 full transform chain)",
)
def normalize_dv3f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full transform over the raw_dv3f_api fixture."""
    wide = spark.sql(WIDE_FIXTURE_SQL)
    return normalize_wide(wide, ID_VARS, METRICS, UID_COLS)


@register(
    "normalize_dv3f_pandas_api",
    oracle=_oracle_sql(),
    survey_ref="R1,R2,A1,F1,F2,F3 via the pandas-on-Spark API (migration-path twin)",
)
def normalize_dv3f_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's transform written AS the reference wrote it —
    pandas ``melt`` / ``str.rsplit(expand=True)`` / ``pivot_table`` /
    ``apply(hashlib)`` — executed distributed through
    ``pyspark.pandas``, and hash-checked against the SAME oracle as
    the native form (:func:`normalize_dv3f`).

    Why this twin exists: the reference IS a pandas program
    (``extract_load.py:119-201``), and the pandas-on-Spark API is the
    migration path for its users — this query proves the chain runs
    nearly verbatim and produces byte-identical output (verified
    against the native implementation too). Production still prefers
    the native form: the ``apply`` hash is an Arrow-batched Python UDF
    where the native ``sha2`` is codegen'd, ``pivot_table`` launches a
    values-discovery pass the explicit-list native pivot skips, and —
    measured here — ``ps.melt`` coerces the value column to STRING
    when id_vars are strings (restored with ``astype('float64')``; the
    cast is exact on these doubles, but it is a real API seam a
    migration must know about).

    ``aggfunc='max'`` (not pandas' ``first``) because each
    (group, metric) cell holds at most ONE value in this payload, so
    max ≡ first while being order-independent — the oracle's
    ``MAX(CASE ...)`` states the same choice.
    """
    import hashlib

    import pyspark.pandas as ps

    ps.set_option("compute.ops_on_diff_frames", True)
    pdf = spark.sql(WIDE_FIXTURE_SQL).pandas_api()
    long = ps.melt(
        pdf, id_vars=ID_VARS, var_name="cod_full", value_name="valeur"
    ).astype({"valeur": "float64"})
    parts = long["cod_full"].str.rsplit("_", n=1, expand=True)
    long["metric"] = parts[0]
    long["cod"] = parts[1].str.replace("cod", "")
    clean = long.dropna(subset=["valeur", "annee", "dep", "libdep", "cod"])
    pt = clean.pivot_table(
        index=["annee", "dep", "libdep", "cod"],
        columns="metric",
        values="valeur",
        aggfunc="max",
    ).reset_index()
    key = pt["annee"].astype(str) + pt["dep"].astype(str) + pt["cod"].astype(str)
    pt["uid"] = key.apply(lambda s: hashlib.sha256(s.encode()).hexdigest())
    return pt[["uid", "annee", "dep", "libdep", "cod", *METRICS]].to_spark()
