"""Declarative table schemas: YAML → StructType → DDL (SURVEY.md §2.2 L2).

The reference declares its persisted schemas in Hydra YAML
(``/root/reference/scripts/config/config.yaml:16-119``): per-table column
name/type/nullable plus validation constraints (``maxLength``, int64
``min``/``max``) and a PRIMARY KEY. DuckDB enforces the PK; Spark cannot,
so here the PK is carried as metadata and enforced by the upsert
(:mod:`.io.sink`) and the Q1/Q4 assertions (:mod:`.quality`).

The YAML shape accepted here::

    database: dev
    tables:
      src_departement:
        primary_key: [uid]
        columns:
          uid:    {type: string, nullable: false}
          annee:  {type: string, nullable: true, maxLength: 4}
          nbtrans: {type: int64, nullable: true, min: -9223372036854775808,
                    max: 9223372036854775807}
          valeurfonc_sum: {type: double}

Everything a 100 TB deployment needs from this file is driver-side and
O(#columns) — no data motion.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

try:
    import yaml
except ImportError:  # pragma: no cover - baked into the target image
    yaml = None

# reference type vocabulary (config.yaml) → Spark SQL types
_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}

_DDL_MAP = {
    "string": "STRING",
    "int32": "INT",
    "int64": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "binary": "BINARY",
}


@dataclass(frozen=True)
class ColumnSpec:
    """One declared column with its validation constraints (Q3)."""

    name: str
    type: str
    nullable: bool = True
    max_length: int | None = None
    min: float | None = None
    max: float | None = None

    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.type]


@dataclass(frozen=True)
class TableSchema:
    """A declared table: columns + primary key, DDL- and StructType-able."""

    name: str
    database: str
    columns: tuple[ColumnSpec, ...]
    primary_key: tuple[str, ...] = field(default_factory=tuple)

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.name}"

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, c.spark_type(), c.nullable, metadata={})
                for c in self.columns
            ]
        )

    def ddl(self, using: str = "PARQUET", location: str | None = None) -> str:
        """``CREATE TABLE IF NOT EXISTS`` statement (L2).

        Mirrors the reference's generated DDL
        (``scripts/extract_load.py:228-230``); the PK clause becomes a
        table comment since Spark has no PK constraint.
        """
        cols = ", ".join(f"{c.name} {_DDL_MAP[c.type]}" for c in self.columns)
        loc = f" LOCATION '{location}'" if location else ""
        pk = (
            f" TBLPROPERTIES ('primary_key' = '{','.join(self.primary_key)}')"
            if self.primary_key
            else ""
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.qualified_name} ({cols}) "
            f"USING {using}{loc}{pk}"
        )


def _parse_column(name: str, spec: dict | str) -> ColumnSpec:
    if isinstance(spec, str):  # shorthand: colname: type
        return ColumnSpec(name=name, type=spec)
    return ColumnSpec(
        name=name,
        type=spec["type"],
        nullable=bool(spec.get("nullable", True)),
        max_length=spec.get("maxLength"),
        min=spec.get("min"),
        max=spec.get("max"),
    )


def schemas_from_dict(cfg: dict) -> dict[str, TableSchema]:
    """Parse the declarative config shape into TableSchema objects."""
    database = cfg.get("database", "default")
    out: dict[str, TableSchema] = {}
    for tname, tcfg in cfg.get("tables", {}).items():
        cols = tuple(_parse_column(n, s) for n, s in tcfg["columns"].items())
        pk = tuple(tcfg.get("primary_key", ()))
        out[tname] = TableSchema(
            name=tname, database=database, columns=cols, primary_key=pk
        )
    return out


def schemas_from_yaml(text: str) -> dict[str, TableSchema]:
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required for YAML schema parsing")
    return schemas_from_dict(yaml.safe_load(text))


def create_database(spark: SparkSession, database: str) -> None:
    """L2 — ``CREATE SCHEMA IF NOT EXISTS`` (ref extract_load.py:220)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def table_exists(spark: SparkSession, qualified_name: str) -> bool:
    """L3 — catalog existence probe (ref extract_load.py:222-231's
    try/except ``con.table`` branch, as a first-class call)."""
    return spark.catalog.tableExists(qualified_name)


def create_table(spark: SparkSession, schema: TableSchema, **ddl_kwargs) -> None:
    create_database(spark, schema.database)
    spark.sql(schema.ddl(**ddl_kwargs))
