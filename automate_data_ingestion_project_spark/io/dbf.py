"""dBase III/IV (.dbf) table source (SURVEY.md §2.1 S7).

The reference ships a stripped ``ressources/v_commune_2023.dbf``
(``.MISSING_LARGE_BLOBS:2``) — the INSEE commune reference table
intended for code→name enrichment joins. This reader parses the DBF
binary layout (fixed 32-byte header + 32-byte field descriptors +
fixed-width records) in pure Python on the driver and hands rows to
``spark.createDataFrame`` with an explicit schema.

Driver-side parsing is the right call: DBF files are reference/dimension
data (a few MB); the resulting DataFrame is broadcast-join fodder. A
multi-GB DBF should be converted to parquet out-of-band instead.

Layout reference: the public dBase specification (version byte, record
count at offset 4, header length at 8, record length at 10; field
descriptors of 32 bytes terminated by 0x0D; records prefixed with a
deletion-flag byte).
"""

from __future__ import annotations

import datetime as dt
import struct
from dataclasses import dataclass
from typing import BinaryIO

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class DbfField:
    name: str
    type: str  # C N F L D
    length: int
    decimals: int

    def spark_type(self) -> T.DataType:
        if self.type == "C":
            return T.StringType()
        if self.type in ("N", "F"):
            return T.DoubleType() if (self.decimals or self.type == "F") else T.LongType()
        if self.type == "L":
            return T.BooleanType()
        if self.type == "D":
            return T.DateType()
        return T.StringType()  # unknown types degrade to text


def _parse_header(fh: BinaryIO) -> tuple[int, int, int, list[DbfField]]:
    head = fh.read(32)
    if len(head) < 32:
        raise ValueError("not a DBF file: truncated header")
    n_records = struct.unpack("<I", head[4:8])[0]
    header_len = struct.unpack("<H", head[8:10])[0]
    record_len = struct.unpack("<H", head[10:12])[0]
    fields: list[DbfField] = []
    while True:
        desc = fh.read(1)
        if desc == b"\x0d":
            break
        desc += fh.read(31)
        if len(desc) < 32:
            raise ValueError("not a DBF file: truncated field descriptor")
        name = desc[:11].split(b"\x00", 1)[0].decode("ascii", "replace").lower()
        ftype = chr(desc[11])
        length = desc[16]
        decimals = desc[17]
        fields.append(DbfField(name, ftype, length, decimals))
    return n_records, header_len, record_len, fields


def _convert(raw: bytes, f: DbfField, encoding: str):
    text = raw.decode(encoding, "replace").strip()
    if not text:
        return None
    if f.type == "C":
        return text
    if f.type in ("N", "F"):
        try:
            return float(text) if (f.decimals or f.type == "F") else int(text)
        except ValueError:
            return None
    if f.type == "L":
        return text[0] in "YyTt" if text[0] in "YyTtNnFf" else None
    if f.type == "D":
        try:
            return dt.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
        except ValueError:
            return None
    return text


def read_dbf(
    spark: SparkSession, path: str, encoding: str = "cp1252"
) -> DataFrame:
    """Read a .dbf table into a DataFrame with a typed schema.

    Deleted rows (flag ``*``) are skipped — dBase soft-delete semantics.
    """
    with open(path, "rb") as fh:
        n_records, header_len, record_len, fields = _parse_header(fh)
        fh.seek(header_len)
        rows = []
        for _ in range(n_records):
            rec = fh.read(record_len)
            if len(rec) < record_len:
                break
            if rec[0:1] == b"*":  # deleted
                continue
            vals, off = [], 1
            for f in fields:
                vals.append(_convert(rec[off : off + f.length], f, encoding))
                off += f.length
            rows.append(tuple(vals))
    schema = T.StructType(
        [T.StructField(f.name, f.spark_type(), True) for f in fields]
    )
    return spark.createDataFrame(rows, schema)
