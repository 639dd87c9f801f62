"""DBF reader (S7): parse a synthesized dBase III file byte-for-byte,
including types, NULL blanks, and soft-deleted rows."""

from __future__ import annotations

import datetime as dt
import struct

import pytest

from automate_data_ingestion_project_spark.io.dbf import read_dbf


def _make_dbf(path, fields, records):
    """fields: [(name, type, length, decimals)]; records: list of
    (deleted, [raw strings])."""
    record_len = 1 + sum(f[2] for f in fields)
    header_len = 32 + 32 * len(fields) + 1
    head = bytearray(32)
    head[0] = 0x03
    struct.pack_into("<I", head, 4, len(records))
    struct.pack_into("<H", head, 8, header_len)
    struct.pack_into("<H", head, 10, record_len)
    out = bytes(head)
    for name, ftype, length, dec in fields:
        d = bytearray(32)
        d[:11] = name.encode("ascii").ljust(11, b"\x00")
        d[11] = ord(ftype)
        d[16] = length
        d[17] = dec
        out += bytes(d)
    out += b"\x0d"
    for deleted, vals in records:
        rec = b"*" if deleted else b" "
        for (name, ftype, length, dec), v in zip(fields, vals):
            rec += v.encode("cp1252").ljust(length)[:length]
        out += rec
    out += b"\x1a"
    with open(path, "wb") as fh:
        fh.write(out)


FIELDS = [
    ("insee", "C", 5, 0),
    ("libelle", "C", 20, 0),
    ("pop", "N", 8, 0),
    ("area", "N", 8, 2),
    ("created", "D", 8, 0),
    ("active", "L", 1, 0),
]


def test_read_dbf_types_and_rows(spark, tmp_path):
    p = str(tmp_path / "commune.dbf")
    _make_dbf(
        p,
        FIELDS,
        [
            (False, ["01001", "Abergement", "776", "15.95", "20230101", "T"]),
            (False, ["2A004", "Ajaccio", "71361", "82.03", "20230101", "F"]),
            (True, ["99999", "Deleted", "1", "1.00", "20230101", "T"]),
            (False, ["97411", "Saint-Denis", "", "", "", " "]),
        ],
    )
    df = read_dbf(spark, p)
    assert df.columns == ["insee", "libelle", "pop", "area", "created", "active"]
    types = dict(df.dtypes)
    assert types == {
        "insee": "string",
        "libelle": "string",
        "pop": "bigint",
        "area": "double",
        "created": "date",
        "active": "boolean",
    }
    rows = {r.insee: r for r in df.collect()}
    assert set(rows) == {"01001", "2A004", "97411"}  # deleted row skipped
    assert rows["01001"].pop == 776
    assert rows["2A004"].area == 82.03
    assert rows["01001"].created == dt.date(2023, 1, 1)
    assert rows["2A004"].active is False
    # blanks → NULL
    assert rows["97411"].pop is None and rows["97411"].created is None


def test_read_dbf_enrichment_join(spark, tmp_path):
    """The reference's intended use: commune-code → name broadcast join."""
    p = str(tmp_path / "c.dbf")
    _make_dbf(
        p,
        [("code", "C", 2, 0), ("name", "C", 10, 0)],
        [(False, ["01", "Ain"]), (False, ["02", "Aisne"])],
    )
    dim = read_dbf(spark, p)
    facts = spark.createDataFrame([("01", 5), ("02", 7), ("01", 1)], "code string, v int")
    from pyspark.sql import functions as F

    out = facts.join(F.broadcast(dim), "code").groupBy("name").sum("v").collect()
    assert {r["name"]: r["sum(v)"] for r in out} == {"Ain": 6, "Aisne": 7}


def test_read_dbf_rejects_garbage(spark, tmp_path):
    p = tmp_path / "bad.dbf"
    p.write_bytes(b"\x03short")
    with pytest.raises(ValueError, match="truncated"):
        read_dbf(spark, str(p))
