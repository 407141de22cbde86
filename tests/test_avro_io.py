"""Stdlib Avro container I/O (operators/avro_io.py): schema-driven
round-trips over the Iceberg-relevant subset, both codecs, and honest
rejection outside the envelope."""

from __future__ import annotations

import os

import pytest

from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro, write_avro

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"], "default": None},
        {
            "name": "c",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "x", "type": "int"},
                    {"name": "m", "type": {"type": "map", "values": "string"}},
                ],
            },
        },
        {"name": "d", "type": {"type": "array", "items": "long"}},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": "double"},
        {"name": "g", "type": "bytes"},
    ],
}

RECORDS = [
    {
        "a": -(2**40) - 7,
        "b": None,
        "c": {"x": 7, "m": {"k": "v", "k2": "v2"}},
        "d": [1, -2, 3],
        "e": True,
        "f": 3.5,
        "g": b"\x00\xff\x10",
    },
    {
        "a": 0,
        "b": "héllo",
        "c": {"x": -1, "m": {}},
        "d": [],
        "e": False,
        "f": -0.25,
        "g": b"",
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro(p, SCHEMA, RECORDS, codec=codec)
    schema, records = read_avro(p)
    assert schema == SCHEMA
    assert records == RECORDS


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro(p1, SCHEMA, RECORDS)
    write_avro(p2, SCHEMA, RECORDS)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_zigzag_longs_boundaries(tmp_path):
    schema = {"type": "record", "name": "z", "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, -2, 63, 64, -64, -65, 2**62, -(2**62)]
    p = str(tmp_path / "z.avro")
    write_avro(p, schema, [{"v": v} for v in vals])
    _, recs = read_avro(p)
    assert [r["v"] for r in recs] == vals


def test_union_default_when_field_missing(tmp_path):
    schema = {
        "type": "record",
        "name": "u",
        "fields": [{"name": "o", "type": ["null", "long"], "default": None}],
    }
    p = str(tmp_path / "u.avro")
    write_avro(p, schema, [{}, {"o": 5}])
    _, recs = read_avro(p)
    assert recs == [{"o": None}, {"o": 5}]


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.avro")
    open(p, "wb").write(b"nope" + b"\x00" * 40)
    with pytest.raises(ValueError, match="object container"):
        read_avro(p)


def test_unsupported_type_rejected(tmp_path):
    schema = {
        "type": "record",
        "name": "f",
        "fields": [{"name": "x", "type": {"type": "fixed", "name": "s", "size": 4}}],
    }
    with pytest.raises(NotImplementedError):
        write_avro(str(tmp_path / "f.avro"), schema, [{"x": b"abcd"}])


def test_sync_corruption_detected(tmp_path):
    p = str(tmp_path / "s.avro")
    write_avro(p, SCHEMA, RECORDS, codec="null")
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # trailing sync marker byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync"):
        read_avro(p)
