"""Minimal Apache Avro 1.x object-container I/O in pure stdlib.

Iceberg's manifest and manifest-list files are Avro — the one piece of
the Iceberg spec this environment has no library for (fastavro and
DuckDB's avro extension are absent, pip is network-blocked). Baseline
Avro needs none of that: the container format is `Obj\\x01`, a string→
bytes metadata map carrying the writer schema JSON and codec, a 16-byte
sync marker, then blocks of (record-count, byte-length, records, sync);
records are schema-driven with zigzag-varint longs, length-prefixed
strings/bytes, union-branch indexes, and in-order record fields.

Supported schema subset (everything Iceberg v1 metadata needs):
records, unions of ["null", X], arrays, maps, and the primitives
null/boolean/int/long/float/double/string/bytes. Fixed/enum/recursive
types raise NotImplementedError. Codec: null (uncompressed) or deflate
(stdlib zlib, raw stream) — both ends.

Verified in tests/test_iceberg_meta.py by an INDEPENDENT from-scratch
Avro parse (the test re-implements varint/container reading without
importing this module), the same exporter-vs-test-replay independence
contract the Delta interop uses (operators/delta_log.py).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)


def _write_varint(out: io.BytesIO, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _write_long(out: io.BytesIO, n: int) -> None:
    _write_varint(out, _zigzag(int(n)))


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write_datum(out: io.BytesIO, schema, value) -> None:
    if isinstance(schema, list):  # union — Iceberg only uses [null, X]
        if value is None:
            idx = next(i for i, s in enumerate(schema) if s == "null")
            _write_long(out, idx)
            return
        idx, branch = next(
            (i, s) for i, s in enumerate(schema) if s != "null"
        )
        _write_long(out, idx)
        _write_datum(out, branch, value)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" in f:
                    _write_datum(out, f["type"], f["default"])
                else:
                    _write_datum(out, f["type"], value[f["name"]])
            return
        if t == "array":
            items = list(value)
            if items:
                _write_long(out, len(items))
                for it in items:
                    _write_datum(out, schema["items"], it)
            _write_long(out, 0)
            return
        if t == "map":
            entries = dict(value)
            if entries:
                _write_long(out, len(entries))
                for k, v in entries.items():
                    _write_bytes(out, k.encode())
                    _write_datum(out, schema["values"], v)
            _write_long(out, 0)
            return
        # logical types ride their base primitive (e.g. date → int)
        return _write_datum(out, t, value)
    if schema in ("long", "int"):
        return _write_long(out, value)
    if schema == "string":
        return _write_bytes(out, str(value).encode())
    if schema == "bytes":
        return _write_bytes(out, bytes(value))
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if schema == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if schema == "null":
        return
    raise NotImplementedError(f"avro type {schema!r} is not supported here")


def write_avro(path: str, schema: dict, records: list[dict], codec: str = "deflate") -> None:
    """Write one Avro object-container file (single block; Iceberg
    manifests for a snapshot are small — the format's own answer to
    huge tables is MANY manifest files, which is how the exporter
    scales, not one giant block)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    body = io.BytesIO()
    for r in records:
        _write_datum(body, schema, r)
    payload = body.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload, 6)[2:-4]  # raw deflate per spec
    sync = bytes((i * 73 + 41) % 256 for i in range(16))  # deterministic
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    _write_long(out, len(records))
    _write_bytes(out, payload)
    out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated avro data")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _read_datum(r: _Reader, schema):
    if isinstance(schema, list):
        return _read_datum(r, schema[r.read_long()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _read_datum(r, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:  # block with byte-size prefix
                    r.read_long()
                    n = -n
                out.extend(_read_datum(r, schema["items"]) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    r.read_long()
                    n = -n
                for _ in range(n):
                    k = r.read_bytes().decode()
                    out[k] = _read_datum(r, schema["values"])
            return out
        return _read_datum(r, t)
    if schema in ("long", "int"):
        return r.read_long()
    if schema == "string":
        return r.read_bytes().decode()
    if schema == "bytes":
        return r.read_bytes()
    if schema == "boolean":
        return r.read(1) == b"\x01"
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "null":
        return None
    raise NotImplementedError(f"avro type {schema!r} is not supported here")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object-container file → (writer schema, records).
    Handles null/deflate codecs and multi-block files (any conforming
    writer, not just ours)."""
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    if r.read(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro object container")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read_bytes().decode()
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.data):
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(_read_datum(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records
