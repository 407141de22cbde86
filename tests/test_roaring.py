"""RoaringBitmap + Delta DV framing units (operators/roaring.py):
spec-format serialization round-trips across container types and the
64-bit array layout, DV file framing with CRC, base85 uuid paths."""

import os
import random
import struct
import uuid

import pytest

from hybrid_data_lakehouse_lab_spark.operators import roaring as R


def test_roundtrip_randomized():
    rng = random.Random(7)
    for _ in range(100):
        n = rng.choice([0, 1, 3, 100, 4095, 4096, 4097, 8000])
        vals = sorted(rng.sample(range(1 << 20), n))
        assert R.deserialize_roaring64(R.serialize_roaring64(vals)) == vals


def test_container_boundaries():
    # exactly at / past the array->bitmap switch, within one container
    for n in (4096, 4097):
        vals = list(range(n))
        assert R.deserialize_roaring64(R.serialize_roaring64(vals)) == vals
    # cross 16-bit container keys and 32-bit bitmap-array keys
    vals = [0, 65535, 65536, (1 << 32) - 1, 1 << 32, (1 << 32) + 7, (3 << 32) + 5]
    assert R.deserialize_roaring64(R.serialize_roaring64(vals)) == vals
    # dense empty-intermediate-bitmap case: keys 0 and 2, nothing at 1
    vals = [5, (2 << 32) + 9]
    buf = R.serialize_roaring64(vals)
    assert struct.unpack_from("<q", buf)[0] == 3  # dense array of 3 bitmaps
    assert R.deserialize_roaring64(buf) == vals


def test_run_container_decode():
    """The writer never emits run containers, but external DVs may:
    hand-serialize the 12347-cookie format and decode it."""
    buf = (
        struct.pack("<i", (0 << 16) | 12347)  # 1 container, run cookie
        + b"\x01"  # run flag for container 0
        + struct.pack("<HH", 0, 9)  # key 0, cardinality 10
        + struct.pack("<H", 2)  # two runs
        + struct.pack("<HH", 5, 3)  # 5..8
        + struct.pack("<HH", 100, 5)  # 100..105
    )
    vals, pos = R.deserialize_roaring32(buf)
    assert vals == [5, 6, 7, 8] + list(range(100, 106))
    assert pos == len(buf)


def test_bad_cookie_rejected():
    with pytest.raises(ValueError, match="cookie"):
        R.deserialize_roaring32(struct.pack("<i", 999))


def test_dv_file_framing(tmp_path):
    p = str(tmp_path / "dv.bin")
    blobs = [R.dv_blob([1, 2, 3]), R.dv_blob(list(range(5000)))]
    descs = R.write_dv_file(p, blobs)
    assert open(p, "rb").read(1) == b"\x01"  # format version byte
    assert R.read_dv_at(p, *descs[0]) == [1, 2, 3]
    assert R.read_dv_at(p, *descs[1]) == list(range(5000))
    # corrupt one byte inside the second blob: CRC must catch it
    data = bytearray(open(p, "rb").read())
    data[descs[1][0] + 10] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        R.read_dv_at(p, *descs[1])


def test_dv_magic_checked():
    blob = R.dv_blob([1])
    assert R.decode_dv_blob(blob) == [1]
    with pytest.raises(ValueError, match="magic"):
        R.decode_dv_blob(b"\x00\x00\x00\x00" + blob[4:])


def test_uuid_base85_path():
    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    enc = R.encode_dv_uuid(u)
    assert len(enc) == 20
    assert R.decode_dv_uuid(enc) == u
    prefix, fname = R.dv_relative_path("xy/" + enc)
    assert prefix == "xy/" and fname == f"deletion_vector_{u}.bin"
    prefix, fname = R.dv_relative_path(enc)
    assert prefix == "" and fname == f"deletion_vector_{u}.bin"


def test_z85_spec_vector_and_alphabet():
    """Pin the ZeroMQ Z85 alphabet (rfc.zeromq.org/spec/32) so the
    writer/reader pair can't drift to another base-85 variant together:
    the spec's own test vector and the Delta PROTOCOL.md example
    payload (contains '.', '[' — not in the RFC-1924 set) must decode."""
    assert (
        R.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]))
        == "HelloWorld"
    )
    # PROTOCOL.md "Deletion Vector Descriptor Schema" example:
    # pathOrInlineDv "ab^-aqEH.-t@S}K{vb[*k^" = prefix "ab" + 20-char uuid
    u = R.decode_dv_uuid("^-aqEH.-t@S}K{vb[*k^")
    assert R.encode_dv_uuid(u) == "^-aqEH.-t@S}K{vb[*k^"


def test_z85_padding_and_errors():
    import os as _os

    for n in range(17):
        data = _os.urandom(n)
        enc = R.z85_encode(data)
        assert len(enc) % 5 == 0
        assert R.z85_decode(enc, n) == data
    with pytest.raises(ValueError, match="multiple of 5"):
        R.z85_decode("abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        R.z85_decode("abcd~", 4)
    with pytest.raises(ValueError, match="overflows"):
        R.z85_decode("#####", 4)  # 84 in every digit > 2^32-1
    with pytest.raises(ValueError, match="truncate"):
        R.z85_decode(R.z85_encode(b"12345678"), 2)
