"""Theta NDV sketches + Iceberg table statistics (round 8).

The strongest verification tier in the repo: datasketches-java 6.2.0
sits on Spark's classpath, so these tests validate the from-scratch
implementation against the REAL Apache DataSketches library —
byte-identical serialization in exact mode, mutual readability in
estimation mode — plus the public smhasher VerificationTest vector for
MurmurHash3 x64_128 (no JVM needed for that one).
"""

from __future__ import annotations

import json
import os
import struct

import pytest

from hybrid_data_lakehouse_lab_spark.operators import theta as T
from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
    export_iceberg_statistics,
    read_iceberg_statistics,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow


def test_murmur3_x64_128_smhasher_verification():
    """The smhasher VerificationTest: hash keys [0..i) with seed 256-i
    for i in 0..255, hash the concatenated outputs with seed 0; the low
    32 bits must be 0x6384BA69 — the published verification value for
    MurmurHash3_x64_128."""
    hashes = b""
    for i in range(256):
        h1, h2 = T.murmur3_x64_128(bytes(range(i)), 256 - i)
        hashes += struct.pack("<QQ", h1, h2)
    f1, _ = T.murmur3_x64_128(hashes, 0)
    assert f1 & 0xFFFFFFFF == 0x6384BA69


def test_murmur_matches_datasketches_java(spark):
    """Byte[] and long hashing agree with the real library for every
    tail length and the theta seed."""
    MH = spark._jvm.org.apache.datasketches.hash.MurmurHash3
    mask = (1 << 64) - 1
    for n in range(1, 40):
        key = bytes((i * 131 + n) & 0xFF for i in range(n))
        out = MH.hash(bytearray(key), 9001)
        assert (out[0] & mask, out[1] & mask) == T.murmur3_x64_128(key, 9001), n
    for v in (0, 1, -1, 12345, -(2**62), 2**62):
        out = MH.hash(v, 9001)
        assert (out[0] & mask, out[1] & mask) == T.murmur3_x64_128(
            T.key_bytes(v), 9001
        ), v


def _lib_bytes(spark, values, k=4096):
    US = spark._jvm.org.apache.datasketches.theta.UpdateSketch
    sk = US.builder().setNominalEntries(k).build()
    for v in values:
        sk.update(v)
    return bytes([b & 0xFF for b in sk.compact(True, None).toByteArray()])


def _mine_bytes(values, k=4096):
    return T.serialize_compact(
        T.build_from_hashes((T.theta_hash(v) for v in values), k=k)
    )


def test_compact_sketch_byte_identical_exact_mode(spark):
    """Empty, single-item, small and string sketches serialize to the
    EXACT bytes datasketches-java produces."""
    for values in ([], [42], [1, 2], list(range(100)), [f"d{i}" for i in range(300)]):
        assert _lib_bytes(spark, values) == _mine_bytes(values), values[:3]


def test_estimation_mode_mutual_readability(spark):
    """Estimation mode: the library heapifies OUR sketch and reports
    our estimate; we read THEIR sketch; both estimates land within the
    theta error bound of the truth."""
    jvm = spark._jvm
    Mem = jvm.org.apache.datasketches.memory.Memory
    CS = jvm.org.apache.datasketches.theta.CompactSketch
    n, k = 50_000, 4096
    values = [f"v{i}" for i in range(n)]
    mine = _mine_bytes(values, k)
    cs = CS.heapify(Mem.wrap(bytearray(mine)))
    my_est = T.estimate(T.deserialize_compact(mine))
    assert abs(cs.getEstimate() - my_est) < 1e-6
    assert cs.getRetainedEntries() == k
    bound = 5.0 / (k**0.5)  # 5 RSE
    assert abs(my_est - n) / n < bound
    theirs = _lib_bytes(spark, values, k)
    their_est = T.estimate(T.deserialize_compact(theirs))
    assert abs(their_est - n) / n < bound


def test_sketch_refusals():
    sk = T.build_from_hashes([T.theta_hash(i) for i in range(10)])
    buf = bytearray(T.serialize_compact(sk))
    buf[1] = 2  # serial version
    with pytest.raises(NotImplementedError, match="serial version"):
        T.deserialize_compact(bytes(buf))
    buf[1] = 3
    buf[2] = 2  # family
    with pytest.raises(ValueError, match="family"):
        T.deserialize_compact(bytes(buf))
    buf[2] = 3
    buf[6] ^= 0xFF  # seed hash
    with pytest.raises(ValueError, match="seed hash"):
        T.deserialize_compact(bytes(buf))
    with pytest.raises(TypeError):
        T.key_bytes(1.5)


def test_iceberg_statistics_roundtrip(spark, tmp_path):
    """Statistics Puffin + metadata `statistics` field over a
    MERGE-ON-READ table: NDVs reflect the masked live rows; the real
    library heapifies every exported blob; exact-mode columns are
    exact and the estimation column lands within 5 RSE."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(20_000).selectExpr(
        "id", "CAST(id % 37 AS STRING) AS cat", "id % 5 AS g"
    )
    t.write(df, committed_at_ms=1000)
    t.write(df.filter("id % 4 != 0"), committed_at_ms=2000)
    export_iceberg_metadata(t, format_version=2)
    est = export_iceberg_statistics(t)
    got = read_iceberg_statistics(spark, t.root)
    assert got["cat"]["estimate"] == 37.0  # exact mode == exact
    assert got["g"]["estimate"] == 5.0
    assert abs(got["id"]["estimate"] - 15_000) / 15_000 < 5.0 / (4096**0.5)
    assert set(est) == {"id", "cat", "g"}
    md = json.load(open(os.path.join(t.root, "metadata", "v2.metadata.json")))
    (st,) = md["statistics"]
    assert st["snapshot-id"] == md["current-snapshot-id"]
    assert os.path.getsize(st["statistics-path"]) == st["file-size-in-bytes"]
    jvm = spark._jvm
    Mem = jvm.org.apache.datasketches.memory.Memory
    CS = jvm.org.apache.datasketches.theta.CompactSketch
    from hybrid_data_lakehouse_lab_spark.operators.puffin import read_blob

    for bm in st["blob-metadata"]:
        assert bm["type"] == "apache-datasketches-theta-v1"
        blob = read_blob(st["statistics-path"], bm["offset"], bm["length"])
        cs = CS.heapify(Mem.wrap(bytearray(blob)))
        (fid,) = bm["fields"]
        name = {1: "id", 2: "cat", 3: "g"}[fid]
        assert abs(cs.getEstimate() - got[name]["estimate"]) < 1e-6
        assert int(bm["properties"]["ndv"]) == got[name]["ndv"]


def test_statistics_unsupported_column_type(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "u"))
    t.write(
        spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v"),
        committed_at_ms=1000,
    )
    export_iceberg_metadata(t, format_version=2)
    with pytest.raises(NotImplementedError, match="long/int/string"):
        export_iceberg_statistics(t, columns=["v"])
    # default column selection simply skips the double column
    assert set(export_iceberg_statistics(t)) == {"id"}


def test_statistics_gc_on_reexport(spark, tmp_path):
    """Metadata regeneration drops the `statistics` field, so the stats
    Puffin must be GC'd (not orphaned); re-running the statistics
    export restores it and replaces any prior stats file."""
    import glob

    t = SnapshotTable(spark, str(tmp_path / "g"))
    t.write(spark.range(100).selectExpr("id"), committed_at_ms=1000)
    export_iceberg_metadata(t, format_version=2)
    export_iceberg_statistics(t)
    meta_dir = os.path.join(t.root, "metadata")
    assert glob.glob(os.path.join(meta_dir, "stats-*.puffin"))
    t.write(spark.range(150).selectExpr("id"), committed_at_ms=2000)
    export_iceberg_metadata(t, format_version=2)
    assert not glob.glob(os.path.join(meta_dir, "stats-*.puffin"))
    md = json.load(open(os.path.join(meta_dir, "v2.metadata.json")))
    assert "statistics" not in md
    est = export_iceberg_statistics(t)
    assert est["id"] == 150.0
    assert len(glob.glob(os.path.join(meta_dir, "stats-*.puffin"))) == 1
    assert read_iceberg_statistics(spark, t.root)["id"]["ndv"] == 150
