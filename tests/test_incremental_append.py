"""Incremental-append snapshot export (round-9 item 2).

Before this round every v1 export snapshot was a full rewrite with all
files status=ADDED — metadata per commit was O(table files). Now a
pure-append transition (child ⊇ masked parent as a multiset, detected
by `mor_diff._append_diff`) reuses the parent's manifests verbatim and
adds ONE delta manifest with only the appended files, in every format
version including v1 — an N-commit append history's metadata tree
grows O(N + total delta files). Appends compose with the v2/v3
merge-on-read delete dialects (delete files / DVs may reference
append-delta files) and with partitioned layouts (delta files are
partition-scoped under the base spec).
"""

from __future__ import annotations

import os
import re

import pytest

from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
    read_iceberg_table,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

from test_iceberg_meta import load_metadata, read_avro_file

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _batch(spark, lo, n):
    return spark.range(lo, lo + n).selectExpr(
        "id", "id * 2 AS v", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS region"
    )


def test_v1_append_chain_metadata_is_incremental(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "ap1"))
    t.write(_batch(spark, 0, 10), committed_at_ms=1000)
    for k in range(1, 4):  # three append commits of 5 rows each
        t.write(
            _batch(spark, 0, 10 + 5 * k), committed_at_ms=1000 * (k + 1)
        )
    export_iceberg_metadata(t, format_version=1)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "append", "append", "append",
    ]
    # snapshot k's manifest list: the k-1 prior manifests VERBATIM plus
    # one -app delta manifest
    lists = []
    for snap in md["snapshots"]:
        _, rows = read_avro_file(snap["manifest-list"])
        lists.append([r["manifest_path"] for r in rows])
    for k in range(1, 4):
        assert lists[k][:-1] == lists[k - 1], k  # parent manifests reused
        assert lists[k][-1].endswith(f"-app.avro"), k
    # each delta manifest holds ONLY the appended rows' files
    for k in range(1, 4):
        _, entries = read_avro_file(lists[k][-1])
        assert sum(e["data_file"]["record_count"] for e in entries) == 5
        assert all(
            "/appends/" in e["data_file"]["file_path"] for e in entries
        )
    # O(N + delta files): exactly N manifest files exist on disk
    meta_dir = os.path.join(t.root, "metadata")
    manifests = [
        f for f in os.listdir(meta_dir)
        if re.match(r"^m-\d+(-app)?\.avro$", f)
    ]
    assert len(manifests) == 4
    # every snapshot value-matches the engine's own read
    for sid, version in ((1, 1), (2, 2), (3, 3), (4, 4)):
        got = _ids(read_iceberg_table(spark, t.root, snapshot_id=sid))
        assert got == _ids(t.read(version=version)), sid


def test_v2_append_then_delete_hits_delta_files(spark, tmp_path):
    """v2: append rides manifest reuse; a later pure delete removes
    rows from BOTH the base and the append-delta files (position
    deletes reference appends/ paths)."""
    t = SnapshotTable(spark, str(tmp_path / "ap2"))
    t.write(_batch(spark, 0, 20), committed_at_ms=1000)
    t.write(_batch(spark, 0, 30), committed_at_ms=2000)  # append 20..29
    t.write(
        _batch(spark, 0, 30).filter("id NOT IN (5, 25)"),
        committed_at_ms=3000,
    )
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "append", "delete",
    ]
    # the delete snapshot reuses data manifests (incl. the -app one)
    _, rows3 = read_avro_file(md["snapshots"][2]["manifest-list"])
    kinds = [(r["content"], os.path.basename(r["manifest_path"])) for r in rows3]
    assert [c for c, _ in kinds] == [0, 0, 1]
    assert kinds[1][1].endswith("-app.avro")
    # delete files reference an appends/ data file (id=25 lives there)
    _, del_entries = read_avro_file(rows3[2]["manifest_path"])
    import pyarrow.parquet as pq

    targets = set()
    for e in del_entries:
        tbl = pq.read_table(e["data_file"]["file_path"])
        targets.update(tbl.column("file_path").to_pylist())
    assert any("/appends/" in p for p in targets)
    assert any("/appends/" not in p for p in targets)
    for sid, version in ((1, 1), (2, 2), (3, 3)):
        got = _ids(read_iceberg_table(spark, t.root, snapshot_id=sid))
        assert got == _ids(t.read(version=version)), sid


def test_v3_append_dv_and_row_lineage(spark, tmp_path):
    """v3: append advances row lineage by exactly the delta, and a
    later delete emits DVs that may reference append-delta files."""
    t = SnapshotTable(spark, str(tmp_path / "ap3"))
    t.write(_batch(spark, 0, 12), committed_at_ms=1000)
    t.write(_batch(spark, 0, 18), committed_at_ms=2000)  # append 12..17
    t.write(
        _batch(spark, 0, 18).filter("id NOT IN (2, 15)"),
        committed_at_ms=3000,
    )
    export_iceberg_metadata(t, format_version=3)
    md = load_metadata(t.root)
    assert md["next-row-id"] == 18  # 12 + 6, deletes add no lineage
    s1, s2, s3 = md["snapshots"]
    assert (s1["first-row-id"], s1["added-rows"]) == (0, 12)
    assert (s2["first-row-id"], s2["added-rows"]) == (12, 6)
    assert (s3["first-row-id"], s3["added-rows"]) == (18, 0)
    # the delete manifest's DVs reference an appends/ file (id=15)
    _, rows3 = read_avro_file(s3["manifest-list"])
    (del_row,) = [r for r in rows3 if r["content"] == 1]
    _, del_entries = read_avro_file(del_row["manifest_path"])
    refs = [e["data_file"]["referenced_data_file"] for e in del_entries]
    assert any("/appends/" in r for r in refs)
    for sid, version in ((1, 1), (2, 2), (3, 3)):
        got = _ids(read_iceberg_table(spark, t.root, snapshot_id=sid))
        assert got == _ids(t.read(version=version)), sid


def test_partitioned_append_is_partition_scoped(spark, tmp_path):
    """Identity-partitioned base: append-delta files are written
    partitionBy the base layout and their entries carry typed partition
    values; the reader reattaches region for delta files too."""
    t = SnapshotTable(spark, str(tmp_path / "app"))
    t.write(_batch(spark, 0, 10), partition_by=["region"], committed_at_ms=1000)
    t.write(_batch(spark, 0, 16), partition_by=["region"], committed_at_ms=2000)
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "append",
    ]
    _, rows2 = read_avro_file(md["snapshots"][1]["manifest-list"])
    assert [r["partition_spec_id"] for r in rows2] == [0, 0]
    _, entries = read_avro_file(rows2[1]["manifest_path"])
    parts = {e["data_file"]["partition"]["region"] for e in entries}
    assert parts == {"a", "b"}
    assert all("region=" in e["data_file"]["file_path"] for e in entries)
    got = sorted(
        (r["id"], r["region"])
        for r in read_iceberg_table(spark, t.root).collect()
    )
    want = sorted(
        (r["id"], r["region"])
        for r in t.read().select("id", "region").collect()
    )
    assert got == want


def test_hidden_partition_append(spark, tmp_path):
    """days(ts) hidden partitioning: the delta rides the base spec with
    typed epoch-day values and the read stays hidden (no dt column)."""
    from pyspark.sql import functions as F

    def mk(n):
        return (
            spark.range(n)
            .selectExpr(
                "id",
                "timestamp'2024-01-01 06:00:00' + make_interval(0,0,0,CAST(id%2 AS INT),0,0,0) AS ts",
            )
            .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        )

    t = SnapshotTable(spark, str(tmp_path / "hap"))
    t.write(mk(10), partition_by=["dt"], committed_at_ms=1000)
    t.write(mk(14), partition_by=["dt"], committed_at_ms=2000)
    export_iceberg_metadata(
        t, format_version=2, hidden_partitions={"dt": ("ts", "day")}
    )
    md = load_metadata(t.root)
    assert md["snapshots"][1]["summary"]["operation"] == "append"
    _, rows2 = read_avro_file(md["snapshots"][1]["manifest-list"])
    _, entries = read_avro_file(rows2[1]["manifest_path"])
    assert {e["data_file"]["partition"]["dt"] for e in entries} <= {19723, 19724}
    got = read_iceberg_table(spark, t.root)
    assert got.columns == ["id", "ts"]
    assert _ids(got) == list(range(14))
    # hidden-transform pruning applies to delta files as well
    jan1 = read_iceberg_table(
        spark, t.root, prune=[("ts", "<", "2024-01-02T00:00:00")]
    )
    assert set(_ids(jan1)) >= {0, 2, 4}  # even ids are 2024-01-01
    assert all(i % 2 == 0 for i in _ids(jan1))


def test_append_reexport_converges_and_extends(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "idem"))
    t.write(_batch(spark, 0, 10), committed_at_ms=1000)
    t.write(_batch(spark, 0, 15), committed_at_ms=2000)
    export_iceberg_metadata(t, format_version=2)
    first = sorted(os.listdir(os.path.join(t.root, "appends", "s00002")))
    export_iceberg_metadata(t, format_version=2)
    assert sorted(os.listdir(os.path.join(t.root, "appends", "s00002"))) == first
    t.write(_batch(spark, 0, 21), committed_at_ms=3000)
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "append", "append",
    ]
    assert _ids(read_iceberg_table(spark, t.root)) == list(range(21))


def test_modified_rows_still_rewrite(spark, tmp_path):
    """A transition that grows the row count but also CHANGES existing
    rows is not append-expressible: falls back to the full rewrite
    (and resets the append chain + GCs its delta dirs)."""
    t = SnapshotTable(spark, str(tmp_path / "rw"))
    t.write(_batch(spark, 0, 10), committed_at_ms=1000)
    t.write(_batch(spark, 0, 15), committed_at_ms=2000)  # append
    t.write(_batch(spark, 5, 20), committed_at_ms=3000)  # shifted: rewrite
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "append", "overwrite",
    ]
    _, rows3 = read_avro_file(md["snapshots"][2]["manifest-list"])
    assert len(rows3) == 1  # fresh base, no manifest reuse
    for sid, version in ((1, 1), (2, 2), (3, 3)):
        got = _ids(read_iceberg_table(spark, t.root, snapshot_id=sid))
        assert got == _ids(t.read(version=version)), sid


def test_append_dirs_gc_when_history_shrinks(spark, tmp_path):
    """Vacuuming past an append chain leaves its delta dirs
    unreferenced — the export GC removes them."""
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        vacuum_snapshots,
    )

    t = SnapshotTable(spark, str(tmp_path / "gc"))
    t.write(_batch(spark, 0, 10), committed_at_ms=1000)
    t.write(_batch(spark, 0, 15), committed_at_ms=2000)  # append
    t.write(_batch(spark, 100, 10), committed_at_ms=3000)  # rewrite
    export_iceberg_metadata(t, format_version=2)
    assert os.path.isdir(os.path.join(t.root, "appends", "s00002"))
    vacuum_snapshots(t, older_than_ms=4000, keep_last=1)
    export_iceberg_metadata(t, format_version=2)
    assert not os.path.isdir(os.path.join(t.root, "appends"))
    assert _ids(read_iceberg_table(spark, t.root)) == list(range(100, 110))
