"""`expire_iceberg_snapshots` — Iceberg expire_snapshots for metadata
trees on disk: retention rules (current / refs / keep_last protected),
reachability GC (MoR shared manifests survive), and the
outside-the-root safety fence.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
    read_iceberg_table,
)
from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
    expire_iceberg_snapshots,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

from tests.test_iceberg_schema_evolution import _schema, _tree, _write_pa

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow


def _meta(root):
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        return json.load(fh), n


def test_expire_rewrite_history_gc(spark, tmp_path):
    """v1 full-rewrite history: the expired snapshot's manifest list,
    manifest and data files are deleted; the head read is unchanged;
    time travel to the expired snapshot fails loudly."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    b = spark.createDataFrame([(3, "c")], "k INT, v STRING")
    t.write(a, committed_at_ms=1)
    t.write(b, committed_at_ms=2)
    export_iceberg_metadata(t, format_version=1)
    md0, n0 = _meta(t.root)
    snap1 = next(s for s in md0["snapshots"] if s["snapshot-id"] == 1)
    from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro

    _, rows1 = read_avro(snap1["manifest-list"])
    old_data = [
        e["data_file"]["file_path"]
        for r in rows1
        for e in read_avro(r["manifest_path"])[1]
    ]
    assert old_data and all(os.path.isfile(p) for p in old_data)

    assert expire_iceberg_snapshots(t.root) == [1]
    md, n = _meta(t.root)
    assert n == n0 + 1
    assert [s["snapshot-id"] for s in md["snapshots"]] == [2]
    assert [e["snapshot-id"] for e in md["snapshot-log"]] == [2]
    assert not os.path.exists(snap1["manifest-list"])
    assert all(not os.path.exists(p) for p in old_data)
    got = read_iceberg_table(spark, t.root)
    assert [(r["k"], r["v"]) for r in got.collect()] == [(3, "c")]
    with pytest.raises(ValueError, match="snapshot 1 not found"):
        read_iceberg_table(spark, t.root, snapshot_id=1)


def test_expire_mor_shared_tree_survives(spark, tmp_path):
    """v2 MoR history (overwrite + two pure deletes): every data and
    delete file of the expired snapshots is still reachable from the
    head (manifest reuse), so GC deletes only the expired snapshots'
    manifest LISTS — and the head read is value-identical."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    t.write(ev, committed_at_ms=1)
    t.write(ev.filter(F.col("k") % 6 != 0), committed_at_ms=2)
    t.write(
        ev.filter((F.col("k") % 6 != 0) & (F.col("k") % 10 != 0)),
        committed_at_ms=3,
    )
    export_iceberg_metadata(t, format_version=2)
    md0, _ = _meta(t.root)
    before = read_iceberg_table(spark, t.root)
    want = sorted(r["k"] for r in before.collect())

    assert expire_iceberg_snapshots(t.root, keep_last=1) == [1, 2]
    md, _ = _meta(t.root)
    assert [s["snapshot-id"] for s in md["snapshots"]] == [3]
    # shared manifests + data + delete files all survive
    from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro

    head = next(s for s in md["snapshots"] if s["snapshot-id"] == 3)
    _, rows = read_avro(head["manifest-list"])
    for r in rows:
        assert os.path.isfile(r["manifest_path"])
        for e in read_avro(r["manifest_path"])[1]:
            assert os.path.isfile(e["data_file"]["file_path"])
    got = sorted(
        r["k"] for r in read_iceberg_table(spark, t.root).collect()
    )
    assert got == want


def test_expire_ref_and_keep_last_protection(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.write(
            spark.createDataFrame([(i,)], "k INT"), committed_at_ms=i + 1
        )
    export_iceberg_metadata(t, format_version=2)
    # pin a tag at snapshot 1 (hand-edit, as an external catalog would)
    meta_dir = os.path.join(t.root, "metadata")
    md, n = _meta(t.root)
    md["refs"]["pinned"] = {"snapshot-id": 1, "type": "tag"}
    with open(os.path.join(meta_dir, f"v{n}.metadata.json"), "w") as fh:
        json.dump(md, fh)
    assert expire_iceberg_snapshots(t.root, keep_last=1) == [2]
    md2, _ = _meta(t.root)
    assert [s["snapshot-id"] for s in md2["snapshots"]] == [1, 3]
    # both protected snapshots still read
    assert read_iceberg_table(spark, t.root, snapshot_id=1).count() == 1
    assert read_iceberg_table(spark, t.root, ref="pinned").count() == 1


def test_expire_older_than_cutoff(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.write(
            spark.createDataFrame([(i,)], "k INT"), committed_at_ms=i + 1
        )
    export_iceberg_metadata(t, format_version=2)
    assert expire_iceberg_snapshots(t.root, older_than_ms=2) == [1]
    md, _ = _meta(t.root)
    assert [s["snapshot-id"] for s in md["snapshots"]] == [2, 3]


def test_expire_nothing_to_do_is_noop(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1,)], "k INT"), committed_at_ms=1)
    export_iceberg_metadata(t, format_version=2)
    _, n0 = _meta(t.root)
    assert expire_iceberg_snapshots(t.root) == []
    _, n1 = _meta(t.root)
    assert n1 == n0  # no new metadata version written


def test_expire_never_deletes_outside_root(spark, tmp_path):
    """An add_files-style tree referencing data OUTSIDE the table root:
    expiring must drop the snapshot but leave the external file alone."""
    ext = _write_pa(
        str(tmp_path / "elsewhere" / "x.parquet"), {"id": [1, 2]}
    )
    root = str(tmp_path / "t")
    own = _write_pa(os.path.join(root, "data", "y.parquet"), {"id": [3]})
    _tree(
        root,
        [_schema(0, (1, "id", "long"))],
        0,
        [(1, 0, [(ext, 2)]), (2, 0, [(own, 1)])],
    )
    assert expire_iceberg_snapshots(root) == [1]
    assert os.path.isfile(ext)  # outside the root: fenced off
    assert read_iceberg_table(spark, root).count() == 1


def test_expire_drops_expired_statistics(spark, tmp_path):
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_statistics,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"),
        committed_at_ms=1,
    )
    t.write(
        spark.createDataFrame([(3, "c")], "k INT, v STRING"),
        committed_at_ms=2,
    )
    export_iceberg_metadata(t, format_version=2)
    export_iceberg_statistics(t, columns=["k"])
    md0, _ = _meta(t.root)
    assert md0["statistics"] and md0["statistics"][0]["snapshot-id"] == 2
    stats_path = md0["statistics"][0]["statistics-path"]
    # stats ride on the CURRENT snapshot, which is protected — they
    # survive an expire of older snapshots
    expire_iceberg_snapshots(t.root)
    md, _ = _meta(t.root)
    assert md["statistics"] == md0["statistics"]
    assert os.path.isfile(stats_path)


def test_per_ref_retention_fields(spark, tmp_path):
    """Spec snapshot-reference retention (round 11): max-ref-age-ms
    removes an aged tag (its snapshot then expires); a branch's
    min-snapshots-to-keep / max-snapshot-age-ms protect its ANCESTOR
    CHAIN, not just its head; fields arrive through the REST commit's
    set-snapshot-ref update. Deterministic via as_of_ms."""
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )
    from test_iceberg_meta import load_metadata
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        expire_iceberg_snapshots,
    )
    from hybrid_data_lakehouse_lab_spark.operators.rest_catalog import (
        IcebergRestCatalog,
        rest_commit_table,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    # four commits, 1000 ms apart
    for v in range(1, 5):
        t.write(
            spark.range(v * 10).selectExpr("id"),
            committed_at_ms=v * 1000,
        )
    export_iceberg_metadata(t, format_version=2)
    with IcebergRestCatalog({("ns", "t"): t.root}) as uri:
        url = f"{uri}/v1/namespaces/ns/tables/t"
        # an aged tag on snapshot 1, a retention-carrying branch on 4
        rest_commit_table(
            url,
            updates=[
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "old-tag",
                    "snapshot-id": 1,
                    "type": "tag",
                    "max-ref-age-ms": 500,
                },
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "dev",
                    "snapshot-id": 4,
                    "type": "branch",
                    "min-snapshots-to-keep": 2,
                    "max-snapshot-age-ms": 1500,
                },
            ],
        )
    md = load_metadata(t.root)
    assert md["refs"]["old-tag"]["max-ref-age-ms"] == 500
    assert md["refs"]["dev"]["min-snapshots-to-keep"] == 2
    # at t=5000: old-tag (snapshot ts 1000) is 4000 ms old -> removed;
    # dev protects head 4 + ancestor 3 (min 2 to keep; snapshot 2 at
    # ts 2000 is 3000 ms old > 1500, so age protects nothing extra);
    # snapshot 1 and 2 expire (keep_last=1 protects only the newest)
    expired = expire_iceberg_snapshots(
        t.root, older_than_ms=10_000, keep_last=1, as_of_ms=5000
    )
    assert expired == [1, 2]
    md2 = load_metadata(t.root)
    assert "old-tag" not in md2["refs"]
    assert sorted(s["snapshot-id"] for s in md2["snapshots"]) == [3, 4]
    # surviving snapshots still read
    assert read_iceberg_table(spark, t.root, snapshot_id=3).count() == 30
    assert read_iceberg_table(spark, t.root, snapshot_id=4).count() == 40


def test_ref_removal_commits_even_when_nothing_expires(spark, tmp_path):
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
    )
    from test_iceberg_meta import load_metadata
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        expire_iceberg_snapshots,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.range(3).selectExpr("id"), committed_at_ms=1000)
    export_iceberg_metadata(t, format_version=2)
    md_path = t.root + "/metadata"
    import json
    import os

    n = int(open(os.path.join(md_path, "version-hint.text")).read())
    mp = os.path.join(md_path, f"v{n}.metadata.json")
    md = json.load(open(mp))
    md["refs"]["stale"] = {
        "snapshot-id": 1,
        "type": "tag",
        "max-ref-age-ms": 10,
    }
    json.dump(md, open(mp, "w"))
    expired = expire_iceberg_snapshots(t.root, as_of_ms=99_999)
    assert expired == []  # snapshot 1 is current: protected
    md2 = load_metadata(t.root)
    assert "stale" not in md2["refs"]  # but the aged tag is GONE
    assert md2["snapshots"]  # and the table still reads
