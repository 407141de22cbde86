"""Regression tests for the round-9 ADVICE findings (fixed in round 10).

1. `rewrite_iceberg_manifests` on a v3 tree using manifest-level
   first_row_id inheritance (null per-file first_row_id, the layout
   external engines write) must materialize each file's assigned
   first_row_id into the rewritten EXISTING entries — the spec requires
   EXISTING entries to carry it explicitly, and readers only inherit
   for status==ADDED, so `_row_id` would silently go null.
2. Cross-facade GC safety: `expire_iceberg_snapshots` and
   `vacuum_delta_table` on a dual-export (UniForm-style) root must not
   delete data files a sibling facade still references.
3. Name-mapping construction: rename-back histories dedupe aliases and
   stale rename mappings fall through to fresh ids
   (tests/test_iceberg_schema_evolution.py carries those two).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from hybrid_data_lakehouse_lab_spark.operators.avro_io import read_avro, write_avro
from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    _entry_schema,
    _manifest_list_schema,
    read_iceberg_table,
)
from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
    rewrite_iceberg_manifests,
)


def _mk_inherited_v3_tree(tmp_path):
    """Two data manifests, each with two files whose entries carry NULL
    per-file first_row_id — lineage comes from the manifests'
    first_row_id (0 and 20) + record-count running sums, the external
    manifest-level inheritance layout."""
    root = str(tmp_path / "ext")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    paths = []
    for i in range(4):
        p = os.path.join(root, f"f{i}.parquet")
        pq.write_table(
            pa.table({"id": list(range(i * 10, i * 10 + 10))}), p
        )
        paths.append(p)
    es = _entry_schema([], 3)
    manifests = []
    for m, pair in enumerate((paths[:2], paths[2:])):
        mp = os.path.join(meta_dir, f"m-{m}.avro")
        write_avro(
            mp,
            es,
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "data_sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 10,
                        "file_size_in_bytes": os.path.getsize(p),
                        # first_row_id deliberately ABSENT: inherited
                    },
                }
                for p in pair
            ],
        )
        manifests.append(mp)
    mlist = os.path.join(meta_dir, "snap-2-1-manifest-list.avro")
    write_avro(
        mlist,
        _manifest_list_schema(3),
        [
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": m + 1,
                "min_sequence_number": m + 1,
                "added_snapshot_id": m + 1,
                "added_files_count": 2,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 20,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "first_row_id": m * 20,
            }
            for m, mp in enumerate(manifests)
        ],
    )
    metadata = {
        "format-version": 3,
        "table-uuid": "00000000-0000-0000-0000-00000000a1a1",
        "location": root,
        "last-updated-ms": 2,
        "last-column-id": 1,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"}
            ],
        },
        "schemas": [],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 2,
                "timestamp-ms": 2,
                "summary": {"operation": "append"},
                "manifest-list": mlist,
                "schema-id": 0,
                "sequence-number": 2,
                "first-row-id": 20,
            }
        ],
        "snapshot-log": [{"snapshot-id": 2, "timestamp-ms": 2}],
        "metadata-log": [],
        "last-sequence-number": 2,
        "next-row-id": 40,
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root


def _row_ids(spark, root):
    return {
        r["id"]: r["_row_id"]
        for r in read_iceberg_table(
            spark, root, with_row_lineage=True
        ).collect()
    }


def test_rewrite_manifests_materializes_inherited_first_row_id(
    spark, tmp_path
):
    root = _mk_inherited_v3_tree(tmp_path)
    want = {i: i for i in range(40)}  # files tile [0,40) in write order
    assert _row_ids(spark, root) == want
    info = rewrite_iceberg_manifests(root)
    assert info["manifests_before"] == 2 and info["manifests_after"] == 1
    # lineage must survive the rewrite: EXISTING entries now carry the
    # materialized first_row_id explicitly
    assert _row_ids(spark, root) == want
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        md = json.load(fh)
    head = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    (row,) = [
        r
        for r in read_avro(head["manifest-list"])[1]
        if (r.get("content") or 0) == 0
    ]
    got = {
        e["data_file"]["file_path"]: e["data_file"]["first_row_id"]
        for e in read_avro(row["manifest_path"])[1]
    }
    assert sorted(got.values()) == [0, 10, 20, 30]
    assert all(v is not None for v in got.values())


def test_expire_iceberg_spares_delta_facade(spark, tmp_path):
    """ADVICE-r9 #2: on a dual-export (UniForm-style) root, expiring
    Iceberg snapshots must NOT delete data files the sibling _delta_log
    still references — every retained Delta version stays readable."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
    )
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        expire_iceberg_snapshots,
    )
    from hybrid_data_lakehouse_lab_spark.operators.timetravel import (
        SnapshotTable,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    t.write(ev, committed_at_ms=1)
    t.write(ev.filter(F.col("k") % 3 != 0), committed_at_ms=2)
    export_iceberg_metadata(t, format_version=1)  # v1: full rewrites
    export_delta_log(t)  # Delta facade retains BOTH versions
    want_v0 = sorted(
        r["k"] for r in read_delta_table(spark, t.root, version=0).collect()
    )

    assert expire_iceberg_snapshots(t.root, keep_last=1) == [1]
    # snapshot 1's files survive because the Delta log still holds them
    got_v0 = sorted(
        r["k"] for r in read_delta_table(spark, t.root, version=0).collect()
    )
    assert got_v0 == want_v0 == list(range(60))
    # and the Iceberg head still reads
    got = sorted(
        r["k"]
        for r in read_iceberg_table(spark, t.root).collect()
    )
    assert got == sorted(k for k in range(60) if k % 3 != 0)


def test_vacuum_delta_spares_iceberg_history(spark, tmp_path):
    """ADVICE-r9 #2 (symmetric): vacuum_delta_table with small
    keep_versions must NOT delete files surviving Iceberg snapshots
    still reference — Iceberg time travel to the old snapshot stays
    green; files are freed only once BOTH facades retire them."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
    )
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        expire_iceberg_snapshots,
        vacuum_delta_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.timetravel import (
        SnapshotTable,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    t.write(ev, committed_at_ms=1)
    t.write(ev.filter(F.col("k") % 3 != 0), committed_at_ms=2)
    export_iceberg_metadata(t, format_version=1)
    export_delta_log(t)

    dropped = vacuum_delta_table(t.root, keep_versions=1)
    assert dropped == []  # everything protected by the Iceberg facade
    got_old = sorted(
        r["k"]
        for r in read_iceberg_table(spark, t.root, snapshot_id=1).collect()
    )
    assert got_old == list(range(60))
    # once the Iceberg facade also expires the snapshot, a re-vacuum
    # actually frees the old files
    expire_iceberg_snapshots(t.root, keep_last=1)
    dropped2 = vacuum_delta_table(t.root, keep_versions=1)
    assert dropped2, "expected the old version's files to be freed now"
    got = sorted(r["k"] for r in read_delta_table(spark, t.root).collect())
    assert got == sorted(k for k in range(60) if k % 3 != 0)


def test_remove_orphan_files_lifecycle(spark, tmp_path):
    """remove_orphan_files: plant orphans -> dry-run lists exactly them
    -> age cutoff spares young files -> execute frees the old ones ->
    every facade still reads green."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
    )
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        remove_orphan_files,
    )
    from hybrid_data_lakehouse_lab_spark.operators.timetravel import (
        SnapshotTable,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    t.write(ev, committed_at_ms=1)
    t.write(ev.filter(F.col("k") % 4 != 0), committed_at_ms=2)
    export_iceberg_metadata(t, format_version=2)
    export_delta_log(t)

    def _plant(name, mtime_s):
        p = os.path.join(t.root, "snapshots", name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(pa.table({"x": [1, 2, 3]}), p)
        os.utime(p, (mtime_s, mtime_s))
        return os.path.abspath(p)

    now_ms = 1_000_000_000_000
    old = _plant("stray-old.parquet", (now_ms - 4 * 86_400_000) / 1000)
    young = _plant("stray-young.parquet", (now_ms - 3_600_000) / 1000)

    # dry run with the stock 3-day default: only the old orphan
    listed = remove_orphan_files(t.root, dry_run=True, now_ms=now_ms)
    assert listed == [old]
    assert os.path.isfile(old) and os.path.isfile(young)

    # execute: old freed, young spared by the age gate
    deleted = remove_orphan_files(t.root, now_ms=now_ms)
    assert deleted == [old]
    assert not os.path.exists(old) and os.path.isfile(young)

    # explicit cutoff catches the young one too
    deleted2 = remove_orphan_files(t.root, older_than_ms=now_ms + 1)
    assert deleted2 == [young]

    # every facade still reads green
    want = sorted(k for k in range(40) if k % 4 != 0)
    assert sorted(
        r["k"] for r in read_iceberg_table(spark, t.root).collect()
    ) == want
    assert sorted(
        r["k"] for r in read_delta_table(spark, t.root).collect()
    ) == want
    assert sorted(r["k"] for r in t.read().collect()) == want
