"""Iceberg PARTITION-SPEC EVOLUTION (round-9 item 1).

The reference's own table is day-partitioned Iceberg
(reference libs/scd2_spark_processor.py:151); repartitioning such a
table is the canonical year-2 lifecycle event. Every long-lived
production table carries manifests under MULTIPLE partition specs, so:

- the WRITER registers a new spec-id whenever a full rewrite (or
  compaction) changes the directory layout, keeps partition field-ids
  unique and stable across specs (the v2 rules), stamps each manifest
  with the spec its files were written under, and lists every spec in
  `partition-specs` with `default-spec-id` = the current write layout;
- the READER resolves each manifest's `partition_spec_id` against that
  list: typed partition values, identity-column reconstruction and
  hidden-transform pruning are all applied under EACH file's own spec —
  including hand-built external trees where one snapshot's live files
  span several specs (which this exporter's full-rewrite model never
  produces itself).
"""

from __future__ import annotations

import json
import os

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


def _rows(df, *cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


# --- writer: repartition registers a new spec --------------------------------


def test_repartition_emits_new_spec(spark, tmp_path):
    """identity(region) -> unpartitioned: two specs, default = latest,
    manifests stamped with their own spec-id, both snapshots read back
    exactly."""
    t = SnapshotTable(spark, str(tmp_path / "evo"))
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i * 10) for i in range(8)],
        "id long, region string, v long",
    )
    t.write(df, partition_by=["region"], committed_at_ms=1000)
    df2 = spark.createDataFrame(
        [(i, "abc"[i % 3], i * 100) for i in range(9)],
        "id long, region string, v long",
    )
    t.write(df2, committed_at_ms=2000)  # repartition: unpartitioned
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert md["default-spec-id"] == 1
    assert [s["spec-id"] for s in md["partition-specs"]] == [0, 1]
    spec0, spec1 = md["partition-specs"]
    assert [(f["name"], f["transform"]) for f in spec0["fields"]] == [
        ("region", "identity")
    ]
    assert spec1["fields"] == []
    # the legacy partition-spec field mirrors the DEFAULT spec
    assert md["partition-spec"] == []
    # manifests are stamped with their own spec
    sids = {}
    for snap in md["snapshots"]:
        _, mrows = read_avro_file(snap["manifest-list"])
        sids[snap["snapshot-id"]] = [r["partition_spec_id"] for r in mrows]
    assert sids == {1: [0], 2: [1]}
    for sid, version in ((1, 1), (2, 2)):
        got = _rows(
            read_iceberg_table(spark, t.root, snapshot_id=sid),
            "id", "region", "v",
        )
        want = _rows(
            t.read(version=version).select("id", "region", "v"),
            "id", "region", "v",
        )
        assert got == want, sid


def test_same_layout_reuses_spec_id(spark, tmp_path):
    """Rewrites with an unchanged layout must NOT mint new specs, and
    a later return to an earlier layout reuses its id (and its
    partition field-ids)."""
    t = SnapshotTable(spark, str(tmp_path / "stable"))

    def batch(lo):
        return spark.createDataFrame(
            [(lo + i, "ab"[i % 2]) for i in range(6)],
            "id long, region string",
        )

    # DISJOINT row sets per commit: every transition is a genuine full
    # rewrite (a subset would export as a MoR delete, a superset as an
    # incremental append — both riding the base spec)
    t.write(batch(0), partition_by=["region"], committed_at_ms=1000)
    t.write(batch(10), partition_by=["region"], committed_at_ms=2000)
    t.write(batch(20), committed_at_ms=3000)  # unpartitioned
    t.write(batch(30), partition_by=["region"], committed_at_ms=4000)
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["spec-id"] for s in md["partition-specs"]] == [0, 1]
    assert md["default-spec-id"] == 0  # back on the region layout
    sids = []
    for snap in md["snapshots"]:
        _, mrows = read_avro_file(snap["manifest-list"])
        sids.append([r["partition_spec_id"] for r in mrows])
    assert sids == [[0], [0], [1], [0]]
    # field-id stability: region keeps 1000 in both spec-0 epochs
    (f0,) = md["partition-specs"][0]["fields"]
    assert f0["field-id"] == 1000
    assert md["last-partition-id"] == 1000


def test_hidden_to_identity_evolution_field_ids(spark, tmp_path):
    """days(ts) hidden -> identity(region): new partition field gets a
    FRESH id (1001, never reusing 1000), reads of both epochs match,
    and re-export is idempotent on spec ids."""
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "hid-evo"))
    df = (
        spark.range(12)
        .selectExpr(
            "id",
            "timestamp'2024-01-01 06:00:00' + make_interval(0,0,0,CAST(id%3 AS INT),0,0,0) AS ts",
            "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS region",
        )
        .withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    )
    t.write(df, partition_by=["dt"], committed_at_ms=1000)
    t.write(
        df.select("id", "ts", "region"),
        partition_by=["region"],
        committed_at_ms=2000,
    )
    export_iceberg_metadata(
        t, format_version=2, hidden_partitions={"dt": ("ts", "day")}
    )
    md = load_metadata(t.root)
    assert [f["name"] for f in md["schema"]["fields"]] == [
        "id", "ts", "region",
    ]
    spec0, spec1 = md["partition-specs"]
    assert [(f["name"], f["transform"], f["field-id"]) for f in spec0["fields"]] == [
        ("dt", "day", 1000)
    ]
    assert [(f["name"], f["transform"], f["field-id"]) for f in spec1["fields"]] == [
        ("region", "identity", 1001)
    ]
    assert md["last-partition-id"] == 1001
    for sid, version in ((1, 1), (2, 2)):
        got = _rows(
            read_iceberg_table(spark, t.root, snapshot_id=sid),
            "id", "ts", "region",
        )
        want = _rows(
            t.read(version=version).select("id", "ts", "region"),
            "id", "ts", "region",
        )
        assert got == want, sid
    # idempotent re-export: same specs, same ids
    export_iceberg_metadata(
        t, format_version=2, hidden_partitions={"dt": ("ts", "day")}
    )
    assert load_metadata(t.root)["partition-specs"] == md["partition-specs"]


def test_mor_deletes_then_repartition(spark, tmp_path):
    """identity(region) base + MoR delete (delete manifest rides the
    BASE spec) + unpartitioned rewrite: all three snapshots read
    correctly and the delete manifest is stamped spec 0."""
    t = SnapshotTable(spark, str(tmp_path / "mor-evo"))
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], i) for i in range(10)],
        "id long, region string, v long",
    )
    t.write(df, partition_by=["region"], committed_at_ms=1000)
    t.write(
        df.filter("id % 3 != 0"), partition_by=["region"], committed_at_ms=2000
    )
    t.write(df.filter("id < 5"), committed_at_ms=3000)  # repartition
    export_iceberg_metadata(t, format_version=2)
    md = load_metadata(t.root)
    assert [s["summary"]["operation"] for s in md["snapshots"]] == [
        "overwrite", "delete", "overwrite",
    ]
    _, m2 = read_avro_file(md["snapshots"][1]["manifest-list"])
    assert {(r["content"], r["partition_spec_id"]) for r in m2} == {
        (0, 0), (1, 0),
    }
    _, m3 = read_avro_file(md["snapshots"][2]["manifest-list"])
    assert [(r["content"], r["partition_spec_id"]) for r in m3] == [(0, 1)]
    for sid, version in ((1, 1), (2, 2), (3, 3)):
        got = _rows(
            read_iceberg_table(spark, t.root, snapshot_id=sid),
            "id", "region", "v",
        )
        want = _rows(
            t.read(version=version).select("id", "region", "v"),
            "id", "region", "v",
        )
        assert got == want, sid


# --- reader: hand-built external trees with MIXED-SPEC live file sets -------


def _write_parquet(path, table):
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    return os.path.getsize(path)


def _mixed_spec_tree(spark, root):
    """A v2 external tree whose CURRENT snapshot's live files span two
    specs — what any engine's manifest reuse across a repartition
    produces (this exporter's full-rewrite model never does, so the
    tree is built by hand):

      spec 0: identity(region)  — file fa: region absent physically,
              value 'a' only in the manifest partition struct
      spec 1: unpartitioned     — file fb: region physical column
    """
    import pyarrow as pa

    from hybrid_data_lakehouse_lab_spark.operators.avro_io import write_avro
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        _entry_schema,
        _manifest_list_schema,
    )

    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    fa = os.path.join(root, "a.parquet")
    _write_parquet(fa, pa.table({"id": [1, 2, 3], "v": [10, 20, 30]}))
    fb = os.path.join(root, "b.parquet")
    _write_parquet(
        fb,
        pa.table(
            {"id": [4, 5], "region": ["b", "c"], "v": [40, 50]}
        ),
    )
    spec0_fields = [
        {
            "name": "region",
            "transform": "identity",
            "source-id": 2,
            "field-id": 1000,
            "type": "string",
        }
    ]

    def entry(path, partition, rc):
        return {
            "status": 1,
            "snapshot_id": None,
            "data_sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": partition,
                "record_count": rc,
                "file_size_in_bytes": os.path.getsize(path),
            },
        }

    m_old = os.path.join(meta_dir, "m-old.avro")
    write_avro(
        m_old, _entry_schema(spec0_fields, 2), [entry(fa, {"region": "a"}, 3)]
    )
    m_new = os.path.join(meta_dir, "m-new.avro")
    write_avro(m_new, _entry_schema([], 2), [entry(fb, {}, 2)])

    def mrow(path, spec_id, seq):
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": seq,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 3,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    mlist = os.path.join(meta_dir, "snap-2-1-manifest-list.avro")
    write_avro(
        mlist,
        _manifest_list_schema(2),
        [mrow(m_old, 0, 1), mrow(m_new, 1, 2)],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000ee",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": 2,
        "last-column-id": 3,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "region", "required": False, "type": "string"},
                {"id": 3, "name": "v", "required": False, "type": "long"},
            ],
        },
        "schemas": [],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {k: v for k, v in f.items() if k != "type"}
                    for f in spec0_fields
                ],
            },
            {"spec-id": 1, "fields": []},
        ],
        "default-spec-id": 1,
        "last-partition-id": 1000,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 2,
                "summary": {"operation": "append"},
                "manifest-list": mlist,
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": 2, "timestamp-ms": 2}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return fa, fb


def test_external_mixed_spec_live_set(spark, tmp_path):
    root = str(tmp_path / "mixed")
    _mixed_spec_tree(spark, root)
    got = sorted(
        (r["id"], r["region"], r["v"])
        for r in read_iceberg_table(spark, root).collect()
    )
    assert got == [
        (1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 40), (5, "c", 50),
    ]


def test_external_mixed_spec_identity_prune(spark, tmp_path):
    """Pruning on region: the spec-0 file prunes via its manifest
    partition value; the spec-1 file (region not a partition column
    under ITS spec) is kept — a reader typing every file under spec 0
    would wrongly drop it or mis-prune."""
    root = str(tmp_path / "mixedp")
    fa, fb = _mixed_spec_tree(spark, root)
    df = read_iceberg_table(spark, root, prune=[("region", "=", "zzz")])
    got_files = {
        os.path.basename(f)
        for f in [
            r["f"]
            for r in df.selectExpr(
                "regexp_replace(input_file_name(), '^file:*', '/') AS f"
            )
            .select("f")
            .collect()
        ]
    }
    # fa pruned (identity value 'a' != 'zzz'); fb must SURVIVE the
    # file-level prune (no spec-0 typing applies to it)
    assert os.path.basename(fa) not in got_files
    assert os.path.basename(fb) in got_files
    # and the prune-is-a-superset contract holds
    assert df.where("region = 'zzz'").count() == 0
    kept = read_iceberg_table(spark, root, prune=[("region", "=", "c")])
    assert sorted(r["id"] for r in kept.collect()) == [4, 5]


def test_external_mixed_hidden_transform_prune(spark, tmp_path):
    """Two specs with DIFFERENT hidden transforms over the same source
    column (day(ts) then month(ts)): each file prunes under its own
    spec's transform."""
    import pyarrow as pa

    from hybrid_data_lakehouse_lab_spark.operators.avro_io import write_avro
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        _entry_schema,
        _manifest_list_schema,
    )

    root = str(tmp_path / "hiddenmix")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    # ts values: 2024-01-01 and 2024-03-15 (epoch micros)
    us_jan = 1_704_067_200_000_000
    us_mar = 1_710_460_800_000_000
    fa = os.path.join(root, "jan.parquet")
    _write_parquet(
        fa,
        pa.table(
            {
                "id": pa.array([1], pa.int64()),
                "ts": pa.array([us_jan], pa.timestamp("us")),
            }
        ),
    )
    fb = os.path.join(root, "mar.parquet")
    _write_parquet(
        fb,
        pa.table(
            {
                "id": pa.array([2], pa.int64()),
                "ts": pa.array([us_mar], pa.timestamp("us")),
            }
        ),
    )
    day_spec = [
        {
            "name": "ts_day",
            "transform": "day",
            "source-id": 2,
            "field-id": 1000,
            "type": "date",
        }
    ]
    month_spec = [
        {
            "name": "ts_month",
            "transform": "month",
            "source-id": 2,
            "field-id": 1001,
            "type": "int",
        }
    ]

    def entry(path, partition):
        return {
            "status": 1,
            "snapshot_id": None,
            "data_sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": partition,
                "record_count": 1,
                "file_size_in_bytes": os.path.getsize(path),
            },
        }

    m_day = os.path.join(meta_dir, "m-day.avro")
    # 2024-01-01 = epoch day 19723
    write_avro(m_day, _entry_schema(day_spec, 2), [entry(fa, {"ts_day": 19723})])
    m_mon = os.path.join(meta_dir, "m-mon.avro")
    # 2024-03 = (2024-1970)*12 + 2 = 650 months since epoch
    write_avro(
        m_mon, _entry_schema(month_spec, 2), [entry(fb, {"ts_month": 650})]
    )

    def mrow(path, spec_id, seq):
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": seq,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    mlist = os.path.join(meta_dir, "snap-2-1-manifest-list.avro")
    write_avro(
        mlist, _manifest_list_schema(2), [mrow(m_day, 0, 1), mrow(m_mon, 1, 2)]
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000ff",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": 2,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
            ],
        },
        "schemas": [],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {k: v for k, v in f.items() if k != "type"}
                    for f in day_spec
                ],
            },
            {
                "spec-id": 1,
                "fields": [
                    {k: v for k, v in f.items() if k != "type"}
                    for f in month_spec
                ],
            },
        ],
        "default-spec-id": 1,
        "last-partition-id": 1001,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 2,
                "summary": {"operation": "append"},
                "manifest-list": mlist,
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": 2, "timestamp-ms": 2}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    # both files live, one scan group (no identity columns anywhere)
    assert sorted(
        r["id"] for r in read_iceberg_table(spark, root).collect()
    ) == [1, 2]
    # prune to January: the day-spec file survives, the month-spec file
    # is dropped by ITS month binning
    jan = read_iceberg_table(
        spark,
        root,
        prune=[
            ("ts", ">=", "2024-01-01T00:00:00"),
            ("ts", "<", "2024-02-01T00:00:00"),
        ],
    )
    assert [r["id"] for r in jan.collect()] == [1]
    # prune to March: only the month-spec file
    mar = read_iceberg_table(
        spark,
        root,
        prune=[
            ("ts", ">=", "2024-03-01T00:00:00"),
            ("ts", "<", "2024-04-01T00:00:00"),
        ],
    )
    assert [r["id"] for r in mar.collect()] == [2]


def test_unknown_spec_id_refused(spark, tmp_path):
    root = str(tmp_path / "badsid")
    _mixed_spec_tree(spark, root)
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    md = json.load(open(meta_path))
    md["partition-specs"] = md["partition-specs"][:1]  # drop spec 1
    with open(meta_path, "w") as fh:
        json.dump(md, fh)
    with pytest.raises(ValueError, match="partition-spec-id 1"):
        read_iceberg_table(spark, root)


def test_equality_delete_on_identity_partition_column(spark, tmp_path):
    """Equality deletes referencing an identity PARTITION column now
    apply (the identity value is attached from the manifests before
    masking) — previously refused."""
    import pyarrow as pa

    from hybrid_data_lakehouse_lab_spark.operators.avro_io import write_avro
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        _entry_schema,
        _manifest_list_schema,
    )

    root = str(tmp_path / "eqpart")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    spec0 = [
        {
            "name": "region",
            "transform": "identity",
            "source-id": 2,
            "field-id": 1000,
            "type": "string",
        }
    ]
    fa = os.path.join(root, "a.parquet")
    _write_parquet(fa, pa.table({"id": [1, 2]}))
    fb = os.path.join(root, "b.parquet")
    _write_parquet(fb, pa.table({"id": [3, 4]}))
    delf = os.path.join(root, "del.parquet")
    _write_parquet(delf, pa.table({"region": ["a"]}))

    def entry(path, content, partition, rc, ids=None):
        rec = {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "partition": partition,
            "record_count": rc,
            "file_size_in_bytes": os.path.getsize(path),
        }
        if ids is not None:
            rec["equality_ids"] = ids
        return {
            "status": 1,
            "snapshot_id": None,
            "data_sequence_number": None,
            "file_sequence_number": None,
            "data_file": rec,
        }

    es = _entry_schema(spec0, 2)
    m_data = os.path.join(meta_dir, "m-data.avro")
    write_avro(
        m_data,
        es,
        [
            entry(fa, 0, {"region": "a"}, 2),
            entry(fb, 0, {"region": "b"}, 2),
        ],
    )
    m_del = os.path.join(meta_dir, "m-del.avro")
    write_avro(m_del, es, [entry(delf, 2, {}, 1, ids=[2])])

    def mrow(path, content, seq):
        return {
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": seq,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 2,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    mlist = os.path.join(meta_dir, "snap-2-1-manifest-list.avro")
    write_avro(
        mlist,
        _manifest_list_schema(2),
        [mrow(m_data, 0, 1), mrow(m_del, 1, 2)],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000aa",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": 2,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "region", "required": False, "type": "string"},
            ],
        },
        "schemas": [],
        "current-schema-id": 0,
        "partition-spec": [
            {k: v for k, v in f.items() if k != "type"} for f in spec0
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {k: v for k, v in f.items() if k != "type"} for f in spec0
                ],
            }
        ],
        "default-spec-id": 0,
        "last-partition-id": 1000,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 2,
                "summary": {"operation": "delete"},
                "manifest-list": mlist,
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": 2, "timestamp-ms": 2}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    got = sorted(
        (r["id"], r["region"])
        for r in read_iceberg_table(spark, root).collect()
    )
    # region='a' rows (ids 1,2) are equality-deleted; 'b' rows survive
    assert got == [(3, "b"), (4, "b")]
