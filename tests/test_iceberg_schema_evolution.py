"""Iceberg SCHEMA EVOLUTION — write-side stable field ids and
read-side field-id / name-mapping column resolution.

The spec ("Schema Evolution", "Column Projection", "Name Mapping
Serialization") requires columns to be resolved by FIELD ID, not name:
a renamed column must keep serving the data written under its old name,
an added column null-fills in older files, and a column dropped and
re-added under the same name gets a NEW id so old data never
resurfaces. Real engine writers stamp parquet field ids into data
files; files without ids (Hive-migrated tables, plain-Spark writers)
resolve through the table's `schema.name-mapping.default` property.

External trees here are built BY HAND (pyarrow-written files with and
without parquet field ids, hand-rolled metadata) so the reader is
exercised against trees the exporter could never produce — the
writer/reader-share-a-bug trap the round-7 Z85 finding demonstrated.

Reference parity anchor: the reference's own Iceberg table
(libs/scd2_spark_processor.py:151) is a long-lived SCD2 store; adding
or renaming a tracked attribute is the canonical year-2 schema change
this reader must survive.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.avro_io import write_avro
from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    _entry_schema,
    _manifest_list_schema,
    export_iceberg_metadata,
    read_iceberg_table,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

# Round 12 (VERDICT r11 item 1): slow tier — the 1,965-test suite
# (~55-68 min) outran the driver's pytest budget (VERIFY_r11
# tests_ok=false on a truncated run). The default run excludes
# `slow` (pytest.ini addopts); run the full suite with -m "".
pytestmark = pytest.mark.slow


def _write_pa(path, columns, field_ids=None, types=None):
    """Write one parquet file; `field_ids` maps column name -> parquet
    field id (omit for an id-less file, what plain Spark writes)."""
    types = types or {}
    arrays, fields = {}, []
    for name, values in columns.items():
        t = types.get(name, pa.int64())
        arrays[name] = pa.array(values, t)
        md = None
        if field_ids and name in field_ids:
            md = {b"PARQUET:field_id": str(field_ids[name]).encode()}
        fields.append(pa.field(name, t, metadata=md))
    tbl = pa.table(arrays).cast(pa.schema(fields))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    return path


def _tree(root, schemas, current_schema_id, snapshots, properties=None):
    """Hand-rolled v2 metadata tree. `snapshots` is a list of
    (snapshot_id, schema_id, [(data_file_path, record_count), ...]) —
    each snapshot a full-rewrite whose manifest ADDs its files."""
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    entry_schema = _entry_schema([], 2)
    ls = _manifest_list_schema(2)
    snap_records = []
    for sid, schema_id, files in snapshots:
        entries = [
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
                    "record_count": rc,
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
            for p, rc in files
        ]
        mpath = os.path.join(meta_dir, f"m-{sid:05d}.avro")
        write_avro(mpath, entry_schema, entries)
        lpath = os.path.join(meta_dir, f"snap-{sid}-1-manifest-list.avro")
        write_avro(
            lpath,
            ls,
            [
                {
                    "manifest_path": mpath,
                    "manifest_length": os.path.getsize(mpath),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": sid,
                    "min_sequence_number": sid,
                    "added_snapshot_id": sid,
                    "added_files_count": len(entries),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(rc for _, rc in files),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
            ],
        )
        snap_records.append(
            {
                "snapshot-id": sid,
                "sequence-number": sid,
                "timestamp-ms": sid,
                "summary": {"operation": "overwrite"},
                "manifest-list": lpath,
                "schema-id": schema_id,
            }
        )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000e801",
        "location": root,
        "last-sequence-number": len(snapshots),
        "last-updated-ms": len(snapshots),
        "last-column-id": max(
            f["id"] for s in schemas for f in s["fields"]
        ),
        "schema": next(
            s for s in schemas if s["schema-id"] == current_schema_id
        ),
        "schemas": schemas,
        "current-schema-id": current_schema_id,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": properties or {},
        "current-snapshot-id": snapshots[-1][0],
        "snapshots": snap_records,
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return root


def _schema(schema_id, *fields):
    return {
        "type": "struct",
        "schema-id": schema_id,
        "fields": [
            {"id": i, "name": n, "required": False, "type": t}
            for i, n, t in fields
        ],
    }


# ---------------------------------------------------------------------------
# External trees: field-id resolution
# ---------------------------------------------------------------------------


def test_external_rename_read_by_field_id(spark, tmp_path):
    """A file written before a rename (real-engine file WITH parquet
    field ids) must serve its values under the CURRENT column name —
    a by-name read would silently null the whole column."""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2, 3], "total": [10, 20, 30]},
        field_ids={"id": 1, "total": 2},
    )
    f_new = _write_pa(
        os.path.join(root, "data", "b.parquet"),
        {"id": [4], "amount": [40]},
        field_ids={"id": 1, "amount": 2},
    )
    _tree(
        root,
        [
            _schema(0, (1, "id", "long"), (2, "total", "long")),
            _schema(1, (1, "id", "long"), (2, "amount", "long")),
        ],
        1,
        [(1, 0, [(f_old, 3)]), (2, 1, [(f_old, 3), (f_new, 1)])],
    )
    got = {
        r["id"]: r["amount"]
        for r in read_iceberg_table(spark, root).collect()
    }
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}
    # time travel to snapshot 1 surfaces the OLD schema's column name
    old = read_iceberg_table(spark, root, snapshot_id=1)
    assert old.columns == ["id", "total"]
    assert {r["id"]: r["total"] for r in old.collect()} == {
        1: 10,
        2: 20,
        3: 30,
    }


def test_external_add_column_null_fills_old_files(spark, tmp_path):
    root = str(tmp_path / "t")
    f1 = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2]},
        field_ids={"id": 1},
    )
    f2 = _write_pa(
        os.path.join(root, "data", "b.parquet"),
        {"id": [3], "score": [7]},
        field_ids={"id": 1, "score": 2},
    )
    _tree(
        root,
        [
            _schema(0, (1, "id", "long")),
            _schema(1, (1, "id", "long"), (2, "score", "long")),
        ],
        1,
        [(1, 0, [(f1, 2)]), (2, 1, [(f1, 2), (f2, 1)])],
    )
    got = {
        r["id"]: r["score"]
        for r in read_iceberg_table(spark, root).collect()
    }
    assert got == {1: None, 2: None, 3: 7}


def test_external_drop_readd_does_not_resurrect(spark, tmp_path):
    """Column `flag` dropped (id 2) and re-added (id 3): the old file's
    physical `flag` column carries field id 2 — its values must NOT
    surface under the re-added id-3 column."""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2], "flag": [111, 222]},
        field_ids={"id": 1, "flag": 2},
    )
    f_new = _write_pa(
        os.path.join(root, "data", "b.parquet"),
        {"id": [3], "flag": [9]},
        field_ids={"id": 1, "flag": 3},
    )
    _tree(
        root,
        [
            _schema(0, (1, "id", "long"), (2, "flag", "long")),
            _schema(1, (1, "id", "long"), (3, "flag", "long")),
        ],
        1,
        [(1, 0, [(f_old, 2)]), (2, 1, [(f_old, 2), (f_new, 1)])],
    )
    got = {
        r["id"]: r["flag"]
        for r in read_iceberg_table(spark, root).collect()
    }
    assert got == {1: None, 2: None, 3: 9}
    # the old snapshot, under ITS schema, still reads the id-2 values
    old = {
        r["id"]: r["flag"]
        for r in read_iceberg_table(spark, root, snapshot_id=1).collect()
    }
    assert old == {1: 111, 2: 222}


def test_external_idless_files_resolve_via_name_mapping(spark, tmp_path):
    """An id-less file (Hive-migrated / plain-Spark-written) under the
    pre-rename column name resolves through
    `schema.name-mapping.default` — the spec's mechanism for exactly
    this tree."""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2], "total": [10, 20]},
    )
    _tree(
        root,
        [
            _schema(0, (1, "id", "long"), (2, "total", "long")),
            _schema(1, (1, "id", "long"), (2, "amount", "long")),
        ],
        1,
        [(1, 0, [(f_old, 2)]), (2, 1, [(f_old, 2)])],
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["id"]},
                    {"field-id": 2, "names": ["total", "amount"]},
                ]
            )
        },
    )
    got = {
        r["id"]: r["amount"]
        for r in read_iceberg_table(spark, root).collect()
    }
    assert got == {1: 10, 2: 20}


def test_external_type_promotion_int_to_long(spark, tmp_path):
    """A file written when the column was `int` reads under the
    promoted `long` schema (spec promotion; Spark's parquet reader
    widens natively)."""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2], "n": [100, 200]},
        field_ids={"id": 1, "n": 2},
        types={"n": pa.int32()},
    )
    _tree(
        root,
        [
            _schema(0, (1, "id", "long"), (2, "n", "int")),
            _schema(1, (1, "id", "long"), (2, "n", "long")),
        ],
        1,
        [(1, 0, [(f_old, 2)]), (2, 1, [(f_old, 2)])],
    )
    df = read_iceberg_table(spark, root)
    assert dict(df.dtypes)["n"] == "bigint"
    assert {r["id"]: r["n"] for r in df.collect()} == {1: 100, 2: 200}


def test_external_swap_rename_on_idless_files_refused(spark, tmp_path):
    """Two columns swapping names across id-less files is genuinely
    ambiguous — the reader must refuse loudly, not guess."""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"a": [1], "b": [2]},
    )
    _tree(
        root,
        [
            _schema(0, (1, "a", "long"), (2, "b", "long")),
            _schema(1, (1, "b", "long"), (2, "a", "long")),
        ],
        1,
        [(1, 0, [(f_old, 1)]), (2, 1, [(f_old, 1)])],
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": 1, "names": ["a", "b"]},
                    {"field-id": 2, "names": ["b", "a"]},
                ]
            )
        },
    )
    with pytest.raises(ValueError, match="ambiguous"):
        read_iceberg_table(spark, root).collect()


def test_external_nested_name_mapping_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    f1 = _write_pa(
        os.path.join(root, "data", "a.parquet"), {"id": [1]}
    )
    _tree(
        root,
        [_schema(0, (1, "id", "long"))],
        0,
        [(1, 0, [(f1, 1)])],
        properties={
            "schema.name-mapping.default": json.dumps(
                [
                    {
                        "field-id": 1,
                        "names": ["id"],
                        "fields": [{"field-id": 5, "names": ["x"]}],
                    }
                ]
            )
        },
    )
    with pytest.raises(NotImplementedError, match="nested name-mapping"):
        read_iceberg_table(spark, root)


# ---------------------------------------------------------------------------
# Exporter: stable ids, schemas list, renames, promotion
# ---------------------------------------------------------------------------


def _meta(root):
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        return json.load(fh)


def test_export_rename_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k INT, val INT"
        ),
        committed_at_ms=1,
    )
    t.write(
        spark.createDataFrame(
            [(1, 10, "x"), (2, 20, "y"), (3, 30, "z")],
            "k INT, amount INT, note STRING",
        ),
        committed_at_ms=2,
    )
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"amount": "val"}
    )
    md = _meta(t.root)
    assert len(md["schemas"]) == 2
    assert [s["schema-id"] for s in md["snapshots"]] == [0, 1]
    assert md["current-schema-id"] == 1
    assert md["last-column-id"] == 3
    by_id_0 = {f["id"]: f["name"] for f in md["schemas"][0]["fields"]}
    by_id_1 = {f["id"]: f["name"] for f in md["schemas"][1]["fields"]}
    assert by_id_0 == {1: "k", 2: "val"}
    assert by_id_1 == {1: "k", 2: "amount", 3: "note"}
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    assert {"field-id": 2, "names": ["val", "amount"]} in nm
    # head read under the new name; snapshot 1 under the old
    head = read_iceberg_table(spark, t.root)
    assert sorted(head.columns) == ["amount", "k", "note"]
    assert {r["k"]: r["amount"] for r in head.collect()} == {
        1: 10,
        2: 20,
        3: 30,
    }
    old = read_iceberg_table(spark, t.root, snapshot_id=1)
    assert old.columns == ["k", "val"]
    assert {r["k"]: r["val"] for r in old.collect()} == {1: 10, 2: 20}


def test_export_rename_unknown_source_refused(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 1)], "k INT, v INT"), committed_at_ms=1)
    t.write(spark.createDataFrame([(1, 1)], "k INT, w INT"), committed_at_ms=2)
    with pytest.raises(ValueError, match="renamed_columns"):
        export_iceberg_metadata(
            t, format_version=2, renamed_columns={"w": "nope"}
        )


def test_export_drop_readd_assigns_new_id(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(1, 5)], "k INT, a INT"), committed_at_ms=1
    )
    t.write(spark.createDataFrame([(1,)], "k INT"), committed_at_ms=2)
    t.write(
        spark.createDataFrame([(1, 9)], "k INT, a INT"), committed_at_ms=3
    )
    export_iceberg_metadata(t, format_version=2)
    md = _meta(t.root)
    assert md["last-column-id"] == 3
    ids = [
        {f["name"]: f["id"] for f in s["fields"]} for s in md["schemas"]
    ]
    assert ids[0] == {"k": 1, "a": 2}
    assert ids[1] == {"k": 1}
    assert ids[2] == {"k": 1, "a": 3}
    # name mapping binds `a` to the CURRENT field only (id 3)
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    assert [e for e in nm if "a" in e["names"]] == [
        {"field-id": 3, "names": ["a"]}
    ]
    assert {
        r["k"]: r["a"]
        for r in read_iceberg_table(spark, t.root).collect()
    } == {1: 9}
    assert {
        r["k"]: r["a"]
        for r in read_iceberg_table(spark, t.root, snapshot_id=1).collect()
    } == {1: 5}


def test_export_type_promotion_and_demotion(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 5)], "k INT, n INT"), committed_at_ms=1)
    t.write(
        spark.createDataFrame([(1, 2**40)], "k INT, n LONG"),
        committed_at_ms=2,
    )
    export_iceberg_metadata(t, format_version=2)
    md = _meta(t.root)
    types = [
        {f["name"]: f["type"] for f in s["fields"]} for s in md["schemas"]
    ]
    assert types[0]["n"] == "int" and types[1]["n"] == "long"
    assert {
        r["k"]: r["n"]
        for r in read_iceberg_table(spark, t.root).collect()
    } == {1: 2**40}

    t2 = SnapshotTable(spark, str(tmp_path / "t2"))
    t2.write(spark.createDataFrame([(1, 5)], "k INT, n LONG"), committed_at_ms=1)
    t2.write(spark.createDataFrame([(1, 5)], "k INT, n INT"), committed_at_ms=2)
    with pytest.raises(ValueError, match="int"):
        export_iceberg_metadata(t2, format_version=2)


def test_export_illegal_type_change_refused(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "x")], "k INT, v STRING"), committed_at_ms=1)
    t.write(spark.createDataFrame([(1, 3)], "k INT, v INT"), committed_at_ms=2)
    with pytest.raises(ValueError, match="changes"):
        export_iceberg_metadata(t, format_version=2)


def test_evolution_then_mor_deletes_on_new_base(spark, tmp_path):
    """A schema-changing snapshot full-rewrites (the incremental diffs
    require schema equality); subsequent pure deletes resume the MoR
    dialect against the NEW base."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.write(ev, committed_at_ms=1)
    ev2 = ev.withColumn("extra", F.col("k") % 7)
    t.write(ev2, committed_at_ms=2)  # schema change: full rewrite
    t.write(ev2.filter(F.col("k") % 10 != 0), committed_at_ms=3)  # MoR
    export_iceberg_metadata(t, format_version=2)
    md = _meta(t.root)
    ops = [s["summary"]["operation"] for s in md["snapshots"]]
    assert ops == ["overwrite", "overwrite", "delete"], ops
    assert [s["schema-id"] for s in md["snapshots"]] == [0, 1, 1]
    got = read_iceberg_table(spark, t.root)
    assert got.count() == 90
    assert got.filter(F.col("k") % 10 == 0).count() == 0


def test_export_reexport_converges_after_rename(spark, tmp_path):
    """Re-export with the same renamed_columns is idempotent — the
    registry walk is deterministic."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10)], "k INT, val INT"), committed_at_ms=1)
    t.write(
        spark.createDataFrame([(1, 10)], "k INT, amount INT"),
        committed_at_ms=2,
    )
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"amount": "val"}
    )
    md1 = _meta(t.root)
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"amount": "val"}
    )
    md2 = _meta(t.root)
    assert md1["schemas"] == md2["schemas"]
    assert md1["properties"] == md2["properties"]


def test_single_schema_table_keeps_fast_path(spark, tmp_path):
    """No evolution → no footer scan: resolution map stays empty and the
    plan is the plain by-name scan (guarded indirectly: the read works
    on a table whose files pyarrow could not even open if the slow path
    misfired on paths)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    t.write(df, committed_at_ms=1)
    export_iceberg_metadata(t, format_version=2)
    got = read_iceberg_table(spark, t.root)
    assert got.count() == 10
    # single schema in the metadata — the by-name safety precondition
    assert len(_meta(t.root)["schemas"]) == 1


def test_fast_path_runs_no_footer_probes(spark, tmp_path, monkeypatch):
    """Single-schema tables must keep the exact by-name plan: the
    footer-probe fan-out (sc.parallelize) must never launch."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        committed_at_ms=1,
    )
    t.write(
        spark.range(25).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        committed_at_ms=2,
    )
    export_iceberg_metadata(t, format_version=2)

    def _boom(*a, **k):
        raise AssertionError("footer probe ran on a single-schema table")

    monkeypatch.setattr(spark.sparkContext, "parallelize", _boom)
    assert read_iceberg_table(spark, t.root).count() == 25


def test_evolved_read_is_one_scan_per_era(spark, tmp_path):
    """The evolved read's plan shape: files group by resolution
    signature, so a two-era table (pre/post rename) costs exactly two
    parquet scans — never per-file work."""
    root = str(tmp_path / "t")
    olds = [
        (
            _write_pa(
                os.path.join(root, "data", f"a{i}.parquet"),
                {"id": [i], "total": [10 * i]},
                field_ids={"id": 1, "total": 2},
            ),
            1,
        )
        for i in range(4)
    ]
    news = [
        (
            _write_pa(
                os.path.join(root, "data", f"b{i}.parquet"),
                {"id": [100 + i], "amount": [7 * i]},
                field_ids={"id": 1, "amount": 2},
            ),
            1,
        )
        for i in range(4)
    ]
    _tree(
        root,
        [
            _schema(0, (1, "id", "long"), (2, "total", "long")),
            _schema(1, (1, "id", "long"), (2, "amount", "long")),
        ],
        1,
        [(1, 0, olds), (2, 1, olds + news)],
    )
    df = read_iceberg_table(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 2, plan
    assert df.count() == 8


def test_initial_default_fills_absent_not_null(spark, tmp_path):
    """Spec v3 "Default values": `initial-default` fills rows from
    files written BEFORE the column existed — while a stored NULL in a
    file that HAS the column stays NULL. (Applied leniently on any
    format version: a default in the schema is an instruction to the
    reader regardless of the tree's declared version.)"""
    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2]},
        field_ids={"id": 1},
    )
    f_new = _write_pa(
        os.path.join(root, "data", "b.parquet"),
        {"id": [3, 4], "score": [9, None]},
        field_ids={"id": 1, "score": 2},
    )
    schema1 = {
        "type": "struct",
        "schema-id": 1,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {
                "id": 2,
                "name": "score",
                "required": False,
                "type": "long",
                "initial-default": 7,
            },
        ],
    }
    _tree(
        root,
        [_schema(0, (1, "id", "long")), schema1],
        1,
        [(1, 0, [(f_old, 2)]), (2, 1, [(f_old, 2), (f_new, 2)])],
    )
    got = {
        r["id"]: r["score"]
        for r in read_iceberg_table(spark, root).collect()
    }
    assert got == {1: 7, 2: 7, 3: 9, 4: None}


def test_initial_default_date_typed(spark, tmp_path):
    import datetime

    root = str(tmp_path / "t")
    f_old = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1]},
        field_ids={"id": 1},
    )
    schema1 = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {
                "id": 2,
                "name": "since",
                "required": False,
                "type": "date",
                "initial-default": "2024-03-01",
            },
        ],
    }
    _tree(root, [schema1], 0, [(1, 0, [(f_old, 1)])])
    (row,) = read_iceberg_table(spark, root).collect()
    assert row["since"] == datetime.date(2024, 3, 1)


def test_rename_with_old_name_still_live_refused(spark, tmp_path):
    """Rename a->b while simultaneously adding a NEW column named a:
    one field id would serve two live columns — refused; the caller
    must split it into two commits."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 5)], "k INT, a INT"), committed_at_ms=1)
    t.write(
        spark.createDataFrame([(1, 5, 9)], "k INT, a INT, b INT"),
        committed_at_ms=2,
    )
    with pytest.raises(ValueError, match="still present"):
        export_iceberg_metadata(
            t, format_version=2, renamed_columns={"b": "a"}
        )


def test_renamed_identity_partition_source_reconstructs(spark, tmp_path):
    """SCHEMA × SPEC interplay: a real-Iceberg rename is metadata-only,
    so an external tree has identity-partitioned files whose partition
    struct still uses the HISTORICAL field name ('g') while the read
    schema says 'region'. The identity column must reconstruct by
    SOURCE-ID (values from the old name), and partition pruning must
    translate the same way — a by-name lookup would null the column
    and break the prune."""
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        _entry_schema,
        _manifest_list_schema,
    )

    root = str(tmp_path / "t")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    f_a = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2]},
        field_ids={"id": 1},
    )
    pf = [{"name": "g", "type": "string", "field-id": 1000}]
    entry_schema = _entry_schema(pf, 2)
    mpath = os.path.join(meta_dir, "m-00000.avro")
    write_avro(
        mpath,
        entry_schema,
        [
            {
                "status": 1,
                "snapshot_id": None,
                "data_sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": f_a,
                    "file_format": "PARQUET",
                    "partition": {"g": "west"},
                    "record_count": 2,
                    "file_size_in_bytes": os.path.getsize(f_a),
                },
            }
        ],
    )
    lpath = os.path.join(meta_dir, "snap-1-1-manifest-list.avro")
    write_avro(
        lpath,
        _manifest_list_schema(2),
        [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 1,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": 2,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
    )
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000ee01",
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": 1,
        "last-column-id": 2,
        "schema": _schema(1, (1, "id", "long"), (2, "region", "string")),
        "schemas": [
            _schema(0, (1, "id", "long"), (2, "g", "string")),
            _schema(1, (1, "id", "long"), (2, "region", "string")),
        ],
        "current-schema-id": 1,
        "partition-spec": [
            {
                "name": "g",
                "transform": "identity",
                "source-id": 2,
                "field-id": 1000,
            }
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "g",
                        "transform": "identity",
                        "source-id": 2,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "last-partition-id": 1000,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": 1,
                "summary": {"operation": "append"},
                "manifest-list": lpath,
                "schema-id": 1,
            }
        ],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg_table(spark, root)
    assert sorted(got.columns) == ["id", "region"]
    assert {(r["id"], r["region"]) for r in got.collect()} == {
        (1, "west"),
        (2, "west"),
    }
    # prune translates through the rename: 'east' drops the only file
    assert (
        read_iceberg_table(
            spark, root, prune=[("region", "=", "east")]
        ).count()
        == 0
    )
    assert (
        read_iceberg_table(
            spark, root, prune=[("region", "=", "west")]
        ).count()
        == 2
    )


def test_export_rename_partition_source_time_travel(spark, tmp_path):
    """Our exporter: renaming an identity partition source forces a
    rewrite (new spec under the new name); time travel to the old
    snapshot reconstructs the OLD column name from the old spec."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k INT, g STRING"
    )
    t.write(df1, partition_by=["g"], committed_at_ms=1)
    df2 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, region STRING"
    )
    t.write(df2, partition_by=["region"], committed_at_ms=2)
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"region": "g"}
    )
    head = read_iceberg_table(spark, t.root)
    assert sorted(head.columns) == ["k", "region"]
    assert {(r["k"], r["region"]) for r in head.collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    old = read_iceberg_table(spark, t.root, snapshot_id=1)
    assert sorted(old.columns) == ["g", "k"]
    assert {(r["k"], r["g"]) for r in old.collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_equality_delete_written_pre_rename_resolves(spark, tmp_path):
    """A Flink-style equality delete file written BEFORE a rename
    carries the OLD column name (with parquet field ids); after the
    rename, the reader must resolve the delete columns by field id —
    selecting by the new name would fail, and skipping the file would
    resurrect deleted rows."""
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        _entry_schema,
        _manifest_list_schema,
    )

    root = str(tmp_path / "t")
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir)
    f_data = _write_pa(
        os.path.join(root, "data", "a.parquet"),
        {"id": [1, 2, 3], "total": [10, 20, 30]},
        field_ids={"id": 1, "total": 2},
    )
    # equality delete on field 2, written pre-rename: column 'total'
    f_del = _write_pa(
        os.path.join(root, "eqdel", "d.parquet"),
        {"total": [20]},
        field_ids={"total": 2},
    )
    entry_schema = _entry_schema([], 2)

    def entry(path, content, rc, ids=None):
        return {
            "status": 1,
            "snapshot_id": None,
            "data_sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": rc,
                "file_size_in_bytes": os.path.getsize(path),
                "equality_ids": ids,
            },
        }

    m_data = os.path.join(meta_dir, "m-0.avro")
    m_del = os.path.join(meta_dir, "m-1-del.avro")
    write_avro(m_data, entry_schema, [entry(f_data, 0, 3)])
    write_avro(m_del, entry_schema, [entry(f_del, 2, 1, [2])])

    def row(path, content, seq):
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
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    ls = _manifest_list_schema(2)
    lpath = os.path.join(meta_dir, "snap-2-1-manifest-list.avro")
    write_avro(lpath, ls, [row(m_data, 0, 1), row(m_del, 1, 2)])
    metadata = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-00000000ee02",
        "location": root,
        "last-sequence-number": 2,
        "last-updated-ms": 2,
        "last-column-id": 2,
        "schema": _schema(1, (1, "id", "long"), (2, "amount", "long")),
        "schemas": [
            _schema(0, (1, "id", "long"), (2, "total", "long")),
            _schema(1, (1, "id", "long"), (2, "amount", "long")),
        ],
        "current-schema-id": 1,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {
                "snapshot-id": 2,
                "sequence-number": 2,
                "timestamp-ms": 2,
                "summary": {"operation": "delete"},
                "manifest-list": lpath,
                "schema-id": 1,
            }
        ],
        "snapshot-log": [],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")

    got = read_iceberg_table(spark, root)
    assert sorted(got.columns) == ["amount", "id"]
    assert {(r["id"], r["amount"]) for r in got.collect()} == {
        (1, 10),
        (3, 30),  # amount==20 deleted via the pre-rename delete file
    }


def test_export_rename_back_dedupes_name_mapping(spark, tmp_path):
    """ADVICE-r9: a rename-back history (a -> b -> a) must keep ONE
    field id across all three eras and emit each alias once in the
    name mapping — not {"names": ["a", "b", "a"]} — and not trip a
    spurious unknown-source error on a's first appearance (the 'a'
    mapping only applies once 'b' is live)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(1, 5)], "k INT, a INT"), committed_at_ms=1
    )
    t.write(
        spark.createDataFrame([(1, 6)], "k INT, b INT"), committed_at_ms=2
    )
    t.write(
        spark.createDataFrame([(1, 7)], "k INT, a INT"), committed_at_ms=3
    )
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"b": "a", "a": "b"}
    )
    md = _meta(t.root)
    assert md["last-column-id"] == 2  # k=1, a/b share id 2 throughout
    ids = [
        {f["name"]: f["id"] for f in s["fields"]} for s in md["schemas"]
    ]
    # era 3's schema is byte-identical to era 1's, so it DEDUPES back
    # to schema-id 0 — only two distinct schemas exist
    assert ids == [{"k": 1, "a": 2}, {"k": 1, "b": 2}]
    assert md["current-schema-id"] == 0
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    entry = [e for e in nm if e["field-id"] == 2]
    assert entry == [{"field-id": 2, "names": ["a", "b"]}]
    # reads resolve every era under its own schema
    assert {
        r["k"]: r["a"] for r in read_iceberg_table(spark, t.root).collect()
    } == {1: 7}
    assert {
        r["k"]: r["b"]
        for r in read_iceberg_table(spark, t.root, snapshot_id=2).collect()
    } == {1: 6}


def test_export_stale_rename_mapping_mints_fresh_id(spark, tmp_path):
    """ADVICE-r9: 'rename a->b, later drop b and re-add b' — the
    {'b': 'a'} mapping applies to the first transition (a live), and
    the re-add after the drop mints a FRESH id instead of raising a
    spurious unknown-source error; dropped data never resurfaces."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(1, 5)], "k INT, a INT"), committed_at_ms=1
    )
    t.write(
        spark.createDataFrame([(1, 6)], "k INT, b INT"), committed_at_ms=2
    )
    t.write(spark.createDataFrame([(1,)], "k INT"), committed_at_ms=3)
    t.write(
        spark.createDataFrame([(1, 9)], "k INT, b INT"), committed_at_ms=4
    )
    export_iceberg_metadata(
        t, format_version=2, renamed_columns={"b": "a"}
    )
    md = _meta(t.root)
    ids = [
        {f["name"]: f["id"] for f in s["fields"]} for s in md["schemas"]
    ]
    assert ids[0] == {"k": 1, "a": 2}
    assert ids[1] == {"k": 1, "b": 2}  # the rename: id kept
    assert ids[2] == {"k": 1}
    assert ids[3] == {"k": 1, "b": 3}  # the re-add: fresh id
    nm = json.loads(md["properties"]["schema.name-mapping.default"])
    # 'b' binds to its CURRENT field (id 3) only; id 2 keeps 'a'
    assert [e for e in nm if "b" in e["names"]] == [
        {"field-id": 3, "names": ["b"]}
    ]
    assert {
        r["k"]: r["b"] for r in read_iceberg_table(spark, t.root).collect()
    } == {1: 9}
    assert {
        r["k"]: r["b"]
        for r in read_iceberg_table(spark, t.root, snapshot_id=2).collect()
    } == {1: 6}
