"""Apache Iceberg (spec v1 + v2 + v3) metadata interop for `SnapshotTable`.

The reference's lakehouse format IS Iceberg — its SCD2 processor
commits Iceberg snapshots through a Nessie catalog (reference
`libs/scd2_spark_processor.py:59-118`, `README.MD:308-313`). The
Iceberg table spec (iceberg.apache.org/spec/) is open: a table is a
`metadata/` tree — `v{N}.metadata.json` (schema with field-ids,
partition spec, snapshot list) + per-snapshot Avro manifest lists and
manifests naming the data files — discovered via `version-hint.text`
(the HadoopCatalog convention; the reference's Nessie serves the same
pointer over REST).

`export_iceberg_metadata` emits exactly that from a `SnapshotTable`
branch's pointer history, so an external Iceberg reader (Spark's
iceberg runtime, Trino, pyiceberg, DuckDB's iceberg extension) could
consume the engine's versioned tables — the sibling of the Delta
interop in operators/delta_log.py, covering the OTHER major table
format, and the one the reference actually uses. Mapping mirrors the
Delta exporter: each pointer-history event becomes one snapshot (WAP
branch writes stay invisible to main until `fast_forward`; a rollback
becomes a new snapshot re-listing the old files), and snapshot
`properties` ride the snapshot summary. Layout-changing or mixed
transitions export as full rewrites (all files status=ADDED); PURE
APPENDS — child rows ⊇ masked parent rows as a multiset, detected by a
distributed exceptAll diff — reuse the parent's manifests verbatim and
add ONE delta manifest with only the appended files (written under
`appends/sNNNNN/`, base-spec layout), in every format version
INCLUDING v1; pure deletes export merge-on-read under v2/v3 (below).

Avro manifests use the stdlib writer in operators/avro_io.py. Scale
note: Iceberg's own answer to million-file tables is many manifests
per snapshot; with manifest reuse an N-commit append history's
metadata tree grows O(N + total delta files), and the tree's size
tracks file COUNT, never data size.

Format-version 2 (`format_version=2`) adds the spec's merge-on-read
surface — the mode the REFERENCE configures on its SCD2 table
(`write.delete.mode=merge-on-read`, libs/scd2_spark_processor.py:155):
sequence numbers (metadata `last-sequence-number`, per-snapshot
`sequence-number`, manifest-list `sequence_number`/`min_sequence_number`
/`content`, entry-level `data_sequence_number` with the spec's
inheritance rule for ADDED entries), and POSITIONAL DELETE FILES.
When a v2 export finds a snapshot whose rows are a sub-multiset of its
parent's (a pure delete — retention purge, GDPR erasure), it does NOT
re-list rewritten files: it reuses the parent's data manifest verbatim
in the new manifest list (Iceberg's manifest-reuse model) and adds a
content=1 delete manifest pointing at parquet position-delete files
(`file_path` field-id 2147483546, `pos` 2147483545, sorted by both —
the spec's delete-file schema), written DISTRIBUTED by Spark with
parquet field-ids attached. The sub-multiset diff itself is a Spark
plan (row_number over a full-row struct key vs child multiplicities),
so export-time delete detection scales with the cluster, not the
driver. Chained deletes accumulate delete manifests in the manifest
list exactly as real Iceberg MoR commits do; partitioned tables get
partition-scoped delete files, and the READ side additionally applies
EQUALITY deletes (null-safe equality_ids match, strictly-older rule) so
externally-written Flink-style upsert tables resolve too. Field names
follow the
published spec tables (iceberg.apache.org/spec/): `data_sequence_number`
(id 3), `added_files_count` (id 504) etc.

SCHEMA EVOLUTION (round 9): the export walks the pointer history
assigning stable field ids (renames via `renamed_columns` keep the id
and land in `schema.name-mapping.default`; drop+re-add mints a new id;
type changes follow the promotion lattice), emits the full `schemas`
list with per-snapshot `schema-id`, and the reader resolves evolved
files by parquet field id / name mapping (see `read_iceberg_table`).
`migrate_parquet_dir` is the `add_files` adoption path — existing
(possibly Hive-partitioned) parquet registered in place with footer
stats and a name mapping, zero data rewritten. Lifecycle maintenance
lives in operators/maintenance.py: `expire_iceberg_snapshots`,
`rewrite_iceberg_manifests`, `vacuum_delta_table`.

Verified in tests/test_iceberg_meta.py with an INDEPENDENT from-scratch
Avro + metadata parse (importing neither this module nor avro_io), plus
a DuckDB read of the resolved live file set value-matched against
`SnapshotTable.read()` — for v2, DuckDB applies the positional delete
masks itself from the independently-parsed manifests.
"""

from __future__ import annotations

import datetime
import json
import os
import urllib.parse
import uuid

from .avro_io import read_avro, write_avro
from .mor_diff import (
    _SCHEME_RE,
    _append_diff,
    _parquet_row_count,
    _position_delete_diff,
    _upsert_diff,
    finalize_spark_parts,
)
from .delta_log import _snapshot_files
from .timetravel import SnapshotTable

_EPOCH = datetime.date(1970, 1, 1)

_SPARK_TO_ICEBERG = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
    # Spark 4 VariantType -> Iceberg v3 `variant` (spec v3 type system).
    # Spark writes the Parquet VARIANT logical type (group of binary
    # metadata/value plus an optional shredded typed_value subtree per
    # the Parquet Variant Shredding spec); the exporter records the
    # logical type and the reader scans it back natively.
    "variant": "variant",
}


def _iceberg_type(spark_type: str) -> str:
    if spark_type.startswith("decimal"):
        return spark_type.replace("decimal(", "decimal(").replace(",", ", ")
    t = _SPARK_TO_ICEBERG.get(spark_type)
    if t is None:
        raise NotImplementedError(
            f"no Iceberg mapping for Spark type {spark_type!r}"
        )
    return t


def _promotion_ok(old: str, new: str) -> bool:
    """The spec's type-promotion lattice (format v1/v2): int→long,
    float→double, decimal precision widening at fixed scale. Anything
    else — including demotions — is not a valid schema evolution."""
    if old == new:
        return True
    if (old, new) in (("int", "long"), ("float", "double")):
        return True
    if old.startswith("decimal(") and new.startswith("decimal("):
        po, so = (int(x) for x in old[8:-1].split(","))
        pn, sn = (int(x) for x in new[8:-1].split(","))
        return sn == so and pn >= po
    return False


def _avro_partition_type(iceberg_type: str):
    if iceberg_type == "string":
        return "string"
    if iceberg_type in ("int",):
        return "int"
    if iceberg_type == "long":
        return "long"
    if iceberg_type == "date":
        return {"type": "int", "logicalType": "date"}
    raise NotImplementedError(
        f"identity partition on {iceberg_type!r} is not supported here"
    )


def _partition_value(iceberg_type: str, raw: str | None):
    if raw is None:
        return None
    if iceberg_type == "string":
        return raw
    if iceberg_type in ("int", "long"):
        return int(raw)
    if iceberg_type == "date":
        return (datetime.date.fromisoformat(raw) - _EPOCH).days
    raise NotImplementedError(iceberg_type)


def _int_map_schema(name: str, key_id: int, value_id: int, value_type: str) -> dict:
    """Iceberg's Avro encoding for map<int, X>: Avro maps require string
    keys, so the spec stores them as an ARRAY of key/value records
    (logicalType "map") with per-field ids — e.g. lower_bounds is
    k126_v127."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }


def _entry_schema(partition_fields: list[dict], format_version: int = 1) -> dict:
    """Iceberg manifest_entry Avro schema with the spec's field-ids
    (status 0, snapshot_id 1, data_file 2; file fields 100+; partition
    fields carry their spec field-ids 1000+). v2 adds the optional
    `data_sequence_number` (3) / `file_sequence_number` (4) — null on
    ADDED entries so readers must apply the spec's inheritance rule —
    plus the required data_file `content` (134), and drops the
    v1-legacy `block_size_in_bytes` (105). Data files carry the
    optional per-column stats maps (value_counts 109, null_value_counts
    110, lower_bounds 125, upper_bounds 128 — int-keyed maps in the
    spec's array-of-record Avro encoding) — the metadata real engines
    use for FILE SKIPPING, which at 100 TB is the difference between
    reading a partition and reading everything."""
    partition_record = {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": f["name"],
                "type": ["null", _avro_partition_type(f["type"])],
                "default": None,
                "field-id": f["field-id"],
            }
            for f in partition_fields
        ],
    }
    file_fields = [
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": partition_record, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        {
            "name": "value_counts",
            "type": ["null", _int_map_schema("k119_v120", 119, 120, "long")],
            "default": None,
            "field-id": 109,
        },
        {
            "name": "null_value_counts",
            "type": ["null", _int_map_schema("k121_v122", 121, 122, "long")],
            "default": None,
            "field-id": 110,
        },
        {
            "name": "lower_bounds",
            "type": ["null", _int_map_schema("k126_v127", 126, 127, "bytes")],
            "default": None,
            "field-id": 125,
        },
        {
            "name": "upper_bounds",
            "type": ["null", _int_map_schema("k129_v130", 129, 130, "bytes")],
            "default": None,
            "field-id": 128,
        },
    ]
    if format_version == 1:
        file_fields.append(
            {"name": "block_size_in_bytes", "type": "long", "field-id": 105}
        )
    else:
        # content: 0=DATA, 1=POSITION DELETES, 2=EQUALITY DELETES
        file_fields.insert(0, {"name": "content", "type": "int", "field-id": 134})
        # equality_ids (135): the schema field ids an EQUALITY delete
        # file matches on; null on data/position-delete files
        file_fields.append(
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
                "default": None,
                "field-id": 135,
            }
        )
        # sort_order_id (140): the registered sort order the file's
        # rows are laid out in — stamped by sorted rewrites so readers
        # can exploit the clustering (merge scans, range locality)
        file_fields.append(
            {
                "name": "sort_order_id",
                "type": ["null", "int"],
                "default": None,
                "field-id": 140,
            }
        )
    if format_version >= 3:
        # v3 row lineage: first_row_id (142) — the starting _row_id of
        # an ADDED data file; and the DELETION VECTOR reference triple
        # (spec v3 "Deletion Vectors"): referenced_data_file (143) names
        # the ONE data file a DV applies to, content_offset (144) /
        # content_size_in_bytes (145) locate the framed blob inside its
        # Puffin file
        file_fields += [
            {
                "name": "first_row_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 142,
            },
            {
                "name": "referenced_data_file",
                "type": ["null", "string"],
                "default": None,
                "field-id": 143,
            },
            {
                "name": "content_offset",
                "type": ["null", "long"],
                "default": None,
                "field-id": 144,
            },
            {
                "name": "content_size_in_bytes",
                "type": ["null", "long"],
                "default": None,
                "field-id": 145,
            },
        ]
    data_file = {"type": "record", "name": "r2", "fields": file_fields}
    entry_fields = [
        {"name": "status", "type": "int", "field-id": 0},
        {
            "name": "snapshot_id",
            "type": ["null", "long"],
            "default": None,
            "field-id": 1,
        },
    ]
    if format_version >= 2:
        entry_fields += [
            {
                "name": "data_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
        ]
    entry_fields.append({"name": "data_file", "type": data_file, "field-id": 2})
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": entry_fields,
    }


def _manifest_list_schema(format_version: int = 1) -> dict:
    """manifest_file Avro schema. v2 adds the required `content` (517:
    0=data, 1=deletes), `sequence_number` (515), `min_sequence_number`
    (516) and the six file/row count fields the spec promotes from
    optional to required."""
    fields = [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
    ]
    if format_version >= 2:
        fields += [
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        ]
        if format_version >= 3:
            # v3 row lineage: the starting _row_id assigned to rows of
            # this manifest's ADDED data files (null on delete manifests)
            fields.append(
                {
                    "name": "first_row_id",
                    "type": ["null", "long"],
                    "default": None,
                    "field-id": 520,
                }
            )
    else:
        fields.append(
            {
                "name": "added_snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 503,
            }
        )
    return {"type": "record", "name": "manifest_file", "fields": fields}


# Kept for external callers/tests that import the v1 constant directly.
_MANIFEST_LIST_SCHEMA = _manifest_list_schema(1)

# Spec-reserved field ids of the position-delete file schema.
POS_DELETE_FILE_PATH_ID = 2147483546
POS_DELETE_POS_ID = 2147483545




def _write_position_deletes(
    spark, deleted, out_dir: str, file_partitions=None, pcols=None
) -> list[dict]:
    """Write a position-delete DataFrame as spec-shaped parquet under
    `out_dir`: columns `file_path`/`pos` carrying the spec's reserved
    parquet field-ids, sorted by (file_path, pos) within each file as
    the spec requires. Written by Spark (scales past driver memory);
    files are renamed to deterministic `delete-NNNNN.parquet` names so
    re-exports reference stable paths.

    For identity-PARTITIONED tables, pass `file_partitions` — a small
    DataFrame (file_path, *pcols raw-string values) built from the base
    manifest — and `pcols`: delete rows join it (broadcast) and write
    `partitionBy(pcols)`, yielding PARTITION-SCOPED delete files as the
    spec requires (a position delete may only target data files of its
    own partition). Returns [{path, record_count, size, partition}]
    with raw partition-value strings (empty dict when unpartitioned).

    Scale note: `repartitionByRange(1, ...)` assumes the per-commit
    delete set fits one task (true for retention/erasure commits); a
    bulk delete raises the partition count — every resulting part file
    simply becomes one more manifest entry."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    pcols = pcols or []
    if pcols:
        deleted = deleted.join(F.broadcast(file_partitions), "file_path")
    writer = (
        deleted.repartitionByRange(1, *pcols, "file_path", "pos")
        .sortWithinPartitions(*pcols, "file_path", "pos")
        .withMetadata("file_path", {"parquet.field.id": POS_DELETE_FILE_PATH_ID})
        .withMetadata("pos", {"parquet.field.id": POS_DELETE_POS_ID})
        .write.mode("overwrite")
    )
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(out_dir)
    return finalize_spark_parts(out_dir, "delete")


def _write_upsert_files(
    spark, df, out_dir: str, prefix: str, pcols: list[str] | None = None
) -> list[dict]:
    """Write `df` as parquet under `out_dir` with deterministic
    `{prefix}-NNNNN.parquet` names (stable re-export references), drop
    zero-row parts, return [{path, record_count, size, partition}].
    Used by the equality-delete upsert export for both the appended
    data files (partitionBy the table's identity spec when `pcols`,
    so each part carries its typed partition struct) and the
    key-tuple delete files (always unpartitioned — they apply as
    GLOBAL deletes under an unpartitioned spec, per the Iceberg spec's
    equality-delete scoping rule); written BY SPARK so a bulk upsert
    scales past driver memory — every part file becomes one manifest
    entry."""
    writer = df.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(out_dir)
    return finalize_spark_parts(out_dir, prefix)


def _hidden_transform_col(
    source_col: str, transform: str, param, source_type: str
):
    """Spark Column computing the spec-exact HIDDEN partition value of
    `source_col` for a transformed spec field, used to lay out upsert
    data files under a days()/month/year/bucket/truncate-partitioned
    base spec (the reference's SCD2 table is
    `PARTITIONED BY (days(effective_start_ts))`,
    libs/scd2_spark_processor.py:151). The dir column inferred from a
    snapshot's layout can be type-mangled by Spark's partition-column
    inference (a digit-like truncate prefix '01' reads back as int 1),
    so the writer always RE-DERIVES the value from the source column —
    the manifests' typed partition tuples then match the base spec
    byte-for-byte. Pure built-in expressions: a map-side projection,
    no shuffle, codegen-friendly at any scale."""
    from pyspark.sql import functions as F

    from .iceberg_transforms import bucket_col, truncate_col

    src = F.col(source_col)
    # The spec defines the date binners over the UTC instant for
    # timestamptz sources. to_date/year/month interpret TimestampType
    # in the SESSION timezone, so a non-UTC session would bin a
    # 2024-03-01T02:00Z instant into 2024-02-29 — derive the UTC date
    # from epoch micros instead (date/timestamp_ntz sources carry no
    # zone and bin directly).
    if source_type == "timestamptz":
        utc_date = F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.floor(F.unix_micros(src) / F.lit(86_400_000_000)).cast("int"),
        )
    else:
        utc_date = F.to_date(src)
    if transform == "day":
        return utc_date  # DateType -> ISO dirs, epoch-day values
    if transform == "hour":
        # epoch hours of the UTC instant (timestamp-only per spec);
        # NTZ sources bin their naive wall-clock fields
        if source_type == "timestamptz":
            return F.floor(
                F.unix_micros(src) / F.lit(3_600_000_000)
            ).cast("int")
        return (
            F.unix_date(F.to_date(src)).cast("bigint") * F.lit(24)
            + F.hour(src)
        ).cast("int")
    if transform == "month":
        return (
            (F.year(utc_date) - F.lit(1970)) * F.lit(12)
            + F.month(utc_date)
            - F.lit(1)
        ).cast("int")
    if transform == "year":
        return (F.year(utc_date) - F.lit(1970)).cast("int")
    if transform == "bucket":
        return bucket_col(src, int(param), source_type)
    if transform == "truncate":
        return truncate_col(src, int(param), source_type)
    raise NotImplementedError(
        f"hidden partition transform {transform!r} for upsert export"
    )


def _write_append_files(df, out_dir: str, pcols: list[str]) -> list[dict]:
    """Write an incremental-append delta under `out_dir`, laid out like
    the base snapshot (partitionBy the base spec's directory columns,
    so the delta manifest's entries carry the same typed partition
    values a rewrite would). Deterministic `append-NNNNN.parquet`
    names; returns [{path, record_count, size, partition}]."""
    writer = df.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(out_dir)
    return finalize_spark_parts(out_dir, "append")


def _bound_bytes(iceberg_type: str, v):
    """Iceberg single-value binary serialization (spec Appendix D) for
    lower/upper bounds; None for unsupported types (omit the bound)."""
    import struct

    if v is None:
        return None
    try:
        if iceberg_type == "int":
            return struct.pack("<i", int(v))
        if iceberg_type == "long":
            return struct.pack("<q", int(v))
        if iceberg_type == "float":
            return struct.pack("<f", float(v))
        if iceberg_type == "double":
            return struct.pack("<d", float(v))
        if iceberg_type == "boolean":
            return b"\x01" if v else b"\x00"
        if iceberg_type == "date":
            d = v if isinstance(v, datetime.date) else datetime.date.fromisoformat(str(v))
            return struct.pack("<i", (d - _EPOCH).days)
        if iceberg_type in ("timestamp", "timestamptz"):
            if isinstance(v, datetime.datetime):
                epoch = (
                    datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                    if v.tzinfo
                    else datetime.datetime(1970, 1, 1)
                )
                micros = (v - epoch) // datetime.timedelta(microseconds=1)
                return struct.pack("<q", micros)
            return None
        if iceberg_type == "string":
            s = v.decode("utf-8") if isinstance(v, bytes) else str(v)
            return s.encode("utf-8")
    except (ValueError, OverflowError, UnicodeDecodeError):
        return None
    return None  # decimal / binary / nested: omit


def _file_column_stats(path: str, col_ids: dict[str, int], type_of: dict[str, str]):
    """Per-column stats straight from the parquet FOOTER (no data
    read): returns the four spec maps (value_counts 109,
    null_value_counts 110, lower_bounds 125, upper_bounds 128) in the
    array-of-record Avro shape, or Nones where the footer lacks
    statistics. Bounds use the spec's single-value binary form — the
    metadata that lets an engine skip files by predicate, the operation
    that makes a 100 TB scan read only the files it must."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except OSError:
        # Parquet VARIANT logical type — unreadable by this pyarrow;
        # the spec makes all four stats maps optional, so a variant
        # file simply ships without file-skipping bounds
        return None, None, None, None
    agg: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name not in col_ids:
                continue  # nested or non-schema column
            st = col.statistics
            ent = agg.setdefault(
                name, {"nulls": 0, "min": None, "max": None, "ok": st is not None}
            )
            if st is None or not st.has_min_max or st.null_count is None:
                ent["ok"] = False
                continue
            ent["nulls"] += st.null_count
            ent["min"] = st.min if ent["min"] is None else min(ent["min"], st.min)
            ent["max"] = st.max if ent["max"] is None else max(ent["max"], st.max)
    value_counts, null_counts, lower, upper = [], [], [], []
    for name, ent in agg.items():
        fid = col_ids[name]
        value_counts.append({"key": fid, "value": md.num_rows})
        if not ent["ok"]:
            continue
        null_counts.append({"key": fid, "value": ent["nulls"]})
        lo = _bound_bytes(type_of[name], ent["min"])
        hi = _bound_bytes(type_of[name], ent["max"])
        if lo is not None and hi is not None:
            lower.append({"key": fid, "value": lo})
            upper.append({"key": fid, "value": hi})
    return (
        sorted(value_counts, key=lambda r: r["key"]) or None,
        sorted(null_counts, key=lambda r: r["key"]) or None,
        sorted(lower, key=lambda r: r["key"]) or None,
        sorted(upper, key=lambda r: r["key"]) or None,
    )


def write_metadata_version(meta_dir: str, md: dict) -> str:
    """Persist `md` as the NEXT metadata version under `meta_dir`
    (v{n+1}.metadata.json, n from version-hint.text or 0) and swap the
    hint atomically — the one pointer-commit discipline every metadata
    writer here shares (catalog commits, view trees, partition-stats
    registration). Returns the new metadata location. Callers that
    need serialization hold their own lock around load+apply+write."""
    os.makedirs(meta_dir, exist_ok=True)
    hint = os.path.join(meta_dir, "version-hint.text")
    n = 0
    if os.path.exists(hint):
        with open(hint) as fh:
            n = int(fh.read().strip())
    new_loc = os.path.join(meta_dir, f"v{n + 1}.metadata.json")
    tmp = new_loc + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(md, fh, indent=1, sort_keys=True)
    os.replace(tmp, new_loc)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write(str(n + 1))
    os.replace(hint_tmp, hint)
    return new_loc


def export_iceberg_metadata(
    table: SnapshotTable,
    branch: str = "main",
    format_version: int = 1,
    hidden_partitions: dict | None = None,
    upsert_key: list[str] | None = None,
    renamed_columns: dict[str, str] | None = None,
    drop_foreign_commits: bool = False,
) -> str:
    """Emit an Iceberg `metadata/` tree under the table root for
    `branch`'s pointer history; returns the metadata directory.
    Idempotent full regeneration (deterministic snapshot ids = history
    index + 1, stable table-uuid via uuid5 of the root, byte-stable
    Avro), so re-export after new commits extends the tree in place and
    bumps `version-hint.text`.

    With `format_version=2`, pure-delete transitions (child rows ⊆
    parent rows as a multiset — the cheap parquet footer row-count
    precheck gates the distributed diff) are exported merge-on-read:
    the parent's data manifest is REUSED in the new manifest list
    (carrying its original sequence number, so entry inheritance
    resolves to the parent's sequence) and a content=1 delete manifest
    adds positional delete files. On identity-PARTITIONED tables the
    delete files are PARTITION-SCOPED as the spec requires (delete rows
    route through partitionBy on the base files' partition values; each
    manifest entry carries its partition's typed tuple). PURE APPENDS
    (child ⊇ masked parent as a multiset) also reuse the parent's
    manifests and add one delta manifest, in EVERY format version
    including v1 (see the module docstring); everything else is the
    full-rewrite ADDED model. v2 delete and append-delta snapshots are
    content-deterministic but not byte-stable (Spark task file
    layout); manifests reference the deterministic renamed file paths,
    so re-export converges.

    With `upsert_key` (requires format_version=2; composes with
    identity AND hidden-transform partitioning — data files lay out
    under the base spec, with transformed dir values re-derived
    spec-exactly from the source column, while key-tuple delete files
    stay global/unpartitioned so cross-partition PK moves mask
    everywhere), every
    transition exports in the EQUALITY-DELETE dialect — the commit
    shape streaming upsert writers (Flink, the mode the reference's
    merge-on-read config targets) produce: the distributed PK diff
    (operators/mor_diff.py `_upsert_diff`) finds changed-or-new rows
    (appended as a content=0 data manifest at the new sequence) and
    replaced-or-deleted keys (written as key-tuple parquet referenced by
    a content=2 delete manifest with `equality_ids`); parent manifests
    are reused with their original sequence numbers. The reader's
    strictly-older rule (delete.seq > data.seq) makes the same-commit
    append survive its own delete file. Raises if `upsert_key` is not
    unique in a snapshot (equality deletes are only sound against a
    PK); a schema-changing transition falls back to the rewrite
    model.

    With `format_version=3`, pure-delete transitions export as
    DELETION VECTORS (spec v3: positional-delete parquet must not be
    written): one cumulative deletion-vector-v1 blob per touched data
    file in a Puffin container (operators/puffin.py), referenced by a
    content=1 manifest whose entries carry the spec's
    `referenced_data_file` / `content_offset` / `content_size_in_bytes`
    triple — and each delete snapshot's manifest REPLACES the prior
    delete manifests (at most one DV per data file, Delta-style
    cumulative replacement, vs v2's stacking). v3 ROW LINEAGE is
    emitted too: table `next-row-id`, snapshot `first-row-id`, manifest
    `first_row_id` (520) and per-data-file `first_row_id` (142).
    Re-exporting an existing v2 tree with format_version=3 upgrades it
    in place (same root, regenerated metadata); the reader accepts
    mixed external v3 trees where a DV supersedes older positional
    delete files for its data file.

    SCHEMA EVOLUTION (spec "Schema Evolution" + "Name Mapping
    Serialization"): the pointer history is walked chronologically and
    every column gets a STABLE field id at first appearance — a column
    present across snapshots keeps its id even as other columns come
    and go, a column dropped and later re-added under the same name
    gets a NEW id (the spec rule that stops re-adds from resurrecting
    old data), and a type change is accepted only along the spec's
    promotion lattice (int→long, float→double, decimal precision
    widening at fixed scale). `renamed_columns` maps NEW name → OLD
    name for transitions that rename a column: the field id transfers
    and the old name is recorded as an alias. The metadata carries the
    full `schemas` list with per-snapshot `schema-id` (time travel
    reads each snapshot under ITS schema), a running `last-column-id`,
    and — because Spark-written data files carry no parquet field ids —
    a `schema.name-mapping.default` property listing every historical
    alias per field id, the spec's mechanism for resolving id-less
    files after a rename. Snapshots whose schema differs from the MoR
    base always export as full rewrites (the incremental diffs require
    schema equality)."""
    if format_version not in (1, 2, 3):
        raise NotImplementedError(
            f"format_version {format_version!r} (only 1, 2 and 3)"
        )
    if upsert_key is not None:
        upsert_key = list(upsert_key)
        if format_version < 2:
            raise ValueError("upsert_key requires format_version >= 2")
    m = table._load_manifest()
    events = m["history"].get(branch, [])
    if not events:
        raise ValueError(f"branch {branch!r} has no commits to export")
    by_version = {s["version"]: s for s in m["snapshots"]}

    meta_dir = os.path.join(table.root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    # FOREIGN-COMMIT SAFETY: a pointer commit through the REST catalog
    # (or any external engine POSTing add-snapshot) appends snapshots
    # this exporter knows nothing about — its manifest lists are not
    # the exporter's own `snap-{i}-1-manifest-list.avro` naming.
    # Regenerating the tree would silently drop them and GC their
    # manifests, so refuse loudly unless the caller opts in. The
    # supported flow for keeping them is to land the data through the
    # parent store (SnapshotTable.write) and re-export, or to keep
    # committing through the catalog.
    import re as _re

    hint_path = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint_path):
        with open(hint_path) as fh:
            _cur_n = int(fh.read().strip())
        _cur_path = os.path.join(meta_dir, f"v{_cur_n}.metadata.json")
        if os.path.exists(_cur_path):
            with open(_cur_path) as fh:
                _cur_md = json.load(fh)
            foreign = [
                s["snapshot-id"]
                for s in _cur_md.get("snapshots") or []
                if not _re.fullmatch(
                    r"snap-\d+-1-manifest-list\.avro",
                    os.path.basename(s.get("manifest-list") or ""),
                )
            ]
            if foreign and not drop_foreign_commits:
                raise ValueError(
                    f"the tree at {meta_dir} holds catalog-committed "
                    f"snapshots this export does not know "
                    f"(ids {foreign}); re-exporting would drop them. "
                    "Land the data through the parent store and retry, "
                    "or pass drop_foreign_commits=True to discard them"
                )

    # SCHEMA EVOLUTION: walk the pointer history chronologically and
    # give every column a stable field id at first appearance. Partition
    # specs are resolved PER SNAPSHOT inside the loop — PARTITION-SPEC
    # EVOLUTION: a full rewrite that changes the directory layout (the
    # canonical year-2 repartition of a long-lived table) becomes a NEW
    # spec-id, and every manifest records the spec its files were
    # written under
    hidden_partitions = hidden_partitions or {}
    renamed_columns = dict(renamed_columns or {})
    seen_dirs: set[str] = set()
    for ev in events:
        for f in _snapshot_files(table.root, by_version[ev["version"]]["path"]):
            seen_dirs.update(f["partitionValues"])
    unknown_hidden = set(hidden_partitions) - seen_dirs
    if unknown_hidden:
        raise ValueError(
            f"hidden_partitions name non-partition columns: "
            f"{sorted(unknown_hidden)} (partition dirs ever used: "
            f"{sorted(seen_dirs)})"
        )
    id_of: dict[str, int] = {}  # live name -> field id (retired on drop)
    type_by_id: dict[int, str] = {}  # id -> latest (possibly promoted) type
    aliases: dict[int, list[str]] = {}  # id -> names in order of use
    ever_named: set[str] = set()  # every name that was ever live
    applied_renames: set[str] = set()  # renamed_columns keys ever applied
    last_column_id = 0
    schemas: list[dict] = []  # distinct schemas, schema-id = list index
    _schema_key_to_id: dict[tuple, int] = {}
    event_schema_id: list[int] = []
    col_ids_of: list[dict[str, int]] = []  # per event: name -> id
    type_of_of: list[dict[str, str]] = []  # per event: name -> type
    for ev in events:
        snap_schema = table.spark.read.parquet(
            by_version[ev["version"]]["path"]
        ).schema
        evf = []
        for f in snap_schema.fields:
            if f.name in hidden_partitions:
                # HIDDEN partitioning (the Iceberg model the reference's
                # `PARTITIONED BY (days(effective_start_ts))` uses,
                # libs/scd2_spark_processor.py:151): the directory
                # column is NOT a table column — it is a transform of a
                # source column and lives only in the partition spec
                continue
            it = _iceberg_type(f.dataType.simpleString())
            if f.name in id_of:
                fid = id_of[f.name]
            elif (
                f.name in renamed_columns
                and renamed_columns[f.name] in id_of
            ):
                # a rename applies only while the OLD name is live; a
                # 'rename a->b, later drop b and re-add b' history (or
                # a rename-back a->b->a) falls through to minting a
                # fresh id instead of a spurious error — typo'd
                # mappings are caught after the loop, when the old
                # name turns out to have never existed at all
                old = renamed_columns[f.name]
                applied_renames.add(f.name)
                fid = id_of.pop(old)
                id_of[f.name] = fid
                if f.name not in aliases[fid]:
                    aliases[fid].append(f.name)
            else:
                last_column_id += 1
                fid = last_column_id
                id_of[f.name] = fid
                type_by_id[fid] = it
                aliases[fid] = [f.name]
            if it != type_by_id[fid]:
                if not _promotion_ok(type_by_id[fid], it):
                    raise ValueError(
                        f"column {f.name!r} (field id {fid}) changes "
                        f"type {type_by_id[fid]} -> {it} in snapshot "
                        f"v{ev['version']}; Iceberg only allows "
                        "int->long, float->double and decimal "
                        "precision widening"
                    )
                type_by_id[fid] = it
            evf.append(
                {"id": fid, "name": f.name, "required": False, "type": it}
            )
        # a rename whose OLD name still exists in the same snapshot
        # (rename a->b while adding a new a) would alias one id to two
        # live columns — refuse; the caller must express it as two
        # separate commits
        ids_used = [x["id"] for x in evf]
        if len(set(ids_used)) != len(ids_used):
            dup = sorted(
                {i for i in ids_used if ids_used.count(i) > 1}
            )
            raise ValueError(
                f"snapshot v{ev['version']}: renamed_columns maps a "
                f"column whose old name is still present — field ids "
                f"{dup} would serve two columns at once"
            )
        # a name absent from this snapshot is RETIRED: a later column
        # re-added under the same name gets a fresh id, so old files'
        # data for the dropped column can never resurface (spec rule)
        live_names = {x["name"] for x in evf}
        ever_named.update(live_names)
        for n in list(id_of):
            if n not in live_names:
                del id_of[n]
        key = tuple((x["id"], x["name"], x["type"]) for x in evf)
        sid = _schema_key_to_id.get(key)
        if sid is None:
            sid = len(schemas)
            schemas.append(
                {"type": "struct", "schema-id": sid, "fields": evf}
            )
            _schema_key_to_id[key] = sid
        event_schema_id.append(sid)
        col_ids_of.append({x["name"]: x["id"] for x in evf})
        type_of_of.append({x["name"]: x["type"] for x in evf})
    typos = {
        new: old
        for new, old in renamed_columns.items()
        if new not in applied_renames and old not in ever_named
    }
    if typos:
        raise ValueError(
            f"renamed_columns maps {typos} to old names no snapshot in "
            f"the history ever had a live column for "
            f"(names ever live: {sorted(ever_named)})"
        )
    if format_version < 3 and any(
        f["type"] == "variant" for s in schemas for f in s["fields"]
    ):
        raise ValueError(
            "variant columns are an Iceberg format-version 3 type; "
            f"export with format_version=3 (got {format_version})"
        )
    fields = schemas[event_schema_id[-1]]["fields"]
    col_ids = col_ids_of[-1]
    type_of = type_of_of[-1]
    # spec result types for the date/time binners: day -> date (ISO
    # dirs, epoch-day values), month/year/hour -> int (months/years/
    # hours from epoch; hour is timestamp-only per the spec)
    _TRANSFORM_TYPES = {
        "day": "date",
        "month": "int",
        "year": "int",
        "hour": "int",
    }

    def _spec_fields_for(pcols: list[str]) -> list[dict]:
        spec_fields = []
        for c in pcols:
            if c in hidden_partitions:
                # (source, transform) for the date binners, or
                # (source, "bucket"|"truncate", param) for the
                # parameterized transforms (spec: bucket[N] = murmur3 &
                # MAX % N, truncate[W] = floor-to-W / first-W-chars)
                hp = tuple(hidden_partitions[c])
                source_col, transform = hp[0], hp[1]
                param = hp[2] if len(hp) > 2 else None
                if source_col not in col_ids:
                    raise ValueError(
                        f"hidden partition {c!r} names unknown source "
                        f"column {source_col!r}"
                    )
                if transform in _TRANSFORM_TYPES:
                    if transform == "hour" and type_of[source_col] not in (
                        "timestamp",
                        "timestamptz",
                    ):
                        raise ValueError(
                            f"hour transform for {c!r} needs a timestamp "
                            f"source (got {type_of[source_col]!r})"
                        )
                    tname, ttype = transform, _TRANSFORM_TYPES[transform]
                elif transform == "bucket":
                    if not isinstance(param, int) or param <= 0:
                        raise ValueError(
                            f"bucket transform for {c!r} needs a positive "
                            f"bucket count, got {param!r}"
                        )
                    tname, ttype = f"bucket[{param}]", "int"
                elif transform == "truncate":
                    if not isinstance(param, int) or param <= 0:
                        raise ValueError(
                            f"truncate transform for {c!r} needs a "
                            f"positive width, got {param!r}"
                        )
                    src_type = type_of[source_col]
                    if src_type not in ("int", "long", "string"):
                        raise NotImplementedError(
                            f"truncate over source type {src_type!r}"
                        )
                    tname, ttype = f"truncate[{param}]", src_type
                else:
                    raise NotImplementedError(
                        f"partition transform {transform!r} (only "
                        f"{sorted(_TRANSFORM_TYPES) + ['bucket', 'truncate']})"
                    )
                spec_fields.append(
                    {
                        "name": c,
                        "transform": tname,
                        "source-id": col_ids[source_col],
                        "type": ttype,
                    }
                )
            else:
                if c not in col_ids:
                    raise ValueError(
                        f"partition column {c!r} (used by an earlier "
                        "snapshot's layout) is not in the latest "
                        "schema; dropping a partitioned column is not "
                        "supported"
                    )
                spec_fields.append(
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": col_ids[c],
                        # convenience for _entry_schema; stripped below
                        "type": type_of[c],
                    }
                )
        return spec_fields

    # SPEC REGISTRY: each distinct partition layout gets a spec-id in
    # order of first appearance (chronological, like real Iceberg);
    # partition field-ids start at 1000 and are NEVER reused for a
    # different (name, transform, source) — and an equivalent field in
    # a later spec KEEPS its id — the v2 rules for spec evolution
    specs: list[list[dict]] = []
    _spec_ids: dict[tuple, int] = {}
    _pfield_ids: dict[tuple, int] = {}
    _entry_schemas: dict[int, dict] = {}

    def _resolve_spec(pcols: list[str]) -> int:
        sfs = _spec_fields_for(list(pcols))
        key = tuple((f["name"], f["transform"], f["source-id"]) for f in sfs)
        sid = _spec_ids.get(key)
        if sid is None:
            for f in sfs:
                fkey = (f["name"], f["transform"], f["source-id"])
                if fkey not in _pfield_ids:
                    _pfield_ids[fkey] = 1000 + len(_pfield_ids)
                f["field-id"] = _pfield_ids[fkey]
            sid = len(specs)
            specs.append(sfs)
            _spec_ids[key] = sid
        return sid

    def _entry_schema_of(sid: int) -> dict:
        if sid not in _entry_schemas:
            _entry_schemas[sid] = _entry_schema(specs[sid], format_version)
        return _entry_schemas[sid]

    if upsert_key is not None:
        bad = [k for k in upsert_key if k not in col_ids]
        if bad:
            raise ValueError(f"upsert_key columns {bad} not in table schema")
    list_schema = _manifest_list_schema(format_version)

    snapshots = []
    snapshot_log = []
    # MoR export state (v2): the physical dir + manifest-list rows of
    # the last full-rewrite snapshot, the delete dirs stacked on it
    # since, and its current LOGICAL row count under those masks.
    prev_rows: list[dict] = []
    base_dir: str | None = None
    base_spec_id: int = 0  # spec of the last full-rewrite snapshot
    delete_dirs: list[str] = []
    # incremental-append delta dirs stacked on the base since the last
    # full rewrite — part of the live file set alongside base_dir
    append_dirs: list[str] = []
    base_live_rows: int | None = None
    # v3 DV state: cumulative per-file deletion-vector BODY bytes
    # (magic + portable roaring64) + cardinality, keyed by absolute
    # data-file path (a new DV REPLACES the prior one for that file,
    # per the spec's at-most-one-DV-per-data-file rule — same replace
    # semantics as Delta's cumulative descriptors). Bitmaps are built
    # and merged EXECUTOR-side (operators/dv_kernel.py); the driver
    # holds only compressed-bitmap bytes, never row positions.
    dv_state: dict[str, tuple[bytes, int]] = {}
    # v3 row lineage: the table's next _row_id to assign
    next_row_id = 0
    written_delete_dirs: set[str] = set()
    written_upsert_dirs: set[str] = set()
    written_append_dirs: set[str] = set()
    written_manifests: set[str] = set()
    verified_unique: set[str] = set()  # PK-probed snapshot dirs (upserts)
    base_schema_sid: int = 0  # schema of the last full-rewrite snapshot
    # spec SORT ORDERS: order-0 = unsorted. A snapshot committed by
    # maintenance.rewrite_data_files_sorted (strategy "sort") declares
    # its lexicographic order in the "sort-by" property; the exporter
    # registers it as a real sort-orders entry, stamps the snapshot's
    # ADDED data files with sort_order_id (field 140), and makes it the
    # table's default write order (ALTER TABLE ... WRITE ORDERED BY
    # semantics — the order persists until a later rewrite replaces
    # it). Z-ORDER rewrites stay summary-only: the spec's sort-order
    # transforms cannot express bit interleaving, so real engines also
    # record z-order only in the rewrite's summary.
    sort_orders: list[dict] = [{"order-id": 0, "fields": []}]
    _order_key_to_id: dict[str, int] = {}
    default_sort_order_id = 0
    for i, ev in enumerate(events):
        snap = by_version[ev["version"]]
        snapshot_id = i + 1
        seq = i + 1
        # stats / spec resolution / equality ids for files written in
        # THIS event use the event's own schema (names may differ from
        # the current schema after a rename); field ids are stable
        col_ids = col_ids_of[i]
        type_of = type_of_of[i]
        snap_first_row_id = next_row_id  # v3 row lineage
        list_path = os.path.join(
            meta_dir, f"snap-{snapshot_id}-1-manifest-list.avro"
        )
        files = _snapshot_files(table.root, snap["path"])

        # compaction snapshots (operators/maintenance.py compact_snapshot)
        # fold accumulated delete files back into rewritten data: always
        # the full-rewrite branch, summary operation "replace" (what
        # Iceberg's rewrite_data_files emits), never a diffed commit.
        # If vacuum expired the whole ancestry, the compaction IS the
        # first exported snapshot — a creation "overwrite", not a
        # "replace" of nothing.
        is_compaction = i > 0 and (
            (snap.get("properties") or {}).get("operation") == "compaction"
        )
        # rewrite-deletes snapshots (maintenance.py rewrite_delete_files)
        # are MINOR compactions: data manifests reused untouched, the
        # stacked delete state consolidated into ONE delete manifest —
        # Iceberg's rewrite_position_delete_files. Only meaningful under
        # a MoR dialect; v1 (no deletes) falls through to the rewrite
        # branch.
        is_minor = (
            i > 0
            and upsert_key is None
            and format_version >= 2
            and (snap.get("properties") or {}).get("operation")
            == "rewrite-deletes"
        )
        # sorted-rewrite commits declare their order; resolve column
        # names under THIS snapshot's schema (field ids are stable)
        snap_sort_order_id = 0
        _sort_by = (snap.get("properties") or {}).get("sort-by")
        if (
            format_version >= 2
            and _sort_by
            and (snap.get("properties") or {}).get("strategy") == "sort"
        ):
            _flds = []
            for c, d in json.loads(_sort_by):
                if c not in col_ids:
                    _flds = []  # column unknown at this snapshot: skip
                    break
                _flds.append(
                    {
                        "transform": "identity",
                        "source-id": col_ids[c],
                        "direction": d,
                        "null-order": (
                            "nulls-first" if d == "asc" else "nulls-last"
                        ),
                    }
                )
            if _flds:
                _okey = json.dumps(_flds, sort_keys=True)
                _oid = _order_key_to_id.get(_okey)
                if _oid is None:
                    _oid = len(sort_orders)
                    sort_orders.append(
                        {"order-id": _oid, "fields": _flds}
                    )
                    _order_key_to_id[_okey] = _oid
                snap_sort_order_id = _oid
                default_sort_order_id = _oid
        upsert = None
        if upsert_key is not None and i > 0 and not is_compaction:
            parent_dir = by_version[events[i - 1]["version"]]["path"]
            if os.path.isdir(parent_dir):
                changed, del_keys = _upsert_diff(
                    table.spark,
                    parent_dir,
                    snap["path"],
                    upsert_key,
                    verified_unique=verified_unique,
                )
                if changed is not None:
                    upsert = (changed, del_keys)

        # per-file footer row counts feed only the positional-delete
        # precheck and the rewrite branch's record_count — skip the
        # O(files) driver-side footer reads on upsert commits
        file_rc = {}
        total_rc = 0
        if upsert is None:
            for f in files:
                rel = urllib.parse.unquote(f["path"])
                full = os.path.join(table.root, rel)
                file_rc[full] = (f, _parquet_row_count(full))
            total_rc = sum(rc for _, rc in file_rc.values())

        if is_minor and base_dir is not None and base_live_rows is not None:
            if total_rc != base_live_rows:
                raise ValueError(
                    f"snapshot v{ev['version']} is flagged "
                    f"operation=rewrite-deletes but changes the row "
                    f"count ({base_live_rows} -> {total_rc}); minor "
                    "compaction must not change the table's data"
                )
        def _prior_deletes():
            """The accumulated delete state as a (file_path, pos)
            DataFrame, or None — the mask both incremental diffs apply
            to the base before comparing against the child."""
            if format_version >= 3:
                from .dv_kernel import dv_state_positions

                return (
                    dv_state_positions(table.spark, dv_state)
                    if dv_state
                    else None
                )
            return (
                table.spark.read.parquet(*delete_dirs).select(
                    "file_path", "pos"
                )
                if delete_dirs
                else None
            )

        deleted = None
        appended = None
        can_incremental = (
            upsert_key is None
            and not is_compaction
            and not is_minor
            and base_dir is not None
            and os.path.isdir(base_dir)
            and all(os.path.isdir(d) for d in append_dirs)
            and base_live_rows is not None
            # SCHEMA EVOLUTION: the incremental diffs compare row
            # multisets against the base — only sound under the base's
            # exact schema; a schema-changing snapshot full-rewrites
            and event_schema_id[i] == base_schema_sid
        )
        if (
            can_incremental
            and format_version >= 2
            and total_rc < base_live_rows
        ):
            deleted = _position_delete_diff(
                table.spark,
                [base_dir, *append_dirs],
                _prior_deletes(),
                snap["path"],
                check_excess=False,
            )
            if deleted is not None:
                # ONE action: materialize the (delete-set-sized)
                # positions executor-side, then validate the count
                # identity |masked base| − |positions| == |child| —
                # replacing the separate excess-probe job, which was
                # ~half of each export diff's scan+shuffle cost
                # (round-9 item 5). Downstream delete writers reuse
                # the checkpointed positions without recompute.
                deleted = deleted.localCheckpoint()
                if base_live_rows - deleted.count() != total_rc:
                    deleted = None  # not a pure delete: rewrite
        elif can_incremental and total_rc > base_live_rows:
            # incremental APPEND (all format versions, v1 included):
            # if the child is the masked base plus new rows, export
            # only the delta — killing the O(table-files)-per-commit
            # metadata growth of the full-rewrite model on
            # append-heavy histories
            appended = _append_diff(
                table.spark,
                [base_dir, *append_dirs],
                _prior_deletes(),
                snap["path"],
                # both totals already known from parquet footers: the
                # narrow diff skips its two count jobs
                base_rows=base_live_rows,
                child_rows=total_rc,
            )

        if upsert is not None:
            # --- equality-delete upsert commit (Flink dialect). On a
            # partitioned table the appended data files are laid out
            # under the base spec — identity dir columns ride along
            # from the snapshot read; HIDDEN-transform dir columns
            # (days/month/year/bucket/truncate) are re-derived from
            # their source column with the spec-exact expression, so a
            # days(effective_start_ts)-partitioned SCD2 table (the
            # reference's own layout) exports with typed partition
            # structs per entry. The key-tuple delete files stay
            # UNPARTITIONED and their manifest uses an unpartitioned
            # spec — the spec's global-equality-delete scoping, so a
            # primary key that MOVES partitions (an SCD2 update lands
            # its current row on a new day) is still masked
            # everywhere. ---
            changed, del_keys = upsert
            base_spec_fields = specs[base_spec_id]
            base_pcols = [sf["name"] for sf in base_spec_fields]
            for sf in base_spec_fields:
                if sf["transform"] == "identity":
                    continue
                hp = tuple(hidden_partitions[sf["name"]])
                src_col = hp[0]
                if hp[1] == "bucket":
                    # staged-column murmur3: the Column form's
                    # duplicated rounds blow up the partitioned write's
                    # sort codegen (see with_bucket_column)
                    from .iceberg_transforms import with_bucket_column

                    changed = with_bucket_column(
                        changed,
                        sf["name"],
                        src_col,
                        int(hp[2]),
                        type_of[src_col],
                    )
                else:
                    changed = changed.withColumn(
                        sf["name"],
                        _hidden_transform_col(
                            src_col,
                            hp[1],
                            hp[2] if len(hp) > 2 else None,
                            type_of[src_col],
                        ),
                    )
            ups_dir = os.path.join(table.root, "upserts", f"s{snapshot_id:05d}")
            data_files = _write_upsert_files(
                table.spark,
                changed,
                os.path.join(ups_dir, "data"),
                "data",
                pcols=base_pcols,
            )
            del_files = _write_upsert_files(
                table.spark, del_keys, os.path.join(ups_dir, "eqdel"), "eqdel"
            )
            if os.path.isdir(ups_dir):
                written_upsert_dirs.add(f"s{snapshot_id:05d}")
            manifest_rows = list(prev_rows)
            if data_files:
                manifest_path = os.path.join(meta_dir, f"m-{i:05d}-ups.avro")
                manifest_first_row_id = next_row_id
                entries = []
                for d in data_files:
                    vcounts, ncounts, lower, upper = _file_column_stats(
                        d["path"], col_ids, type_of
                    )
                    data_file = {
                        "content": 0,
                        "file_path": d["path"],
                        "file_format": "PARQUET",
                        "partition": {
                            sf["name"]: _partition_value(
                                sf["type"], d["partition"].get(sf["name"])
                            )
                            for sf in base_spec_fields
                        },
                        "record_count": d["record_count"],
                        "file_size_in_bytes": d["size"],
                        "value_counts": vcounts,
                        "null_value_counts": ncounts,
                        "lower_bounds": lower,
                        "upper_bounds": upper,
                        "equality_ids": None,
                    }
                    if format_version >= 3:
                        data_file["first_row_id"] = next_row_id
                        next_row_id += d["record_count"]
                    entries.append(
                        {
                            "status": 1,
                            "snapshot_id": None,
                            "data_sequence_number": None,  # inherited
                            "file_sequence_number": None,
                            "data_file": data_file,
                        }
                    )
                write_avro(manifest_path, _entry_schema_of(base_spec_id), entries)
                ups_row = {
                    "manifest_path": manifest_path,
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": base_spec_id,
                    "content": 0,
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": snapshot_id,
                    "added_files_count": len(entries),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(
                        d["record_count"] for d in data_files
                    ),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                }
                if format_version >= 3:
                    ups_row["first_row_id"] = manifest_first_row_id
                manifest_rows.append(ups_row)
            if del_files:
                eq_ids = [col_ids[k] for k in upsert_key]
                # global equality deletes: the manifest uses an
                # UNPARTITIONED spec (minted on first use), so the
                # keys mask across every partition per the spec rule
                del_sid = _resolve_spec([])
                manifest_path = os.path.join(meta_dir, f"m-{i:05d}-del.avro")
                entries = [
                    {
                        "status": 1,
                        "snapshot_id": None,
                        "data_sequence_number": None,  # inherited
                        "file_sequence_number": None,
                        "data_file": {
                            "content": 2,  # EQUALITY DELETES
                            "file_path": d["path"],
                            "file_format": "PARQUET",
                            "partition": {},
                            "record_count": d["record_count"],
                            "file_size_in_bytes": d["size"],
                            "value_counts": None,
                            "null_value_counts": None,
                            "lower_bounds": None,
                            "upper_bounds": None,
                            "equality_ids": eq_ids,
                        },
                    }
                    for d in del_files
                ]
                write_avro(manifest_path, _entry_schema_of(del_sid), entries)
                manifest_rows.append(
                    {
                        "manifest_path": manifest_path,
                        "manifest_length": os.path.getsize(manifest_path),
                        "partition_spec_id": del_sid,
                        "content": 1,
                        "sequence_number": seq,
                        "min_sequence_number": seq,
                        "added_snapshot_id": snapshot_id,
                        "added_files_count": len(entries),
                        "existing_files_count": 0,
                        "deleted_files_count": 0,
                        "added_rows_count": sum(
                            d["record_count"] for d in del_files
                        ),
                        "existing_rows_count": 0,
                        "deleted_rows_count": 0,
                    }
                )
            operation = "overwrite" if del_files else "append"
        elif format_version >= 3 and (
            deleted is not None or (is_minor and dv_state)
        ):
            # --- v3 merge-on-read delete snapshot: DELETION VECTORS in
            # a Puffin file (spec v3 forbids new positional-delete
            # parquet). One cumulative DV per touched data file; the
            # new delete manifest REPLACES all prior delete manifests
            # in the manifest list (at most one DV per data file). The
            # bitmaps are merged and serialized ON the executors via
            # the cogrouped Arrow kernel shared with the Delta exporter
            # (operators/dv_kernel.py — same magic+roaring64 body
            # bytes); the driver receives only (file, blob,
            # cardinality) per touched file and does the O(files)
            # Puffin container assembly. ---
            from .dv_kernel import dv_blobs_by_file
            from .puffin import DELETION_VECTOR_V1, frame_dv_v1, write_puffin

            if deleted is not None:
                dv_state.update(
                    {
                        r["file_path"]: (
                            bytes(r["blob"]),
                            int(r["cardinality"]),
                        )
                        for r in dv_blobs_by_file(
                            table.spark, deleted, dv_state
                        )
                    }
                )
            # else (minor compaction): re-emit the cumulative DV state
            # as one fresh Puffin file — k stacked DV files become one
            base_by_abs = {
                os.path.abspath(
                    os.path.join(table.root, urllib.parse.unquote(f["path"]))
                ): f
                for d in [base_dir, *append_dirs]
                for f in _snapshot_files(table.root, d)
            }
            sdir = os.path.join(table.root, "deletes", f"s{snapshot_id:05d}")
            if os.path.isdir(sdir):
                # a prior v2 export of this snapshot left positional
                # delete parquet here; the fv3 upgrade supersedes it —
                # clear the dir so no orphaned delete files linger
                import shutil as _shutil

                _shutil.rmtree(sdir)
            os.makedirs(sdir, exist_ok=True)
            puffin_path = os.path.join(sdir, f"dv-{snapshot_id:05d}.puffin")
            touched = sorted(dv_state)
            blobs = [
                {
                    "type": DELETION_VECTOR_V1,
                    "data": frame_dv_v1(dv_state[p][0]),
                    "snapshot-id": snapshot_id,
                    "sequence-number": seq,
                    "properties": {
                        "referenced-data-file": p,
                        "cardinality": str(dv_state[p][1]),
                    },
                }
                for p in touched
            ]
            blob_metas = write_puffin(puffin_path, blobs)
            puffin_size = os.path.getsize(puffin_path)
            base_spec_fields = specs[base_spec_id]
            entries = []
            for p, bm in zip(touched, blob_metas):
                bf = base_by_abs.get(p)
                if bf is None:
                    raise RuntimeError(
                        f"diff produced positions for unknown file {p}"
                    )
                entries.append(
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": None,
                        "data_sequence_number": None,  # inherited
                        "file_sequence_number": None,
                        "data_file": {
                            "content": 1,  # POSITION DELETES (as a DV)
                            "file_path": puffin_path,
                            "file_format": "PUFFIN",
                            "partition": {
                                sf["name"]: _partition_value(
                                    sf["type"],
                                    bf["partitionValues"].get(sf["name"]),
                                )
                                for sf in base_spec_fields
                            },
                            "record_count": dv_state[p][1],
                            "file_size_in_bytes": puffin_size,
                            "referenced_data_file": p,
                            "content_offset": bm["offset"],
                            "content_size_in_bytes": bm["length"],
                        },
                    }
                )
            manifest_path = os.path.join(meta_dir, f"m-{i:05d}-del.avro")
            write_avro(manifest_path, _entry_schema_of(base_spec_id), entries)
            row = {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": base_spec_id,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    dv_state[p][1] for p in touched
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
            # REPLACE semantics: parent DATA manifests ride along, prior
            # delete manifests are dropped (their DVs are superseded)
            manifest_rows = [
                r for r in prev_rows if (r.get("content") or 0) == 0
            ] + [row]
            written_delete_dirs.add(os.path.basename(sdir))
            base_live_rows = total_rc
            operation = "replace" if is_minor else "delete"
        elif deleted is not None or (
            is_minor and delete_dirs and format_version == 2
        ):
            # --- merge-on-read delete snapshot (v2 positional), or its
            # MINOR compaction: the stacked delete dirs rewritten into
            # one consolidated, still-partition-scoped file set ---
            if deleted is None:
                deleted = table.spark.read.parquet(*delete_dirs).select(
                    "file_path", "pos"
                )
            ddir = os.path.join(table.root, "deletes", f"s{snapshot_id:05d}")
            base_spec_fields = specs[base_spec_id]
            file_partitions = None
            if base_spec_fields:
                # partition-scoped delete files (the spec's rule): map
                # each live data file (base + append deltas) to its raw
                # partition values so the delete rows can be routed by
                # partitionBy
                base_files = [
                    f
                    for d in [base_dir, *append_dirs]
                    for f in _snapshot_files(table.root, d)
                ]
                rows = [
                    tuple(
                        [
                            os.path.join(
                                table.root, urllib.parse.unquote(f["path"])
                            )
                        ]
                        + [
                            f["partitionValues"].get(sf["name"])
                            for sf in base_spec_fields
                        ]
                    )
                    for f in base_files
                ]
                file_partitions = table.spark.createDataFrame(
                    rows,
                    ", ".join(
                        ["file_path string"]
                        + [f"{sf['name']} string" for sf in base_spec_fields]
                    ),
                )
            dfiles = _write_position_deletes(
                table.spark,
                deleted,
                ddir,
                file_partitions=file_partitions,
                pcols=[sf["name"] for sf in base_spec_fields],
            )
            manifest_path = os.path.join(meta_dir, f"m-{i:05d}-del.avro")
            entries = [
                {
                    "status": 1,  # ADDED
                    "snapshot_id": None,  # inherited from manifest list
                    "data_sequence_number": None,  # inherited (spec rule)
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 1,  # POSITION DELETES
                        "file_path": d["path"],
                        "file_format": "PARQUET",
                        "partition": {
                            sf["name"]: _partition_value(
                                sf["type"], d["partition"].get(sf["name"])
                            )
                            for sf in base_spec_fields
                        },
                        "record_count": d["record_count"],
                        "file_size_in_bytes": d["size"],
                    },
                }
                for d in dfiles
            ]
            write_avro(manifest_path, _entry_schema_of(base_spec_id), entries)
            row = {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": base_spec_id,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(dfiles),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(d["record_count"] for d in dfiles),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
            # manifest REUSE: the parent's manifests ride along verbatim,
            # keeping their original sequence numbers for inheritance.
            # A minor compaction instead REPLACES the stacked delete
            # manifests with the consolidated one (data manifests only
            # ride along).
            if is_minor:
                manifest_rows = [
                    r for r in prev_rows if (r.get("content") or 0) == 0
                ] + [row]
                delete_dirs = [ddir]
            else:
                manifest_rows = prev_rows + [row]
                delete_dirs.append(ddir)
            written_delete_dirs.add(os.path.basename(ddir))
            base_live_rows = total_rc
            operation = "replace" if is_minor else "delete"
        elif is_minor and base_dir is not None and prev_rows:
            # minor compaction with nothing to consolidate (no live
            # delete state): a pure metadata snapshot — parent manifests
            # verbatim, no data movement
            manifest_rows = list(prev_rows)
            operation = "replace"
        elif appended is not None:
            # --- incremental APPEND commit (v1, v2 and v3): the
            # parent's manifests ride along VERBATIM (keeping their
            # sequence numbers / snapshot ids) and ONE delta manifest
            # adds only the new rows, written under the base spec's
            # layout. Metadata per commit is O(delta files), not
            # O(table files) — an N-commit append history's tree grows
            # O(N + total delta files). ---
            adir = os.path.join(table.root, "appends", f"s{snapshot_id:05d}")
            base_spec_fields = specs[base_spec_id]
            afiles = _write_append_files(
                appended, adir, [sf["name"] for sf in base_spec_fields]
            )
            manifest_path = os.path.join(meta_dir, f"m-{i:05d}-app.avro")
            manifest_first_row_id = next_row_id
            entries = []
            for d in afiles:
                vcounts, ncounts, lower, upper = _file_column_stats(
                    d["path"], col_ids, type_of
                )
                data_file = {
                    "file_path": d["path"],
                    "file_format": "PARQUET",
                    "partition": {
                        sf["name"]: _partition_value(
                            sf["type"], d["partition"].get(sf["name"])
                        )
                        for sf in base_spec_fields
                    },
                    "record_count": d["record_count"],
                    "file_size_in_bytes": d["size"],
                    "value_counts": vcounts,
                    "null_value_counts": ncounts,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                }
                if format_version == 1:
                    data_file["block_size_in_bytes"] = 67108864
                    entry = {
                        "status": 1,
                        "snapshot_id": snapshot_id,
                        "data_file": data_file,
                    }
                else:
                    data_file["content"] = 0
                    if format_version >= 3:
                        data_file["first_row_id"] = next_row_id
                        next_row_id += d["record_count"]
                    entry = {
                        "status": 1,
                        "snapshot_id": None,  # inherited
                        "data_sequence_number": None,  # inherited
                        "file_sequence_number": None,
                        "data_file": data_file,
                    }
                entries.append(entry)
            write_avro(manifest_path, _entry_schema_of(base_spec_id), entries)
            row = {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": base_spec_id,
                "added_snapshot_id": snapshot_id,
            }
            if format_version >= 2:
                row.update(
                    {
                        "content": 0,
                        "sequence_number": seq,
                        "min_sequence_number": seq,
                        "added_files_count": len(entries),
                        "existing_files_count": 0,
                        "deleted_files_count": 0,
                        "added_rows_count": sum(
                            d["record_count"] for d in afiles
                        ),
                        "existing_rows_count": 0,
                        "deleted_rows_count": 0,
                    }
                )
            if format_version >= 3:
                row["first_row_id"] = manifest_first_row_id
            manifest_rows = prev_rows + [row]
            if os.path.isdir(adir):
                written_append_dirs.add(os.path.basename(adir))
                append_dirs.append(adir)
            base_live_rows = total_rc
            operation = "append"
        else:
            # --- full-rewrite snapshot (layout changes, modified rows,
            # compaction; v1 deletes) ---
            if is_compaction and i > 0:
                # a compaction must preserve the live row count of the
                # previous snapshot — a wrong flag would silently turn a
                # data change into a "replace" no external consumer
                # re-reads
                prev_dir = by_version[events[i - 1]["version"]]["path"]
                if os.path.isdir(prev_dir):
                    want = sum(
                        _parquet_row_count(
                            os.path.join(
                                table.root, urllib.parse.unquote(f["path"])
                            )
                        )
                        for f in _snapshot_files(table.root, prev_dir)
                    )
                    if total_rc != want:
                        raise ValueError(
                            f"snapshot v{ev['version']} is flagged "
                            f"operation=compaction but changes the row "
                            f"count ({want} -> {total_rc})"
                        )
            manifest_path = os.path.join(meta_dir, f"m-{i:05d}.avro")
            manifest_first_row_id = next_row_id
            # PARTITION-SPEC EVOLUTION: this snapshot's own directory
            # layout decides its spec — a rewrite (or compaction) that
            # repartitions the table registers a new spec-id; manifests
            # of unchanged layout reuse the existing one
            pcols_i = next(
                (
                    list(f["partitionValues"])
                    for f in files
                    if f["partitionValues"]
                ),
                [],
            )
            sid_spec = _resolve_spec(pcols_i)
            spec_fields_i = specs[sid_spec]
            entries = []
            for full, (f, rc) in file_rc.items():
                vcounts, ncounts, lower, upper = _file_column_stats(
                    full, col_ids, type_of
                )
                data_file = {
                    "file_path": full,
                    "file_format": "PARQUET",
                    "partition": {
                        sf["name"]: _partition_value(
                            sf["type"],
                            f["partitionValues"].get(sf["name"]),
                        )
                        for sf in spec_fields_i
                    },
                    "record_count": rc,
                    "file_size_in_bytes": f["size"],
                    "value_counts": vcounts,
                    "null_value_counts": ncounts,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                }
                if format_version == 1:
                    data_file["block_size_in_bytes"] = 67108864
                    entry = {
                        "status": 1,  # ADDED (full-rewrite model)
                        "snapshot_id": snapshot_id,
                        "data_file": data_file,
                    }
                else:
                    data_file["content"] = 0
                    if snap_sort_order_id:
                        data_file["sort_order_id"] = snap_sort_order_id
                    if format_version >= 3:
                        # v3 row lineage: every ADDED data file gets an
                        # explicit starting _row_id; the table counter
                        # advances by its record count
                        data_file["first_row_id"] = next_row_id
                        next_row_id += rc
                    entry = {
                        "status": 1,
                        "snapshot_id": None,  # inherited
                        "data_sequence_number": None,  # inherited
                        "file_sequence_number": None,
                        "data_file": data_file,
                    }
                entries.append(entry)
            write_avro(manifest_path, _entry_schema_of(sid_spec), entries)
            row = {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": sid_spec,
                "added_snapshot_id": snapshot_id,
            }
            if format_version >= 2:
                row.update(
                    {
                        "content": 0,
                        "sequence_number": seq,
                        "min_sequence_number": seq,
                        "added_files_count": len(entries),
                        "existing_files_count": 0,
                        "deleted_files_count": 0,
                        "added_rows_count": total_rc,
                        "existing_rows_count": 0,
                        "deleted_rows_count": 0,
                    }
                )
            if format_version >= 3:
                row["first_row_id"] = manifest_first_row_id
            manifest_rows = [row]
            base_dir = snap["path"]
            base_spec_id = sid_spec
            base_schema_sid = event_schema_id[i]
            delete_dirs = []
            append_dirs = []
            dv_state = {}
            base_live_rows = total_rc
            operation = "replace" if is_compaction else "overwrite"

        write_avro(list_path, list_schema, manifest_rows)
        written_manifests.update(
            os.path.basename(r["manifest_path"]) for r in manifest_rows
        )
        rows_before = prev_rows
        prev_rows = manifest_rows
        summary = {"operation": operation}
        for k, v in (snap.get("properties") or {}).items():
            if k == "operation":
                continue  # internal flag; the spec operation is computed
            summary[str(k)] = str(v)
        if format_version >= 2:
            # spec-standard summary counters (what engines surface in
            # DESCRIBE HISTORY / $snapshots): derived from the manifest
            # rows' own counts — a manifest's live content is its
            # added + existing entries
            def _tot(rows_, content):
                fs = rs = 0
                for r in rows_:
                    if (r.get("content") or 0) != content:
                        continue
                    fs += (r.get("added_files_count") or 0) + (
                        r.get("existing_files_count") or 0
                    )
                    rs += (r.get("added_rows_count") or 0) + (
                        r.get("existing_rows_count") or 0
                    )
                return fs, rs

            def _added(rows_, content):
                fs = rs = 0
                for r in rows_:
                    if (r.get("content") or 0) != content:
                        continue
                    if r.get("added_snapshot_id") != snapshot_id:
                        continue
                    fs += r.get("added_files_count") or 0
                    rs += r.get("added_rows_count") or 0
                return fs, rs

            tdf, tdr = _tot(manifest_rows, 0)
            tvf, tvr = _tot(manifest_rows, 1)
            adf, adr = _added(manifest_rows, 0)
            avf, avr = _added(manifest_rows, 1)
            carried = {
                r["manifest_path"] for r in manifest_rows
            }
            pdf, pdr = _tot(
                [r for r in rows_before if r["manifest_path"] not in carried],
                0,
            )
            flavor = (
                "equality" if upsert_key is not None else "position"
            )
            summary.update(
                {
                    "added-data-files": str(adf),
                    "added-records": str(adr),
                    "added-delete-files": str(avf),
                    f"added-{flavor}-deletes": str(avr),
                    "deleted-data-files": str(pdf),
                    "deleted-records": str(pdr),
                    "total-data-files": str(tdf),
                    "total-records": str(tdr),
                    "total-delete-files": str(tvf),
                    f"total-{flavor}-deletes": str(tvr),
                }
            )
        s = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ev["at_ms"],
            "summary": summary,
            "manifest-list": list_path,
            "schema-id": event_schema_id[i],
        }
        if format_version >= 2:
            s["sequence-number"] = seq
        if format_version >= 3:
            s["first-row-id"] = snap_first_row_id
            s["added-rows"] = next_row_id - snap_first_row_id
        if i > 0:
            s["parent-snapshot-id"] = i
        snapshots.append(s)
        snapshot_log.append(
            {"snapshot-id": snapshot_id, "timestamp-ms": ev["at_ms"]}
        )

    # NAME MAPPING (spec "Name Mapping Serialization"): Spark-written
    # data files carry no parquet field ids, so a rename would orphan
    # the old files' columns — the mapping lists every historical alias
    # per field id. A name reused by a DIFFERENT field later (drop +
    # re-add) binds to its CURRENT field only; the retired alias is
    # omitted (per-snapshot read schemas resolve those directly by
    # name, and the re-add transition full-rewrote the live files).
    name_mapping = []
    claimed = {f["name"]: f["id"] for f in fields}
    for fid in sorted(aliases):
        names = []
        for nm in aliases[fid]:
            owner = claimed.get(nm)
            if owner is None or owner == fid:
                names.append(nm)
                claimed[nm] = fid
        if names:
            name_mapping.append({"field-id": fid, "names": names})
    metadata = {
        "format-version": format_version,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, table.root)),
        "location": table.root,
        "last-updated-ms": events[-1]["at_ms"],
        "last-column-id": last_column_id,
        "schema": schemas[event_schema_id[-1]],
        "schemas": schemas,
        "current-schema-id": event_schema_id[-1],
        # default spec = the layout of the last full rewrite (the
        # table's CURRENT write spec); all historical specs are listed
        # so readers can type/prune each manifest under the spec its
        # files were written with
        "partition-spec": [
            {k: v for k, v in sf.items() if k != "type"}
            for sf in specs[base_spec_id]
        ],
        "partition-specs": [
            {
                "spec-id": sid,
                "fields": [
                    {k: v for k, v in sf.items() if k != "type"}
                    for sf in sfs
                ],
            }
            for sid, sfs in enumerate(specs)
        ],
        "default-spec-id": base_spec_id,
        "last-partition-id": max(_pfield_ids.values(), default=999),
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping)
        },
        "current-snapshot-id": snapshots[-1]["snapshot-id"],
        "snapshots": snapshots,
        "snapshot-log": snapshot_log,
        "metadata-log": [],
    }
    if format_version >= 2:
        metadata["last-sequence-number"] = len(events)
        metadata["sort-orders"] = sort_orders
        metadata["default-sort-order-id"] = default_sort_order_id
    if format_version >= 3:
        # v3 row lineage: the next _row_id a future commit may assign
        metadata["next-row-id"] = next_row_id
    # branch refs (spec `refs`): the exported branch tracks the current
    # snapshot under its own name, and every OTHER SnapshotTable branch
    # whose head version exists in this exported chain gets a branch
    # ref at that snapshot — the Iceberg spelling of the Nessie-style
    # zero-copy branches (reference README.MD:308-313). A branch whose
    # head is NOT in the chain (an unpublished WAP stage) is simply
    # absent, preserving WAP invisibility.
    # metadata-log (spec): pointers to the PREVIOUS metadata files still
    # on disk, oldest first — how external engines walk table-metadata
    # history. Each entry's timestamp is that file's own last-updated-ms.
    n_events = len(events)
    mlog = []
    for k in range(1, n_events):
        prev_path = os.path.join(meta_dir, f"v{k}.metadata.json")
        if os.path.exists(prev_path):
            try:
                with open(prev_path) as fh:
                    prev_ts = json.load(fh).get("last-updated-ms", 0)
            except ValueError:
                continue
            mlog.append(
                {"timestamp-ms": prev_ts, "metadata-file": prev_path}
            )
    metadata["metadata-log"] = mlog
    version_to_sid = {ev["version"]: i + 1 for i, ev in enumerate(events)}
    refs = {branch: {"snapshot-id": snapshots[-1]["snapshot-id"], "type": "branch"}}
    all_heads = dict(m.get("branches") or {})
    if m.get("current") is not None:
        all_heads["main"] = m["current"]
    for b, head in all_heads.items():
        if b == branch:
            continue
        sid = version_to_sid.get(head)
        if sid is not None:
            refs[b] = {"snapshot-id": sid, "type": "branch"}
    metadata["refs"] = refs
    n = len(events)
    meta_path = os.path.join(meta_dir, f"v{n}.metadata.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write(str(n))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    # A vacuum can SHRINK the pointer history; files from a longer
    # pre-vacuum export (higher metadata versions, manifests for dropped
    # snapshots) are unreferenced by the new hint but would reference
    # deleted data — remove them, the catalog-GC step a real Iceberg
    # deployment runs.
    import re

    for f in os.listdir(meta_dir):
        stale = (
            (re.match(r"^m-\d+(-del|-ups|-app)?\.avro$", f) and f not in written_manifests)
            or (f.startswith("snap-") and f.endswith(".avro")
                and f.split("-")[1].isdigit()
                and int(f.split("-")[1]) > len(events))
            # foreign (catalog-committed) staged manifests + manifest
            # lists: GC'd ONLY under the drop_foreign_commits opt-in —
            # a staged-but-not-yet-committed external append must
            # survive a routine re-export (the docstring's contract);
            # with the opt-in, the foreign snapshots were just dropped
            # and their staging goes with them
            or (
                drop_foreign_commits
                and f.startswith(("m-staged-", "snap-staged-"))
            )
            or (f.startswith("v") and f.endswith(".metadata.json")
                and f[1:-14].isdigit() and int(f[1:-14]) > n)
            # statistics puffins: regeneration drops the `statistics`
            # field, so any stats file is now unreferenced — GC it;
            # re-run export_iceberg_statistics to restore stats
            or (f.startswith("stats-") and f.endswith(".puffin"))
        )
        if stale:
            os.remove(os.path.join(meta_dir, f))
    staged_root = os.path.join(table.root, "staged")
    if drop_foreign_commits and os.path.isdir(staged_root):
        import shutil

        shutil.rmtree(staged_root, ignore_errors=True)
    # Delete-file dirs not referenced by THIS export (history shrunk by
    # a vacuum, or a snapshot that re-exported as a rewrite) would
    # reference vacuumed data files — same GC contract as the manifests.
    deletes_root = os.path.join(table.root, "deletes")
    if os.path.isdir(deletes_root):
        import shutil

        for d in os.listdir(deletes_root):
            if d.startswith("s") and d not in written_delete_dirs:
                shutil.rmtree(os.path.join(deletes_root, d), ignore_errors=True)
        if not os.listdir(deletes_root):
            os.rmdir(deletes_root)
    upserts_root = os.path.join(table.root, "upserts")
    if os.path.isdir(upserts_root):
        import shutil

        for d in os.listdir(upserts_root):
            if d.startswith("s") and d not in written_upsert_dirs:
                shutil.rmtree(os.path.join(upserts_root, d), ignore_errors=True)
        if not os.listdir(upserts_root):
            os.rmdir(upserts_root)
    appends_root = os.path.join(table.root, "appends")
    if os.path.isdir(appends_root):
        import shutil

        for d in os.listdir(appends_root):
            if d.startswith("s") and d not in written_append_dirs:
                shutil.rmtree(os.path.join(appends_root, d), ignore_errors=True)
        if not os.listdir(appends_root):
            os.rmdir(appends_root)
    return meta_dir


def _spark_type(iceberg_type: str):
    from pyspark.sql import types as T

    table = {
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamptz": T.TimestampType(),
        "timestamp": T.TimestampNTZType(),
        "binary": T.BinaryType(),
        "variant": T.VariantType(),
    }
    if iceberg_type in table:
        return table[iceberg_type]
    if iceberg_type.startswith("decimal"):
        p, s = iceberg_type[iceberg_type.index("(") + 1 : -1].split(",")
        return T.DecimalType(int(p), int(s))
    raise NotImplementedError(f"iceberg type {iceberg_type!r}")


def _default_value(iceberg_type: str, v):
    """Deserialize a field's `initial-default` from the spec's JSON
    single-value form into a Python literal for F.lit (spec v3
    "Default values"): dates/timestamps arrive as ISO strings, numbers
    and strings as themselves; decimals as strings (the lit's cast to
    the table type finishes the job)."""
    if v is None:
        return None
    if iceberg_type == "date":
        return datetime.date.fromisoformat(v)
    if iceberg_type in ("timestamp", "timestamptz"):
        return datetime.datetime.fromisoformat(v)
    return v


def _decode_bound(iceberg_type: str, b: bytes):
    """Inverse of _bound_bytes for the comparable domain used in
    pruning (dates stay epoch-days, timestamps epoch-micros)."""
    import struct

    if iceberg_type in ("int", "date"):
        return struct.unpack("<i", b)[0]
    if iceberg_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", b)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", b)[0]
    if iceberg_type == "double":
        return struct.unpack("<d", b)[0]
    if iceberg_type == "boolean":
        return b == b"\x01"
    if iceberg_type == "string":
        return b.decode("utf-8")
    return None


def _pred_value(iceberg_type: str, v):
    """Normalize a user predicate value into the bound domain."""
    if iceberg_type == "date":
        if isinstance(v, str):
            v = datetime.date.fromisoformat(v)
        if isinstance(v, datetime.date):
            return (v - _EPOCH).days
        return int(v)
    if iceberg_type in ("timestamp", "timestamptz"):
        if isinstance(v, str):
            v = datetime.datetime.fromisoformat(v)
        if isinstance(v, datetime.datetime):
            epoch = (
                datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                if v.tzinfo
                else datetime.datetime(1970, 1, 1)
            )
            return (v - epoch) // datetime.timedelta(microseconds=1)
        return int(v)
    if iceberg_type in ("int", "long"):
        return int(v)
    if iceberg_type in ("float", "double"):
        return float(v)
    if iceberg_type == "string":
        return str(v)
    return v


_DAY_MICROS = 86_400_000_000


def _transform_range(transform: str, source_type: str, pv: int):
    """The [lo, hi] interval (inclusive, in the source column's
    comparable domain: epoch days for dates, epoch micros for
    timestamps) covered by a day/month/year partition value — the
    spec's time binners count days/months/years since epoch (negative
    before 1970; divmod handles the month wrap). None when the source
    type isn't a time type."""
    if source_type not in ("date", "timestamp", "timestamptz"):
        return None
    pv = int(pv)
    if transform == "hour":
        # epoch-hour bin: micros interval; meaningless on a date source
        if source_type == "date":
            return None
        return pv * 3_600_000_000, (pv + 1) * 3_600_000_000 - 1
    if transform == "day":
        start_day, end_day = pv, pv + 1
    elif transform == "month":
        y, m = divmod(pv, 12)
        try:
            start = datetime.date(1970 + y, m + 1, 1)
            end = (
                datetime.date(1970 + y + 1, 1, 1)
                if m == 11
                else datetime.date(1970 + y, m + 2, 1)
            )
        except ValueError:
            # sentinel bins past datetime's range (e.g. an SCD2
            # 9999-12-31 end-date partition): cannot bound, keep
            return None
        start_day, end_day = (start - _EPOCH).days, (end - _EPOCH).days
    elif transform == "year":
        try:
            start_day = (datetime.date(1970 + pv, 1, 1) - _EPOCH).days
            end_day = (datetime.date(1971 + pv, 1, 1) - _EPOCH).days
        except ValueError:
            return None
    else:
        return None
    if source_type == "date":
        return start_day, end_day - 1
    return start_day * _DAY_MICROS, end_day * _DAY_MICROS - 1


def _range_may_match(lo, hi, op: str, v) -> bool:
    """Can any value in [lo, hi] satisfy `value op v`?"""
    if op == "=":
        return lo <= v <= hi
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    raise ValueError(f"unsupported prune op {op!r}")


def read_iceberg_table(
    spark,
    root: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    prune=None,
    ref: str | None = None,
    with_row_lineage: bool = False,
):
    """Read an Iceberg v1/v2/v3 table at `snapshot_id` (None = current)
    with plain Spark parquet scans — the consumer half, no iceberg jar:
    version-hint → metadata.json → manifest list (Avro) → manifests →
    live file set; partition values come from the manifests' typed
    partition structs (the Iceberg rule — paths are opaque).

    v2 merge-on-read: the reader applies the spec's sequence-number
    inheritance (a null entry `data_sequence_number` on an ADDED entry
    inherits the manifest-list row's `sequence_number`; EXISTING/DELETED
    entries must carry it explicitly), collects content=1 delete
    manifests, and masks BOTH delete flavors with broadcast anti-joins:
    positional delete files drop (file, `_metadata.row_index`) pairs
    where delete.seq >= data.seq, and equality delete files (what
    streaming upsert writers like Flink emit; matched null-safe on the
    `equality_ids` columns) drop strictly-older rows where
    delete.seq > data.seq — the spec's asymmetry. Equality deletes may
    reference identity partition columns (attached before masking).

    PARTITION-SPEC EVOLUTION: every manifest's `partition_spec_id` is
    resolved against the metadata's `partition-specs` list — files
    written before a repartition are typed and pruned under THEIR spec,
    not the current one; live files are scanned in one group per
    distinct identity-column layout and unioned.

    SCHEMA EVOLUTION: the snapshot is read under ITS schema (snapshot
    `schema-id` against the `schemas` list). When any id↔name binding
    is non-unique across schemas (a rename or re-add happened), each
    live file's columns resolve per-file — by parquet field id when the
    file carries ids, else through `schema.name-mapping.default` — via
    executor-parallel footer probes, one scan per resolution signature;
    otherwise the by-name fast path runs unchanged. Fields with a v3
    `initial-default` fill that value for files written before the
    column existed (stored NULLs stay NULL). `with_row_lineage=True`
    (v3 only) appends `_row_id` = file first_row_id + position, stable
    across MoR deletes.

    `prune` is an ADVISORY list of (column, op, value) conjuncts with
    op in =, <, <=, >, >= : files whose stats (manifest
    lower/upper_bounds, Appendix-D decoded) or identity partition
    values prove no row can match are dropped BEFORE the scan — the
    driver-side file-skipping step real Iceberg engines run, and at
    100 TB the difference between reading the matching files and
    reading the table. The result is a SUPERSET of matching rows
    (files without stats are kept); the caller still applies the real
    filter — which Catalyst then also pushes into the surviving scans.

    100 TB plan shape: metadata resolution is driver-side and
    proportional to file count; the data read is ONE parquet scan per
    distinct identity-column layout (one scan for the common
    single-spec table; a handful after spec evolution) with a broadcast
    file→partition-values join (identical to read_delta_table) plus,
    under MoR, a broadcast left-anti join against the delete set —
    fine while per-snapshot deletes are small relative to data (the
    MoR design point; a compaction rewrites when they are not)."""
    import urllib.parse

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if root.startswith(("http://", "https://")):
        # REST-catalog discovery (operators/rest_catalog.py): `root` is
        # the spec's load-table endpoint
        # (`http://host:port/v1/namespaces/{ns}/tables/{t}`); the
        # LoadTableResult's metadata document replaces the
        # version-hint.text walk. Data/manifest I/O still goes straight
        # to the paths the metadata references — the catalog serves
        # only the pointer, like any real Iceberg catalog.
        from .rest_catalog import rest_load_table

        metadata = rest_load_table(root)["metadata"]
        meta_dir = root  # label for error messages only
    else:
        meta_dir = os.path.join(root, "metadata")
        with open(os.path.join(meta_dir, "version-hint.text")) as fh:
            n = int(fh.read().strip())
        with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
            metadata = json.load(fh)
    fv = metadata.get("format-version", 1)
    if fv not in (1, 2, 3):
        raise NotImplementedError(
            f"only Iceberg format-versions 1-3 are read here (got {fv})"
        )
    if with_row_lineage and fv < 3:
        raise ValueError(
            f"row lineage is a format-version 3 feature (table is v{fv})"
        )
    if sum(x is not None for x in (snapshot_id, as_of_ms, ref)) > 1:
        raise ValueError("pass at most one of snapshot_id, as_of_ms, ref")
    if ref is not None:
        # named refs (spec `refs`): branches and tags both resolve to a
        # snapshot id — the read-side of the Nessie-style branch story
        r = (metadata.get("refs") or {}).get(ref)
        if r is None:
            raise ValueError(
                f"ref {ref!r} not found in {meta_dir} "
                f"(refs: {sorted(metadata.get('refs') or {})})"
            )
        snapshot_id = r["snapshot-id"]
    if as_of_ms is not None:
        # TIMESTAMP AS OF per the spec: the snapshot-log records every
        # current-snapshot change in time order; resolve to the last
        # entry at or before the requested instant
        eligible = [
            e for e in metadata.get("snapshot-log", [])
            if e["timestamp-ms"] <= as_of_ms
        ]
        if not eligible:
            raise ValueError(
                f"no snapshot at or before timestamp {as_of_ms} in {meta_dir}"
            )
        sid = eligible[-1]["snapshot-id"]
    else:
        sid = (
            snapshot_id
            if snapshot_id is not None
            else metadata["current-snapshot-id"]
        )
    if sid is None or sid == -1:
        # A table with no current snapshot (freshly created through the
        # catalog, nothing committed yet; the spec writes -1). SELECT *
        # must work and return zero rows under the table schema.
        if snapshot_id is not None or metadata.get("snapshots"):
            raise ValueError(f"snapshot {sid} not found in {meta_dir}")
        empty_schema = T.StructType(
            [
                T.StructField(
                    f["name"], _spark_type(f["type"]), not f.get("required")
                )
                for f in metadata["schema"]["fields"]
            ]
        )
        return spark.createDataFrame([], empty_schema)
    snap = next(
        (s for s in metadata["snapshots"] if s["snapshot-id"] == sid), None
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} not found in {meta_dir}")
    _, manifest_files = read_avro(snap["manifest-list"])
    files: dict[str, dict] = {}
    file_seq: dict[str, int] = {}
    # PARTITION-SPEC EVOLUTION: each manifest's files carry partition
    # values typed under the spec the manifest was written with
    # (manifest-list field 502) — a long-lived table repartitioned over
    # its life has manifests under several specs, and typing/pruning a
    # file under the wrong spec corrupts reads
    default_sid = metadata.get("default-spec-id", 0)
    file_spec: dict[str, int] = {}
    # v3 ROW LINEAGE (consumer half): each data file's starting _row_id
    # — explicit field 142, or assigned from the manifest's first_row_id
    # plus the record counts of preceding null-first_row_id ADDED
    # entries (the spec's inheritance rule)
    file_first: dict[str, int | None] = {}
    pos_deletes: list[tuple[str, int]] = []  # (delete file path, its seq)
    eq_deletes: list[tuple[str, int, tuple]] = []  # (+ equality field ids)
    # v3 deletion vectors: (puffin path, offset, size, referenced data
    # file, seq, cardinality)
    dv_deletes: list[tuple[str, int, int, str, int, int]] = []
    # v3 row-lineage manifest inheritance (spec "Row Lineage"): a DATA
    # manifest whose manifest-list row leaves first_row_id null
    # inherits it from the SNAPSHOT's first-row-id, advanced by the
    # added_rows_count of preceding null-first_row_id data manifests in
    # list order. This engine's own trees write explicit ids
    # everywhere; the fallback is for external v3 writers that rely on
    # inheritance.
    snap_row_cursor = snap.get("first-row-id") if fv >= 3 else None
    for mf in manifest_files:
        m_seq = mf.get("sequence_number")
        m_content = mf.get("content") or 0
        m_sid = mf.get("partition_spec_id")
        if m_sid is None:
            m_sid = default_sid
        if fv >= 2 and m_seq is None:
            raise ValueError(
                "v2 manifest-list row missing required sequence_number: "
                + mf.get("manifest_path", "?")
            )
        _, entries = read_avro(mf["manifest_path"])
        m_first = mf.get("first_row_id")
        if (
            m_first is None
            and m_content == 0
            and snap_row_cursor is not None
            # only manifests ADDED BY this snapshot may inherit; a
            # carried-forward manifest must keep its original explicit
            # id (else old rows would receive the NEW snapshot's range)
            and mf.get("added_snapshot_id") == snap["snapshot-id"]
        ):
            m_first = snap_row_cursor
            snap_row_cursor += mf.get("added_rows_count") or 0
        m_assigned = 0
        for e in entries:
            df_rec = e["data_file"]
            seq = e.get("data_sequence_number")
            if seq is None:
                if e["status"] == 1:  # ADDED: inherit (spec rule)
                    seq = m_seq if m_seq is not None else 0
                elif fv >= 2:
                    raise ValueError(
                        "v2+ EXISTING/DELETED entry missing explicit "
                        f"data_sequence_number: {df_rec.get('file_path')}"
                    )
                else:
                    seq = 0
            if m_content == 1:  # delete manifest
                if e["status"] == 2:
                    continue
                if df_rec.get("content") == 2:
                    ids = df_rec.get("equality_ids")
                    if not ids:
                        raise ValueError(
                            "equality delete file without equality_ids: "
                            + df_rec["file_path"]
                        )
                    eq_deletes.append(
                        (df_rec["file_path"], seq, tuple(ids))
                    )
                    continue
                # DV classification: PUFFIN format (or a content_offset,
                # which only DV blobs carry) marks a deletion vector.
                # referenced_data_file alone does NOT — the spec allows
                # it (field id 143) on v2 position-delete PARQUET
                # entries as a single-file hint, and such files remain
                # ordinary position deletes (also inside upgraded v3
                # mixed trees).
                is_dv = (
                    str(df_rec.get("file_format", "")).upper() == "PUFFIN"
                    or df_rec.get("content_offset") is not None
                )
                if is_dv:
                    if fv < 3:
                        raise ValueError(
                            f"deletion-vector entry in a v{fv} table: "
                            + df_rec["file_path"]
                        )
                    if (
                        df_rec.get("content_offset") is None
                        or df_rec.get("content_size_in_bytes") is None
                        or df_rec.get("referenced_data_file") is None
                    ):
                        raise ValueError(
                            "deletion-vector entry missing referenced_"
                            "data_file/content_offset/content_size_in_"
                            "bytes: " + df_rec["file_path"]
                        )
                    dv_deletes.append(
                        (
                            df_rec["file_path"],
                            df_rec["content_offset"],
                            df_rec["content_size_in_bytes"],
                            df_rec["referenced_data_file"],
                            seq,
                            df_rec["record_count"],
                        )
                    )
                    continue
                pos_deletes.append((df_rec["file_path"], seq))
                continue
            if e["status"] == 2:  # DELETED
                files.pop(df_rec["file_path"], None)
                file_seq.pop(df_rec["file_path"], None)
                file_spec.pop(df_rec["file_path"], None)
                file_first.pop(df_rec["file_path"], None)
                continue
            if fv >= 2 and df_rec.get("content", 0) != 0:
                raise ValueError(
                    "delete file listed in a content=0 data manifest: "
                    + df_rec["file_path"]
                )
            if df_rec["file_format"].upper() != "PARQUET":
                raise NotImplementedError(
                    f"file format {df_rec['file_format']!r}"
                )
            files[df_rec["file_path"]] = df_rec
            file_seq[df_rec["file_path"]] = seq
            file_spec[df_rec["file_path"]] = m_sid
            frow = df_rec.get("first_row_id")
            if frow is None and e["status"] == 1 and m_first is not None:
                frow = m_first + m_assigned
                m_assigned += df_rec.get("record_count") or 0
            file_first[df_rec["file_path"]] = frow
    # SCHEMA EVOLUTION (read side): a snapshot is read under ITS schema
    # (spec: snapshot `schema-id` resolves against the `schemas` list) —
    # time travel across a rename/add/drop surfaces each era's own
    # column set; a snapshot without a recorded schema-id falls back to
    # the current schema
    schema_fields = metadata["schema"]["fields"]
    all_schemas = metadata.get("schemas") or [metadata["schema"]]
    if snap.get("schema-id") is not None:
        _by_sid_schema = {s["schema-id"]: s for s in all_schemas}
        if snap["schema-id"] in _by_sid_schema:
            schema_fields = _by_sid_schema[snap["schema-id"]]["fields"]
    _nm_raw = (metadata.get("properties") or {}).get(
        "schema.name-mapping.default"
    )
    name_mapping = json.loads(_nm_raw) if _nm_raw else []
    if any(e.get("fields") for e in name_mapping):
        raise NotImplementedError(
            "nested name-mapping entries (field resolution here is "
            "top-level; nested structs are matched by name)"
        )
    # by-NAME scans are sound iff no field was ever renamed or re-added:
    # every id<->name binding must be unique across all schemas plus the
    # name mapping. Otherwise each live file's columns are resolved by
    # parquet field id (real-engine files) or via the name mapping
    # (id-less files, e.g. plain-Spark-written ones) — the slow path,
    # engaged only on evolved tables.
    _id2names: dict[int, set] = {}
    _name2ids: dict[str, set] = {}
    for s in all_schemas:
        for f in s["fields"]:
            _id2names.setdefault(f["id"], set()).add(f["name"])
            _name2ids.setdefault(f["name"], set()).add(f["id"])
    for e in name_mapping:
        for _nm in e.get("names") or []:
            _id2names.setdefault(e["field-id"], set()).add(_nm)
            _name2ids.setdefault(_nm, set()).add(e["field-id"])
    # v3 DEFAULT VALUES: a field's `initial-default` fills rows from
    # files written before the column existed (spec "Default values");
    # its presence forces per-file resolution — only the footer probes
    # can tell which files lack the column (a stored NULL must stay
    # NULL; only ABSENCE takes the default)
    defaults = {
        f["name"]: (f["type"], f["initial-default"])
        for f in schema_fields
        if f.get("initial-default") is not None
    }
    by_name_safe = (
        all(len(v) == 1 for v in _id2names.values())
        and all(len(v) == 1 for v in _name2ids.values())
        and not defaults
    )
    all_specs = {
        s["spec-id"]: s for s in metadata["partition-specs"]
    }
    import re as _re

    _PARAM_RE = _re.compile(r"(bucket|truncate)\[(\d+)\]")
    # resolve every spec REFERENCED BY A LIVE FILE (an abandoned
    # historical spec with an exotic transform must not block the read)
    used_sids = sorted(set(file_spec.values()))
    specs_of: dict[int, dict] = {}
    for sid in used_sids:
        if sid not in all_specs:
            raise ValueError(
                f"manifest references partition-spec-id {sid}, absent "
                f"from partition-specs (have {sorted(all_specs)})"
            )
        specs_of[sid] = {
            f["name"]: f for f in all_specs[sid]["fields"]
        }
        for f in specs_of[sid].values():
            t = f["transform"]
            if t not in (
                "identity", "day", "month", "year", "hour"
            ) and not _PARAM_RE.fullmatch(t):
                raise NotImplementedError(f"partition transform {t!r}")
    # identity fields attach as real columns; day/month/year and
    # bucket[N]/truncate[W] transforms are HIDDEN partitioning (the
    # partition value is derived from a source column that IS in the
    # schema) — nothing to attach, the manifests' typed values exist
    # for pruning only. Per spec, the identity set can DIFFER per file.
    # SCHEMA × SPEC EVOLUTION: an identity spec field keeps its
    # HISTORICAL name in old manifests' partition structs even after
    # its source column is renamed — so identity columns resolve by
    # SOURCE-ID against the read schema (ident_of maps read-schema name
    # → the spec field name the values are stored under); a spec field
    # whose source was dropped from the read schema simply detaches.
    _id_to_read_name = {f["id"]: f["name"] for f in schema_fields}
    ident_of: dict[int, dict[str, str]] = {
        sid: {
            _id_to_read_name[f["source-id"]]: n
            for n, f in sp.items()
            if f["transform"] == "identity"
            and f.get("source-id") in _id_to_read_name
        }
        for sid, sp in specs_of.items()
    }
    pcols_of = {sid: list(m) for sid, m in ident_of.items()}
    if prune:
        from .iceberg_transforms import bucket_value, truncate_value

        by_name = {f["name"]: f for f in schema_fields}

        def _hidden_may_match(rec, sname, sf, f, op, val) -> bool:
            """Can this file's hidden partition value hold a row
            matching `source op val`? bucket prunes equality (hash the
            predicate value, compare buckets); truncate[W] over ints
            covers [t, t+W-1] so all range ops prune, over strings
            equality prunes by prefix; day/month/year binners cover a
            calendar interval in the source domain, so every range op
            prunes — the path that matters on external trees whose
            manifests lack column stats."""
            pv = (rec.get("partition") or {}).get(sname)
            if pv is None:
                return True
            m = _PARAM_RE.fullmatch(sf["transform"])
            if not m:
                rng = _transform_range(sf["transform"], f["type"], pv)
                if rng is None:
                    return True
                try:
                    v = _pred_value(f["type"], val)
                except (ValueError, TypeError):
                    return True
                return _range_may_match(rng[0], rng[1], op, v)
            kind, param = m.group(1), int(m.group(2))
            if kind == "bucket":
                if op != "=":
                    return True
                try:
                    return bucket_value(val, param, f["type"]) == pv
                except (NotImplementedError, ValueError, TypeError):
                    return True
            if f["type"] in ("int", "long"):
                try:
                    v = _pred_value(f["type"], val)
                except (ValueError, TypeError):
                    return True
                return _range_may_match(pv, pv + param - 1, op, v)
            if f["type"] == "string" and op == "=":
                try:
                    return truncate_value(val, param, "string") == pv
                except (ValueError, TypeError):
                    return True
            return True

        def may_match(rec, spec, pcols, ident) -> bool:
            for col, op, val in prune:
                if col in pcols:
                    # values are stored under the spec field's
                    # HISTORICAL name (pre-rename)
                    pv = (rec.get("partition") or {}).get(
                        ident.get(col, col)
                    )
                    if pv is None:
                        continue  # null/absent partition value: keep
                    ptype = by_name[col]["type"] if col in by_name else "string"
                    try:
                        v = _pred_value(ptype, val)
                    except (ValueError, TypeError):
                        continue
                    if not _range_may_match(pv, pv, op, v):
                        return False
                    continue
                f = by_name.get(col)
                if f is None:
                    raise ValueError(f"prune column {col!r} not in schema")
                for sname, sf in spec.items():
                    if sf.get("source-id") == f["id"] and sf["transform"] != "identity":
                        if not _hidden_may_match(rec, sname, sf, f, op, val):
                            return False
                fid = f["id"]
                lob = {
                    r["key"]: r["value"] for r in rec.get("lower_bounds") or []
                }.get(fid)
                hib = {
                    r["key"]: r["value"] for r in rec.get("upper_bounds") or []
                }.get(fid)
                if lob is None or hib is None:
                    continue  # no stats: cannot prune, keep
                lo = _decode_bound(f["type"], lob)
                hi = _decode_bound(f["type"], hib)
                if lo is None or hi is None:
                    continue
                try:
                    v = _pred_value(f["type"], val)
                except (ValueError, TypeError):
                    continue
                if not _range_may_match(lo, hi, op, v):
                    return False
            return True

        files = {
            p: rec
            for p, rec in files.items()
            if may_match(
                rec,
                specs_of[file_spec[p]],
                pcols_of[file_spec[p]],
                ident_of[file_spec[p]],
            )
        }
        file_seq = {p: s for p, s in file_seq.items() if p in files}
    full_schema = T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), True)
            for f in schema_fields
        ]
    )
    if with_row_lineage:
        full_schema = T.StructType(
            list(full_schema.fields)
            + [T.StructField("_row_id", T.LongType(), True)]
        )
    if not files:
        return spark.createDataFrame([], full_schema)
    if with_row_lineage:
        full_schema = T.StructType(full_schema.fields[:-1])
    any_deletes = bool(pos_deletes or eq_deletes or dv_deletes)
    need_pos = any_deletes or with_row_lineage
    # group live files by their spec's IDENTITY column set: files of an
    # identity-partitioned spec physically lack those columns (they are
    # reconstructed from the manifests' typed partition values), so an
    # evolved table needs one scan per distinct identity layout — a
    # handful of unions, never per-file work
    schema_order = [f.name for f in full_schema.fields]
    # FIELD-ID RESOLUTION (slow path; evolved tables only): each live
    # file's top-level columns are mapped to the read schema — by
    # parquet field id when the file carries ids (what real Iceberg
    # writers emit), else via the table's name mapping (id-less files
    # after a rename), else by direct name. Footers are read
    # EXECUTOR-parallel (one tiny tuple per file comes back — the same
    # O(files) driver state the manifests already produced); files
    # sharing a resolution signature scan together, so an evolved table
    # costs one scan per (identity layout × column-name era), never
    # per-file work.
    field_ids = {f["name"]: f["id"] for f in schema_fields}
    resolution_of: dict[str, tuple] = {}
    if not by_name_safe and files:
        alias_of: dict[int, list[str]] = {}
        for e in name_mapping:
            for _nm in e.get("names") or []:
                alias_of.setdefault(e["field-id"], []).append(_nm)
        paths = sorted({os.path.abspath(p) for p in files})

        def _footer_cols(p):
            import pyarrow.parquet as pq

            out = []
            for f in pq.read_schema(p):
                md = f.metadata or {}
                fid = md.get(b"PARQUET:field_id")
                out.append((f.name, int(fid) if fid is not None else None))
            return (p, tuple(out))

        footers = dict(
            spark.sparkContext.parallelize(
                paths, max(1, min(len(paths), 256))
            )
            .map(_footer_cols)
            .collect()
        )
        for p, cols in footers.items():
            in_file = {n for n, _ in cols}
            if any(fid is not None for _, fid in cols):
                by_id = {fid: n for n, fid in cols if fid is not None}
                resolved = {
                    n: by_id.get(field_ids[n]) for n in schema_order
                }
            else:
                # id-less file: each physical column may be claimed by
                # a schema field directly (same name) or through a
                # name-mapping alias; a column claimed by TWO fields
                # (a swap-rename) is genuinely ambiguous — refuse
                claims: dict[str, list[str]] = {}
                for n in schema_order:
                    fid = field_ids[n]
                    cands = {
                        a
                        for a in (n, *alias_of.get(fid, ()))
                        if a in in_file
                    }
                    for c in cands:
                        claims.setdefault(c, []).append(n)
                multi = {c: ns for c, ns in claims.items() if len(ns) > 1}
                if multi:
                    raise ValueError(
                        "ambiguous column resolution in id-less file "
                        f"{p}: {multi} — a swap-rename on files "
                        "without parquet field ids cannot be read "
                        "safely"
                    )
                owner = {ns[0]: c for c, ns in claims.items()}
                resolved = {n: owner.get(n) for n in schema_order}
            # REQUEST name per field (+ absent flag, which routes
            # `initial-default` fills): the resolved physical name; an
            # unresolved field null-fills — requested under its own
            # name unless the file binds that name to a DIFFERENT
            # field (drop + re-add), where a synthetic surely-absent
            # name is requested instead so old data never resurfaces
            req = []
            for n in schema_order:
                src = resolved.get(n)
                absent = src is None
                if src is None:
                    src = n
                    if n in in_file:
                        src = f"{n}__absent_f{field_ids[n]}"
                        while src in in_file:
                            src += "_"
                req.append((src, absent))
            resolution_of[p] = tuple(req)
    groups: dict[tuple, dict[str, dict]] = {}
    ident_vals: dict[str, dict] = {}
    for p, rec in files.items():
        ap = os.path.abspath(p)
        icols = tuple(
            c for c in schema_order if c in pcols_of[file_spec[p]]
        )
        ident_vals[ap] = {
            c: (rec.get("partition") or {}).get(
                ident_of[file_spec[p]][c]
            )
            for c in icols
        }
        groups.setdefault((icols, resolution_of.get(ap)), {})[ap] = rec
    need_file = (
        need_pos
        or any(icols for icols, _ in groups)
        or len(groups) > 1
    )
    if need_file:
        from .mor_diff import guard_reserved_columns

        guard_reserved_columns(
            [f.name for f in full_schema.fields],
            ("_file", "_pos", "_fseq", "_first", "_row_id"),
            "read_iceberg_table",
        )
    iceberg_types = {f["name"]: f["type"] for f in schema_fields}

    def from_typed(col: str, v):
        if v is None:
            return None
        if iceberg_types[col] == "date":
            return _EPOCH + datetime.timedelta(days=int(v))
        return v

    parts = []
    for (gkey, gres), gpaths in groups.items():
        data_fields = [f for f in full_schema.fields if f.name not in gkey]
        rename: dict[str, str] = {}
        fills: dict[str, object] = {}
        if gres is not None:
            # read each table column under the FILE's name for it (an
            # unresolved column is requested under its table name and
            # null-fills — the add-column case — unless the field
            # carries an `initial-default`, which fills instead);
            # Spark's parquet reader natively widens int→long /
            # float→double / decimal precision, so promoted columns
            # need no cast
            res_by_name = dict(zip(schema_order, gres))
            read_fields = []
            for f in data_fields:
                src, absent = res_by_name.get(f.name, (f.name, False))
                if absent and f.name in defaults:
                    it, dv = defaults[f.name]
                    fills[f.name] = F.lit(_default_value(it, dv)).cast(
                        f.dataType
                    )
                    continue
                read_fields.append(T.StructField(src, f.dataType, True))
                if src != f.name:
                    rename[src] = f.name
            req = [f.name for f in read_fields]
            if len(set(req)) != len(req):
                raise ValueError(
                    "ambiguous column resolution (one file name serves "
                    f"two schema fields): {sorted(req)} — a swap-rename "
                    "on id-less files cannot be read safely"
                )
            data_fields = read_fields
        data_schema = T.StructType(data_fields)
        gdf = spark.read.schema(data_schema).parquet(*gpaths)
        if rename:
            gdf = gdf.select(
                *[
                    F.col(f.name).alias(rename.get(f.name, f.name))
                    for f in data_fields
                ]
            )
        for name, lit in fills.items():
            gdf = gdf.withColumn(name, lit)
        if need_file:
            gdf = gdf.withColumn(
                "_file",
                F.regexp_replace(F.input_file_name(), _SCHEME_RE, "/"),
            )
        if need_pos:
            gdf = gdf.withColumn("_pos", F.col("_metadata.row_index"))
        if gkey:
            # identity columns from the manifests' typed partition
            # values — a |group files|-row broadcast mapping
            mapping = spark.createDataFrame(
                [
                    (p, *[from_typed(c, ident_vals[p].get(c)) for c in gkey])
                    for p in gpaths
                ],
                T.StructType(
                    [T.StructField("_file", T.StringType())]
                    + [
                        T.StructField(c, _spark_type(iceberg_types[c]), True)
                        for c in gkey
                    ]
                ),
            )
            gdf = gdf.join(F.broadcast(mapping), "_file")
        sel = list(schema_order)
        if need_file:
            sel.append("_file")
        if need_pos:
            sel.append("_pos")
        parts.append(gdf.select(*sel))
    df = parts[0]
    for p_df in parts[1:]:
        df = df.unionByName(p_df)
    if any_deletes:
        # attach each data row's (inherited) sequence number via the
        # broadcast |files|-row map — BOTH delete flavors compare
        # against it: positional applies at delete.seq >= data.seq,
        # equality at delete.seq > data.seq (the spec's asymmetry:
        # a positional delete can target rows of its own commit, an
        # equality delete only strictly older data)
        fseq_map = spark.createDataFrame(
            [(os.path.abspath(p), s) for p, s in file_seq.items()],
            "_file STRING, _fseq BIGINT",
        )
        df = df.join(F.broadcast(fseq_map), "_file")
    dv_files: set[str] = set()
    dv_rows: list[tuple[str, int, int]] = []
    if dv_deletes:
        # v3 DELETION VECTORS (Puffin): decode driver-side — bounded by
        # each DV's cardinality, the spec's design point (a DV indexes
        # rows of ONE data file; compaction folds large ones) — then
        # mask with the same broadcast anti-join as positional deletes
        # (applies at dv.seq >= data.seq).
        from .puffin import read_dv

        for path, off, size, ref, dseq, card in dv_deletes:
            ref_abs = os.path.abspath(ref)
            if ref_abs in dv_files:
                raise ValueError(
                    f"multiple deletion vectors reference data file "
                    f"{ref}: invalid v3 table (at most one DV per file)"
                )
            positions = read_dv(path, off, size)
            if len(positions) != card:
                raise ValueError(
                    f"deletion-vector cardinality mismatch for {ref}: "
                    f"entry says {card}, bitmap holds {len(positions)}"
                )
            dv_files.add(ref_abs)
            dv_rows.extend((ref_abs, p, dseq) for p in positions)
    if pos_deletes:
        dseq_by_path = {os.path.abspath(p): s for p, s in pos_deletes}
        dmap = spark.createDataFrame(
            list(dseq_by_path.items()), "_dfile STRING, _dseq BIGINT"
        )
        mask = (
            spark.read.parquet(*dseq_by_path)
            .withColumn(
                "_dfile", F.regexp_replace(F.input_file_name(), _SCHEME_RE, "/")
            )
            .join(F.broadcast(dmap), "_dfile")
            .select("file_path", "pos", "_dseq")
        )
        if dv_files:
            # the spec's upgrade rule: a data file that has a DV must
            # IGNORE its (older, v2-era) positional delete files — the
            # DV supersedes them
            mask = mask.where(~F.col("file_path").isin(sorted(dv_files)))
        mask = mask.alias("m")
        d = df.alias("d")
        df = d.join(
            F.broadcast(mask),
            (F.col("d._file") == F.col("m.file_path"))
            & (F.col("d._pos") == F.col("m.pos"))
            & (F.col("m._dseq") >= F.col("d._fseq")),
            "left_anti",
        )
    if dv_rows:
        vmask = spark.createDataFrame(
            dv_rows, "file_path STRING, pos BIGINT, _dseq BIGINT"
        ).alias("v")
        d = df.alias("d")
        df = d.join(
            F.broadcast(vmask),
            (F.col("d._file") == F.col("v.file_path"))
            & (F.col("d._pos") == F.col("v.pos"))
            & (F.col("v._dseq") >= F.col("d._fseq")),
            "left_anti",
        )
    if eq_deletes:
        # equality deletes (what streaming upsert writers like Flink
        # emit): each delete row removes every strictly-older data row
        # matching on the equality_ids columns (null-safe, per spec).
        # One broadcast anti-join per distinct equality_ids set.
        # identity partition columns are already attached per group
        # (before the masks), so equality deletes may reference them
        # like any other column
        id_to_name = {f["id"]: f["name"] for f in schema_fields}
        eq_groups: dict[tuple, list[tuple[str, int]]] = {}
        for p, s, ids in eq_deletes:
            eq_groups.setdefault(ids, []).append((p, s))
        for ids, plist in eq_groups.items():
            try:
                names = [id_to_name[i] for i in ids]
            except KeyError as exc:
                raise ValueError(
                    f"equality_ids {ids} reference unknown field id {exc}"
                ) from None
            dmap2 = spark.createDataFrame(
                [(os.path.abspath(p), s) for p, s in plist],
                "_dfile STRING, _dseq BIGINT",
            )
            dpaths = {os.path.abspath(p) for p, _ in plist}
            if by_name_safe:
                escan = spark.read.parquet(*dpaths).select(*names)
            else:
                # SCHEMA EVOLUTION: a delete file written BEFORE a
                # rename carries the old column name (and, from real
                # engines, parquet field ids) — resolve its columns the
                # same way as data files: by id, else name mapping.
                # Delete sets are small by design (the MoR design
                # point), so footers probe driver-side.
                import pyarrow.parquet as _pq

                name_types = {
                    f["name"]: _spark_type(f["type"])
                    for f in schema_fields
                }
                egroups: dict[tuple, list[str]] = {}
                for ap in sorted(dpaths):
                    cols = [
                        (
                            fld.name,
                            int(m[b"PARQUET:field_id"])
                            if (m := fld.metadata or {}).get(
                                b"PARQUET:field_id"
                            )
                            is not None
                            else None,
                        )
                        for fld in _pq.read_schema(ap)
                    ]
                    if any(fid is not None for _, fid in cols):
                        by_id = {
                            fid: nm for nm, fid in cols if fid is not None
                        }
                        res = tuple(by_id.get(i) for i in ids)
                    else:
                        in_f = {nm for nm, _ in cols}
                        alias_lists = {
                            e["field-id"]: e.get("names") or []
                            for e in name_mapping
                        }
                        res = tuple(
                            next(
                                (
                                    a
                                    for a in (
                                        id_to_name.get(i, ""),
                                        *alias_lists.get(i, ()),
                                    )
                                    if a in in_f
                                ),
                                None,
                            )
                            for i in ids
                        )
                    if any(r is None for r in res):
                        raise ValueError(
                            f"equality delete file {ap} does not "
                            f"contain the equality_ids columns {ids} "
                            f"(resolved: {res})"
                        )
                    egroups.setdefault(res, []).append(ap)
                parts_e = []
                for res, paths_e in egroups.items():
                    sch = T.StructType(
                        [
                            T.StructField(src, name_types[tgt], True)
                            for src, tgt in zip(res, names)
                        ]
                    )
                    parts_e.append(
                        spark.read.schema(sch)
                        .parquet(*paths_e)
                        .select(
                            *[
                                F.col(src).alias(tgt)
                                for src, tgt in zip(res, names)
                            ]
                        )
                    )
                escan = parts_e[0]
                for pe in parts_e[1:]:
                    escan = escan.unionByName(pe)
            ddf = (
                escan.withColumn(
                    "_dfile",
                    F.regexp_replace(
                        F.input_file_name(), _SCHEME_RE, "/"
                    ),
                )
                .join(F.broadcast(dmap2), "_dfile")
                .alias("e")
            )
            d = df.alias("d")
            cond = F.col("e._dseq") > F.col("d._fseq")
            for nm in names:
                cond = cond & F.col(f"d.{nm}").eqNullSafe(F.col(f"e.{nm}"))
            df = d.join(F.broadcast(ddf), cond, "left_anti")
    out_cols = [f.name for f in full_schema.fields]
    if with_row_lineage:
        # v3 ROW LINEAGE: _row_id = the file's first_row_id + the row's
        # position — STABLE across MoR deletes and metadata rewrites
        # (surviving rows keep their ids; only a data-file rewrite
        # re-assigns). A |files|-row broadcast map, one projection.
        _unresolved = [p for p in files if file_first.get(p) is None]
        if _unresolved:
            # a carried-forward manifest with null first_row_id is
            # spec-invalid (only a snapshot's OWN manifests inherit);
            # inventing ids here would collide with real ones — refuse
            raise ValueError(
                "row lineage requested but no first_row_id resolves "
                f"for {len(_unresolved)} data file(s), e.g. "
                f"{_unresolved[0]} (carried-forward manifest with null "
                "first_row_id?)"
            )
        fmap = spark.createDataFrame(
            [
                (os.path.abspath(p), file_first.get(p))
                for p in files
            ],
            "_file STRING, _first BIGINT",
        )
        df = df.join(F.broadcast(fmap), "_file").withColumn(
            "_row_id", F.col("_first") + F.col("_pos")
        )
        out_cols.append("_row_id")
    return df.select(*out_cols)


def migrate_parquet_dir(
    spark,
    root: str,
    source_dir: str,
    timestamp_ms: int = 0,
) -> str:
    """Iceberg `add_files` / snapshot-table MIGRATION: register the
    parquet files of an existing (possibly Hive-partitioned `k=v`)
    directory into a NEW Iceberg `metadata/` tree under `root` —
    IN PLACE, zero data rewritten. This is how a plain parquet lake
    adopts Iceberg: the tree's manifests point at the original files
    (which may live OUTSIDE `root`; maintenance actions fence deletion
    to the root, so originals are never GC'd).

    Spec obligations honored: the migrated files carry no parquet field
    ids, so the table gets a `schema.name-mapping.default` binding each
    name to its assigned field id — the property that keeps these files
    readable through later renames ("Name Mapping Serialization", the
    round's schema-evolution reader applies it). Hive partition dirs
    become an identity partition spec with typed per-file partition
    values (partition columns are read from the directory names exactly
    as Spark inferred their types), so partition pruning works from the
    first read. Column stats come from the parquet FOOTERS, read
    EXECUTOR-parallel — the driver receives one stats tuple per file,
    the same O(files) state the manifest write needs anyway.

    Returns the metadata directory. format-version 2, one `append`
    snapshot."""
    src_abs = os.path.abspath(source_dir)
    paths_all = sorted(
        os.path.join(dirpath, fn)
        for dirpath, _d, fns in os.walk(src_abs)
        for fn in fns
        if fn.endswith(".parquet") and not fn.startswith((".", "_"))
    )
    if not paths_all:
        raise ValueError(f"no parquet files under {source_dir}")
    pcols: list[str] = []
    part_of: dict[str, dict] = {}
    for p in paths_all:
        rel = os.path.relpath(p, src_abs)
        vals = {}
        for comp in rel.split(os.sep)[:-1]:
            if "=" in comp:
                k, v = comp.split("=", 1)
                v = urllib.parse.unquote(v)
                vals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else v
                )
        part_of[p] = vals
        for k in vals:
            if k not in pcols:
                pcols.append(k)
    if any(sorted(part_of[p]) != sorted(pcols) for p in part_of):
        raise ValueError(
            f"inconsistent partition layout under {source_dir}: "
            f"expected columns {pcols}"
        )
    df = spark.read.parquet(source_dir)  # schema analysis only, no scan
    if any(
        f.dataType.simpleString() == "variant" for f in df.schema.fields
    ):
        # migrate emits format-version 2 and reads footers with pyarrow
        # (which rejects the Parquet VARIANT logical type); variant is a
        # v3-only schema type, so an in-place migration of variant
        # parquet cannot produce a spec-valid v2 tree — refuse with the
        # reason rather than crash mid-job in _footer_stats
        raise NotImplementedError(
            "migrate_parquet_dir does not support VARIANT columns: the "
            "migration emits a format-version 2 tree and variant is a "
            "v3-only type; rewrite through SnapshotTable + "
            "export_iceberg_metadata(format_version=3) instead"
        )
    fields = []
    col_ids: dict[str, int] = {}
    for i, f in enumerate(df.schema.fields, start=1):
        col_ids[f.name] = i
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": False,
                "type": _iceberg_type(f.dataType.simpleString()),
            }
        )
    missing = [c for c in pcols if c not in col_ids]
    if missing:
        raise ValueError(f"partition dirs name unknown columns {missing}")
    type_of = {f["name"]: f["type"] for f in fields}
    spec_fields = [
        {
            "name": c,
            "transform": "identity",
            "source-id": col_ids[c],
            "type": type_of[c],
            "field-id": 1000 + i,
        }
        for i, c in enumerate(pcols)
    ]
    # footer stats + row counts in ONE executor-parallel footer pass
    # (data columns only — partition values live in the directory
    # names, not the files); no data bytes are read anywhere
    data_col_ids = {c: i for c, i in col_ids.items() if c not in pcols}
    data_types = {c: type_of[c] for c in data_col_ids}
    paths = paths_all

    def _footer_stats(p):
        import pyarrow.parquet as pq

        return (
            p,
            _file_column_stats(p, data_col_ids, data_types),
            pq.ParquetFile(p).metadata.num_rows,
        )

    rc_of: dict[str, int] = {}
    stats_of: dict[str, tuple] = {}
    for p, st, rc in (
        spark.sparkContext.parallelize(
            paths, max(1, min(len(paths), 256))
        )
        .map(_footer_stats)
        .collect()
    ):
        stats_of[p] = st
        rc_of[p] = rc
    meta_dir = os.path.join(root, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    entry_schema = _entry_schema(spec_fields, 2)
    entries = []
    for p in paths:
        vcounts, ncounts, lower, upper = stats_of[p]
        entries.append(
            {
                "status": 1,
                "snapshot_id": None,
                "data_sequence_number": None,  # inherited
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {
                        sf["name"]: _partition_value(
                            sf["type"], part_of[p].get(sf["name"])
                        )
                        for sf in spec_fields
                    },
                    "record_count": rc_of[p],
                    "file_size_in_bytes": os.path.getsize(p),
                    "value_counts": vcounts,
                    "null_value_counts": ncounts,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                },
            }
        )
    mpath = os.path.join(meta_dir, "m-00000-migrate.avro")
    write_avro(mpath, entry_schema, entries)
    list_path = os.path.join(meta_dir, "snap-1-1-manifest-list.avro")
    write_avro(
        list_path,
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
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(rc_of.values()),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
    )
    name_mapping = [
        {"field-id": f["id"], "names": [f["name"]]} for f in fields
    ]
    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, root)),
        "location": root,
        "last-sequence-number": 1,
        "last-updated-ms": timestamp_ms,
        "last-column-id": len(fields),
        "schema": {"type": "struct", "schema-id": 0, "fields": fields},
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": fields}
        ],
        "current-schema-id": 0,
        "partition-spec": [
            {k: v for k, v in sf.items() if k != "type"}
            for sf in spec_fields
        ],
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {k: v for k, v in sf.items() if k != "type"}
                    for sf in spec_fields
                ],
            }
        ],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": {
            "schema.name-mapping.default": json.dumps(name_mapping)
        },
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "sequence-number": 1,
                "timestamp-ms": timestamp_ms,
                "summary": {"operation": "append"},
                "manifest-list": list_path,
                "schema-id": 0,
            }
        ],
        "snapshot-log": [
            {"snapshot-id": 1, "timestamp-ms": timestamp_ms}
        ],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 1, "type": "branch"}},
    }
    meta_path = os.path.join(meta_dir, "v1.metadata.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write("1")
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return meta_dir


def export_iceberg_statistics(
    table: SnapshotTable,
    columns: list[str] | None = None,
    k: int = 4096,
):
    """Write an Iceberg TABLE STATISTICS file for the current snapshot:
    per-column NDV as `apache-datasketches-theta-v1` sketches in a
    Puffin container, referenced from the metadata's `statistics` field
    — the stats real engines (Trino, the reference's serving layer)
    feed into NDV-driven join planning at 100 TB.

    The sketches are REAL DataSketches compact theta sketches
    (operators/theta.py): byte-identical to datasketches-java in exact
    mode and heapify-able by it in estimation mode — verified against
    the actual library on Spark's classpath in tests/test_theta.py.
    Each blob carries the spec's `ndv` property.

    Run AFTER `export_iceberg_metadata` (regeneration rewrites the
    metadata file without statistics; re-run this to restore them).
    Columns default to every top-level long/int/string column.

    100 TB shape: per column, theta hashes are computed JVM-adjacent in
    an Arrow-batched pandas UDF, then ONE distinct + ordered-limit
    (k+1) — Spark's TakeOrdered partial top-k — ships only k+1 longs
    per partition to the driver; the KMV sketch is assembled there.
    Returns {column: estimate}."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .puffin import write_puffin
    from .theta import (
        build_from_hashes,
        estimate,
        murmur3_x64_128,
        serialize_compact,
    )

    meta_dir = os.path.join(table.root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    meta_path = os.path.join(meta_dir, f"v{n}.metadata.json")
    with open(meta_path) as fh:
        metadata = json.load(fh)
    sid = metadata["current-snapshot-id"]
    snap = next(s for s in metadata["snapshots"] if s["snapshot-id"] == sid)
    seq = snap.get("sequence-number", 0)
    field_id_of = {
        f["name"]: f["id"] for f in metadata["schema"]["fields"]
    }
    type_of = {
        f["name"]: f["type"] for f in metadata["schema"]["fields"]
    }
    df = read_iceberg_table(table.spark, table.root, snapshot_id=sid)
    if columns is None:
        columns = [
            c for c in df.columns if type_of.get(c) in ("long", "int", "string")
        ]
    bad = [c for c in columns if type_of.get(c) not in ("long", "int", "string")]
    if bad:
        raise NotImplementedError(
            f"theta NDV statistics support long/int/string columns; got "
            f"{[(c, type_of.get(c)) for c in bad]}"
        )

    # classic-style pandas_udf declarations: `from __future__ import
    # annotations` stringifies type hints, which the hint-based API
    # can't resolve inside a nested scope
    import struct as _st

    # Arrow delivers a long column CONTAINING nulls as float64, which
    # silently rounds |v| > 2^53 — so the plan below filters nulls
    # BEFORE the UDF (the series arrives as exact int64), and the UDF
    # additionally converts via pandas' nullable Int64 so a stray
    # null-bearing batch can never hash rounded values.
    _theta_hash_long = F.pandas_udf(
        lambda s: s.astype("Int64").map(
            lambda v: None
            if pd.isna(v)
            # Spark LongType is signed; pack signed, as the library does
            else murmur3_x64_128(_st.pack("<q", int(v)), 9001)[0] >> 1
        ),
        T.LongType(),
    )
    _theta_hash_str = F.pandas_udf(
        lambda s: s.map(
            lambda v: None
            if v is None
            else murmur3_x64_128(str(v).encode("utf-8"), 9001)[0] >> 1
        ),
        T.LongType(),
    )

    blobs = []
    estimates = {}
    for c in columns:
        kind = type_of[c]
        hcol = (
            _theta_hash_str(F.col("_v"))
            if kind == "string"
            else _theta_hash_long(F.col("_v").cast("long"))
        )
        rows = (
            # null-filter BEFORE the hash UDF: a null-free long batch
            # crosses Arrow as int64, never float64 (precision!)
            df.select(F.col(c).alias("_v"))
            .where(F.col("_v").isNotNull())
            .select(hcol.alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(k + 1)
            .collect()
        )
        # the top-k+1 smallest hashes ARE the KMV state: if fewer than
        # k+1 came back the sketch is exact
        sk = build_from_hashes((r["h"] for r in rows), k=k)
        est = estimate(sk)
        estimates[c] = est
        blobs.append(
            {
                "type": "apache-datasketches-theta-v1",
                "data": serialize_compact(sk),
                "snapshot-id": sid,
                "sequence-number": seq,
                "fields": [field_id_of[c]],
                "properties": {"ndv": str(int(round(est)))},
            }
        )
    for f in os.listdir(meta_dir):
        # replace-on-rewrite: prior statistics files are superseded by
        # this run (sole-writer assumption, same as the exporters)
        if f.startswith("stats-") and f.endswith(".puffin"):
            os.remove(os.path.join(meta_dir, f))
    stats_path = os.path.join(meta_dir, f"stats-{sid}-{n}.puffin")
    blob_metas = write_puffin(
        stats_path, blobs, properties={"created-by": "spark-graft theta"}
    )
    size = os.path.getsize(stats_path)
    # footer = trailing Magic + payload + size + flags + Magic
    data_end = max(
        (bm["offset"] + bm["length"] for bm in blob_metas), default=4
    )
    metadata["statistics"] = [
        {
            "snapshot-id": sid,
            "statistics-path": stats_path,
            "file-size-in-bytes": size,
            "file-footer-size-in-bytes": size - data_end,
            "blob-metadata": blob_metas,
        }
    ]
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    return estimates


def read_iceberg_statistics(spark, root: str) -> dict:
    """Read the current snapshot's table-statistics Puffin back:
    {column_name: {"ndv": int, "estimate": float, "retained": int}}.
    Verifies blob types and field-id resolution."""
    from .puffin import read_blob
    from .theta import deserialize_compact, estimate

    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        metadata = json.load(fh)
    stats = metadata.get("statistics") or []
    out = {}
    name_of = {f["id"]: f["name"] for f in metadata["schema"]["fields"]}
    for st in stats:
        for bm in st["blob-metadata"]:
            if bm["type"] != "apache-datasketches-theta-v1":
                continue
            raw = read_blob(st["statistics-path"], bm["offset"], bm["length"])
            codec = bm.get("compression-codec")
            if codec == "lz4":
                from .lz4 import lz4_frame_decompress

                raw = lz4_frame_decompress(raw)
            elif codec not in (None, "none"):
                raise NotImplementedError(
                    f"statistics blob compression-codec {codec!r}"
                )
            sk = deserialize_compact(raw)
            fields = bm.get("fields") or []
            if len(fields) != 1 or fields[0] not in name_of:
                continue  # multi-column or unknown-field blob: skip
            fid = fields[0]
            props = bm.get("properties") or {}
            est = estimate(sk)
            out[name_of[fid]] = {
                # the ndv property is optional on external blobs; fall
                # back to the sketch's own estimate when absent
                "ndv": int(props["ndv"]) if "ndv" in props
                else int(round(est)),
                "estimate": est,
                "retained": len(sk["entries"]),
            }
    return out


def next_row_id_of(metadata: dict) -> int:
    """The v3 row-lineage cursor of a table: the metadata's
    `next-row-id`, or — for external v3 trees that predate row lineage
    or were registered without the field — the derived cursor
    max(first-row-id + added-rows) over the committed snapshots. ONE
    implementation shared by the stager and the catalog's add-snapshot
    validation: if the two sides derived the cursor differently, a
    register-then-append flow would 409 forever (both re-derivations
    keep producing the same mismatched pair)."""
    nri = metadata.get("next-row-id")
    if nri is not None:
        return int(nri)
    return max(
        (
            (s.get("first-row-id") or 0) + (s.get("added-rows") or 0)
            for s in metadata.get("snapshots") or []
        ),
        default=0,
    )


def stage_iceberg_append(spark, df, metadata: dict) -> dict:
    """Stage an APPEND against a live Iceberg table as an EXTERNAL
    writer would before a catalog pointer commit: write the new data
    files (by Spark — a bulk append scales past driver memory), build
    their ADDED manifest with footer stats, build a manifest list that
    carries the parent's manifests forward, and return the spec
    `Snapshot` JSON ready for the REST catalog's `add-snapshot` +
    `set-snapshot-ref` commit (operators/rest_catalog.py). Nothing in
    the table is modified — the pointer move IS the commit, so a lost
    race (409) costs only re-staging against the fresh metadata.

    Scope: unpartitioned v1/v2/v3 tables, schema equal by (name, type)
    to the table's current schema. On v3 the staged manifest and files
    carry EXPLICIT row lineage starting at the loaded metadata's
    `next-row-id` (the snapshot JSON then declares `first-row-id` +
    `added-rows`); the catalog's add-snapshot commit validates that
    `first-row-id` still equals its `next-row-id` and advances it — a
    writer that lost a race staged against stale lineage and gets the
    same 409 CommitFailedException as a stale ref, so re-staging
    against fresh metadata is the one retry path for both.

    Driver cost: O(new files) manifest records + footer probes; the
    data write and its stats stay distributed/columnar.
    """
    fv = metadata.get("format-version", 1)
    first_row = next_row_id_of(metadata) if fv >= 3 else None
    spec_fields = None
    for s in metadata.get("partition-specs") or [{"spec-id": 0, "fields": []}]:
        if s["spec-id"] == metadata.get("default-spec-id", 0):
            spec_fields = s["fields"]
    if spec_fields:
        raise NotImplementedError(
            "stage_iceberg_append supports unpartitioned tables; "
            f"default spec has fields {spec_fields}"
        )
    fields = metadata["schema"]["fields"]
    want = {f["name"]: f["type"] for f in fields}
    got = {
        f.name: _iceberg_type(f.dataType.simpleString())
        for f in df.schema.fields
    }
    if got != want:
        raise ValueError(
            f"staged schema {got} != table schema {want}; evolve the "
            "table first"
        )
    col_ids = {f["name"]: f["id"] for f in fields}
    type_of = want
    root = metadata["location"]
    snaps = metadata.get("snapshots") or []
    snapshot_id = max((s["snapshot-id"] for s in snaps), default=0) + 1
    seq = (metadata.get("last-sequence-number") or 0) + 1
    meta_dir = os.path.join(root, "metadata")
    # staged paths are UUID-unique, NOT snapshot-id-derived: two
    # concurrent writers both pick max+1 before one of them wins the
    # pointer commit, and id-derived paths would let the loser's
    # re-staging clobber the winner's already-committed files (the
    # reason real Iceberg writers uuid their data/manifest file names)
    token = uuid.uuid4().hex[:12]
    stage_dir = os.path.join(root, "staged", f"s-{token}")
    files = _write_upsert_files(spark, df, stage_dir, "data")
    entries = []
    row_cursor = first_row
    for d in files:
        vcounts, ncounts, lower, upper = _file_column_stats(
            d["path"], col_ids, type_of
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": None if fv >= 2 else snapshot_id,
                "data_sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": d["path"],
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": d["record_count"],
                    "file_size_in_bytes": d["size"],
                    "value_counts": vcounts,
                    "null_value_counts": ncounts,
                    "lower_bounds": lower,
                    "upper_bounds": upper,
                    "equality_ids": None,
                },
            }
        )
        if fv >= 3:
            entries[-1]["data_file"]["first_row_id"] = row_cursor
            row_cursor += d["record_count"]
    manifest_path = os.path.join(meta_dir, f"m-staged-{token}.avro")
    write_avro(manifest_path, _entry_schema([], fv), entries)
    row = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": metadata.get("default-spec-id", 0),
        "added_snapshot_id": snapshot_id,
    }
    if fv >= 2:
        row.update(
            {
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_files_count": len(entries),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    d["record_count"] for d in files
                ),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    if fv >= 3:
        row["first_row_id"] = first_row
    parent_rows = []
    cur = metadata.get("current-snapshot-id")
    parent = next((s for s in snaps if s["snapshot-id"] == cur), None)
    if parent is not None:
        _, parent_rows = read_avro(parent["manifest-list"])
    list_path = os.path.join(
        meta_dir, f"snap-staged-{token}-manifest-list.avro"
    )
    write_avro(
        list_path, _manifest_list_schema(fv), [*parent_rows, row]
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "timestamp-ms": (metadata.get("last-updated-ms") or 0) + 1,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(entries)),
            "added-records": str(sum(d["record_count"] for d in files)),
        },
        "manifest-list": list_path,
    }
    if parent is not None:
        snapshot["parent-snapshot-id"] = parent["snapshot-id"]
    if metadata.get("current-schema-id") is not None:
        snapshot["schema-id"] = metadata["current-schema-id"]
    if fv >= 2:
        snapshot["sequence-number"] = seq
    if fv >= 3:
        snapshot["first-row-id"] = first_row
        snapshot["added-rows"] = row_cursor - first_row
    return snapshot


def create_iceberg_table(
    root: str,
    fields: list[dict],
    partition_fields: list[dict] | None = None,
    properties: dict | None = None,
    format_version: int = 2,
) -> str:
    """Mint a brand-new EMPTY Iceberg table tree: `v1.metadata.json` +
    `version-hint.text` under `root/metadata`, no snapshots — the state
    a catalog CREATE TABLE produces before the first commit
    (current-snapshot-id = -1 per the spec). The REST catalog's
    create-table endpoint (operators/rest_catalog.py) calls this; the
    external-writer append flow (`stage_iceberg_append` + pointer
    commit) then populates it, and `read_iceberg_table` reads the empty
    table as zero rows under the declared schema.

    `fields` are Iceberg schema fields ({"name", "type", "required"});
    ids are assigned 1..n when absent (the spec: the catalog assigns
    fresh ids on create — client-sent ids are suggestions at best).
    `partition_fields` become partition-specs[0] verbatim with
    field-ids assigned from 1000 — declarative JSON only; only
    transforms the reader understands are accepted.

    Returns the metadata directory. Refuses to create over an existing
    tree (a catalog create is not an overwrite)."""
    meta_dir = os.path.join(root, "metadata")
    if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
        raise FileExistsError(f"table already exists at {root}")
    if format_version not in (1, 2, 3):
        raise ValueError(
            f"unsupported format-version {format_version!r} (1-3)"
        )
    known = {
        "identity", "bucket", "truncate", "year", "month", "day", "hour",
    }
    out_fields = []
    for i, f in enumerate(fields, start=1):
        if not f.get("name") or not f.get("type"):
            raise ValueError(f"schema field needs name+type: {f!r}")
        _spark_type(f["type"])  # validates the type is one we read
        out_fields.append(
            {
                "id": f.get("id") or i,
                "name": f["name"],
                "required": bool(f.get("required")),
                "type": f["type"],
            }
        )
    ids = [f["id"] for f in out_fields]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate field ids in schema: {ids}")
    if format_version < 3 and any(
        f["type"] == "variant" for f in out_fields
    ):
        raise ValueError(
            "variant columns are an Iceberg format-version 3 type; "
            f"create with format_version=3 (got {format_version})"
        )
    by_name = {f["name"]: f["id"] for f in out_fields}
    spec_fields = []
    for j, pf in enumerate(partition_fields or []):
        transform = pf.get("transform", "identity")
        if transform.split("[")[0] not in known:
            raise NotImplementedError(
                f"unsupported partition transform {transform!r}"
            )
        src = pf.get("source-id") or by_name.get(pf.get("name"))
        if src is None:
            raise ValueError(
                f"partition field needs source-id or a schema column "
                f"name: {pf!r}"
            )
        if src not in ids:
            # the client's source-id may live in ITS original id space
            # when the catalog stripped/reassigned incomplete field
            # ids; a dangling id would mint a spec that silently never
            # partitions anything
            raise ValueError(
                f"partition field source-id {src} matches no schema "
                f"column (schema ids: {sorted(ids)}); name the column "
                "instead when the catalog assigns fresh ids"
            )
        spec_fields.append(
            {
                "source-id": src,
                "field-id": pf.get("field-id") or 1000 + j,
                "name": pf.get("name")
                or next(f["name"] for f in out_fields if f["id"] == src),
                "transform": transform,
            }
        )
    os.makedirs(meta_dir)
    props = dict(properties or {})
    # seed the name-mapping so files written WITHOUT parquet field ids
    # keep resolving after later renames (the same property the
    # exporter maintains); caller-provided mappings win
    props.setdefault(
        "schema.name-mapping.default",
        json.dumps(
            [{"field-id": f["id"], "names": [f["name"]]} for f in out_fields]
        ),
    )
    metadata = {
        "format-version": format_version,
        "table-uuid": str(uuid.uuid4()),
        "location": root,
        "last-sequence-number": 0,
        "last-updated-ms": 0,
        "last-column-id": max(ids),
        "schema": {"type": "struct", "schema-id": 0, "fields": out_fields},
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": out_fields}
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 999 + len(spec_fields),
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "properties": props,
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
        "refs": {},
    }
    if format_version >= 3:
        # v3 row lineage: the table starts with no rows assigned; the
        # commit path advances this as snapshots add rows
        metadata["next-row-id"] = 0
    meta_path = os.path.join(meta_dir, "v1.metadata.json")
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, meta_path)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write("1")
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return meta_dir
