"""Table-maintenance jobs: small-file compaction and snapshot vacuum.

A streaming bronze layer accretes one small parquet file per micro-batch
per partition — at 100 TB that is millions of files whose listing and
task-scheduling overhead dominates scans. `compact_partition_dir`
rewrites a dt-partitioned directory to bounded file counts. The
reference leans on Pinot segment auto-merge + Iceberg table maintenance
for the same job (SURVEY §4 flush/segment rows); plain-parquet mode
needs it spelled out.

`vacuum_snapshots` implements snapshot retention for SnapshotTable
(the VACUUM / `expire_snapshots` analog): drop-and-delete all versions
strictly older than the retention cutoff while always keeping the
current snapshot (plus any floor of recent versions).

`expire_iceberg_snapshots` is the same lifecycle step for an EXPORTED
or EXTERNAL Iceberg `metadata/` tree (Iceberg's `expire_snapshots`
action): drop expired snapshots from the metadata, then
reachability-GC every manifest list, manifest, data/delete file and
statistics Puffin referenced ONLY by them — never touching anything a
surviving snapshot still reaches (MoR trees share data manifests
across snapshots, so most of an expired snapshot's tree usually
survives).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

from .timetravel import SnapshotTable


def compact_partition_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str = "dt",
    retire_metadata: bool = True,
    skip_partitions: set[str] | None = None,
) -> dict[str, int]:
    """Rewrite each hive partition of `path` into ceil(size/target) files.

    Returns {partition_value: n_files_after}. Uses a temp rewrite +
    directory swap per partition so a crash leaves either the old or the
    new complete fileset. At cluster scale run per-partition rewrites in
    parallel batches and prefer the table format's native compaction
    (Delta OPTIMIZE / Iceberg rewrite_data_files) when available.

    Two modes for a directory written by a Structured Streaming file sink:

    * ``retire_metadata=True`` (finalize): the `_spark_metadata` commit log
      — which pins the exact pre-compaction file list for root readers —
      is deleted, turning the directory into a plain parquet table. ONLY
      valid when the stream will never resume into this directory: a
      resumed sink would recreate the log with just the new batches and
      root reads would silently exclude every compacted file.
    * ``retire_metadata=False`` (live compaction): the sink log is left
      intact so the stream can resume, and every reader of this directory
      must bypass the log (read `path/dt=*` with basePath, as
      LakehouseJob does — the sink itself never re-stats old entries).
      Pass ``skip_partitions`` with the still-open partition(s); compacting
      a partition mid-write would race the sink's in-flight files.
    """
    if retire_metadata:
        meta = os.path.join(path, "_spark_metadata")
        if os.path.isdir(meta):
            shutil.rmtree(meta)
    out: dict[str, int] = {}
    for entry in sorted(os.listdir(path)):
        pdir = os.path.join(path, entry)
        if not (os.path.isdir(pdir) and entry.startswith(f"{partition_col}=")):
            continue
        if skip_partitions and entry.split("=", 1)[1] in skip_partitions:
            continue
        size = sum(
            os.path.getsize(os.path.join(pdir, f))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(size / target_file_bytes))
        tmp = pdir + ".compact.tmp"
        (
            spark.read.parquet(pdir)
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = pdir + ".compact.old"
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        out[entry.split("=", 1)[1]] = n_files
    return out


def vacuum_snapshots(
    table: SnapshotTable,
    older_than_ms: int,
    keep_last: int = 1,
) -> list[int]:
    """Expire snapshots committed before `older_than_ms`, always keeping
    the current snapshot and the most recent `keep_last` versions.

    Returns the expired version numbers. The manifest is committed
    BEFORE data directories are deleted, so a reader holding the old
    manifest can at worst hit a missing-path error for an expired
    version — never silently wrong data (same contract as Delta VACUUM).
    """
    m = table._load_manifest()
    if m["current"] is None:
        return []
    snaps = sorted(m["snapshots"], key=lambda s: s["version"])
    # every branch head is protected — expiring a version a branch still
    # points at would break that branch's reads (same rule as Nessie:
    # unreferenced-only garbage collection)
    protected = (
        {m["current"]}
        | {s["version"] for s in snaps[-keep_last:]}
        | set(m["branches"].values())
    )
    expired = [
        s
        for s in snaps
        if s["version"] not in protected and s["committed_at_ms"] < older_than_ms
    ]
    if not expired:
        return []
    keep = [s for s in snaps if s not in expired]
    table._commit_manifest(
        {"current": m["current"], "snapshots": keep, "branches": m["branches"]}
    )
    for s in expired:
        shutil.rmtree(s["path"], ignore_errors=True)
    return [s["version"] for s in expired]


def _snapshot_table_reachable(root: str) -> set[str]:
    """Every file under any SnapshotTable version dir at `root` (empty
    set when no SnapshotTable manifest exists). Absolute paths."""
    import json

    st_manifest = os.path.join(root, SnapshotTable.MANIFEST)
    reachable: set[str] = set()
    if not os.path.exists(st_manifest):
        return reachable
    with open(st_manifest) as fh:
        st = json.load(fh)
    for snap in st.get("snapshots") or []:
        d = snap.get("path")
        if d and os.path.isdir(d):
            for dp, _dn, fns in os.walk(d):
                reachable.update(
                    os.path.abspath(os.path.join(dp, fn)) for fn in fns
                )
    return reachable


def _delta_log_reachable(root: str) -> set[str]:
    """Every data file, DV `.bin` and change-data file ANY version of a
    `_delta_log/` at `root` references (empty set when no Delta facade
    exists). Absolute paths."""
    import json
    import urllib.parse

    log_dir = os.path.join(root, "_delta_log")
    reachable: set[str] = set()
    if not os.path.isdir(log_dir):
        return reachable
    from .delta_log import _is_commit_file
    from .roaring import dv_relative_path

    for f in os.listdir(log_dir):
        if not _is_commit_file(f):
            continue
        with open(os.path.join(log_dir, f)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                act = a.get("add") or a.get("remove") or a.get("cdc")
                if not act:
                    continue
                reachable.add(
                    os.path.abspath(
                        os.path.join(
                            root, urllib.parse.unquote(act["path"])
                        )
                    )
                )
                dv = act.get("deletionVector") if "add" in a else None
                if dv and dv.get("storageType") == "u":
                    prefix, fname = dv_relative_path(dv["pathOrInlineDv"])
                    reachable.add(
                        os.path.abspath(
                            os.path.join(root, prefix, fname)
                            if prefix
                            else os.path.join(root, fname)
                        )
                    )
    return reachable


def _iceberg_reachable(root: str) -> set[str]:
    """Every data/delete file and statistics Puffin any snapshot of an
    Iceberg `metadata/` tree at `root` references (empty set when no
    Iceberg facade exists). Manifest avros themselves are NOT included
    — no sibling facade ever shares those. Absolute paths."""
    import json

    from .avro_io import read_avro

    meta_dir = os.path.join(root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    reachable: set[str] = set()
    if not os.path.exists(hint):
        return reachable
    with open(hint) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        metadata = json.load(fh)
    seen: set[str] = set()
    for s in metadata.get("snapshots") or []:
        for r in read_avro(s["manifest-list"])[1]:
            mp = r["manifest_path"]
            if mp in seen:
                continue
            seen.add(mp)
            for e in read_avro(mp)[1]:
                reachable.add(
                    os.path.abspath(e["data_file"]["file_path"])
                )
    for key in ("statistics", "partition-statistics"):
        for st in metadata.get(key) or []:
            reachable.add(os.path.abspath(st["statistics-path"]))
    return reachable


def expire_iceberg_snapshots(
    root: str,
    older_than_ms: int | None = None,
    keep_last: int = 1,
    as_of_ms: int | None = None,
) -> list[int]:
    """Iceberg `expire_snapshots` for a `metadata/` tree on disk —
    works on exported AND hand-built/external trees (anything
    `read_iceberg_table` can read).

    Retention rule (the spec action's): the current snapshot, every
    snapshot a SURVIVING ref (branch/tag) points at, and the most
    recent `keep_last` snapshots are always protected; everything else
    expires when older than `older_than_ms` (or unconditionally when
    None).

    PER-REF RETENTION (the spec's snapshot-reference fields, settable
    through the REST commit's set-snapshot-ref update):
    `max-ref-age-ms` removes a non-main ref whose referenced snapshot
    is older than the limit at `as_of_ms` (wall clock when None) — the
    tag/branch itself is dropped from `refs`, and its snapshots become
    expirable like any other; a surviving BRANCH additionally protects
    its ancestor chain per its own `min-snapshots-to-keep` (first N
    ancestors from the head) and `max-snapshot-age-ms` (ancestors
    younger than the limit), walked over `parent-snapshot-id` links —
    branches without the fields protect only their head, the prior
    behavior.

    GC is REACHABILITY-BASED: manifest lists, manifests, data/delete
    files (parquet and Puffin DVs) and statistics Puffins referenced by
    any surviving snapshot are kept; paths referenced only by expired
    snapshots are deleted — but only under the table root (a tree
    referencing files elsewhere, e.g. an `add_files`-migrated table,
    never has those touched). Merge-on-read trees share data manifests
    across snapshots via manifest reuse, so expiring an old MoR
    snapshot typically deletes just its manifest list.

    The surviving metadata is written as the NEXT metadata version
    (v{N+1}.metadata.json, hint bumped), `snapshot-log` truncated to
    surviving snapshots and `statistics` entries of expired snapshots
    dropped. Time travel to an expired snapshot then fails loudly in
    the reader ("snapshot not found"). For a SnapshotTable-backed tree
    prefer `vacuum_snapshots` + re-export (the export regenerates the
    whole tree from pointer history and owns the version numbering);
    this action is for trees maintained in place.

    Returns the expired snapshot ids.
    """
    import json

    from .avro_io import read_avro

    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        metadata = json.load(fh)
    snaps = sorted(
        metadata.get("snapshots") or [],
        key=lambda s: (s.get("timestamp-ms", 0), s["snapshot-id"]),
    )
    by_id = {s["snapshot-id"]: s for s in snaps}
    refs = dict(metadata.get("refs") or {})
    if as_of_ms is None and any(
        r.get("max-ref-age-ms") is not None
        or r.get("max-snapshot-age-ms") is not None
        for r in refs.values()
    ):
        import time as _time

        as_of_ms = int(_time.time() * 1000)
    # ref aging: a non-main ref past its max-ref-age-ms is REMOVED (its
    # snapshots then expire like any other's)
    refs_removed = []
    for name, r in list(refs.items()):
        age_limit = r.get("max-ref-age-ms")
        if name == "main" or age_limit is None:
            continue
        ref_ts = by_id.get(r["snapshot-id"], {}).get("timestamp-ms", 0)
        if as_of_ms - ref_ts > age_limit:
            del refs[name]
            refs_removed.append(name)
    metadata["refs"] = refs

    def _ancestors(sid):
        while sid in by_id:
            yield sid
            sid = by_id[sid].get("parent-snapshot-id")
            if sid is None:
                return

    protected = {metadata.get("current-snapshot-id")}
    for r in refs.values():
        protected.add(r["snapshot-id"])
        if r.get("type", "branch") != "branch":
            continue
        keep_n = r.get("min-snapshots-to-keep")
        max_age = r.get("max-snapshot-age-ms")
        if keep_n is None and max_age is None:
            continue
        for idx, sid in enumerate(_ancestors(r["snapshot-id"])):
            ts = by_id[sid].get("timestamp-ms", 0)
            if (keep_n is not None and idx < keep_n) or (
                max_age is not None and as_of_ms - ts <= max_age
            ):
                protected.add(sid)
    protected.update(
        s["snapshot-id"] for s in snaps[max(0, len(snaps) - keep_last):]
    )
    expired = [
        s
        for s in snaps
        if s["snapshot-id"] not in protected
        and (older_than_ms is None or s.get("timestamp-ms", 0) < older_than_ms)
    ]
    if not expired and not refs_removed:
        return []
    expired_ids = {s["snapshot-id"] for s in expired}
    survivors = [s for s in snaps if s["snapshot-id"] not in expired_ids]

    manifest_cache: dict[str, list[dict]] = {}

    def _reach(snapshots: list[dict]) -> set[str]:
        paths: set[str] = set()
        for s in snapshots:
            ml = os.path.abspath(s["manifest-list"])
            paths.add(ml)
            _, rows = read_avro(ml)
            for r in rows:
                mp = os.path.abspath(r["manifest_path"])
                paths.add(mp)
                if mp not in manifest_cache:
                    _, manifest_cache[mp] = read_avro(mp)
                for e in manifest_cache[mp]:
                    paths.add(
                        os.path.abspath(e["data_file"]["file_path"])
                    )
        return paths

    keep = _reach(survivors)
    # CROSS-FACADE SAFETY: on a dual-export (UniForm-style) root, data
    # files referenced only by expired Iceberg snapshots may still be
    # live in the sibling _delta_log — union its holdings into the
    # keep-set so this facade's GC never breaks the other. (The
    # SnapshotTable manifest is deliberately NOT protected: it is the
    # PARENT store the facades are exported from, expiring an exported
    # tree is the owner trimming history, and `vacuum_snapshots` is
    # the SnapshotTable-side retention action.)
    keep |= _delta_log_reachable(root)
    drop = _reach(expired) - keep
    # table stats AND partition stats: survivors protected, expired
    # snapshots' artifacts dropped with their snapshots
    surviving_by_key: dict[str, list] = {}
    for key in ("statistics", "partition-statistics"):
        entries = metadata.get(key) or []
        surviving_by_key[key] = [
            st for st in entries if st["snapshot-id"] not in expired_ids
        ]
        keep.update(
            os.path.abspath(st["statistics-path"])
            for st in surviving_by_key[key]
        )
        drop.update(
            os.path.abspath(st["statistics-path"])
            for st in entries
            if st["snapshot-id"] in expired_ids
        )
    stats_entries = metadata.get("statistics") or []
    surviving_stats = surviving_by_key["statistics"]
    drop -= keep

    metadata["snapshots"] = survivors
    metadata["snapshot-log"] = [
        e
        for e in metadata.get("snapshot-log") or []
        if e["snapshot-id"] not in expired_ids
    ]
    if stats_entries:
        metadata["statistics"] = surviving_stats
    if metadata.get("partition-statistics"):
        metadata["partition-statistics"] = surviving_by_key[
            "partition-statistics"
        ]
    prev_path = os.path.join(meta_dir, f"v{n}.metadata.json")
    metadata.setdefault("metadata-log", []).append(
        {
            "timestamp-ms": metadata.get("last-updated-ms", 0),
            "metadata-file": prev_path,
        }
    )
    # commit the new metadata version FIRST (readers holding the old
    # hint can at worst hit a missing-path error for an expired
    # snapshot — never silently wrong data), then GC
    new_path = os.path.join(meta_dir, f"v{n + 1}.metadata.json")
    tmp = new_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, new_path)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write(str(n + 1))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    root_abs = os.path.abspath(root) + os.sep
    for p in sorted(drop):
        if p.startswith(root_abs) and os.path.isfile(p):
            os.remove(p)
    return sorted(expired_ids)


def vacuum_delta_table(root: str, keep_versions: int = 1) -> list[str]:
    """Delta VACUUM for an exported `_delta_log/` tree: physically
    delete data files, DV `.bin` files and change-data files that the
    log once referenced but that none of the RETAINED versions (the
    last `keep_versions`, always including the current one) still
    references. Time travel to vacuumed versions then fails on the
    missing files — the stock VACUUM contract; pair with
    `clean_log_commits` to also retire their JSON commits.

    DELIBERATE DIVERGENCE from stock VACUUM, which directory-walks and
    deletes any file it does not recognize: this implementation is
    LOG-SCOPED — it deletes only paths the log itself referenced —
    because an exported tree may share its data directory with an
    Iceberg facade (the UniForm dual-export shape), whose
    `metadata/` / `deletes/` files a directory walk would destroy.
    Files outside the table root (absolute-path DVs, add_files-style
    externals) are never touched.

    Driver-side O(versions × files-per-version) log replay, one unlink
    per dropped file. Returns the deleted paths.
    """
    import json
    import urllib.parse

    from .delta_log import (
        _is_commit_file,
        _load_last_checkpoint,
        replay_delta_log,
    )
    from .roaring import dv_relative_path

    log_dir = os.path.join(root, "_delta_log")
    versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if _is_commit_file(f)
    )
    cp = _load_last_checkpoint(log_dir)
    if cp is not None and cp["version"] not in versions:
        versions = sorted({cp["version"], *versions})
    if not versions:
        raise FileNotFoundError(f"no commit files in {log_dir}")
    current = versions[-1]
    retained = {v for v in versions if v > current - keep_versions}

    def _refs(state: dict) -> set[str]:
        out = set()
        for path, add in state["files"].items():
            out.add(
                os.path.abspath(
                    os.path.join(root, urllib.parse.unquote(path))
                )
            )
            dv = add.get("deletionVector")
            if dv and dv.get("storageType") == "u":
                prefix, fname = dv_relative_path(dv["pathOrInlineDv"])
                out.add(
                    os.path.abspath(
                        os.path.join(root, prefix, fname)
                        if prefix
                        else os.path.join(root, fname)
                    )
                )
            elif dv and dv.get("storageType") == "p":
                out.add(os.path.abspath(dv["pathOrInlineDv"]))
        return out

    keep: set[str] = set()
    ever: set[str] = set()
    for v in versions:
        refs = _refs(replay_delta_log(log_dir, version=v))
        ever |= refs
        if v in retained:
            keep |= refs
    # change-data files ride their commit's version
    for v in versions:
        f = os.path.join(log_dir, f"{v:020d}.json")
        if not os.path.exists(f):
            continue
        with open(f) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    p = os.path.abspath(
                        os.path.join(
                            root, urllib.parse.unquote(action["cdc"]["path"])
                        )
                    )
                    ever.add(p)
                    if v in retained:
                        keep.add(p)
    # CROSS-FACADE SAFETY: files this Delta log no longer retains may
    # still be referenced by a sibling Iceberg tree on the same root
    # (the UniForm dual-export shape). The SnapshotTable manifest is
    # deliberately NOT protected — it is the parent store (see
    # expire_iceberg_snapshots)
    keep |= _iceberg_reachable(root)
    root_abs = os.path.abspath(root) + os.sep
    dropped = []
    for p in sorted(ever - keep):
        if p.startswith(root_abs) and os.path.isfile(p):
            os.remove(p)
            dropped.append(p)
    return dropped


def rewrite_iceberg_manifests(root: str) -> dict:
    """Iceberg `rewrite_manifests` for a `metadata/` tree on disk — the
    METADATA-side compaction: after N incremental-append (or MoR
    delete) commits the head's manifest list holds N small manifests,
    and manifest-open cost starts to dominate planning. This action
    consolidates the head's live DATA entries into ONE manifest per
    partition spec (entries re-emitted status=EXISTING with their
    EXPLICIT data sequence numbers and original snapshot ids, so v2+
    inheritance and both delete-flavor masks resolve exactly as
    before); delete manifests ride along untouched. The result is a new
    `replace` snapshot — no data bytes move, older snapshots' manifest
    lists still reference the old manifests (time travel intact; a
    later `expire_iceberg_snapshots` GCs them).

    Driver-side O(files) metadata work, zero data I/O — the same cost
    class as the planning walk it accelerates. Returns
    {manifests_before, manifests_after, files}.
    """
    import json
    import re

    from .avro_io import read_avro, write_avro
    from .iceberg_meta import _entry_schema, _manifest_list_schema

    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        metadata = json.load(fh)
    fv = metadata.get("format-version", 1)
    head = next(
        s
        for s in metadata["snapshots"]
        if s["snapshot-id"] == metadata["current-snapshot-id"]
    )
    _, rows = read_avro(head["manifest-list"])
    live: dict[str, dict] = {}
    delete_rows: list[dict] = []
    n_data = 0
    for r in rows:
        if (r.get("content") or 0) == 1:
            delete_rows.append(r)
            continue
        n_data += 1
        m_seq = r.get("sequence_number")
        m_snap = r.get("added_snapshot_id")
        spec_id = r.get("partition_spec_id") or 0
        # v3 row lineage: files written under manifest-level first_row_id
        # inheritance carry null per-file first_row_id — materialize the
        # assigned value NOW (manifest first_row_id + running record
        # counts of preceding null-id ADDED entries, the spec's rule),
        # because the rewritten entries become EXISTING and the spec
        # requires EXISTING entries to carry an explicit first_row_id
        # (readers only inherit for status==ADDED)
        m_first = r.get("first_row_id")
        m_assigned = 0
        for e in read_avro(r["manifest_path"])[1]:
            rec = e["data_file"]
            p = rec["file_path"]
            frid = rec.get("first_row_id")
            if frid is None and e["status"] == 1 and m_first is not None:
                frid = m_first + m_assigned
                m_assigned += rec.get("record_count") or 0
            if e["status"] == 2:
                live.pop(p, None)
                continue
            if fv >= 3 and frid is not None:
                rec = dict(rec)
                rec["first_row_id"] = frid
            seq = e.get("data_sequence_number")
            if seq is None:
                if e["status"] == 1:
                    seq = m_seq if m_seq is not None else 0
                elif fv >= 2:
                    raise ValueError(
                        "EXISTING entry missing data_sequence_number: " + p
                    )
                else:
                    seq = 0
            fseq = e.get("file_sequence_number")
            if fseq is None:
                fseq = m_seq if e["status"] == 1 else seq
            snap_id = e.get("snapshot_id")
            if snap_id is None:
                snap_id = m_snap
            live[p] = {
                "spec": spec_id,
                "seq": seq,
                "fseq": fseq,
                "snap": snap_id,
                "rec": rec,
            }
    if n_data <= 1:
        return {
            "manifests_before": n_data,
            "manifests_after": n_data,
            "files": len(live),
        }
    # partition value types per spec, reconstructed from the transforms
    type_by_id: dict[int, str] = {}
    for s in metadata.get("schemas") or [metadata["schema"]]:
        for f in s["fields"]:
            type_by_id.setdefault(f["id"], f["type"])
    _PARAM = re.compile(r"(bucket|truncate)\[(\d+)\]")

    def _ptype(sf: dict) -> str:
        t = sf["transform"]
        if t == "identity":
            return type_by_id[sf["source-id"]]
        if t == "day":
            return "date"
        if t in ("month", "year", "hour"):
            return "int"
        m = _PARAM.fullmatch(t)
        if m:
            return "int" if m.group(1) == "bucket" else type_by_id[sf["source-id"]]
        raise NotImplementedError(f"partition transform {t!r}")

    specs = {s["spec-id"]: s["fields"] for s in metadata["partition-specs"]}
    by_spec: dict[int, list[dict]] = {}
    for info in live.values():
        by_spec.setdefault(info["spec"], []).append(info)
    new_snapshot_id = (
        max(s["snapshot-id"] for s in metadata["snapshots"]) + 1
    )
    new_seq = (metadata.get("last-sequence-number") or 0) + 1
    new_rows: list[dict] = []
    for spec_id, infos in sorted(by_spec.items()):
        pf = [
            {
                "name": sf["name"],
                "type": _ptype(sf),
                "field-id": sf["field-id"],
            }
            for sf in specs[spec_id]
        ]
        entries = []
        for info in sorted(infos, key=lambda x: x["rec"]["file_path"]):
            entry = {
                "status": 0,  # EXISTING (spec: carried forward)
                "snapshot_id": info["snap"],
                "data_file": info["rec"],
            }
            if fv >= 2:
                entry["data_sequence_number"] = info["seq"]
                entry["file_sequence_number"] = info["fseq"]
            entries.append(entry)
        mpath = os.path.join(
            meta_dir, f"m-rw-{new_snapshot_id:05d}-{spec_id}.avro"
        )
        write_avro(mpath, _entry_schema(pf, fv), entries)
        row = {
            "manifest_path": mpath,
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": spec_id,
            "added_snapshot_id": new_snapshot_id,
        }
        if fv >= 2:
            row.update(
                {
                    "content": 0,
                    "sequence_number": new_seq,
                    "min_sequence_number": min(
                        i["seq"] for i in infos
                    ),
                    "added_files_count": 0,
                    "existing_files_count": len(entries),
                    "deleted_files_count": 0,
                    "added_rows_count": 0,
                    "existing_rows_count": sum(
                        i["rec"].get("record_count") or 0 for i in infos
                    ),
                    "deleted_rows_count": 0,
                }
            )
        if fv >= 3 and head.get("first-row-id") is not None:
            row["first_row_id"] = metadata.get("next-row-id")
        new_rows.append(row)
    new_rows += delete_rows
    list_path = os.path.join(
        meta_dir, f"snap-{new_snapshot_id}-1-manifest-list.avro"
    )
    write_avro(list_path, _manifest_list_schema(fv), new_rows)
    new_snap = {
        "snapshot-id": new_snapshot_id,
        "parent-snapshot-id": head["snapshot-id"],
        # deterministic: metadata rewrites carry the head's instant + 1
        "timestamp-ms": (head.get("timestamp-ms") or 0) + 1,
        "summary": {"operation": "replace"},
        "manifest-list": list_path,
    }
    if head.get("schema-id") is not None:
        new_snap["schema-id"] = head["schema-id"]
    if fv >= 2:
        new_snap["sequence-number"] = new_seq
        metadata["last-sequence-number"] = new_seq
    if fv >= 3:
        new_snap["first-row-id"] = metadata.get("next-row-id")
        new_snap["added-rows"] = 0
    metadata["snapshots"].append(new_snap)
    metadata["current-snapshot-id"] = new_snapshot_id
    metadata.setdefault("snapshot-log", []).append(
        {
            "snapshot-id": new_snapshot_id,
            "timestamp-ms": new_snap["timestamp-ms"],
        }
    )
    # refs tracking the old head follow it (the action commits to the
    # branch, as the Spark procedure does on the current branch)
    for ref in (metadata.get("refs") or {}).values():
        if (
            ref.get("type") == "branch"
            and ref["snapshot-id"] == head["snapshot-id"]
        ):
            ref["snapshot-id"] = new_snapshot_id
    metadata["last-updated-ms"] = new_snap["timestamp-ms"]
    metadata.setdefault("metadata-log", []).append(
        {
            "timestamp-ms": head.get("timestamp-ms") or 0,
            "metadata-file": os.path.join(meta_dir, f"v{n}.metadata.json"),
        }
    )
    new_path = os.path.join(meta_dir, f"v{n + 1}.metadata.json")
    tmp = new_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(metadata, fh, indent=1, sort_keys=True)
    os.replace(tmp, new_path)
    hint_tmp = os.path.join(meta_dir, ".version-hint.tmp")
    with open(hint_tmp, "w") as fh:
        fh.write(str(n + 1))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return {
        "manifests_before": n_data,
        "manifests_after": len(by_spec),
        "files": len(live),
    }


def compact_snapshot(
    table: SnapshotTable,
    branch: str = "main",
    target_file_bytes: int = 128 * 1024 * 1024,
    committed_at_ms: int | None = None,
):
    """MERGE-ON-READ COMPACTION: fold accumulated deletes back into
    rewritten data files (Iceberg `rewrite_data_files` +
    `rewrite_position_delete_files`; Delta `OPTIMIZE`, which purges
    deletion vectors).

    The reference's table is merge-on-read
    (reference libs/scd2_spark_processor.py:155); run its SCD2 batches
    for a year and every read re-applies an ever-growing stack of
    positional deletes / DVs. This job commits a new snapshot whose
    data equals the branch head, rewritten into ceil(size/target)
    right-sized files and flagged `operation=compaction` in the
    snapshot properties. The format exporters recognize the flag and
    emit it as a REWRITE commit that carries ZERO live delete entries
    (Iceberg: summary operation `replace`, fresh data manifest only;
    Delta: `OPTIMIZE` commitInfo with `dataChange: false` on every
    add/remove, so streaming/CDF consumers skip it — real OPTIMIZE
    semantics). Time travel to pre-compaction snapshots still resolves
    their masked reads; a later `vacuum_snapshots` + re-export garbage-
    collects the folded delete files.

    Partitioning is preserved: each hive partition of the head rewrites
    into its own right-sized files (the layout partition pruning
    depends on must survive compaction). Returns the new SnapshotInfo,
    or None when the head is already a compaction commit with no
    sibling writes after it (idempotence: re-running is a no-op, not an
    identical-content commit chain).

    100 TB shape: one distributed scan of the head + one shuffle-free
    coalesce-style write per partition; the decision metadata (file
    sizes) comes from the manifest, driver-side O(files)."""
    m = table._load_manifest()
    head = table.branch_head(branch)
    if head is None:
        raise ValueError(f"branch {branch!r} has no snapshots to compact")
    by_version = {s["version"]: s for s in m["snapshots"]}
    snap = by_version[head]
    if (snap.get("properties") or {}).get("operation") == "compaction":
        return None  # already compacted; nothing accreted since
    head_dir = snap["path"]
    # partition layout of the head (nested dirs like part=a/dt=.../...)
    pcols = _partition_layout(head_dir)
    df = table.spark.read.parquet(head_dir)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(head_dir)
        for f in fns
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    if pcols:
        # per-partition right-sizing: repartition by the partition
        # columns so each hive dir gets contiguous writers, bounded by
        # n_files total
        df = df.repartition(n_files, *pcols)
    else:
        df = df.repartition(n_files)
    return table.write(
        df,
        partition_by=pcols or None,
        committed_at_ms=committed_at_ms,
        branch=branch,
        properties={"operation": "compaction", "compacted-from": head},
    )


def rewrite_data_files_sorted(
    table: SnapshotTable,
    by: list[tuple[str, str]] | list[str],
    strategy: str = "sort",
    branch: str = "main",
    target_file_bytes: int = 128 * 1024 * 1024,
    committed_at_ms: int | None = None,
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int = 16,
    target_files: int | None = None,
):
    """SORTED REWRITE: rewrite the branch head clustered on `by` —
    Iceberg's `rewrite_data_files(strategy => 'sort' | 'zorder')`,
    Delta's `OPTIMIZE ... ZORDER BY`. An unsorted table's every file
    spans the whole key domain, so min/max file skipping prunes
    nothing; after the rewrite each file covers a narrow slice of the
    sort key (or, for z-order, of EVERY participating column), and a
    predicate reads the few files that can match.

    strategy="sort": `by` is [(col, "asc"|"desc"), ...] (bare names
    mean asc). The plan is repartitionByRange on the leading columns
    (one shuffle that splits the key domain into contiguous chunks)
    + sortWithinPartitions honoring directions. The commit records the
    order in the `sort-by` property; `export_iceberg_metadata` turns
    it into a real spec `sort-orders` entry, stamps the rewritten
    files' `sort_order_id` (field 140), and makes it the table's
    default write order.

    strategy="zorder": `by` is column names; rows cluster along the
    Morton curve of `bounds` (col -> (lo, hi); computed with one tiny
    min/max aggregate when omitted — at 100 TB pass table-stat bounds
    instead). Z-order is summary-only in the export: the spec's
    sort-order transforms cannot express bit interleaving, so real
    engines record it the same way.

    Partitioned tables keep their hive layout: the range split leads
    with the partition columns, so each partition dir's files carry
    tight sort-key ranges. Idempotent like compact_snapshot: a head
    that is already a compaction commit returns None.

    100 TB shape: one distributed scan + ONE range shuffle (the
    sampling pass repartitionByRange runs is on the sort key only);
    the zorder key is pure JVM bit arithmetic (sources/zorder.py), no
    UDF anywhere."""
    import json as _json

    from pyspark.sql import functions as F

    from ..sources.zorder import zorder_key

    if strategy not in ("sort", "zorder"):
        raise ValueError(f"strategy {strategy!r} (sort|zorder)")
    norm: list[tuple[str, str]] = [
        (c, "asc") if isinstance(c, str) else (c[0], c[1]) for c in by
    ]
    if not norm:
        raise ValueError("rewrite_data_files_sorted needs sort columns")
    for _c, d in norm:
        if d not in ("asc", "desc"):
            raise ValueError(f"direction {d!r} (asc|desc)")
    m = table._load_manifest()
    head = table.branch_head(branch)
    if head is None:
        raise ValueError(f"branch {branch!r} has no snapshots to rewrite")
    snap = {s["version"]: s for s in m["snapshots"]}[head]
    head_props = snap.get("properties") or {}
    if head_props.get("operation") == "compaction":
        # no-op ONLY when the head already has THIS clustering; a plain
        # compaction (or a rewrite on different keys/strategy) still
        # gets re-clustered — the caller asked for a specific layout
        want_key = _json.dumps(
            [c for c, _d in norm] if strategy == "zorder" else norm
        )
        have_key = head_props.get(
            "zorder-by" if strategy == "zorder" else "sort-by"
        )
        if head_props.get("strategy") == strategy and have_key == want_key:
            return None  # already clustered this way; nothing accreted
    head_dir = snap["path"]
    pcols = _partition_layout(head_dir)
    df = table.spark.read.parquet(head_dir)
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dn, fns in os.walk(head_dir)
        for f in fns
        if f.endswith(".parquet")
    )
    n_files = target_files or max(1, math.ceil(size / target_file_bytes))
    if strategy == "sort":
        keys = [c for c, _d in norm]
        order = [
            F.col(c).asc() if d == "asc" else F.col(c).desc()
            for c, d in norm
        ]
        clustered = df.repartitionByRange(
            n_files, *pcols, *keys
        ).sortWithinPartitions(*[F.col(c) for c in pcols], *order)
        props = {
            "operation": "compaction",
            "strategy": "sort",
            "sort-by": _json.dumps(norm),
            "compacted-from": head,
        }
    else:
        cols = [c for c, _d in norm]
        if bounds is None:
            aggs = []
            for c in cols:
                aggs += [
                    F.min(c).cast("double").alias(f"{c}__lo"),
                    F.max(c).cast("double").alias(f"{c}__hi"),
                ]
            row = df.agg(*aggs).collect()[0]  # one row: 2x|cols| scalars
            bounds = {}
            for c in cols:
                lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
                if lo is None or hi is None:
                    raise ValueError(
                        f"zorder column {c!r} is entirely NULL — it has "
                        "no bounds and adds no clustering; drop it"
                    )
                if hi <= lo:
                    # constant column: quantizes to one cell either way;
                    # widen so the key math stays well-defined
                    hi = lo + 1
                bounds[c] = (lo, hi)
        key = zorder_key(
            [(F.col(c), *bounds[c]) for c in cols], bits=bits
        )
        clustered = (
            df.withColumn("_zkey", key)
            .repartitionByRange(n_files, *pcols, "_zkey")
            .sortWithinPartitions(*pcols, "_zkey")
            .drop("_zkey")
        )
        props = {
            "operation": "compaction",
            "strategy": "zorder",
            "zorder-by": _json.dumps(cols),
            "compacted-from": head,
        }
    return table.write(
        clustered,
        partition_by=pcols or None,
        committed_at_ms=committed_at_ms,
        branch=branch,
        properties=props,
    )


def _partition_layout(snapshot_dir: str) -> list[str]:
    """Hive partition columns of a snapshot dir, outermost first."""
    pcols: list[str] = []
    d = snapshot_dir
    while True:
        subs = sorted(
            e
            for e in os.listdir(d)
            if "=" in e and os.path.isdir(os.path.join(d, e))
        )
        if not subs:
            return pcols
        pcols.append(subs[0].split("=", 1)[0])
        d = os.path.join(d, subs[0])


def apply_retention(
    table: SnapshotTable,
    keep_predicate: str,
    branch: str = "main",
    committed_at_ms: int | None = None,
):
    """PHYSICAL retention enforcement (round-8 item 3): commit a new
    snapshot holding only the rows matching `keep_predicate` — the
    engine twin of Pinot's segment drops and Delta/Iceberg's
    delete-where job, vs `TableSpec.retention_predicate`'s serving VIEW
    (which filters at read time but deletes nothing).

    The transition is a PURE DELETE, so the format exporters re-express
    it merge-on-read automatically (Iceberg positional deletes / v3
    DVs, Delta deletion vectors); time travel to pre-retention
    snapshots still resolves the full history, and a later
    `compact_snapshot` + `vacuum_snapshots` folds and then physically
    frees the expired bytes. Returns the new SnapshotInfo, or None when
    nothing is expired — so the job is IDEMPOTENT: running it twice
    with the same predicate commits once.

    Use a DETERMINISTIC predicate (a literal cutoff, not
    current_timestamp()) — the snapshot must not depend on when the
    export replays it. `TableSpec.retention_predicate(now_expr=...)`
    with a pinned `now` produces exactly that.

    100 TB shape: one partition-prunable scan of the head (a predicate
    on the partition/time column prunes expired directories at the
    source) and one write of the surviving rows; the exporters' diff
    then runs distributed. Real engines drop whole expired partitions
    metadata-only — this job trades that for exact row-level semantics
    shared with every other lane; at petabyte scale, partition the
    history table by day so the scan prunes to the retention boundary
    day only."""
    head = table.branch_head(branch)
    if head is None:
        raise ValueError(f"branch {branch!r} has no snapshots")
    m = table._load_manifest()
    snap = next(s for s in m["snapshots"] if s["version"] == head)
    df = table.spark.read.parquet(snap["path"])
    expired = df.where(f"NOT ({keep_predicate})").limit(1).count()
    if not expired:
        return None
    pcols = _partition_layout(snap["path"])
    return table.write(
        df.where(keep_predicate),
        partition_by=pcols or None,
        committed_at_ms=committed_at_ms,
        branch=branch,
        properties={"operation": "retention", "predicate": keep_predicate},
    )


def rewrite_delete_files(
    table: SnapshotTable,
    branch: str = "main",
    committed_at_ms: int | None = None,
):
    """MINOR merge-on-read compaction: consolidate the accumulated
    delete files WITHOUT rewriting data — Iceberg's
    `rewrite_position_delete_files` (the cheap half of MoR maintenance;
    `compact_snapshot` is the `rewrite_data_files` half).

    Commits a data-identical snapshot flagged
    `operation=rewrite-deletes`. The Iceberg exporter emits it as a
    summary-operation `replace` snapshot whose manifest list reuses the
    base DATA manifests untouched and carries ONE consolidated delete
    manifest: under v2, the stacked positional-delete parquet of every
    prior delete commit rewritten into a single sorted file set; under
    v3, the per-file cumulative DVs re-emitted in a single fresh Puffin
    file. Read amplification drops from k delete files per scan to one,
    and no data bytes move. The Delta exporter has no stacked-delete
    concept (descriptors already replace per file), so it exports the
    flag with OPTIMIZE semantics — still a logical no-op.

    Idempotent: returns None when the head is already a maintenance
    commit (rewrite-deletes or compaction). At 100 TB: one scan of the
    (small) delete files + one metadata commit — this is the job you
    run NIGHTLY, with `compact_snapshot` weekly."""
    head = table.branch_head(branch)
    if head is None:
        raise ValueError(f"branch {branch!r} has no snapshots")
    m = table._load_manifest()
    snap = next(s for s in m["snapshots"] if s["version"] == head)
    if (snap.get("properties") or {}).get("operation") in (
        "compaction",
        "rewrite-deletes",
    ):
        return None
    pcols = _partition_layout(snap["path"])
    return table.write(
        table.spark.read.parquet(snap["path"]),
        partition_by=pcols or None,
        committed_at_ms=committed_at_ms,
        branch=branch,
        properties={"operation": "rewrite-deletes", "rewritten-from": head},
    )


def find_orphan_files(root: str) -> list[str]:
    """The detection half of Iceberg's `remove_orphan_files`: walk the
    table root and report every data-looking file (parquet / Puffin)
    that NO snapshot in the current metadata reaches through its
    manifest graph — failed-write leftovers and files stranded by
    external tools. Read-only by design: the report feeds a human or a
    scheduled deleter with its own age cutoff (stock Iceberg's
    3-day-old default exists precisely because a concurrent writer's
    not-yet-committed files look orphaned; a metadata-only detector
    cannot tell, so this one never unlinks).

    CROSS-FACADE AWARE: a root may carry several metadata systems at
    once (the UniForm shape — an Iceberg tree, a Delta log and the
    engine's own SnapshotTable store). A file any of them references —
    Iceberg manifests, every Delta version's adds / DV bins /
    change-data, every SnapshotTable version dir — counts as reachable;
    only files NO system knows are orphans.

    Driver-side O(manifests + files-on-disk); `metadata/` and
    `_delta_log/` trees are out of scope (they are not data files and
    a Delta facade may legitimately own extra files there).
    """
    # primary facade must exist (same contract as before the round-10
    # refactor onto the shared reachability helpers)
    meta_dir = os.path.join(root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        fh.read()
    reachable = (
        _iceberg_reachable(root)
        | _delta_log_reachable(root)
        | _snapshot_table_reachable(root)
    )
    root_abs = os.path.abspath(root)
    skip_dirs = {"metadata", "_delta_log", "_change_data"}
    orphans = []
    for dirpath, dirnames, filenames in os.walk(root_abs):
        rel = os.path.relpath(dirpath, root_abs)
        top = rel.split(os.sep)[0]
        if top in skip_dirs:
            dirnames[:] = []
            continue
        for fn in filenames:
            if fn.startswith((".", "_")):
                continue
            if not fn.endswith((".parquet", ".puffin", ".bin")):
                continue
            p = os.path.abspath(os.path.join(dirpath, fn))
            if p not in reachable:
                orphans.append(p)
    return sorted(orphans)


def remove_orphan_files(
    root: str,
    older_than_ms: int | None = None,
    dry_run: bool = False,
    now_ms: int | None = None,
) -> list[str]:
    """The execution half of Iceberg's `remove_orphan_files` on top of
    `find_orphan_files`: delete (or with `dry_run`, just list) every
    orphan whose mtime is older than the age cutoff.

    The cutoff defaults to NOW − 3 days — stock Iceberg's default, and
    for the same reason: a concurrent writer's not-yet-committed files
    look orphaned to a metadata-only detector, and the age gate is the
    only defense. Pass `older_than_ms` explicitly to override (tests
    and controlled single-writer maintenance windows may use
    `now_ms`-relative or absolute cutoffs safely).

    CROSS-FACADE SAFE by construction: `find_orphan_files` counts a
    file reachable if ANY co-resident metadata system references it
    (Iceberg manifests, every Delta log version, the SnapshotTable
    manifest), so nothing any facade can still read is ever deleted.

    Driver-side O(manifests + files-on-disk), one unlink per orphan.
    Returns the deleted (or with `dry_run`, the would-delete) paths.
    """
    import time

    if now_ms is None:
        now_ms = int(time.time() * 1000)
    if older_than_ms is None:
        older_than_ms = now_ms - 3 * 24 * 3600 * 1000
    out = []
    for p in find_orphan_files(root):
        try:
            mtime_ms = os.stat(p).st_mtime * 1000
        except FileNotFoundError:
            continue  # already gone (concurrent cleaner)
        if mtime_ms >= older_than_ms:
            continue
        out.append(p)
        if not dry_run:
            os.remove(p)
    return out
