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


def expire_iceberg_snapshots(
    root: str,
    older_than_ms: int | None = None,
    keep_last: int = 1,
) -> list[int]:
    """Iceberg `expire_snapshots` for a `metadata/` tree on disk —
    works on exported AND hand-built/external trees (anything
    `read_iceberg_table` can read).

    Retention rule (the spec action's): the current snapshot, every
    snapshot a ref (branch/tag) points at, and the most recent
    `keep_last` snapshots are always protected; everything else expires
    when older than `older_than_ms` (or unconditionally when None).

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
    protected = {metadata.get("current-snapshot-id")}
    for r in (metadata.get("refs") or {}).values():
        protected.add(r["snapshot-id"])
    protected.update(
        s["snapshot-id"] for s in snaps[max(0, len(snaps) - keep_last):]
    )
    expired = [
        s
        for s in snaps
        if s["snapshot-id"] not in protected
        and (older_than_ms is None or s.get("timestamp-ms", 0) < older_than_ms)
    ]
    if not expired:
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
    drop = _reach(expired) - keep
    stats_entries = metadata.get("statistics") or []
    surviving_stats = [
        st for st in stats_entries if st["snapshot-id"] not in expired_ids
    ]
    keep.update(
        os.path.abspath(st["statistics-path"]) for st in surviving_stats
    )
    drop.update(
        os.path.abspath(st["statistics-path"])
        for st in stats_entries
        if st["snapshot-id"] in expired_ids
    )
    drop -= keep

    metadata["snapshots"] = survivors
    metadata["snapshot-log"] = [
        e
        for e in metadata.get("snapshot-log") or []
        if e["snapshot-id"] not in expired_ids
    ]
    if stats_entries:
        metadata["statistics"] = surviving_stats
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
