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
