"""Snapshot-versioned parquet tables — time travel without Delta/Iceberg.

The reference gets time travel from Iceberg snapshots via Nessie
(`FOR TIMESTAMP AS OF`, reference README.MD:308-313). No lakehouse-format
jars ship in this environment, so the engine provides the same capability
over plain parquet: each commit writes a new version directory and
atomically swaps a manifest (os.replace is atomic on POSIX). Readers
resolve version → directory → ordinary parquet scan, so Catalyst pushdown
and partition pruning work unchanged on any snapshot.

This is the Delta/Iceberg *protocol* idea (manifest points at immutable
files) minus compaction/file-level deltas: each version is a full rewrite,
which is fine for dimension-scale SCD2 tables (the reference's use case —
its fact history is append-only parquet, not merged). Swap in Delta by
replacing this class; the engine call sites only use write/read/as_of.

Branches add the Nessie side of the reference's catalog (its Iceberg
commits go through a Nessie REST catalog, libs/scd2_spark_processor.py:
59-118 — the reference only ever uses `main`, but the branch model is
what Nessie exists for): a branch is a named pointer into the shared
snapshot list, so `create_branch` is zero-copy, and the
write-audit-publish flow is write-to-branch → validate → `fast_forward`
main — the publish is one atomic manifest swap, invisible to `main`
readers until it lands.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this writer's read and commit."""


@dataclass
class SnapshotInfo:
    version: int
    committed_at_ms: int
    path: str
    # Arbitrary commit metadata (the Iceberg snapshot-summary idea). The
    # SCD2 pipeline stores its incremental checkpoint here so data +
    # checkpoint commit in ONE manifest swap (no replay window on crash).
    properties: dict | None = None


class SnapshotTable:
    """A parquet table with numbered, timestamped, immutable snapshots."""

    MANIFEST = "_manifest.json"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def _load_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                m = json.load(f)
        except FileNotFoundError:
            m = {"current": None, "snapshots": []}
        m.setdefault("branches", {})  # non-main branch name → version
        # Per-branch pointer history: branch → [{version, at_ms}, ...] appended
        # at every head change (write / fast_forward / create_branch). This is
        # what TIMESTAMP AS OF resolves against — an unpublished branch write
        # or a rolled-back version must not be reachable via a main read.
        # Legacy manifests (no history) were main-only: rebuild from snapshots.
        if "history" not in m:
            m["history"] = {
                "main": [
                    {"version": s["version"], "at_ms": s["committed_at_ms"]}
                    for s in m["snapshots"]
                ]
            }
        return m

    def _commit_manifest(
        self, manifest: dict, expected_base: int | None = None
    ) -> None:
        """Atomic manifest swap; with `expected_base`, an optimistic
        compare-and-swap: the commit aborts (ConcurrentWriteError) if
        any snapshot landed since this writer read the manifest — the
        Delta/Iceberg optimistic-concurrency contract. The advisory
        flock serializes the check+swap on one node; on shared object
        storage this role belongs to the catalog service (Nessie, a
        DynamoDB lock, Hive metastore), which is exactly what the
        reference's Nessie REST catalog provides.
        """
        lock_path = os.path.join(self.root, ".manifest.lock")
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            if expected_base is not None:
                on_disk = self._load_manifest()
                latest = max(
                    (s["version"] for s in on_disk["snapshots"]), default=0
                )
                if latest != expected_base:
                    raise ConcurrentWriteError(
                        f"manifest advanced to v{latest} (expected v{expected_base}); "
                        "reload and retry the commit"
                    )
            fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, self._manifest_path())  # atomic commit point

    # -- API ----------------------------------------------------------------
    def exists(self) -> bool:
        return self._load_manifest()["current"] is not None

    def snapshots(self) -> list[SnapshotInfo]:
        m = self._load_manifest()
        return [SnapshotInfo(**s) for s in m["snapshots"]]

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        committed_at_ms: int | None = None,
        branch: str = "main",
        properties: dict | None = None,
    ) -> SnapshotInfo:
        """Write a new snapshot on `branch`; visible only after the
        manifest swap. Non-main branches must exist (create_branch) —
        implicit creation would hide typos as silent forks.

        committed_at_ms is injectable for deterministic tests; defaults to
        wall clock (ms) like an Iceberg commit timestamp.
        """
        m = self._load_manifest()
        if branch != "main" and branch not in m["branches"]:
            raise ValueError(f"unknown branch {branch!r}; create_branch first")
        # versions are table-global (branches share the snapshot list)
        version = max((s["version"] for s in m["snapshots"]), default=0) + 1
        # uuid suffix: a crashed write never collides with a retry
        vdir = os.path.join(self.root, f"v{version:05d}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        info = SnapshotInfo(
            version=version,
            committed_at_ms=committed_at_ms
            if committed_at_ms is not None
            else int(time.time() * 1000),
            path=vdir,
            properties=properties,
        )
        m["snapshots"].append(info.__dict__)
        if branch == "main":
            m["current"] = version
        else:
            m["branches"][branch] = version
        m["history"].setdefault(branch, []).append(
            {"version": version, "at_ms": info.committed_at_ms}
        )
        # CAS against the version we allocated from: if another writer
        # committed meanwhile, abort instead of clobbering its snapshot
        self._commit_manifest(m, expected_base=version - 1)
        return info

    # -- branches (write-audit-publish) -------------------------------------
    def branch_head(self, branch: str = "main") -> int | None:
        m = self._load_manifest()
        return m["current"] if branch == "main" else m["branches"].get(branch)

    def head_properties(self, branch: str = "main") -> dict | None:
        """Commit metadata of the branch head (None if no head / none set)."""
        head = self.branch_head(branch)
        if head is None:
            return None
        m = self._load_manifest()
        return next(
            (s.get("properties") for s in m["snapshots"] if s["version"] == head),
            None,
        )

    def create_branch(
        self, name: str, from_branch: str = "main", at_ms: int | None = None
    ) -> int:
        """Zero-copy branch: a named pointer at from_branch's head."""
        m = self._load_manifest()
        if name == "main" or name in m["branches"]:
            raise ValueError(f"branch {name!r} already exists")
        head = self.branch_head(from_branch)
        if head is None:
            raise ValueError(f"branch {from_branch!r} has no snapshots")
        m["branches"][name] = head
        m["history"].setdefault(name, []).append(
            {"version": head, "at_ms": at_ms if at_ms is not None else int(time.time() * 1000)}
        )
        self._commit_manifest(m)
        return head

    def fast_forward(
        self, to_branch: str, from_branch: str, at_ms: int | None = None
    ) -> int:
        """Publish: move to_branch's pointer to from_branch's head (one
        atomic manifest swap — the WAP publish step when to_branch is
        'main'). Recorded in to_branch's pointer history at `at_ms`
        (wall clock by default), so TIMESTAMP AS OF reads reflect when
        the publish (or rollback — a backward move) happened on that
        branch, never when the data was staged elsewhere."""
        m = self._load_manifest()
        head = self.branch_head(from_branch)
        if head is None:
            raise ValueError(f"branch {from_branch!r} has no snapshots")
        if to_branch == "main":
            m["current"] = head
        else:
            if to_branch not in m["branches"]:
                raise ValueError(f"unknown branch {to_branch!r}")
            m["branches"][to_branch] = head
        m["history"].setdefault(to_branch, []).append(
            {"version": head, "at_ms": at_ms if at_ms is not None else int(time.time() * 1000)}
        )
        self._commit_manifest(m)
        return head

    def drop_branch(self, name: str) -> None:
        m = self._load_manifest()
        if name == "main":
            raise ValueError("cannot drop main")
        m["branches"].pop(name, None)
        self._commit_manifest(m)

    def _resolve(
        self,
        version: int | None = None,
        as_of_ms: int | None = None,
        branch: str = "main",
    ) -> str:
        m = self._load_manifest()
        snaps = m["snapshots"]
        if version is not None:
            for s in snaps:
                if s["version"] == version:
                    return s["path"]
            raise ValueError(f"version {version} not found in {self.root}")
        if as_of_ms is not None:
            # Resolve against the BRANCH's pointer history, not the global
            # snapshot list: an unpublished WAP branch write, or a version
            # abandoned by a rollback (backward fast_forward), must stay
            # invisible to this branch's timestamp-as-of readers.
            events = [
                e for e in m["history"].get(branch, []) if e["at_ms"] <= as_of_ms
            ]
            if not events:
                raise ValueError(
                    f"no snapshot on branch {branch!r} at or before {as_of_ms}"
                )
            # history is append-ordered under the manifest lock, so the last
            # eligible event IS the head at as_of_ms (max-by-at_ms would pick
            # the wrong side of a same-millisecond rollback)
            head_then = events[-1]
            return next(
                s["path"] for s in snaps if s["version"] == head_then["version"]
            )
        head = m["current"] if branch == "main" else m["branches"].get(branch)
        if head is None:
            raise FileNotFoundError(f"no snapshots on {branch!r} in {self.root}")
        return next(s["path"] for s in snaps if s["version"] == head)

    def read(
        self,
        version: int | None = None,
        as_of_ms: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        """Branch head, `VERSION AS OF`, or `TIMESTAMP AS OF` read."""
        return self.spark.read.parquet(self._resolve(version, as_of_ms, branch))
