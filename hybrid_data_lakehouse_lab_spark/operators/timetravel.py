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
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotInfo:
    version: int
    committed_at_ms: int
    path: str


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
                return json.load(f)
        except FileNotFoundError:
            return {"current": None, "snapshots": []}

    def _commit_manifest(self, manifest: dict) -> None:
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
    ) -> SnapshotInfo:
        """Write a new snapshot; visible only after the manifest swap.

        committed_at_ms is injectable for deterministic tests; defaults to
        wall clock (ms) like an Iceberg commit timestamp.
        """
        m = self._load_manifest()
        version = (m["current"] or 0) + 1
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
        )
        m["snapshots"].append(info.__dict__)
        m["current"] = version
        self._commit_manifest(m)
        return info

    def _resolve(self, version: int | None = None, as_of_ms: int | None = None) -> str:
        m = self._load_manifest()
        if m["current"] is None:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        snaps = m["snapshots"]
        if version is not None:
            for s in snaps:
                if s["version"] == version:
                    return s["path"]
            raise ValueError(f"version {version} not found in {self.root}")
        if as_of_ms is not None:
            eligible = [s for s in snaps if s["committed_at_ms"] <= as_of_ms]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            return max(eligible, key=lambda s: s["version"])["path"]
        return next(s["path"] for s in snaps if s["version"] == m["current"])

    def read(
        self, version: int | None = None, as_of_ms: int | None = None
    ) -> DataFrame:
        """Current table, `VERSION AS OF`, or `TIMESTAMP AS OF` read."""
        return self.spark.read.parquet(self._resolve(version, as_of_ms))
