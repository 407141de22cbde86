"""Delta Lake adapter seam for the snapshot/merge engine.

The reference runs MERGE and time travel on Iceberg through a Nessie
catalog (`libs/scd2_spark_processor.py:135-159,438-483`; README.MD:308-313
`FOR TIMESTAMP AS OF`). This engine's default is the plain-parquet
`SnapshotTable` (operators/timetravel.py) — semantically equivalent,
property-tested, and runnable without lakehouse-format jars. This module
is the documented seam to an EXISTING Delta lakehouse: one factory,
`versioned_table()`, returns either backend behind the same surface, so
call sites (`Scd2Pipeline`, the demo plans) never mention the format.

Interface contract (what both backends provide):

- ``write(df, partition_by=None, committed_at_ms=None, properties=None)``
  — one ATOMIC commit per batch (manifest swap / Delta commit). The
  SCD2 pipeline's checkpoint rides in ``properties`` so data +
  checkpoint commit together. ``committed_at_ms`` (logical commit
  time) is SnapshotTable-only — the Delta backend raises, because the
  Delta log stamps wall-clock time and ``as_of_ms`` would resolve
  against the wrong clock.
- ``read(version=None, as_of_ms=None)`` — head, ``VERSION AS OF``, or
  ``TIMESTAMP AS OF`` resolution. Versions are 1-based on BOTH backends
  (first commit = 1; the Delta shim translates to Delta's 0-based log).
- ``exists()`` / ``snapshots()`` — table probe + commit log.

Mapping table (SnapshotTable → Delta):

| SnapshotTable                  | Delta                                  |
|--------------------------------|----------------------------------------|
| manifest swap commit           | `_delta_log` JSON commit               |
| ``read(version=v)`` (1-based)  | ``option("versionAsOf", v - 1)``       |
| ``read(as_of_ms=t)``           | ``option("timestampAsOf", t)``         |
| snapshot ``properties``        | ``userMetadata`` commit info           |
| branches + fast_forward (WAP)  | no direct analog (use shallow clones)  |
| ``merge_scd2_batch`` rebuild   | ``DeltaTable.merge`` close + append    |

The merge delegate stays the DataFrame rebuild (`merge_scd2_batch`) in
BOTH modes: it resolves the whole batch in one plan and one commit,
which is strictly stronger than the reference's 3-commit MERGE sequence;
on Delta the same plan writes through ``mode("overwrite")`` on the keys'
partitions (or a `DeltaTable.merge` if row-level deltas are preferred —
left to the deployment, both are one commit).

No behavior change in plain-parquet mode: without the ``delta`` package
the factory returns `SnapshotTable` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .timetravel import SnapshotInfo, SnapshotTable


def delta_available() -> bool:
    """True iff the delta-spark Python package is importable. The
    Spark session must additionally carry the Delta SQL extension +
    catalog confs (delta.io docs); `versioned_table` only checks the
    import because the conf check is session-construction-time."""
    try:
        import delta  # noqa: F401

        return True
    except Exception:
        return False


class DeltaSnapshotTable:
    """`SnapshotTable` surface over a Delta table — THIN by design: all
    commit atomicity, version resolution, and retention come from Delta's
    own log. Only constructed when `delta_available()`.

    Not supported here (SnapshotTable-only): branches / fast_forward
    (write-audit-publish). A Delta deployment expresses WAP with shallow
    clones or Unity-catalog-level mechanisms; raising keeps the gap loud.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def exists(self) -> bool:
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.root)

    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        committed_at_ms: int | None = None,
        branch: str = "main",
        properties: dict | None = None,
    ) -> SnapshotInfo:
        if branch != "main":
            raise NotImplementedError(
                "branches are SnapshotTable-only; Delta WAP = shallow clone"
            )
        if committed_at_ms is not None:
            # Delta stamps wall-clock commit times in its log; a caller
            # passing a LOGICAL timestamp (the SnapshotTable checkpoint
            # pattern: write(committed_at_ms=1); read(as_of_ms=1_500))
            # would silently resolve against the wrong clock — fail loud
            # instead. Logical-timestamp flows stay on the parquet
            # backend.
            raise NotImplementedError(
                "committed_at_ms is SnapshotTable-only: Delta commits are "
                "stamped with wall-clock time by the Delta log"
            )
        import json

        writer = df.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if properties is not None:
            writer = writer.option("userMetadata", json.dumps(properties))
        writer.save(self.root)
        last = self._history(1)[0]
        return SnapshotInfo(
            version=int(last["version"]) + 1,
            committed_at_ms=int(last["timestamp"].timestamp() * 1000),
            path=self.root,
            properties=properties,
        )

    def _history(self, limit: int | None = None):
        from delta.tables import DeltaTable

        h = DeltaTable.forPath(self.spark, self.root).history(limit)
        return [r.asDict() for r in h.orderBy("version", ascending=False).collect()]

    def snapshots(self) -> list[SnapshotInfo]:
        import json

        out = []
        for r in reversed(self._history()):
            meta = r.get("userMetadata")
            out.append(
                SnapshotInfo(
                    version=int(r["version"]) + 1,
                    committed_at_ms=int(r["timestamp"].timestamp() * 1000),
                    path=self.root,
                    properties=json.loads(meta) if meta else None,
                )
            )
        return out

    def head_properties(self, branch: str = "main") -> dict | None:
        import json

        meta = self._history(1)[0].get("userMetadata")
        return json.loads(meta) if meta else None

    def read(
        self,
        version: int | None = None,
        as_of_ms: int | None = None,
        branch: str = "main",
    ) -> DataFrame:
        if branch != "main":
            raise NotImplementedError("branches are SnapshotTable-only")
        reader = self.spark.read.format("delta")
        if version is not None:
            # Surface versions are 1-based (SnapshotTable numbering);
            # Delta's native log is 0-based. Normalizing here keeps
            # read(version=1) == "first commit" on BOTH backends.
            reader = reader.option("versionAsOf", version - 1)
        elif as_of_ms is not None:
            # Delta's timestampAsOf takes a timestamp string; resolution
            # (latest commit <= ts) matches SnapshotTable._resolve, but
            # against Delta's WALL-CLOCK commit times (write() rejects
            # logical committed_at_ms for exactly this reason), and Delta
            # raises for timestamps before the first commit.
            import datetime as dt

            ts = dt.datetime.fromtimestamp(
                as_of_ms / 1000, tz=dt.timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S.%f")
            reader = reader.option("timestampAsOf", ts)
        return reader.load(self.root)


def versioned_table(
    spark: SparkSession, root: str, backend: str = "auto"
) -> SnapshotTable | DeltaSnapshotTable:
    """Factory: ``backend`` is "auto" (Delta iff importable AND the root
    is already a Delta table — a plain-parquet root stays on
    SnapshotTable so existing tables never change format silently),
    "parquet", or "delta" (raises if the package is absent)."""
    if backend == "parquet":
        return SnapshotTable(spark, root)
    if backend == "delta":
        if not delta_available():
            raise ImportError("backend='delta' but the delta package is absent")
        return DeltaSnapshotTable(spark, root)
    if backend != "auto":
        raise ValueError(f"unknown backend {backend!r}")
    if delta_available():
        t = DeltaSnapshotTable(spark, root)
        if t.exists():
            return t
    return SnapshotTable(spark, root)
