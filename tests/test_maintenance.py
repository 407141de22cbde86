"""Maintenance jobs: compaction preserves data and bounds file counts;
vacuum expires old snapshots but never the current/protected ones."""

from __future__ import annotations

import glob
import os

from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
    compact_partition_dir,
    vacuum_snapshots,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable


def test_compaction_bounds_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "bronze")
    # simulate many micro-batch appends → many small files per partition
    for batch in range(8):
        (
            spark.range(batch * 100, batch * 100 + 100)
            .selectExpr("id", "CAST(id % 2 AS STRING) AS dt")
            .repartition(4)
            .write.mode("append")
            .partitionBy("dt")
            .parquet(path)
        )
    before = spark.read.parquet(path).orderBy("id").collect()
    files_before = len(glob.glob(f"{path}/dt=*/*.parquet"))
    assert files_before >= 32  # genuinely fragmented

    result = compact_partition_dir(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert set(result) == {"0", "1"} and all(n == 1 for n in result.values())
    files_after = len(glob.glob(f"{path}/dt=*/*.parquet"))
    assert files_after == 2
    assert spark.read.parquet(path).orderBy("id").collect() == before


def test_vacuum_expires_only_unprotected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    paths = []
    for v in range(1, 5):
        info = t.write(spark.range(v).toDF("id"), committed_at_ms=v * 1000)
        paths.append(info.path)

    # expire everything committed before t=3500; current (v4) is protected
    expired = vacuum_snapshots(t, older_than_ms=3500, keep_last=1)
    assert expired == [1, 2, 3]
    for p in paths[:3]:
        assert not os.path.exists(p)
    assert [s.version for s in t.snapshots()] == [4]
    assert t.read().count() == 4
    # expired version reads fail loudly, never silently return stale data
    import pytest

    with pytest.raises(ValueError):
        t.read(version=1)

    # keep_last=2 would have protected v3: verify on a fresh table
    t2 = SnapshotTable(spark, str(tmp_path / "tbl_keep2"))
    for v in range(1, 5):
        t2.write(spark.range(v).toDF("id"), committed_at_ms=v * 1000)
    assert vacuum_snapshots(t2, older_than_ms=3500, keep_last=2) == [1, 2]
    assert [s.version for s in t2.snapshots()] == [3, 4]


def test_vacuum_keeps_everything_when_young(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    for v in range(1, 4):
        t.write(spark.range(v).toDF("id"), committed_at_ms=v * 1000)
    assert vacuum_snapshots(t, older_than_ms=500) == []
    assert [s.version for s in t.snapshots()] == [1, 2, 3]
