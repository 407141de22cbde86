"""Adapter-seam tests: plain-parquet mode is byte-identical to using
SnapshotTable directly; the Delta path only activates when the package
exists (it does not in this container — those tests auto-skip, proving
the shim is import-gated rather than load-bearing)."""

from __future__ import annotations

import pytest

from hybrid_data_lakehouse_lab_spark.operators.lakehouse_adapter import (
    DeltaSnapshotTable,
    delta_available,
    versioned_table,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable


def test_auto_backend_is_parquet_without_delta(spark, tmp_path):
    t = versioned_table(spark, str(tmp_path / "t"))
    if delta_available():
        pytest.skip("delta installed in this environment; auto may differ")
    assert isinstance(t, SnapshotTable)


def test_parquet_backend_unchanged(spark, tmp_path):
    """versioned_table('parquet') is the same class, same behavior."""
    t = versioned_table(spark, str(tmp_path / "t"), backend="parquet")
    assert isinstance(t, SnapshotTable)
    t.write(spark.range(5).toDF("id"), committed_at_ms=1_000)
    t.write(spark.range(8).toDF("id"), committed_at_ms=2_000)
    assert t.read(version=1).count() == 5
    assert t.read(as_of_ms=1_500).count() == 5
    assert t.read().count() == 8


def test_delta_backend_raises_without_package(spark, tmp_path):
    if delta_available():
        pytest.skip("delta installed")
    with pytest.raises(ImportError):
        versioned_table(spark, str(tmp_path / "t"), backend="delta")


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        versioned_table(spark, str(tmp_path / "t"), backend="iceberg-v3")


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_roundtrip_versions(spark, tmp_path):
    """Runs only where delta-spark exists: write two versions, read both
    back via versionAsOf — the SnapshotTable surface on a real Delta log."""
    t = DeltaSnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.range(5).toDF("id"))
    t.write(spark.range(8).toDF("id"))
    # surface versions are 1-based on both backends (first commit = 1);
    # the shim translates to Delta's 0-based log internally
    assert t.read(version=1).count() == 5
    assert t.read().count() == 8
    assert [s.version for s in t.snapshots()] == [1, 2]


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_rejects_logical_commit_timestamps(spark, tmp_path):
    """committed_at_ms is a LOGICAL clock on SnapshotTable; Delta stamps
    wall-clock commit times, so passing one must fail loud, not resolve
    as_of_ms against the wrong clock."""
    t = DeltaSnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(NotImplementedError):
        t.write(spark.range(3).toDF("id"), committed_at_ms=1_000)
