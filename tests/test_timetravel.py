"""SnapshotTable: versioned reads, TIMESTAMP AS OF resolution, atomicity
of the manifest swap (time travel without Delta/Iceberg — README.MD:
308-313 capability)."""

from __future__ import annotations

import pytest

from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_versioned_reads(spark, table):
    table.write(_df(spark, [1, 2]), committed_at_ms=100)
    table.write(_df(spark, [1, 2, 3]), committed_at_ms=200)
    assert table.read().count() == 3
    assert table.read(version=1).count() == 2
    assert table.read(as_of_ms=150).count() == 2
    assert table.read(as_of_ms=250).count() == 3
    with pytest.raises(ValueError):
        table.read(as_of_ms=50)
    with pytest.raises(ValueError):
        table.read(version=99)


def test_empty_table_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        table.read()


def test_snapshot_immutable_under_new_writes(spark, table):
    table.write(_df(spark, [1]), committed_at_ms=100)
    v1 = table.read(version=1)
    table.write(_df(spark, [1, 2, 3, 4]), committed_at_ms=200)
    # v1 still readable post-commit (new version wrote a new directory)
    assert v1.count() == 1
    assert table.read(version=1).count() == 1
    assert len(table.snapshots()) == 2


def test_partitioned_snapshot(spark, table):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["x", "p"])
    table.write(df, partition_by=["p"], committed_at_ms=100)
    got = table.read()
    assert got.count() == 2
    assert set(got.columns) == {"x", "p"}
