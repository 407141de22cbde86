"""Iceberg metadata tables (`$snapshots`/`$history`/`$manifests`/
`$files`/`$partitions`) over exported trees."""

import pytest
import os

from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.iceberg_inspect import (
    files_table,
    history_table,
    manifests_table,
    partitions_table,
    snapshots_table,
)
from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow


def _mor_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(90).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
    )
    t.write(ev, partition_by=["g"], committed_at_ms=1)
    t.write(
        ev.filter(F.col("k") % 5 != 0), partition_by=["g"], committed_at_ms=2
    )
    export_iceberg_metadata(t, format_version=2)
    return t


def test_snapshots_and_history(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    snaps = snapshots_table(spark, t.root).orderBy("snapshot_id").collect()
    assert [(r["snapshot_id"], r["operation"]) for r in snaps] == [
        (1, "overwrite"),
        (2, "delete"),
    ]
    assert snaps[1]["parent_id"] == 1
    hist = history_table(spark, t.root).orderBy("snapshot_id").collect()
    assert [(r["snapshot_id"], r["is_current_ancestor"]) for r in hist] == [
        (1, True),
        (2, True),
    ]


def test_manifests_reuse_visible(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    m1 = manifests_table(spark, t.root, snapshot_id=1).collect()
    m2 = manifests_table(spark, t.root, snapshot_id=2).collect()
    assert [r["content"] for r in m1] == [0]
    assert sorted(r["content"] for r in m2) == [0, 1]
    # MoR manifest reuse: the head's data manifest IS snapshot 1's
    assert {r["path"] for r in m1} <= {r["path"] for r in m2}


def test_files_and_partitions_match_source(spark, tmp_path):
    t = _mor_table(spark, tmp_path)
    f = files_table(spark, t.root)
    data_rows = (
        f.filter(F.col("content") == 0)
        .agg(F.sum("record_count"))
        .collect()[0][0]
    )
    del_rows = (
        f.filter(F.col("content") == 1)
        .agg(F.sum("record_count"))
        .collect()[0][0]
    )
    assert data_rows == 90  # base manifests reused: full pre-delete set
    assert del_rows == 18  # k % 5 == 0
    assert all(
        r["partition"] and "g" in r["partition"]
        for r in f.collect()
    )
    parts = partitions_table(spark, t.root).collect()
    assert sorted(p["partition"]["g"] for p in parts) == ["0", "1", "2"]
    assert sum(p["record_count"] for p in parts) == 90
    assert all(p["file_count"] >= 1 for p in parts)


def test_files_table_unpartitioned_and_missing_snapshot(spark, tmp_path):
    import pytest

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1,)], "k INT"), committed_at_ms=1)
    export_iceberg_metadata(t, format_version=2)
    f = files_table(spark, t.root).collect()
    assert len(f) >= 1 and all(r["partition"] is None for r in f)
    with pytest.raises(ValueError, match="snapshot 99"):
        files_table(spark, t.root, snapshot_id=99)


def test_snapshot_summary_counters(spark, tmp_path):
    """The spec-standard summary counters engines show in DESCRIBE
    HISTORY: a MoR chain's delete snapshot must report the delete
    file/row adds and carry totals; the overwrite reports its own
    adds and what it replaced."""
    import json

    t = _mor_table(spark, tmp_path)  # 90 rows, then delete 18 (k%5==0)
    meta_dir = os.path.join(t.root, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    md = json.load(open(os.path.join(meta_dir, f"v{n}.metadata.json")))
    s1, s2 = md["snapshots"]
    assert s1["summary"]["operation"] == "overwrite"
    assert s1["summary"]["added-records"] == "90"
    assert s1["summary"]["total-records"] == "90"
    assert s1["summary"]["total-delete-files"] == "0"
    assert s2["summary"]["operation"] == "delete"
    assert s2["summary"]["added-data-files"] == "0"
    assert int(s2["summary"]["added-delete-files"]) >= 1
    assert s2["summary"]["added-position-deletes"] == "18"
    assert s2["summary"]["total-records"] == "90"  # physical, pre-mask
    assert s2["summary"]["total-position-deletes"] == "18"
    # the counters surface through the snapshots metadata table
    got = {
        r["snapshot_id"]: r["summary"]
        for r in snapshots_table(spark, t.root).collect()
    }
    assert got[2]["added-position-deletes"] == "18"


def test_delta_history_table(spark, tmp_path):
    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        export_delta_log,
    )
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_inspect import (
        delta_history_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        compact_snapshot,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"))
    ev = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    t.write(ev, committed_at_ms=1000, properties={"checkpoint": "a"})
    t.write(ev.filter(F.col("k") % 4 != 0), committed_at_ms=2000)
    compact_snapshot(t, committed_at_ms=3000)
    export_delta_log(t, mor_deletes=True)
    h = delta_history_table(spark, t.root).orderBy("version").collect()
    assert [r["version"] for r in h] == [0, 1, 2]
    assert [r["timestamp_ms"] for r in h] == [1000, 2000, 3000]
    assert h[2]["operation"] == "OPTIMIZE"
    assert '"checkpoint": "a"' in (h[0]["user_metadata"] or "")
