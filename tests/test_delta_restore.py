"""Delta RESTORE (operators/delta_log.py:restore_delta_table):
append-only rollback commit, DV-descriptor shedding, vacuum
interaction, and CDF across the restore commit."""

from __future__ import annotations

import json
import os

import pytest

from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
    export_delta_log,
    read_delta_changes,
    read_delta_table,
    replay_delta_log,
    restore_delta_table,
    version_at_timestamp,
)
from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
    vacuum_delta_table,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable


def _two_version_table(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    v0 = spark.createDataFrame(
        [(i, "v0") for i in range(10)], "id LONG, tag STRING"
    )
    v1 = spark.createDataFrame(
        [(i, "v1") for i in range(4)], "id LONG, tag STRING"
    )
    t.write(v0, committed_at_ms=1)
    t.write(v1, committed_at_ms=2)
    return t, export_delta_log(t)


def test_restore_restores_content_and_keeps_history(spark, tmp_path):
    t, log = _two_version_table(spark, tmp_path)
    res = restore_delta_table(log, 0)
    assert res["restored_to"] == 0 and res["version"] == 2
    head = read_delta_table(spark, t.root)
    assert head.count() == 10
    assert [r.tag for r in head.select("tag").distinct().collect()] == ["v0"]
    # the pre-restore state is STILL time-travelable: append-only
    assert read_delta_table(spark, t.root, version=1).count() == 4
    # commitInfo carries the RESTORE operation and a monotonic timestamp
    with open(os.path.join(log, f"{2:020d}.json")) as fh:
        ci = json.loads(fh.readline())["commitInfo"]
    assert ci["operation"] == "RESTORE"
    assert ci["operationParameters"]["version"] == "0"
    assert version_at_timestamp(log, ci["timestamp"]) == 2


def test_restore_to_current_version_refuses(spark, tmp_path):
    _, log = _two_version_table(spark, tmp_path)
    with pytest.raises(ValueError, match="already at version 1"):
        restore_delta_table(log, 1)


def test_restore_sheds_deletion_vectors(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "dv"))
    full = spark.createDataFrame(
        [(i, "x") for i in range(10)], "id LONG, tag STRING"
    )
    t.write(full, committed_at_ms=1)
    t.write(full.filter("id >= 3"), committed_at_ms=2)  # pure delete -> DV
    log = export_delta_log(t, mor_deletes=True)
    assert read_delta_table(spark, t.root).count() == 7
    restore_delta_table(log, 0)
    # masked rows return, and no live add carries a DV descriptor
    assert read_delta_table(spark, t.root).count() == 10
    state = replay_delta_log(log)
    assert all(
        "deletionVector" not in a for a in state["files"].values()
    ), "restore must re-add the target's descriptor-free actions"


def test_restore_refuses_after_vacuum(spark, tmp_path):
    t, log = _two_version_table(spark, tmp_path, name="vac")
    vacuum_delta_table(t.root, keep_versions=1)
    with pytest.raises(ValueError, match="no longer exist"):
        restore_delta_table(log, 0)


def test_cdf_sees_restore_as_ordinary_change_commit(spark, tmp_path):
    t, log = _two_version_table(spark, tmp_path, name="cdf")
    res = restore_delta_table(log, 0)
    changes = read_delta_changes(
        spark,
        t.root,
        starting_version=res["version"],
        ending_version=res["version"],
    )
    kinds = {
        r["_change_type"]
        for r in changes.select("_change_type").distinct().collect()
    }
    assert kinds == {"insert", "delete"}
    # the inserts are exactly the returning v0 rows
    ins = changes.filter("_change_type = 'insert'")
    assert ins.count() == 10


def test_restore_by_timestamp_and_arg_validation(spark, tmp_path):
    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        restore_delta_table as _restore,
    )

    t, log = _two_version_table(spark, tmp_path, name="ts")
    with pytest.raises(ValueError, match="exactly one"):
        _restore(log)
    with pytest.raises(ValueError, match="exactly one"):
        _restore(log, version=0, timestamp_ms=1)
    # commit timestamps are the SnapshotTable at_ms values (1 and 2):
    # restoring to ts=1 resolves to version 0
    res = _restore(log, timestamp_ms=1)
    assert res["restored_to"] == 0
    assert read_delta_table(spark, t.root).count() == 10
