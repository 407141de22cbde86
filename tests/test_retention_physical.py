"""PHYSICAL retention enforcement (round-8 item 3): `apply_retention`
commits the expired-row delete that `TableSpec.retention_predicate`'s
serving view only filters — the engine twin of Pinot segment drops /
Delta delete-where + vacuum / Iceberg delete + expire_snapshots.

Proven here: idempotence, time-travel consistency with the view lane,
merge-on-read export through BOTH format facades (and fv3 DVs), and the
full lifecycle retention → compaction → vacuum that physically frees
the expired bytes.
"""

from __future__ import annotations

import json
import os

import pytest

from hybrid_data_lakehouse_lab_spark.ddl import TableSpec
from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
    export_delta_log,
    read_delta_table,
)
from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
    export_iceberg_metadata,
    read_iceberg_table,
)
from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
    apply_retention,
    compact_snapshot,
    vacuum_snapshots,
)
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def hist(spark, tmp_path):
    """A history table with 120 days of daily rows."""
    t = SnapshotTable(spark, str(tmp_path / "h"))
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + "
        "make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, id % 4 AS g "
        "FROM range(120)"
    )
    t.write(df, committed_at_ms=1000)
    return t


KEEP = "ts >= timestamp'2024-03-01 00:00:00'"  # deterministic cutoff


def test_apply_retention_idempotent_and_exact(spark, hist):
    info = apply_retention(hist, KEEP, committed_at_ms=2000)
    assert info is not None and info.version == 2
    assert _rows(hist.read()) == _rows(
        hist.read(version=1).where(KEEP)
    )
    # idempotent: nothing left to expire
    assert apply_retention(hist, KEEP, committed_at_ms=3000) is None
    assert hist.branch_head() == 2
    # time travel still resolves the full pre-retention history
    assert hist.read(version=1).count() == 120


def test_retention_view_lane_equivalence(spark, hist):
    """The physical job and the serving view agree: enforcing the spec's
    retention predicate (with a pinned now) yields exactly the rows the
    view lane serves over the unenforced table."""
    spec = TableSpec.from_dict(
        "h",
        {
            "time_column": {"name": "ts", "type": "TIMESTAMP"},
            "retention": {"time_value": 30, "time_unit": "DAYS"},
            "columns": [
                {"name": "id", "type": "LONG", "field_type": "dimension"},
                {"name": "ts", "type": "TIMESTAMP", "field_type": "datetime"},
                {"name": "g", "type": "LONG", "field_type": "dimension"},
            ],
        },
    )
    pred = spec.retention_predicate(
        now_expr="timestamp'2024-04-15 00:00:00'"
    )
    view_rows = _rows(hist.read().where(pred))
    apply_retention(hist, pred, committed_at_ms=2000)
    assert _rows(hist.read()) == view_rows
    assert apply_retention(hist, pred, committed_at_ms=3000) is None


def test_retention_exports_as_mor_delete_both_formats(spark, hist):
    apply_retention(hist, KEEP, committed_at_ms=2000)
    # Delta: a DV DELETE commit, not a rewrite
    log_dir = export_delta_log(hist, mor_deletes=True)
    v1 = [json.loads(x) for x in open(os.path.join(log_dir, f"{1:020d}.json"))]
    ci = next(a["commitInfo"] for a in v1 if "commitInfo" in a)
    assert ci["operation"] == "DELETE"
    assert any(a.get("add", {}).get("deletionVector") for a in v1)
    assert _rows(read_delta_table(spark, hist.root)) == _rows(hist.read())
    assert _rows(read_delta_table(spark, hist.root, version=0)) == _rows(
        hist.read(version=1)
    )
    # Iceberg v2 (positional) and v3 (Puffin DVs)
    for fv in (2, 3):
        meta_dir = export_iceberg_metadata(hist, format_version=fv)
        md = json.load(open(os.path.join(meta_dir, "v2.metadata.json")))
        assert [s["summary"]["operation"] for s in md["snapshots"]] == [
            "overwrite",
            "delete",
        ]
        assert _rows(read_iceberg_table(spark, hist.root)) == _rows(
            hist.read()
        )
        assert _rows(
            read_iceberg_table(spark, hist.root, snapshot_id=1)
        ) == _rows(hist.read(version=1))


def test_retention_preserves_partition_layout(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"))
    df = spark.sql(
        "SELECT id, CAST(id % 3 AS STRING) AS part, "
        "timestamp'2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0)"
        " AS ts FROM range(30)"
    )
    t.write(df, partition_by=["part"], committed_at_ms=1000)
    info = apply_retention(
        t, "ts >= timestamp'2024-01-10'", committed_at_ms=2000
    )
    assert sorted(
        e for e in os.listdir(info.path) if e.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]
    assert t.read().count() == 21


def test_retention_then_compaction_then_vacuum_frees_bytes(spark, hist):
    """The full lifecycle: retention marks, compaction folds, vacuum
    frees — at the end the table root holds neither delete files nor
    the expired snapshot's data."""
    apply_retention(hist, KEEP, committed_at_ms=2000)
    compact_snapshot(hist, committed_at_ms=3000)
    export_delta_log(hist, mor_deletes=True)
    assert any(
        f.startswith("deletion_vector_") for f in os.listdir(hist.root)
    )
    assert vacuum_snapshots(hist, older_than_ms=2500, keep_last=1) == [1, 2]
    export_delta_log(hist, mor_deletes=True)
    assert not any(
        f.startswith("deletion_vector_") for f in os.listdir(hist.root)
    )
    got = read_delta_table(spark, hist.root)
    assert got.count() == 120 - 60  # days >= Mar 1 in the 120-day span
    assert _rows(got) == _rows(hist.read())
