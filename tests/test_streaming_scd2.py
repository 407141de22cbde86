"""Streaming SCD2 history lane: the versioned table maintained by
scd2_stream across micro-batches must equal the one-shot batch rebuild
over the same events — including out-of-order arrivals that STRADDLE
micro-batch boundaries (a late event landing while its key's chain is
still open is woven into the open segment; the fixture's boundary is
chosen so exactly that case occurs for key 7)."""

from __future__ import annotations

import pytest

from hybrid_data_lakehouse_lab_spark.operators.cdc import (
    envelope_as_changes,
    flatten_envelope,
)
from hybrid_data_lakehouse_lab_spark.operators.scd2 import scd2_from_changes
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable
from hybrid_data_lakehouse_lab_spark.streaming import scd2_stream
from hybrid_data_lakehouse_lab_spark.streaming.lanes import read_envelope_stream
from hybrid_data_lakehouse_lab_spark.testing.compare import frames_equal
from hybrid_data_lakehouse_lab_spark.testing.fixtures import (
    envelope_json_lines,
    raw_envelope_df,
    write_drop_dir,
)

KEY = "id"
ATTRS = ["product_name", "category", "price", "quantity", "sale_date"]
ORDER = ["event_timestamp", "lsn"]

# Fixture events 0..14 end with key 7's LATER update (u @ minute 31);
# event 15 is key 7's create (c @ minute 30). Splitting here delivers
# the create one micro-batch AFTER the update it precedes in event time
# — the cross-batch late-arrival case (key 7 has no closed history yet,
# so the open-segment weave must reproduce the full rebuild exactly).
SPLIT = 15


def _run_lane(spark, drop_dir, table, ckpt):
    q = scd2_stream(
        read_envelope_stream(spark, str(drop_dir)),
        table,
        str(ckpt),
        key_col=KEY,
        attr_cols=ATTRS,
        order_cols=ORDER,
    )
    q.awaitTermination(180)


COLS = [
    KEY,
    *ATTRS,
    "effective_start_ts",
    "effective_end_ts",
    "is_current",
    "is_deleted",
]


def test_scd2_stream_equals_batch_rebuild(spark, tmp_path):
    lines = envelope_json_lines()
    b1, b2 = lines[:SPLIT], lines[SPLIT:]
    assert '"op":"u"' in b1[-1] and '"op":"c"' in b2[0]  # boundary case intact

    table = SnapshotTable(spark, str(tmp_path / "scd2_table"))
    drop = tmp_path / "drop"
    ckpt = tmp_path / "ckpt"

    write_drop_dir(str(drop), b1, per_file=len(b1))
    _run_lane(spark, drop, table, ckpt)
    n_after_b1 = table.read().count()
    assert n_after_b1 > 0

    write_drop_dir(str(drop), b2, per_file=20, prefix="b2")
    # second availableNow run drains only the NEW files (checkpointed)
    _run_lane(spark, drop, table, ckpt)

    expected = scd2_from_changes(
        envelope_as_changes(flatten_envelope(raw_envelope_df(spark)), KEY, ATTRS),
        [KEY],
        ATTRS,
        "event_timestamp",
        "op",
        ORDER,
    )
    ok, why = frames_equal(
        table.read().select(*COLS).toPandas(),
        expected.select(*COLS).toPandas(),
    )
    assert ok, why


def test_scd2_stream_replay_is_noop(spark, tmp_path):
    """Re-running the drained stream against the same checkpoint must
    not change the table (T6: incremental restart processes nothing)."""
    table = SnapshotTable(spark, str(tmp_path / "scd2_table"))
    drop = tmp_path / "drop"
    ckpt = tmp_path / "ckpt"
    write_drop_dir(str(drop), envelope_json_lines(), per_file=20)
    _run_lane(spark, drop, table, ckpt)
    before = table.read().select(*COLS).toPandas()
    _run_lane(spark, drop, table, ckpt)
    ok, why = frames_equal(table.read().select(*COLS).toPandas(), before)
    assert ok, why
