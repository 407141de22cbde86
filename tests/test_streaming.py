"""Streaming lanes: bronze partitioned writer, latest-wins upsert via
foreachBatch, and the stream/batch consistency property (SURVEY §5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.cdc import flatten_envelope
from hybrid_data_lakehouse_lab_spark.operators.scd2 import current_state
from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable
from hybrid_data_lakehouse_lab_spark.streaming import bronze_stream, upsert_stream
from hybrid_data_lakehouse_lab_spark.streaming.lanes import read_envelope_stream
from hybrid_data_lakehouse_lab_spark.testing.compare import frames_equal
from hybrid_data_lakehouse_lab_spark.testing.fixtures import (
    envelope_json_lines,
    raw_envelope_df,
    write_drop_dir,
)


@pytest.fixture(scope="module")
def drop_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cdc_drop"))
    write_drop_dir(d)
    return d


def test_bronze_stream_partitioned_parquet(spark, drop_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bronze"))
    ckpt = str(tmp_path_factory.mktemp("bronze_ckpt"))
    q = bronze_stream(read_envelope_stream(spark, drop_dir), out, ckpt)
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    assert written.count() == len(envelope_json_lines())
    # dt is a real partition column (directory-level pruning)
    assert "dt" in written.columns
    import glob

    assert glob.glob(f"{out}/dt=*"), "expected dt=... partition directories"
    # incremental restart: nothing new → no duplicates (T6)
    q2 = bronze_stream(read_envelope_stream(spark, drop_dir), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(envelope_json_lines())


def test_upsert_stream_matches_batch_current_state(
    spark, drop_dir, tmp_path_factory
):
    """Stream/batch consistency: the foreachBatch upsert over micro-batches
    must converge to the batch latest-per-key result."""
    table = SnapshotTable(spark, str(tmp_path_factory.mktemp("current_state")))
    ckpt = str(tmp_path_factory.mktemp("upsert_ckpt"))
    q = upsert_stream(
        read_envelope_stream(spark, drop_dir),
        table,
        ckpt,
        key_cols=["key_id"],
        ts_col="event_timestamp",
        order_cols=["event_timestamp", "lsn"],
    )
    q.awaitTermination(180)

    batch_flat = flatten_envelope(raw_envelope_df(spark))
    expected = current_state(
        batch_flat.withColumn(
            "key_id", F.coalesce("after_id", "before_id")
        ),
        key_cols=["key_id"],
        ts_col="event_timestamp",
        order_cols=["event_timestamp", "lsn"],
    )
    got = table.read()
    cols = ["key_id", "event_timestamp", "op", "is_deleted", "after_price"]
    ok, why = frames_equal(
        got.select(*cols).toPandas(), expected.select(*cols).toPandas()
    )
    assert ok, why
    # soft-delete semantics: deleted keys flagged, not dropped
    assert got.filter("is_deleted").count() > 0
