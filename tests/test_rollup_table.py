"""IncrementalRollup: N incremental refreshes must equal one full
aggregate — including out-of-order batches (late data folds into its
original bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.rollup_table import IncrementalRollup
from hybrid_data_lakehouse_lab_spark.sources import load_table


def _full(events, window="6 hours"):
    return (
        events.groupBy(
            F.window("ts", window).start.alias("bucket_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def _as_map(df):
    return {
        (r["bucket_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
    for r in df.collect()
    }


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    ).cache()


def test_incremental_equals_full(spark, events, tmp_path_factory):
    roll = IncrementalRollup(spark, str(tmp_path_factory.mktemp("roll")))
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    first, second = (
        events.filter(F.col("event_id") <= mid),
        events.filter(F.col("event_id") > mid),
    )
    roll.refresh(first)
    roll.refresh(second)
    assert _as_map(roll.read()) == _as_map(_full(events))


def test_out_of_order_batches_converge(spark, events, tmp_path_factory):
    """Batches split by event TIME applied newest-first: the late batch
    still folds into the old buckets — arrival order is irrelevant."""
    roll = IncrementalRollup(spark, str(tmp_path_factory.mktemp("roll_ooo")))
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    older, newer = events.filter(F.col("ts") < cutoff), events.filter(
        F.col("ts") >= cutoff
    )
    roll.refresh(newer)  # newest first
    roll.refresh(older)  # late data second
    assert _as_map(roll.read()) == _as_map(_full(events))


def test_refresh_history_time_travels(spark, events, tmp_path_factory):
    roll = IncrementalRollup(spark, str(tmp_path_factory.mktemp("roll_tt")))
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    roll.refresh(events.filter(F.col("ts") < cutoff))
    v1_buckets = roll.read().count()
    roll.refresh(events.filter(F.col("ts") >= cutoff))
    assert roll.read(version=1).count() == v1_buckets
    assert roll.read().count() > v1_buckets
