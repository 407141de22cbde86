"""Binned interval join: must equal the naive range join row-for-row
(including overlapping intervals), and must plan as a hash join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.rangejoin import binned_interval_join
from hybrid_data_lakehouse_lab_spark.plans.intervals import WINDOWS
from hybrid_data_lakehouse_lab_spark.sources import load_table


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    w = spark.createDataFrame(
        WINDOWS, "window_id STRING, ws STRING, we STRING"
    ).select(
        "window_id",
        F.col("ws").cast("timestamp").alias("ws"),
        F.col("we").cast("timestamp").alias("we"),
    )
    return events, w


@pytest.mark.parametrize("bin_seconds", [3600, 86400, 7 * 86400])
def test_matches_naive_range_join(spark, frames, bin_seconds):
    """Result is bin-width-invariant and equals the nested-loop join."""
    events, w = frames
    binned = binned_interval_join(events, w, "ts", "ws", "we", bin_seconds)
    naive = events.crossJoin(w).filter(
        (F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we"))
    )
    got = {(r["event_id"], r["window_id"]) for r in binned.collect()}
    want = {(r["event_id"], r["window_id"]) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_overlap_produces_one_row_per_interval(spark, frames):
    """An event inside two overlapping windows matches both — exactly
    once each (single-bin membership means no dedup pass is needed)."""
    events, w = frames
    binned = binned_interval_join(events, w, "ts", "ws", "we")
    dup = (
        binned.groupBy("event_id", "window_id")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0
    overlap = binned.filter(
        (F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-22 00:00:00").cast("timestamp"))
    )
    per_event = overlap.groupBy("event_id").count()
    assert per_event.count() > 0
    assert per_event.agg(F.min("count")).collect()[0][0] == 2  # W3 and W4


def test_plans_as_hash_join(spark, frames):
    events, w = frames
    plan = (
        binned_interval_join(events, w, "ts", "ws", "we")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
