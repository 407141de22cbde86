"""Stateful streaming operators: cross-batch first-seen dedup and
per-key running totals (applyInPandasWithState), driven file-per-batch
so state must survive micro-batch boundaries."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.streaming.stateful import (
    first_seen_stream,
    running_totals_stream,
)

# Round 12 (VERDICT r11 item 1): slow tier — see pytest.ini; run
# the full suite with -m "".
pytestmark = pytest.mark.slow

SCHEMA = "row_id LONG, user_id LONG, value DOUBLE"

# Three micro-batches; user 1 and 2 repeat across batches, user 3 within one.
BATCHES = [
    [(1, 1, 10.0), (2, 2, 5.0)],
    [(3, 1, 7.0), (4, 3, 1.0), (5, 3, 2.0)],
    [(6, 2, 4.0), (7, 1, 3.0), (8, 4, 9.0)],
]
ALL_ROWS = [r for b in BATCHES for r in b]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stateful_src")
    for i, batch in enumerate(BATCHES):
        path = d / f"batch_{i}.json"
        with open(path, "w") as f:
            for row_id, user_id, value in batch:
                f.write(
                    json.dumps({"row_id": row_id, "user_id": user_id, "value": value})
                    + "\n"
                )
        # FileStreamSource orders files by modification time; pin distinct
        # mtimes so micro-batch order matches BATCHES order deterministically.
        t = 1_700_000_000 + i * 60
        os.utime(path, (t, t))
    return str(d)


def _read_stream(spark, stream_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .json(stream_dir)
    )


def test_first_seen_dedup_across_batches(spark, stream_dir, tmp_path_factory):
    deduped = first_seen_stream(_read_stream(spark, stream_dir), "user_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("fs_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("first_seen").collect()
    # exactly one row per distinct user, and it is that user's first arrival
    assert sorted(r["user_id"] for r in got) == [1, 2, 3, 4]
    first_by_user = {}
    for row_id, user_id, value in ALL_ROWS:
        first_by_user.setdefault(user_id, row_id)
    assert {r["user_id"]: r["row_id"] for r in got} == first_by_user


def test_running_totals_converge_to_batch_agg(spark, stream_dir, tmp_path_factory):
    totals: dict[int, tuple[int, float]] = {}

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            totals[r["user_id"]] = (r["n"], r["total"])

    q = (
        running_totals_stream(_read_stream(spark, stream_dir), "user_id", "value")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("rt_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.createDataFrame(ALL_ROWS, SCHEMA)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    expected = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert totals == expected


# ---------------------------------------------------------------------------
# Streaming funnel: out-of-order arrivals across batches, including a
# late re-anchoring stage-1 event that retroactively promotes a user.
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = "user_id LONG, ts_us LONG, event_type STRING"

# (user_id, ts_us, event_type) per micro-batch.
FUNNEL_BATCHES = [
    [
        (10, 100, "view"),
        (20, 150, "click"),       # click before its view arrives
        (30, 500, "view"),
        (40, 100, "view"),
        (40, 300, "click"),
        (50, 100, "purchase"),    # purchase only: never enters the funnel
    ],
    [
        (10, 200, "click"),
        (20, 100, "view"),        # late view@100 makes click@150 eligible
        (30, 400, "click"),       # click BEFORE the view: not eligible
        (40, 250, "purchase"),    # ineligible now (t_click=300), later promoted
    ],
    [
        (10, 300, "purchase"),
        (40, 50, "view"),         # re-anchor: view@50 ...
        (40, 200, "click"),       # ... makes click@200 the anchor, so
                                  # purchase@250 becomes eligible → stage 3
    ],
]

# Reference final stages (strict-order semantics, order-independent).
FUNNEL_EXPECTED = {10: 3, 20: 2, 30: 1, 40: 3}


@pytest.fixture(scope="module")
def funnel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel_src")
    for i, batch in enumerate(FUNNEL_BATCHES):
        path = d / f"batch_{i}.json"
        with open(path, "w") as f:
            for user_id, ts_us, event_type in batch:
                f.write(
                    json.dumps(
                        {"user_id": user_id, "ts_us": ts_us, "event_type": event_type}
                    )
                    + "\n"
                )
        t = 1_700_000_000 + i * 60
        os.utime(path, (t, t))
    return str(d)


def test_funnel_stream_matches_batch_semantics(spark, funnel_dir, tmp_path_factory):
    from hybrid_data_lakehouse_lab_spark.streaming.stateful import funnel_stage_stream

    emissions: list[tuple[int, int, int]] = []  # (epoch, user, stage_idx)

    def sink(batch_df, epoch_id):
        for r in batch_df.collect():
            emissions.append((epoch_id, r["user_id"], r["stage_idx"]))

    src = (
        spark.readStream.schema(FUNNEL_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(funnel_dir)
    )
    q = (
        funnel_stage_stream(src)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("funnel_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final: dict[int, int] = {}
    prev: dict[int, int] = {}
    for _, user, stage in sorted(emissions):
        # reached stage is monotone non-decreasing even under re-anchoring
        assert stage >= prev.get(user, 0), f"user {user} regressed to {stage}"
        prev[user] = stage
        final[user] = stage
    assert final == FUNNEL_EXPECTED  # user 50 (purchase-only) never emitted

    # Cross-check against the batch funnel lane's strict-order semantics on
    # the SAME rows: stage counts must agree with the streaming result.
    from hybrid_data_lakehouse_lab_spark.plans.funnel import events_funnel_conversion
    import hybrid_data_lakehouse_lab_spark.plans.funnel as funnel_mod

    rows = [r for b in FUNNEL_BATCHES for r in b]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    orig = funnel_mod.load_table
    funnel_mod.load_table = lambda _s, _d, _n: df.withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    try:
        got = {
            r["stage"]: r["n_users"]
            for r in events_funnel_conversion(spark, "unused").collect()
        }
    finally:
        funnel_mod.load_table = orig
    want = {
        "view": sum(1 for s in FUNNEL_EXPECTED.values() if s >= 1),
        "click": sum(1 for s in FUNNEL_EXPECTED.values() if s >= 2),
        "purchase": sum(1 for s in FUNNEL_EXPECTED.values() if s >= 3),
    }
    assert got == want
