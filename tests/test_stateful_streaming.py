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
