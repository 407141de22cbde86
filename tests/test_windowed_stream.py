"""Watermarked windowed aggregation: the streaming lane must emit each
closed window exactly once and match the batch tumbling aggregate."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.streaming.lanes import windowed_counts_stream

BASE = datetime(2026, 3, 1, tzinfo=timezone.utc).timestamp()

# events across three 6h windows (+ one sentinel far ahead that pushes
# the watermark past every real window so availableNow drains them all)
EVENTS = [
    ("click", 0.5, 0),
    ("click", 1.0, 3600),
    ("view", 2.0, 7200),
    ("click", 4.0, 6 * 3600),
    ("view", 8.0, 7 * 3600),
    ("click", 16.0, 13 * 3600),
]
SENTINEL = ("sentinel", 0.0, 48 * 3600)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("win_src")
    for i, batch in enumerate([EVENTS, [SENTINEL]]):
        path = d / f"b{i}.json"
        with open(path, "w") as f:
            for etype, value, offset in batch:
                ts = datetime.fromtimestamp(BASE + offset, tz=timezone.utc)
                f.write(
                    json.dumps(
                        {"event_type": etype, "value": value,
                         "ts": ts.strftime("%Y-%m-%d %H:%M:%S")}
                    )
                    + "\n"
                )
        t = 1_700_000_000 + i * 60
        os.utime(path, (t, t))
    return str(d)


def test_windowed_stream_matches_batch(spark, stream_dir, tmp_path_factory):
    src = (
        spark.readStream.schema("event_type STRING, value DOUBLE, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )
    out = str(tmp_path_factory.mktemp("win_out"))
    q = windowed_counts_stream(
        src, out, str(tmp_path_factory.mktemp("win_ckpt")), watermark="1 hour"
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    batch_rows = [
        (etype, value, datetime.fromtimestamp(BASE + off, tz=timezone.utc))
        for etype, value, off in EVENTS
    ]
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in (
            spark.createDataFrame(batch_rows, "event_type STRING, value DOUBLE, ts TIMESTAMP")
            .groupBy(F.window("ts", "6 hours").start.alias("window_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
            .collect()
        )
    }
    assert got == expected  # every real window closed exactly once
