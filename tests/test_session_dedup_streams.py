"""Native session_window streaming sessionization and
dropDuplicatesWithinWatermark dedup: both must match their batch
equivalents once the watermark drains."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.streaming.lanes import (
    deduped_stream,
    session_window_stream,
)

BASE = datetime(2026, 5, 1, tzinfo=timezone.utc).timestamp()

# (event_id, user_id, value, offset_min) — user 1: two sessions
# (gap > 30 min between minutes 20 and 90); user 2: one session.
EVENTS = [
    (1, 1, 1.0, 0),
    (2, 1, 2.0, 20),
    (3, 1, 2.0, 20),
    (4, 1, 4.0, 90),
    (5, 2, 8.0, 10),
    (6, 9, 0.0, 48 * 60),  # sentinel far ahead: drains watermarks
]
# Dedup-lane variant: event_id 2 is replayed (exact duplicate row).
DUP_EVENTS = EVENTS[:2] + [(2, 1, 2.0, 20)] + EVENTS[3:]


def _write(dirpath, rows):
    for i, chunk in enumerate([rows[:-1], rows[-1:]]):
        p = dirpath / f"b{i}.json"
        with open(p, "w") as f:
            for eid, uid, value, off in chunk:
                ts = datetime.fromtimestamp(BASE + off * 60, tz=timezone.utc)
                f.write(
                    json.dumps(
                        {"event_id": eid, "user_id": uid, "value": value,
                         "ts": ts.strftime("%Y-%m-%d %H:%M:%S")}
                    ) + "\n"
                )
        t = 1_700_000_000 + i * 60
        os.utime(p, (t, t))


SCHEMA = "event_id BIGINT, user_id BIGINT, value DOUBLE, ts TIMESTAMP"


def _src(spark, d):
    return (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(d))
    )


def test_session_window_stream_matches_batch(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sess_src")
    _write(d, EVENTS)
    out = str(tmp_path_factory.mktemp("sess_out"))
    q = session_window_stream(
        _src(spark, d), out, str(tmp_path_factory.mktemp("sess_ckpt"))
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).filter(F.col("user_id") != 9).collect()
    }
    batch = (
        spark.read.schema(SCHEMA).json(str(d))
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "w.start", "w.end", "n_events")
    )
    want = {
        (r["user_id"], r["start"], r["end"], r["n_events"])
        for r in batch.filter(F.col("user_id") != 9).collect()
    }
    assert got == want
    # user 1 split into two sessions (40-min gap), user 2 one session
    assert sorted(u for (u, _, _, _) in got) == [1, 1, 2]


def test_deduped_stream_drops_replayed_event(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dd_src")
    _write(d, DUP_EVENTS)
    out = str(tmp_path_factory.mktemp("dd_out"))
    q = deduped_stream(
        _src(spark, d).coalesce(1), out, str(tmp_path_factory.mktemp("dd_ckpt"))
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 4, 5, 6]  # the replayed event_id=2 appears once
