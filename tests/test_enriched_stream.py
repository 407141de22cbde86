"""Stream-static enrichment: the streaming lane's output must equal the
equivalent batch join, and the static side must be re-resolved between
micro-batches (dim updates visible without a stream restart)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.streaming.lanes import enriched_stream

EVENTS = [
    {"event_id": 1, "user_id": 10, "event_type": "click", "value": 0.5},
    {"event_id": 2, "user_id": 11, "event_type": "view", "value": 2.0},
    {"event_id": 3, "user_id": 10, "event_type": "click", "value": 1.5},
    {"event_id": 4, "user_id": 99, "event_type": "view", "value": 4.0},  # no dim row
]

DIM = [(10, "gold"), (11, "basic")]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("enrich_src")
    for i, ev in enumerate(EVENTS):
        path = d / f"b{i}.json"
        path.write_text(json.dumps(ev) + "\n")
        t = 1_700_000_000 + i * 60  # pin distinct mtimes: file order = mtime
        os.utime(path, (t, t))
    return str(d)


SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"


def _read_stream(spark, stream_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .json(stream_dir)
    )


def test_enriched_stream_matches_batch_join(spark, stream_dir, tmp_path_factory):
    dim = spark.createDataFrame(DIM, "user_id BIGINT, tier STRING")
    out = str(tmp_path_factory.mktemp("enrich_out"))
    q = enriched_stream(
        _read_stream(spark, stream_dir),
        dim,
        out,
        str(tmp_path_factory.mktemp("enrich_ckpt")),
        on="user_id",
    )
    q.awaitTermination(120)

    got = {r["event_id"]: r for r in spark.read.parquet(out).collect()}
    batch = spark.read.schema(SCHEMA).json(stream_dir).join(
        F.broadcast(dim), "user_id", "left"
    )
    want = {r["event_id"]: r for r in batch.collect()}
    assert set(got) == set(want) == {1, 2, 3, 4}
    for eid in want:
        assert got[eid]["tier"] == want[eid]["tier"], eid
    assert got[4]["tier"] is None  # left join keeps dim-less events


def test_dim_update_across_incremental_runs(spark, tmp_path_factory):
    """The slowly-changing-dim pattern for plain parquet: each
    availableNow run resolves the dim FRESH, continuing from the same
    checkpoint — new dim rows apply to new events only. (An overwrite
    under a pinned dim DataFrame would instead fail the stream with
    FILE_NOT_EXIST — see enriched_stream's docstring.)"""
    src = tmp_path_factory.mktemp("rr_src")
    dim_dir = str(tmp_path_factory.mktemp("rr_dim"))
    out = str(tmp_path_factory.mktemp("rr_out"))
    ckpt = str(tmp_path_factory.mktemp("rr_ckpt"))

    spark.createDataFrame([(10, "gold")], "user_id BIGINT, tier STRING").write.mode(
        "overwrite"
    ).parquet(dim_dir)
    dim = spark.read.parquet(dim_dir)

    def drop(i: int, ev: dict) -> None:
        p = src / f"b{i}.json"
        p.write_text(json.dumps(ev) + "\n")
        t = 1_700_000_000 + i * 60
        os.utime(p, (t, t))

    drop(0, {"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.0})
    q = enriched_stream(
        _read_stream(spark, str(src)).coalesce(1), dim, out, ckpt, on="user_id"
    )
    q.awaitTermination(120)

    # dim gains a row, then a second availableNow run drains a new event
    spark.createDataFrame(
        [(10, "gold"), (20, "silver")], "user_id BIGINT, tier STRING"
    ).write.mode("overwrite").parquet(dim_dir)
    drop(1, {"event_id": 2, "user_id": 20, "event_type": "view", "value": 2.0})
    dim_fresh = spark.read.parquet(dim_dir)
    q2 = enriched_stream(
        _read_stream(spark, str(src)).coalesce(1), dim_fresh, out, ckpt, on="user_id"
    )
    q2.awaitTermination(120)

    got = {r["event_id"]: r["tier"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "gold", 2: "silver"}
