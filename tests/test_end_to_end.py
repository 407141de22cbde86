"""Golden end-to-end: the reference's whole architecture in one pass —
CDC drop dir → bronze stream (dt-partitioned parquet) → small-file
compaction → checkpointed SCD2 pipeline → serving views (current /
history / revenue rollup) → time travel. Expected values are computed
independently in Python from the fixture events (SURVEY §5.3)."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.maintenance import compact_partition_dir
from hybrid_data_lakehouse_lab_spark.operators.pipeline import Scd2Pipeline
from hybrid_data_lakehouse_lab_spark.streaming import bronze_stream
from hybrid_data_lakehouse_lab_spark.streaming.lanes import read_envelope_stream
from hybrid_data_lakehouse_lab_spark.testing.fixtures import (
    envelope_json_lines,
    make_cdc_events,
    write_drop_dir,
)

ATTRS = ["product_name", "category", "price", "quantity", "sale_date", "created_at"]


def _expected_current() -> dict[int, dict]:
    """Replay fixture events in Python: last image per id IN EVENT-TIME
    order (ts_ms, lsn) — the fixture emits out-of-order arrivals, which
    the engine resolves by event time, not arrival order. Dropped if the
    final event is a delete."""
    payloads = sorted(
        (e["payload"] for e in make_cdc_events()),
        key=lambda p: (p["ts_ms"], p["source"]["lsn"]),
    )
    state: dict[int, dict | None] = {}
    for p in payloads:
        key = (p["after"] or p["before"])["id"]
        state[key] = None if p["op"] == "d" else p["after"]
    return {k: v for k, v in state.items() if v is not None}


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    drop = str(root / "drop")
    bronze = str(root / "bronze")
    write_drop_dir(drop)

    # 1. streaming bronze: envelope JSON → flattened dt-partitioned parquet
    q = bronze_stream(
        read_envelope_stream(spark, drop), bronze, str(root / "bronze_ckpt")
    )
    q.awaitTermination(120)

    # 2. maintenance: compact the micro-batch fragments
    compact_partition_dir(spark, bronze, target_file_bytes=64 * 1024 * 1024)

    # 3. batch SCD2 over the bronze scan, checkpointed
    pipe = Scd2Pipeline(
        spark,
        str(root / "silver"),
        key_cols=["id"],
        attr_cols=ATTRS,
        ts_col="event_timestamp",
        order_cols=["event_timestamp", "lsn"],
    )
    flat = spark.read.parquet(bronze)
    ins = flat.filter(F.col("op") != "d").select(
        F.col("after_id").alias("id"),
        *[F.col(f"after_{c}").alias(c) for c in ATTRS],
        "event_timestamp", "lsn", "op", "dt",
    )
    dels = flat.filter(F.col("op") == "d").select(
        F.col("before_id").alias("id"),
        *[F.col(f"before_{c}").alias(c) for c in ATTRS],
        "event_timestamp", "lsn", "op", "dt",
    )
    n = pipe.process_batch(ins.unionByName(dels))
    assert n == len(envelope_json_lines())
    return {"pipe": pipe, "bronze": bronze}


def test_bronze_is_partitioned_and_compacted(spark, lake):
    parts = glob.glob(lake["bronze"] + "/dt=*")
    assert parts, "expected dt=... partition directories"
    for p in parts:
        files = glob.glob(p + "/*.parquet")
        assert len(files) == 1, f"{p}: compaction left {len(files)} files"


def test_current_state_matches_python_replay(spark, lake):
    expected = _expected_current()
    got = {
        r["id"]: r
        for r in lake["pipe"].current().select("id", *ATTRS).collect()
    }
    assert set(got) == set(expected)
    for k, img in expected.items():
        for c in ("product_name", "category", "price", "quantity"):
            assert got[k][c] == img[c], f"id={k} col={c}"


def test_revenue_rollup_acceptance(spark, lake):
    """The reference's headline acceptance query (README.MD:281-285):
    revenue per category over current non-deleted rows."""
    expected: dict[str, float] = {}
    for img in _expected_current().values():
        expected[img["category"]] = round(
            expected.get(img["category"], 0.0)
            + float(img["price"]) * img["quantity"],
            2,
        )
    got = {
        r["category"]: round(r["revenue"], 2)
        for r in (
            lake["pipe"].current()
            .groupBy("category")
            .agg(F.sum(F.col("price").cast("double") * F.col("quantity")).alias("revenue"))
            .collect()
        )
    }
    assert got == pytest.approx(expected)


def test_history_chronology_per_key(spark, lake):
    """Audit-replay acceptance (README.MD:288-295): each id's versions in
    event order with contiguous intervals."""
    rows = lake["pipe"].scd2().filter(F.col("id") == 1).orderBy("effective_start_ts").collect()
    assert rows, "id=1 missing from SCD2 table"
    for prev, nxt in zip(rows, rows[1:]):
        assert prev["effective_end_ts"] == nxt["effective_start_ts"]


def test_time_travel_reads(spark, lake):
    """VERSION AS OF v1 equals the table as first committed (README time
    travel, README.MD:308-313)."""
    v1 = lake["pipe"].scd2(version=1)
    assert v1.count() == lake["pipe"].scd2().count()  # single batch → same snapshot
    # replay: a second identical batch is a no-op (checkpoint), so still v1
    assert len(lake["pipe"].table.snapshots()) == 1
