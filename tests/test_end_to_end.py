"""Golden end-to-end: the reference's whole architecture in one pass —
CDC drop dir → bronze stream (dt-partitioned parquet) → small-file
compaction → checkpointed SCD2 pipeline → serving views (current /
history / revenue rollup) → time travel. Expected values are computed
independently in Python from the fixture events (SURVEY §5.3)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.job import LakehouseJob
from hybrid_data_lakehouse_lab_spark.operators.maintenance import compact_partition_dir
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
    root = str(tmp_path_factory.mktemp("lake"))
    job = LakehouseJob(spark, root, attr_cols=ATTRS)
    write_drop_dir(job.drop_dir)
    n = job.run()
    assert n == len(envelope_json_lines())

    # maintenance: compact the micro-batch fragments (the stream for
    # this cycle is drained; compaction finalizes the bronze dir)
    compact_partition_dir(spark, job.bronze_dir, target_file_bytes=64 * 1024 * 1024)
    return {"pipe": job.pipe, "bronze": job.bronze_dir, "job": job}


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


def test_rerun_with_no_new_input_is_noop(spark, lake):
    """A scheduler re-triggering the job with nothing new must change
    nothing: the SCD2 checkpoint filters every replayed event (DAG
    idempotency — reference re-appends dupes on crash-rerun; we don't).

    The rerun reads the COMPACTED bronze (its _spark_metadata retired),
    so this also proves the maintenance output is a valid batch input.
    """
    job = lake["job"]
    before = job.history().count()
    assert job.pipe.process_batch(job._bronze_as_changes()) == 0
    assert job.history().count() == before


def test_revenue_view_matches_rollup(spark, lake):
    got = {
        r["category"]: round(r["revenue"], 2)
        for r in lake["job"].revenue_by_category().collect()
    }
    expected: dict[str, float] = {}
    for img in _expected_current().values():
        expected[img["category"]] = round(
            expected.get(img["category"], 0.0)
            + float(img["price"]) * img["quantity"], 2
        )
    assert got == pytest.approx(expected)


def test_time_travel_reads(spark, lake):
    """VERSION AS OF v1 equals the table as first committed (README time
    travel, README.MD:308-313)."""
    v1 = lake["pipe"].scd2(version=1)
    assert v1.count() == lake["pipe"].scd2().count()  # single batch → same snapshot
    # replay: a second identical batch is a no-op (checkpoint), so still v1
    assert len(lake["pipe"].table.snapshots()) == 1
