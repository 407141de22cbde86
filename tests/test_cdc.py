"""CDC envelope parsing — reference P1-P4 semantics
(scripts/cdc_to_parquet.py:91-124,202-204)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.cdc import flatten_envelope, route_ops
from hybrid_data_lakehouse_lab_spark.testing.fixtures import (
    BASE_MS,
    make_cdc_events,
    raw_envelope_df,
)


@pytest.fixture(scope="module")
def flat(spark):
    return flatten_envelope(raw_envelope_df(spark)).cache()


def test_event_count_and_ops(flat):
    assert flat.count() == len(make_cdc_events())
    ops = {r["op"] for r in flat.select("op").distinct().collect()}
    assert ops <= {"c", "r", "u", "d"}


def test_insert_has_no_before_image(flat):
    r = flat.filter("op = 'c' AND after_id = 1").collect()[0]
    assert r["before_id"] is None
    assert r["after_product_name"] == "Electronics Item 1"
    assert r["after_price"] == "10.00"  # decimal-as-string preserved


def test_delete_has_no_after_image(flat):
    r = flat.filter("op = 'd' AND before_id = 5").collect()[0]
    assert r["after_id"] is None
    assert r["before_price"] == "50.00"


def test_event_timestamp_and_dt(flat):
    r = flat.filter("op = 'c' AND after_id = 1").collect()[0]
    assert r["ts_ms"] == BASE_MS + 60_000
    assert r["event_timestamp"].isoformat().startswith("2026-01-01T00:01:00")
    assert r["dt"] == "2026-01-01"


def test_malformed_envelope_dropped(spark):
    bad = spark.createDataFrame(
        [("not json at all",), ('{"payload": {"before": null}}',)],
        ["raw_message"],
    )
    assert flatten_envelope(bad).count() == 0


def test_route_ops_partition(flat):
    upserts, deletes = route_ops(flat)
    assert upserts.filter(F.col("op") == "d").count() == 0
    assert deletes.filter(F.col("op") != "d").count() == 0
    assert upserts.count() + deletes.count() == flat.count()


def test_source_metadata(flat):
    r = flat.limit(1).collect()[0]
    assert r["source_db"] == "mydb"
    assert r["source_table"] == "source_sales"
    assert r["lsn"] is not None
