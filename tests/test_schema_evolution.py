"""Add-only schema evolution in Scd2Pipeline: a new attr column widens
history with typed nulls, versions correctly from its first batch, and
unsafe evolutions (retype / missing column) are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.pipeline import Scd2Pipeline

B1 = [
    # (id, name, price, ts, op)
    (1, "widget", 10.0, "2024-01-01 10:00:00", "c"),
    (2, "bolt", 5.0, "2024-01-01 10:00:00", "c"),
]
B2 = [
    # id=1: only the NEW column gains a value → must version
    (1, "widget", 10.0, "red", "2024-01-02 10:00:00", "u"),
    # id=2: nothing changes (new column still null) → hash-suppressed
    (2, "bolt", 5.0, None, "2024-01-02 10:00:00", "u"),
]


def _df(spark, rows, with_color):
    cols = "id BIGINT, product_name STRING, price DOUBLE"
    if with_color:
        cols += ", color STRING"
    cols += ", event_timestamp STRING, op STRING"
    return spark.createDataFrame(rows, cols).withColumn(
        "event_timestamp", F.col("event_timestamp").cast("timestamp")
    )


@pytest.fixture(scope="module")
def evolved(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evolve"))
    p1 = Scd2Pipeline(
        spark, root, key_cols=["id"], attr_cols=["product_name", "price"],
        lsn_col=None, order_cols=["event_timestamp"],
    )
    assert p1.process_batch(_df(spark, B1, False)) == 2
    p2 = Scd2Pipeline(
        spark, root, key_cols=["id"],
        attr_cols=["product_name", "price", "color"],
        lsn_col=None, order_cols=["event_timestamp"],
    )
    assert p2.process_batch(_df(spark, B2, True)) == 2
    return p2


def test_new_column_backfilled_null_in_history(spark, evolved):
    hist = evolved.scd2().filter((F.col("id") == 1) & ~F.col("is_current"))
    rows = hist.collect()
    assert rows and all(r["color"] is None for r in rows)


def test_new_column_value_creates_version(spark, evolved):
    cur = evolved.current().filter(F.col("id") == 1).collect()
    assert len(cur) == 1 and cur[0]["color"] == "red"
    assert evolved.scd2().filter(F.col("id") == 1).count() == 2


def test_unchanged_row_with_null_new_column_suppressed(spark, evolved):
    assert evolved.scd2().filter(F.col("id") == 2).count() == 1


def test_retype_refused(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("retype"))
    p1 = Scd2Pipeline(
        spark, root, key_cols=["id"], attr_cols=["product_name", "price"],
        lsn_col=None, order_cols=["event_timestamp"],
    )
    p1.process_batch(_df(spark, B1, False))
    bad = _df(spark, B1, False).withColumn("price", F.col("price").cast("string"))
    with pytest.raises(ValueError, match="retyped"):
        p1.process_batch(bad.withColumn(
            "event_timestamp",
            F.col("event_timestamp") + F.expr("INTERVAL 1 day"),
        ))


def test_missing_attr_column_refused(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("missing"))
    p1 = Scd2Pipeline(
        spark, root, key_cols=["id"], attr_cols=["product_name", "price"],
        lsn_col=None, order_cols=["event_timestamp"],
    )
    p1.process_batch(_df(spark, B1, False))
    p2 = Scd2Pipeline(
        spark, root, key_cols=["id"],
        attr_cols=["product_name", "price", "color"],
        lsn_col=None, order_cols=["event_timestamp"],
    )
    b2_no_color = [(i, n, p, ts, op) for (i, n, p, _, ts, op) in B2]
    with pytest.raises(ValueError, match="missing from the batch"):
        p2.process_batch(_df(spark, b2_no_color, False).withColumn(
            "event_timestamp",
            F.col("event_timestamp") + F.expr("INTERVAL 2 day"),
        ))
