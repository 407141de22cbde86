"""asof_join operator semantics: backward match, exact-ts visibility,
no-match nulls, tolerance, and null payload FIELDS (must not fall back
to an older right row)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def joined(spark):
    from hybrid_data_lakehouse_lab_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", "e1"),  # after q1
            ("k1", "2024-01-01 12:00:00", "e2"),  # exactly at q2
            ("k1", "2024-01-01 13:00:00", "e3"),  # after q2 (null px)
            ("k2", "2024-01-01 09:00:00", "e4"),  # before any right row
        ],
        "key STRING, lts STRING, event STRING",
    ).selectExpr("key", "CAST(lts AS TIMESTAMP) AS lts", "event")
    right = spark.createDataFrame(
        [
            ("k1", "2024-01-01 09:00:00", 1.0),
            ("k1", "2024-01-01 12:00:00", None),  # null payload FIELD
            ("k2", "2024-01-01 11:00:00", 3.0),
        ],
        "key STRING, rts STRING, px DOUBLE",
    ).selectExpr("key", "CAST(rts AS TIMESTAMP) AS rts", "px")
    rows = asof_join(left, right, ["key"], "lts", "rts").collect()
    return {r["event"]: r for r in rows}


def test_backward_match(joined):
    assert joined["e1"]["px"] == 1.0
    assert str(joined["e1"]["matched_ts"]) == "2024-01-01 09:00:00"


def test_exact_ts_right_row_is_visible(joined):
    assert str(joined["e2"]["matched_ts"]) == "2024-01-01 12:00:00"


def test_null_payload_field_not_skipped(joined):
    """The 12:00 right row has px=NULL; e3 must see THAT row (null px),
    not reach back to the 09:00 row's px=1.0."""
    assert str(joined["e3"]["matched_ts"]) == "2024-01-01 12:00:00"
    assert joined["e3"]["px"] is None


def test_no_prior_right_row_yields_nulls(joined):
    assert joined["e4"]["matched_ts"] is None
    assert joined["e4"]["px"] is None


def test_tolerance_nulls_stale_matches(spark):
    from hybrid_data_lakehouse_lab_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", "fresh"), ("k", "2024-01-02 10:00:00", "stale")],
        "key STRING, lts STRING, tag STRING",
    ).selectExpr("key", "CAST(lts AS TIMESTAMP) AS lts", "tag")
    right = spark.createDataFrame(
        [("k", "2024-01-01 09:00:00", 5.0)], "key STRING, rts STRING, px DOUBLE"
    ).selectExpr("key", "CAST(rts AS TIMESTAMP) AS rts", "px")
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, ["key"], "lts", "rts", tolerance_seconds=2 * 3600
        ).collect()
    }
    assert rows["fresh"]["px"] == 5.0
    assert rows["stale"]["px"] is None and rows["stale"]["matched_ts"] is None


def test_column_clash_rejected(spark):
    from hybrid_data_lakehouse_lab_spark.operators.asof import asof_join

    df = spark.createDataFrame([("k", 1, 2)], "key STRING, ts BIGINT, v BIGINT")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, ["key"], "ts", "ts")
