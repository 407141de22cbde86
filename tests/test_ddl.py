"""S10 config/DDL layer: spec parsing, StructType, executable DDL,
defaults, config-generated current-state view, retention predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hybrid_data_lakehouse_lab_spark.ddl import TableSpec
from hybrid_data_lakehouse_lab_spark.plans.config_driven import SPECS

SPEC_YAML = """
tables:
  sales_current:
    description: "Current state of sales records"
    mode: "upsert"
    time_column: {name: last_updated_ts, type: MILLISECONDS}
    upsert:
      primary_key: ["id"]
      comparison_column: "last_updated_ts"
      tiebreak: ["txid"]
    retention: {time_value: 30, time_unit: DAYS}
    columns:
      - {name: id, type: INT, field_type: dimension}
      - {name: product_name, type: STRING, field_type: dimension}
      - {name: is_deleted, type: BOOLEAN, field_type: dimension, default: false}
      - {name: price, type: DOUBLE, field_type: metric, default: 0.0}
      - {name: quantity, type: INT, field_type: metric, default: 0}
      - {name: txid, type: LONG, field_type: dimension}
      - {name: last_updated_ts, type: LONG, field_type: datetime}
    advanced: {flush_threshold_rows: 50000}
"""


@pytest.fixture(scope="module")
def spec() -> TableSpec:
    return TableSpec.all_from_yaml(SPEC_YAML)["sales_current"]


def test_struct_type(spec):
    st = spec.struct_type()
    assert st["id"].dataType == T.IntegerType()
    assert st["price"].dataType == T.DoubleType()
    assert st["is_deleted"].dataType == T.BooleanType()
    assert st["last_updated_ts"].dataType == T.LongType()
    assert [f.name for f in st.fields] == [
        "id", "product_name", "is_deleted", "price", "quantity", "txid",
        "last_updated_ts",
    ]


def test_ddl_executes(spec, spark, tmp_path):
    ddl = spec.create_table_ddl(location=str(tmp_path / "sales_current"))
    assert "PARTITIONED BY (last_updated_ts_date)" in ddl
    assert "'maxRecordsPerFile' = '50000'" in ddl
    assert "'spec.primaryKey' = 'id'" in ddl
    spark.sql(ddl)
    try:
        spark.sql(
            "INSERT INTO sales_current VALUES "
            "(1, 'x', false, 9.5, 2, 100, 1700000000000, DATE'2023-11-14')"
        )
        got = spark.table("sales_current").collect()
        assert len(got) == 1 and got[0]["price"] == 9.5
    finally:
        spark.sql("DROP TABLE sales_current")


def test_defaults(spec, spark):
    df = spark.createDataFrame(
        [(1, None, None, None, None, 7, 5)],
        schema="id INT, product_name STRING, is_deleted BOOLEAN, price DOUBLE, quantity INT, txid LONG, last_updated_ts LONG",
    )
    row = spec.apply_defaults(df).collect()[0]
    assert row["is_deleted"] is False
    assert row["price"] == 0.0 and row["quantity"] == 0
    assert row["product_name"] is None  # no default declared


def test_current_view_latest_wins(spec, spark):
    rows = [
        (1, "a", False, 1.0, 1, 10, 100),
        (1, "b", False, 2.0, 1, 11, 200),  # newer ts wins
        (2, "c", False, 3.0, 1, 12, 100),
        (2, "d", False, 4.0, 1, 13, 100),  # ts tie → higher txid wins
    ]
    spark.createDataFrame(
        rows,
        schema="id INT, product_name STRING, is_deleted BOOLEAN, price DOUBLE, quantity INT, txid LONG, last_updated_ts LONG",
    ).createOrReplaceTempView("sales_src")
    got = {
        r["id"]: r["product_name"]
        for r in spark.sql(spec.current_view_sql(source="sales_src")).collect()
    }
    assert got == {1: "b", 2: "d"}


def test_retention_predicate(spec, spark):
    pred = spec.retention_predicate(now_expr="TIMESTAMP'2023-11-20 00:00:00'")
    df = spark.createDataFrame(
        [(1, 1700000000000), (2, 1500000000000)], "id INT, last_updated_ts LONG"
    )
    kept = [r["id"] for r in df.filter(F.expr(pred)).collect()]
    assert kept == [1]  # 2023-11-14 kept; 2017 row aged out


def test_packaged_specs_parse():
    assert set(SPECS) == {"events_current", "events_history"}
    cur = SPECS["events_current"]
    assert cur.mode == "upsert" and cur.primary_key == ["user_id"]
    assert "row_number()" in cur.current_view_sql(source="events")
    assert SPECS["events_history"].mode == "append"
