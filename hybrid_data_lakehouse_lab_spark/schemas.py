"""Canonical schemas for the engine.

Every schema is declared, never inferred — matching the reference's fixed
DDL style (reference: libs/scd2_spark_processor.py:135-177, Flink DDLs in
scripts/cdc_to_parquet.py:130-164, Pinot YAML scripts/pinot_auto/
pinot_tables.yaml:43-95).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Operational row table (reference: scripts/pinot_auto/data_gen_pg2.py:60-64)
# ---------------------------------------------------------------------------
SOURCE_SALES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("sale_date", T.DateType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Debezium-style CDC envelope. The reference extracts 22 JSON paths with
# JSON_VALUE (scripts/cdc_to_parquet.py:95-119); we parse once with
# from_json against this nested struct and flatten — one pass, typed.
# price is STRING per decimal.handling.mode=string
# (reference: connectors/connectors.yaml:15); sale_date is epoch-days INT;
# created_at is epoch-millis BIGINT.
# ---------------------------------------------------------------------------
_SALES_IMAGE = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("sale_date", T.IntegerType(), True),
        T.StructField("created_at", T.LongType(), True),
    ]
)

CDC_ENVELOPE = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("before", _SALES_IMAGE, True),
                    T.StructField("after", _SALES_IMAGE, True),
                    T.StructField("op", T.StringType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("db", T.StringType(), True),
                                T.StructField("table", T.StringType(), True),
                                T.StructField("txId", T.LongType(), True),
                                T.StructField("lsn", T.LongType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

# ---------------------------------------------------------------------------
# Flattened CDC record — the engine's canonical IR (reference bronze schema:
# scripts/cdc_to_parquet.py:130-164). `dt` is the bronze partition column.
# ---------------------------------------------------------------------------
CDC_EVENTS = T.StructType(
    [
        T.StructField("after_id", T.IntegerType(), True),
        T.StructField("after_product_name", T.StringType(), True),
        T.StructField("after_category", T.StringType(), True),
        T.StructField("after_price", T.StringType(), True),
        T.StructField("after_quantity", T.IntegerType(), True),
        T.StructField("after_sale_date", T.IntegerType(), True),
        T.StructField("after_created_at", T.LongType(), True),
        T.StructField("before_id", T.IntegerType(), True),
        T.StructField("before_product_name", T.StringType(), True),
        T.StructField("before_category", T.StringType(), True),
        T.StructField("before_price", T.StringType(), True),
        T.StructField("before_quantity", T.IntegerType(), True),
        T.StructField("before_sale_date", T.IntegerType(), True),
        T.StructField("before_created_at", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("source_db", T.StringType(), True),
        T.StructField("source_table", T.StringType(), True),
        T.StructField("tx_id", T.LongType(), True),
        T.StructField("lsn", T.LongType(), True),
        T.StructField("event_timestamp", T.TimestampType(), True),
        T.StructField("dt", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Silver SCD2 table (reference: libs/scd2_spark_processor.py:135-157); we
# normalize sale_date to DateType (documented divergence from the epoch-days
# INT the reference keeps) and created_at to TimestampType.
# ---------------------------------------------------------------------------
SCD2 = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("sale_date", T.DateType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("effective_start_ts", T.TimestampType(), False),
        T.StructField("effective_end_ts", T.TimestampType(), True),
        T.StructField("is_current", T.BooleanType(), False),
        T.StructField("record_hash", T.StringType(), True),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

# Checkpoint table (reference: libs/scd2_spark_processor.py:167-177)
CHECKPOINT = T.StructType(
    [
        T.StructField("last_processed_timestamp", T.TimestampType(), True),
        T.StructField("last_processed_lsn", T.LongType(), True),
        T.StructField("processed_at", T.TimestampType(), True),
        T.StructField("records_processed", T.LongType(), True),
    ]
)
