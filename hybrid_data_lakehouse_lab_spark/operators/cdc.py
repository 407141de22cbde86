"""CDC envelope parsing and op routing.

The reference extracts 22 JSON paths per event with repeated JSON_VALUE
calls (reference: scripts/cdc_to_parquet.py:95-119 and the typed variant
scripts/cdc_to_pinot_current.py:87-111). We parse the envelope ONCE with
``from_json`` against a declared StructType and flatten — a single pass
that Catalyst prunes to only the fields actually consumed downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CDC_ENVELOPE

# Debezium op codes: c=create, r=snapshot-read, u=update, d=delete
# (reference: scripts/cdc_to_parquet.py:204).
UPSERT_OPS = ["c", "r", "u"]
ALL_OPS = ["c", "r", "u", "d"]

_IMAGE_FIELDS = [
    "id",
    "product_name",
    "category",
    "price",
    "quantity",
    "sale_date",
    "created_at",
]


def flatten_envelope(raw: DataFrame, value_col: str = "raw_message") -> DataFrame:
    """raw JSON envelope column → flattened typed CDC record.

    Output schema matches the reference's bronze table
    (scripts/cdc_to_parquet.py:130-164): after_*/before_* images, op,
    ts_ms, source metadata, event_timestamp, and the `dt` partition
    column (date_format(event_timestamp,'yyyy-MM-dd'),
    scripts/cdc_to_parquet.py:202). Malformed events (no op) are dropped
    (scripts/cdc_to_parquet.py:121); unknown ops are whitelisted out
    (scripts/cdc_to_parquet.py:204).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col), CDC_ENVELOPE).alias("env")
    ).select("env.payload.*")
    cols = []
    for side in ("after", "before"):
        for f in _IMAGE_FIELDS:
            cols.append(F.col(f"{side}.{f}").alias(f"{side}_{f}"))
    cols += [
        F.col("op"),
        F.col("ts_ms"),
        F.col("source.db").alias("source_db"),
        F.col("source.table").alias("source_table"),
        F.col("source.txId").alias("tx_id"),
        F.col("source.lsn").alias("lsn"),
        F.timestamp_millis(F.col("ts_ms")).alias("event_timestamp"),
    ]
    return (
        parsed.select(*cols)
        .withColumn("dt", F.date_format("event_timestamp", "yyyy-MM-dd"))
        .filter(F.col("op").isNotNull() & F.col("op").isin(ALL_OPS))
    )


def envelope_as_changes(
    flat: DataFrame, key_col: str, attr_cols: list[str]
) -> DataFrame:
    """Flattened envelope rows (before/after images) → keyed change
    records: after image for upserts, before image for deletes — the
    coalesce idiom of the reference's MERGE source (SURVEY F3;
    scripts/cdc_to_pinot_current.py:209). Both branches share one scan
    (two filters over the same subtree, no double read)."""
    ins = flat.filter(F.col("op") != "d").select(
        F.col(f"after_{key_col}").alias(key_col),
        *[F.col(f"after_{c}").alias(c) for c in attr_cols],
        "event_timestamp", "lsn", "op",
    )
    dels = flat.filter(F.col("op") == "d").select(
        F.col(f"before_{key_col}").alias(key_col),
        *[F.col(f"before_{c}").alias(c) for c in attr_cols],
        "event_timestamp", "lsn", "op",
    )
    return ins.unionByName(dels)


def route_ops(cdc: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a CDC batch into (upserts, deletes).

    Same routing as the reference (libs/scd2_spark_processor.py:241-242).
    Both branches share one scan — Catalyst plans two filters over the
    same source; no double read of parquet at scale.
    """
    upserts = cdc.filter(F.col("op").isin(UPSERT_OPS))
    deletes = cdc.filter(F.col("op") == "d")
    return upserts, deletes
