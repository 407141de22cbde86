"""Scalar helpers — every one a thin composition of JVM-side built-ins
(pyspark.sql.functions), so they stay inside whole-stage codegen. The
reference's scalar surface is SURVEY.md §2.9 (F1-F13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel used in place of a content hash on delete-marker rows
# (reference: libs/scd2_spark_processor.py:397).
DELETED_HASH = "DELETED"

# Business columns covered by the change-detection hash. The reference
# hashes only product_name/category/price/quantity
# (libs/scd2_spark_processor.py:309-313), silently ignoring sale_date /
# created_at changes; we hash all business columns and document the
# divergence (SURVEY.md §4 decision).
HASH_COLUMNS = ["product_name", "category", "price", "quantity", "sale_date"]


def record_hash(*cols: str | Column) -> Column:
    """Content hash for no-op change suppression.

    md5(concat_ws('|', coalesce(col, ''))) — same shape as the reference
    (libs/scd2_spark_processor.py:306-314). md5 is kept for oracle
    portability; at 100 TB prefer xxhash64 (cheaper, same suppression
    semantics) via ``record_hash_fast``.
    """
    safe = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *safe))


def record_hash_fast(*cols: str | Column) -> Column:
    """xxhash64 variant — the scale path (no cryptographic cost, 64-bit)."""
    safe = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit(""))
        for c in cols
    ]
    return F.xxhash64(F.concat_ws("|", *safe))


def epoch_days_to_date(col: str | Column) -> Column:
    """Debezium encodes Postgres DATE as epoch-days INT
    (reference: scripts/cdc_to_parquet.py:100,109); decode to DateType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_add(F.lit("1970-01-01").cast("date"), c)


def epoch_millis_to_ts(col: str | Column) -> Column:
    """Exact epoch-millis → timestamp. The reference does
    TO_TIMESTAMP(FROM_UNIXTIME(ts_ms/1000)) (scripts/cdc_to_parquet.py:119),
    which truncates to seconds; timestamp_millis keeps millisecond precision.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c)


def ts_to_epoch_millis(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c)


def decode_op(col: str | Column) -> Column:
    """5-arm op decode (reference: scripts/cdc_to_pinot_history.py:258-264)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == "c", "CREATE")
        .when(c == "r", "READ")
        .when(c == "u", "UPDATE")
        .when(c == "d", "DELETE")
        .otherwise("UNKNOWN")
    )
