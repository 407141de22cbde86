"""Parquet table loaders over the testdata layout (one file per table).

The reference's batch lane does exactly this — a recursive parquet
directory scan (reference: libs/scd2_spark_processor.py:203-223) — and
relies on Catalyst for predicate pushdown / column pruning, which we get
for free by loading lazily and never materializing here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table; filters/projections push down.

    events.ts is TIMESTAMP(NANOS) in parquet, which Spark reads as a long
    (nanosAsLong, see session.py); normalize to a microsecond timestamp by
    integer division — the same ns→µs truncation DuckDB applies, so the
    oracle sees identical values.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
