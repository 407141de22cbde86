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

# Runtime-settable SQL confs every plan depends on, applied in load_table so
# results are correct even on a session NOT built by session.get_spark (e.g.
# an external harness calling queries() on a bare getOrCreate() session):
#  * nanosAsLong — events.parquet carries TIMESTAMP(NANOS), which the vectorized
#    parquet reader rejects outright; read as long and normalize below.
#  * UTC session timezone — timestamp formatting/arithmetic must not depend on
#    the host timezone (the DuckDB oracle is UTC-naive).
#  * Arrow — the pandas-UDF lanes (similarity/multimodal) ride Arrow batches.
_REQUIRED_RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Idempotently pin the runtime confs correctness depends on."""
    for k, v in _REQUIRED_RUNTIME_CONF.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table; filters/projections push down.

    events.ts is TIMESTAMP(NANOS) in parquet. Spark versions differ in how
    they surface it — older readers need ``nanosAsLong`` (read as long,
    normalized here by ``div 1000``), newer ones read it natively as a
    µs-truncated TIMESTAMP_NTZ and ignore that conf. Both branches land on
    the same TimestampType under the pinned UTC session timezone, matching
    DuckDB's own ns→µs truncation, so plans and oracle hashes are
    identical regardless of which reader behavior the host Spark has.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if any(
        f.name == "ts" and isinstance(f.dataType, T.TimestampNTZType)
        for f in df.schema.fields
    ):
        # Re-read with ts declared TimestampType instead of casting after
        # the scan: a cast wraps the scan in a Project and ts predicates
        # stop pushing down to parquet (no row-group skipping on the CDC
        # fact's time column). Schema-on-read keeps PushedFilters intact
        # (verified in tests/test_plan_quality.py) and yields bit-identical
        # µs-truncated instants under the pinned UTC session timezone.
        schema = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.TimestampType()
                    if f.name == "ts"
                    and isinstance(f.dataType, T.TimestampNTZType)
                    else f.dataType,
                    f.nullable,
                )
                for f in df.schema.fields
            ]
        )
        return spark.read.schema(schema).parquet(path)
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
