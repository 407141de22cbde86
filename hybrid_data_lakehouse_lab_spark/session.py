"""SparkSession factory.

Local defaults mirror the test environment (single JVM, local[N]); the same
builder runs unmodified on a real cluster where ``master`` comes from
spark-submit. Scale notes:

* AQE on — runtime coalescing + skew-join splitting replaces hand-tuned
  shuffle partition counts at 100 TB.
* ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a cluster leave it to AQE's coalescing (initial partitions high).
* Session timezone pinned to UTC so timestamp semantics are stable across
  driver hosts (and match the DuckDB oracle, which is UTC-naive).
* Arrow enabled — every Pandas-UDF extension operator (similarity, text)
  rides vectorized Arrow batches instead of row pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "hybrid-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session. All knobs env-overridable for the bench."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which the parquet reader
        # rejects; read as long and normalize in sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # int64 micros, not the deprecated INT96: INT96 columns carry no
        # parquet min/max statistics (killing timestamp data-skipping in
        # the exported Delta/Iceberg metadata) and both table-format
        # specs require int64-encoded timestamps in data files.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
