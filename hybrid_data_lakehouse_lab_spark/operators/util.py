"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy downstream work.

    A small parquet file scans as ONE partition (maxPartitionBytes), which
    serializes expression-heavy lanes (hashing, shingling, regex) onto one
    core. Repartition up only when the scan is narrower than the cluster —
    at real scale inputs already have thousands of splits and this is a
    no-op (no shuffle added).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
