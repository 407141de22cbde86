"""Bucketed-table layout — shuffle-free co-located joins (SCALE.md).

The orders ⋈ lineitem fact join pays a full shuffle of both sides on
every run at 100 TB. Writing both tables bucketed (and sorted) by the
join key makes the sort-merge join read co-located buckets with NO
exchange — the one-time write cost amortizes over every subsequent join.
`tests/test_bucketing.py` asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (+ sorted) table.

    Both sides of a co-located join must use the SAME bucket count and
    key; sorting within buckets lets the sort-merge join skip its sort.
    """
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans a sort-merge join with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
