"""Incremental rollup table — a continuous aggregate maintained batch
by batch (the TimescaleDB continuous-aggregate / hypertable-rollup
idea, and the lakehouse form of Pinot's star-tree pre-aggregation the
reference leans on for serving — SURVEY §4 flush/segment rows).

Each refresh aggregates ONLY the new events to per-bucket partials and
algebraically merges them into the stored rollup: counts add, sums add
— so the merge is a union + re-aggregate on the bucket key, touching
|existing buckets| + |new partials| rows, never the raw history. Late
events fold into their (old) bucket on whatever refresh carries them:
the merge is commutative, so arrival order cannot change the final
table. Non-algebraic measures (exact median, distinct) would need a
mergeable sketch column instead (HLL / quantile digest) — same shape,
different payload.

The rollup itself is a SnapshotTable: every refresh is one atomic
manifest commit, readers time-travel across refreshes, and the
optimistic-concurrency check aborts racing refreshes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .timetravel import SnapshotTable


class IncrementalRollup:
    """Windowed (bucket × event_type) counts + value sums over events."""

    def __init__(self, spark: SparkSession, root: str, window: str = "6 hours"):
        self.spark = spark
        self.window = window
        self.table = SnapshotTable(spark, root)

    def _partials(self, events: DataFrame) -> DataFrame:
        return (
            events.groupBy(
                F.window("ts", self.window).start.alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total_value"),
            )
        )

    def refresh(self, new_events: DataFrame) -> int:
        """Fold a batch of events into the rollup; returns the number of
        buckets in the refreshed table."""
        partial = self._partials(new_events)
        if self.table.exists():
            merged = (
                self.table.read()
                .unionByName(partial)
                .groupBy("bucket_start", "event_type")
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        else:
            merged = partial
        self.table.write(merged.localCheckpoint())
        return self.table.read().count()

    def read(self, version: int | None = None) -> DataFrame:
        return self.table.read(version)
