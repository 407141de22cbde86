"""LakehouseJob — the reference's whole architecture as one callable:
CDC drop dir → bronze stream → compaction → checkpointed SCD2 → serving
views. The Airflow DAG's role (dags/cdc_scd2_dag.py:61-83: staging
check → spark-submit) collapses to `run()`; the staging gate is the
empty-input check inside Scd2Pipeline.process_batch (SURVEY S8).

Each `run()` is incremental and idempotent: the bronze stream drains
only new drop files (its checkpoint), the SCD2 batch only events newer
than ITS checkpoint, and a rerun with nothing new is a no-op — so a
scheduler can invoke it on any cadence, exactly like triggering the
reference's DAG.

Scale: every stage is the already-scale-annotated operator (SCALE.md);
this wrapper adds no driver-side loops — its only actions are the
stream drain and one process_batch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.maintenance import compact_partition_dir
from .operators.pipeline import Scd2Pipeline
from .streaming import bronze_stream
from .streaming.lanes import read_envelope_stream


@dataclass
class LakehouseJob:
    spark: SparkSession
    root: str
    attr_cols: list[str]
    key_col: str = "id"
    compact: bool = False  # only compact dt partitions the stream is done with
    pipe: Scd2Pipeline = field(init=False)

    def __post_init__(self) -> None:
        self.drop_dir = os.path.join(self.root, "drop")
        self.bronze_dir = os.path.join(self.root, "bronze")
        self.pipe = Scd2Pipeline(
            self.spark,
            os.path.join(self.root, "silver"),
            key_cols=[self.key_col],
            attr_cols=self.attr_cols,
            ts_col="event_timestamp",
            order_cols=["event_timestamp", "lsn"],
        )

    def run(self) -> int:
        """One incremental cycle; returns SCD2 events processed."""
        q = bronze_stream(
            read_envelope_stream(self.spark, self.drop_dir),
            self.bronze_dir,
            os.path.join(self.root, "bronze_ckpt"),
        )
        q.awaitTermination(300)
        if self.compact:
            compact_partition_dir(self.spark, self.bronze_dir)
        return self.pipe.process_batch(self._bronze_as_changes())

    def _bronze_as_changes(self) -> DataFrame:
        """Bronze rows (before/after images) → keyed change records:
        after image for upserts, before image for deletes — the
        coalesce idiom of the reference's MERGE source (SURVEY F3)."""
        flat = self.spark.read.parquet(self.bronze_dir)
        ins = flat.filter(F.col("op") != "d").select(
            F.col(f"after_{self.key_col}").alias(self.key_col),
            *[F.col(f"after_{c}").alias(c) for c in self.attr_cols],
            "event_timestamp", "lsn", "op", "dt",
        )
        dels = flat.filter(F.col("op") == "d").select(
            F.col(f"before_{self.key_col}").alias(self.key_col),
            *[F.col(f"before_{c}").alias(c) for c in self.attr_cols],
            "event_timestamp", "lsn", "op", "dt",
        )
        return ins.unionByName(dels)

    # -- serving views (README acceptance queries) --------------------------
    def current(self) -> DataFrame:
        return self.pipe.current()

    def history(self) -> DataFrame:
        return self.pipe.scd2()

    def revenue_by_category(self) -> DataFrame:
        return (
            self.current()
            .groupBy("category")
            .agg(
                F.sum(
                    F.col("price").cast("double") * F.col("quantity")
                ).alias("revenue")
            )
        )
