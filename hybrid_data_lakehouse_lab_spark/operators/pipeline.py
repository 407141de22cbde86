"""Scd2Pipeline — the reference's batch job end-to-end (libs/
scd2_spark_processor.py run(), :518-567): checkpoint read → incremental
filter → op routing → SCD2 merge → single-commit write → checkpoint update.

Differences from the reference, by design:
* ONE atomic commit per batch (snapshot manifest swap) instead of three
  Iceberg commits — no closed-but-unreplaced window on crash (§3.2 note).
* Replay safety: a re-run of an already-processed batch is a no-op because
  the checkpoint filter drops every event (the reference re-appends dupes
  if it crashes after MERGE but before its checkpoint write).
* The incremental predicate also applies to the `dt` partition column when
  present, so bronze scans prune whole partitions (the reference filters
  only the non-partition event_timestamp; README.MD:256's pruning claim is
  aspirational there — here it's real).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import merge_scd2_batch
from .timetravel import SnapshotTable


@dataclass
class Scd2Pipeline:
    spark: SparkSession
    root: str
    key_cols: list[str]
    attr_cols: list[str]
    ts_col: str = "event_timestamp"
    op_col: str = "op"
    order_cols: list[str] | None = None
    lsn_col: str | None = "lsn"
    table: SnapshotTable = field(init=False)

    def __post_init__(self) -> None:
        self.table = SnapshotTable(self.spark, os.path.join(self.root, "scd2"))
        self._ckpt_dir = os.path.join(self.root, "checkpoint")

    # -- checkpoint (reference: libs/scd2_spark_processor.py:180-201,491-516)
    def last_checkpoint(self) -> tuple | None:
        if not os.path.isdir(self._ckpt_dir):  # first run: no checkpoint yet
            return None
        row = (
            self.spark.read.parquet(self._ckpt_dir)
            .agg(
                F.max("last_processed_timestamp").alias("ts"),
                F.max("last_processed_lsn").alias("lsn"),
            )
            .collect()[0]
        )
        return None if row["ts"] is None else (row["ts"], row["lsn"])

    def _write_checkpoint(self, batch: DataFrame) -> None:
        agg = [
            F.max(self.ts_col).alias("last_processed_timestamp"),
            F.count(F.lit(1)).alias("records_processed"),
            F.current_timestamp().alias("processed_at"),
        ]
        agg.insert(
            1,
            (F.max(self.lsn_col) if self.lsn_col else F.lit(None).cast("long")).alias(
                "last_processed_lsn"
            ),
        )
        batch.agg(*agg).write.mode("append").parquet(self._ckpt_dir)

    # -- one batch ----------------------------------------------------------
    def process_batch(self, cdc: DataFrame, committed_at_ms: int | None = None) -> int:
        """Apply new CDC events; returns number of events processed."""
        ckpt = self.last_checkpoint()
        if ckpt is not None:
            last_ts = ckpt[0]
            cdc = cdc.filter(F.col(self.ts_col) > F.lit(last_ts))
            if "dt" in cdc.columns:
                cdc = cdc.filter(
                    F.col("dt") >= F.date_format(F.lit(last_ts), "yyyy-MM-dd")
                )
        cdc = cdc.cache()  # consumed by merge + checkpoint aggregate
        try:
            n = cdc.count()
            if n == 0:
                return 0
            existing = self.table.read() if self.table.exists() else None
            existing = self._evolve_schema(existing, cdc)
            merged = merge_scd2_batch(
                existing,
                cdc,
                self.key_cols,
                self.attr_cols,
                self.ts_col,
                self.op_col,
                self.order_cols,
            )
            self.table.write(merged, committed_at_ms=committed_at_ms)
            self._write_checkpoint(cdc)
            return n
        finally:
            cdc.unpersist()

    # -- schema evolution (add-only) -----------------------------------------
    def _evolve_schema(self, existing: DataFrame | None, cdc: DataFrame) -> DataFrame | None:
        """Widen an existing SCD2 table to this pipeline's attr_cols.

        ADD-ONLY evolution (the Delta/Iceberg mergeSchema contract): an
        attr column new to the table is backfilled as typed NULL on all
        historical versions; the next merge then hashes it everywhere,
        so a key whose new column arrives non-null gets a genuine new
        version, while a key whose values (including the still-null new
        column) are unchanged is hash-suppressed — no spurious
        version storm. Dropping or retyping a column is refused: silent
        drops corrupt the hash chain (every key would version-bump).
        """
        if existing is None:
            return None
        for c in self.attr_cols:
            if c not in cdc.columns:
                raise ValueError(f"attr column {c!r} missing from the batch")
            if c not in existing.columns:
                existing = existing.withColumn(
                    c, F.lit(None).cast(cdc.schema[c].dataType)
                )
            elif existing.schema[c].dataType != cdc.schema[c].dataType:
                raise ValueError(
                    f"attr column {c!r} retyped: table has "
                    f"{existing.schema[c].dataType.simpleString()}, batch has "
                    f"{cdc.schema[c].dataType.simpleString()}"
                )
        return existing

    # -- reads ---------------------------------------------------------------
    def scd2(self, version: int | None = None, as_of_ms: int | None = None) -> DataFrame:
        return self.table.read(version, as_of_ms)

    def current(self) -> DataFrame:
        """Current non-deleted rows (the README acceptance filter,
        reference README.MD:300-302,324-325)."""
        return self.scd2().filter(F.col("is_current") & ~F.col("is_deleted"))

    def as_of_business_time(self, ts) -> DataFrame:
        """Rows effective at business time ts (interval predicate)."""
        t = F.lit(ts).cast("timestamp")
        return self.scd2().filter(
            (F.col("effective_start_ts") <= t)
            & (F.col("effective_end_ts").isNull() | (F.col("effective_end_ts") > t))
            & ~(F.col("is_deleted") & F.col("effective_end_ts").isNull())
        )
