"""Driver-visible time-travel round-trip: the SnapshotTable machinery
(the repo's Iceberg/Nessie analog — versioned snapshots, manifest swap
commits) exercised inside a registered query so the external correctness
gate checks WHAT a versioned read returns, not just that pytest says so.

The lane writes two snapshot versions of the events table to a scratch
dir (v1 = rows before a fixed cut, v2 = all rows), reads each version
back through the snapshot manifest, and returns per-version type counts.
The oracle states the same split declaratively — so a hash match proves
version-1 reads resolve to exactly the pre-cut rows even after version 2
was committed (reference behavior: Iceberg `VERSION AS OF`).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timetravel import SnapshotTable
from ..sources import load_table
from .registry import register

_CUT = "2024-01-15 00:00:00"


@register(
    "timetravel_versions_demo",
    oracle=f"""
    SELECT 1 AS version, event_type, count(*) AS n
    FROM events WHERE ts < TIMESTAMP '{_CUT}' GROUP BY 2
    UNION ALL
    SELECT 2 AS version, event_type, count(*) AS n
    FROM events GROUP BY 2
    """,
)
def timetravel_versions_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two snapshot commits, then a versioned read of each.

    The tiny final collect exists only so the scratch dir can be removed
    before returning (a lazy plan over deleted files would fail); the
    operators under test — snapshot write, manifest swap, version
    resolution, parquet read-back — all run distributed. Output is
    |event types| × 2 rows regardless of scale.
    """
    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="tt_demo_")
    try:
        t = SnapshotTable(spark, os.path.join(tmp, "t"))
        t.write(ev.filter(F.col("ts") < F.lit(_CUT).cast("timestamp")),
                committed_at_ms=1)
        t.write(ev, committed_at_ms=2)
        rows = []
        for v in (1, 2):
            got = (
                t.read(version=v)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            rows.extend((v, r["event_type"], r["n"]) for r in got)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "version INT, event_type STRING, n BIGINT"
    )
