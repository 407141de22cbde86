"""Per-phase profile of the mor_compaction_roundtrip lane at 10×
(round-9 item 5): build (3 SnapshotTable writes) vs compaction vs each
format export vs the masked/folded reads. Run:

    python tools/profile_compaction.py [replication]

Writes one JSON line; the breakdown goes into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def main():
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )
    from hybrid_data_lakehouse_lab_spark.operators.maintenance import (
        compact_snapshot,
    )
    from hybrid_data_lakehouse_lab_spark.operators.timetravel import SnapshotTable
    from hybrid_data_lakehouse_lab_spark.session import get_spark
    from hybrid_data_lakehouse_lab_spark.sources import load_table
    from make_scaled_slice import build

    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    phases: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = round(time.perf_counter() - t0, 3)
        return out

    root = tempfile.mkdtemp(prefix="compaction_profile_")
    slice_dir = os.path.join(root, "slice")
    try:
        timed("slice_build", lambda: build(sf_dir, slice_dir, rep))
        ev = load_table(spark, slice_dir, "events")
        tmp = os.path.join(root, "t")
        t = SnapshotTable(spark, tmp)
        timed("write_v1_full", lambda: t.write(ev, committed_at_ms=1))
        timed(
            "write_v2_delete",
            lambda: t.write(
                ev.filter(F.col("user_id") % 6 != 0), committed_at_ms=2
            ),
        )
        masked = ev.filter(
            (F.col("user_id") % 6 != 0) & (F.col("user_id") % 10 != 0)
        )
        timed("write_v3_delete", lambda: t.write(masked, committed_at_ms=3))
        timed("compact_snapshot", lambda: compact_snapshot(t, committed_at_ms=4))
        timed(
            "export_iceberg_v2",
            lambda: export_iceberg_metadata(t, format_version=2),
        )
        timed(
            "export_delta_dv",
            lambda: export_delta_log(t, mor_deletes=True),
        )
        for fmt, reader in (
            ("iceberg", lambda s: read_iceberg_table(spark, t.root, snapshot_id=s)),
            ("delta", lambda s: read_delta_table(spark, t.root, version=s - 1)),
        ):
            for sid in (3, 4):
                timed(
                    f"read_{fmt}_s{sid}",
                    lambda s=sid, r=reader: r(s)
                    .groupBy("event_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect(),
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    lane = round(sum(v for k, v in phases.items() if k != "slice_build"), 3)
    print(json.dumps({"rep": rep, "lane_total_sec": lane, "phases": phases}))


if __name__ == "__main__":
    main()
