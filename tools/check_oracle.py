"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, schema
(column names), and order-insensitive values.

Usage: python tools/check_oracle.py [--bare-session] [sf_dir] [query ...]

--bare-session replicates the driver harness: a plain
``SparkSession.builder.getOrCreate()`` with NONE of the builder confs from
session.get_spark, so any hidden dependency on builder-session configuration
fails here before it fails in the driver.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from hybrid_data_lakehouse_lab_spark.session import get_spark  # noqa: E402
from hybrid_data_lakehouse_lab_spark.plans import ORACLES, QUERIES  # noqa: E402
from hybrid_data_lakehouse_lab_spark.testing.compare import (  # noqa: E402
    duck_con,
    frames_equal,
)


def main() -> int:
    argv = list(sys.argv[1:])
    bare = "--bare-session" in argv
    if bare:
        argv.remove("--bare-session")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = argv[1:] or list(QUERIES)
    if bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"warn  {name}: no oracle (rows-only) rows={len(sdf)}")
            continue
        try:
            ddf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok, why = frames_equal(sdf, ddf)
        dt = time.time() - t0
        if ok:
            print(f"ok    {name}  rows={len(sdf)}  ({dt:.1f}s)")
        else:
            print(f"FAIL  {name}: {why}")
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
