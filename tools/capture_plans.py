"""Capture .explain('formatted') output for headline queries.

Usage: python tools/capture_plans.py <outdir> [query ...]
Defaults to every bench.HEADLINE query when no names are given.
Writes <outdir>/<name>.txt. Pure driver-side planning — no jobs run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from hybrid_data_lakehouse_lab_spark.plans import QUERIES  # noqa: E402
from hybrid_data_lakehouse_lab_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
