"""A/B harness for runtime SQL confs over a query subset.

Usage: python tools/experiment_confs.py <n_runs> <query,query,...> \
           "<label>=<conf>=<value>[,<conf>=<value>...]" ...

Runs each query list under each conf variant in ONE session (confs are
runtime-settable; reset between variants), min-of-<n_runs> per query
with the noop sink — the bench's estimator on a chosen subset, for
deciding plan-strategy knobs empirically (guide §1: measure first).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hybrid_data_lakehouse_lab_spark.plans import QUERIES  # noqa: E402
from hybrid_data_lakehouse_lab_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_runs = int(sys.argv[1])
    names = sys.argv[2].split(",")
    variants = []
    for spec in sys.argv[3:]:
        label, _, confs = spec.partition("=")
        pairs = []
        for kv in confs.split(","):
            k, _, v = kv.partition("=")
            pairs.append((k, v))
        variants.append((label, pairs))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "experiment", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    defaults = {}
    for _, pairs in variants:
        for k, _ in pairs:
            try:
                defaults[k] = spark.conf.get(k, None)
            except Exception:  # keys with no default can raise (ADVICE r11)
                defaults[k] = None
    # untimed warmup of every query (codegen/JIT) under default confs
    for n in names:
        materialize(QUERIES[n](spark, sf_dir))
    # Interleaved sweeps (A,B,...,A,B,...) so monotone drift — JIT
    # still warming, host throttle windows — cancels across variants
    # instead of biasing whichever variant runs later.
    results: dict[str, dict[str, float]] = {label: {} for label, _ in variants}
    for _ in range(n_runs):
        for label, pairs in variants:
            try:
                for k, v in pairs:
                    spark.conf.set(k, v)
                spark.sparkContext.setJobDescription(f"variant {label}")
                per = results[label]
                for n in names:
                    t0 = time.perf_counter()
                    materialize(QUERIES[n](spark, sf_dir))
                    dt = time.perf_counter() - t0
                    per[n] = min(per.get(n, dt), dt)
            finally:
                # reset even when a variant dies mid-run (ADVICE r11):
                # a later manual use of the session must see defaults
                for k in dict(pairs):
                    if defaults[k] is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, defaults[k])
    header = ["query"] + [label for label, _ in variants]
    print("\t".join(header))
    for n in names:
        print("\t".join([n] + [f"{results[label][n]:.3f}" for label, _ in variants]))
    for label, _ in variants:
        print(f"TOTAL {label}: {sum(results[label].values()):.3f}")


if __name__ == "__main__":
    main()
