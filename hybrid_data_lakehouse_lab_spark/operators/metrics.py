"""Single-pass pipeline metrics via Observation — the fix for the
reference's repeated-materialization anti-pattern.

The reference's SCD2 job calls `count()`/`show()` at 9+ sites
(reference: libs/scd2_spark_processor.py:215-268,539-546 — the author
notes the cost inline at :534-538); each action replays the whole plan.
`observe` attaches aggregate metrics to a DataFrame that are collected
as a side effect of the ONE action that materializes it — zero extra
passes at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_batch_metrics(
    df: DataFrame, ts_col: str | None = None, null_check_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach standard CDC-batch metrics, collected free with the write.

    Returns (df, observation); read `observation.get` AFTER an action on
    the returned df. Metrics: row count, per-op counts when an `op`
    column exists, max event time, null counts for the given columns —
    everything the reference burned extra passes on.
    """
    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if "op" in df.columns:
        for op in ("c", "r", "u", "d"):
            metrics.append(
                F.sum(F.when(F.col("op") == op, 1).otherwise(0)).alias(f"n_op_{op}")
            )
    if ts_col:
        metrics.append(F.max(ts_col).alias("max_ts"))
    for c in null_check_cols or []:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
