"""Z-order (Morton) layout clustering for multi-column scan pruning.

A table sorted by one column prunes row groups on that column only; a
query filtering on a DIFFERENT column reads everything. Interleaving
the bits of several columns into one sort key (the Delta OPTIMIZE
ZORDER BY / Iceberg sort-order technique) gives every participating
column locality: each parquet row group covers a small range of EACH
column, so min/max stats skip most groups for predicates on any of
them.

Pure-projection implementation: each column is normalized to a
`bits`-wide integer against caller-supplied bounds (no data pass to
find min/max — at 100 TB bounds come from table metadata or domain
knowledge; stale bounds only degrade clustering, never correctness),
then bit-interleaved with shift/mask arithmetic — JVM codegen, no UDF.

Write path: `repartitionByRange` on the key splits the z-curve into
contiguous chunks (one shuffle), `sortWithinPartitions` orders inside
each file, so row-group boundaries follow the curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    bounded_cols: list[tuple[Column, float, float]], bits: int = 16
) -> Column:
    """Morton key interleaving `bits` bits of each bounded column.

    bounded_cols: (column, lower, upper) per dimension; values are
    clamped to the bounds, so outliers cluster at the curve's ends
    instead of corrupting the key. Two 16-bit dims fill 32 bits; keep
    len(bounded_cols) * bits <= 62 (bigint).
    """
    n = len(bounded_cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds bigint range")
    for _c, lo, hi in bounded_cols:
        if lo is None or hi is None:
            raise ValueError(
                "zorder bounds must be numbers (an all-NULL column has "
                "no bounds; drop it from the key)"
            )
        if not float(hi) > float(lo):
            raise ValueError(
                f"zorder bounds need hi > lo, got ({lo}, {hi}) — a "
                "constant column adds no clustering; drop it"
            )
    scale = (1 << bits) - 1
    quantized = []
    for col, lo, hi in bounded_cols:
        unit = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
        clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
        quantized.append(F.floor(clamped * scale).cast("bigint"))
    parts = [
        F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + d)
        for d, q in enumerate(quantized)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zorder_key")


def write_zordered(
    df: DataFrame,
    path: str,
    bounded_cols: list[tuple[Column, float, float]],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered along the z-curve of the given
    columns: range-partition by key (contiguous curve chunks per file),
    sort within, drop the key."""
    keyed = df.withColumn("_zkey", zorder_key(bounded_cols, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
