"""As-of join — for each left row, the latest right row at or before
its timestamp (per key). Spark has no native ASOF JOIN (DuckDB, QuestDB
and kdb do; pandas has merge_asof); the scalable composition is
UNION + ORDERED WINDOW, not a join:

    tag left/right rows, union them, and per key take
    last(right-row-struct, ignorenulls) over (ORDER BY ts, side
    ROWS UNBOUNDED PRECEDING .. CURRENT ROW), then keep left rows.

Why not a join? `l.key = r.key AND r.ts <= l.ts` + keep-max-r.ts is an
O(|matches|) intermediate per key — a hot key with n lefts × m rights
materializes n·m rows before the max prunes them. The union-window form
shuffles each row ONCE on the key and holds O(1) running state per
partition — the same cost profile as any window aggregate, immune to
per-key blowup.

The right row travels as ONE struct through the window (not per-column
last): a null FIELD inside a right payload stays null in the match —
per-column last(ignorenulls) would wrongly reach past it to an older
right row.

Tie rule: a right row at exactly left.ts IS visible (right sorts before
left at equal ts) — matching DuckDB/pandas `>=` semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join. Output: all left columns, then `matched_ts`
    (the matched right row's timestamp) and every non-key, non-ts right
    column. Left rows with no prior right row keep nulls.

    `tolerance_seconds`: if set, a match older than `left_ts -
    tolerance` is nulled out (pandas merge_asof tolerance semantics).
    """
    payload_cols = [c for c in right.columns if c not in set(on) | {right_ts}]
    reserved = {"matched_ts", "_ts", "_side", "_match"}
    clash = (set(payload_cols) | reserved) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left/reserved: {sorted(clash)}")

    match_struct = F.struct(
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in payload_cols],
    )
    null_struct = F.lit(None).cast(
        "struct<"
        + ", ".join(
            [f"matched_ts: {right.schema[right_ts].dataType.simpleString()}"]
            + [f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload_cols]
        )
        + ">"
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        null_struct.alias("_match"),
    )
    r_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        match_struct.alias("_match"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        F.last("_match", ignorenulls=True).over(w).alias("_match"),
    ).filter(F.col("_side") == 1)

    if tolerance_seconds is not None:
        # unix_millis, not unix_timestamp: whole-second truncation would
        # mis-classify matches within ~1s of the tolerance boundary.
        stale: Column = (
            F.unix_millis(F.col(left_ts)) - F.unix_millis(F.col("_match.matched_ts"))
            > tolerance_seconds * 1000
        )
        filled = filled.withColumn(
            "_match", F.when(stale, null_struct).otherwise(F.col("_match"))
        )
    return filled.select(
        *left.columns,
        F.col("_match.matched_ts").alias("matched_ts"),
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
