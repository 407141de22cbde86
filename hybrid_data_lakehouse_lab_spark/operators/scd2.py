"""SCD2 versioning and current-state (upsert) semantics as window ops.

The reference builds SCD2 in three non-atomic statements — MERGE deletes,
MERGE close-old, append new (libs/scd2_spark_processor.py:438-483) — over
an Iceberg table. Re-expressed Spark-first:

* Building version chains from a CDC batch is ONE pass of window
  functions over (key, event order) — no MERGE needed for the build.
* Applying a batch to an existing SCD2 table is `apply_scd2_batch` in
  merge.py (anti-join + union, the MERGE emulation).

Semantics (documented divergences from the reference):
* A no-op change (same content hash as the previous version) creates no
  new version — we keep the FIRST event of a run of identical hashes, so
  `effective_start_ts` is when the state actually began. (The reference's
  lead-based filter keeps the LAST of a run: libs/scd2_spark_processor.py:
  325-342.)
* A delete closes the open version in place (`effective_end_ts` = delete
  time, `is_current` = false, `is_deleted` = true). The reference instead
  appends a separate tombstone row AND closes the current row
  (libs/scd2_spark_processor.py:371-402,438-450); the in-place close keeps
  intervals contiguous and ≤1 row per (key, interval).
* The content hash covers ALL business attribute columns; the reference
  omits sale_date/created_at (libs/scd2_spark_processor.py:309-313), so
  date-only changes produce no version there. (SURVEY.md §4 decision.)

Scale: every step is partition-local after ONE shuffle on the business
key (Window.partitionBy). Skewed keys are rare for business-key CDC; if
present, AQE skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import DELETED_HASH, record_hash


def _key_window(key_cols: list[str], order_cols: list[str]) -> Window:
    return Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])


def scd2_from_changes(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Ordered CDC changes → SCD2 version table.

    changes must contain key_cols + attr_cols + ts_col + op_col with op in
    {c,r,u,d}. order_cols defaults to [ts_col]; pass a unique tiebreaker
    (e.g. lsn / event_id) for deterministic chains when timestamps collide.

    Returns key_cols + attr_cols + record_hash, effective_start_ts,
    effective_end_ts, is_current, is_deleted.
    """
    order_cols = order_cols or [ts_col]
    hashed = changes.withColumn(
        "record_hash",
        F.when(F.col(op_col) == "d", F.lit(DELETED_HASH)).otherwise(
            record_hash(*attr_cols)
        ),
    )
    return _scd2_chain(hashed, key_cols, attr_cols, ts_col, op_col, order_cols)


def _scd2_chain(
    hashed: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    op_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Chain builder over a relation that already carries record_hash —
    shared by the single-window and chunked builds so the hash is
    computed exactly once per input row in either path."""
    w = _key_window(key_cols, order_cols)
    # Consecutive-duplicate suppression: a run of events with identical
    # content collapses to its first event. Delete rows hash to a sentinel,
    # so an insert→delete→identical-insert sequence still yields two
    # versions (the run is broken by the delete).
    deduped = hashed.withColumn("_prev_hash", F.lag("record_hash").over(w)).filter(
        ~F.col("record_hash").eqNullSafe(F.col("_prev_hash"))
    )

    w2 = _key_window(key_cols, order_cols)
    chained = (
        deduped.withColumn("_next_ts", F.lead(F.col(ts_col)).over(w2))
        .withColumn("_next_op", F.lead(F.col(op_col)).over(w2))
    )
    return (
        chained.filter(F.col(op_col) != "d")
        .select(
            *key_cols,
            *attr_cols,
            "record_hash",
            F.col(ts_col).alias("effective_start_ts"),
            F.col("_next_ts").alias("effective_end_ts"),
            F.col("_next_ts").isNull().alias("is_current"),
            (F.col("_next_op") == "d").alias("is_deleted"),
        )
        .fillna({"is_deleted": False})
    )


def scd2_from_changes_chunked(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
    chunk_col: Column | None = None,
) -> DataFrame:
    """Two-level SCD2 chain for HOT keys — the skew-bounded twin of
    ``scd2_from_changes`` (SCALE.md §Windows: an entity updated 10⁸
    times makes the single business-key window one 10⁸-row task).

    Stage 1 partitions the window by (key, chunk) and drops every event
    whose content hash equals its immediate predecessor's WITHIN the
    chunk. This is a pure semantic reducer — the full chain would drop
    those events anyway (a run of identical hashes keeps only its head)
    — PROVIDED chunk is a monotone function of the ORDER (order_cols):
    then an event's within-chunk predecessor IS its global predecessor
    for all but each chunk's first event, which stage 1 always keeps,
    deferring the cross-boundary comparison. The default chunk,
    to_date(ts_col), is monotone only when order_cols leads with
    ts_col, so that combination is enforced; callers ordering by
    something else (e.g. lsn-first) must pass a chunk_col that is
    monotone in THEIR order, or stage 1 could drop an event whose true
    predecessor (in a different chunk) has a different hash.

    Stage 2 runs the standard single-window chain over the survivors —
    per key that is O(distinct versions + chunks) rows, not O(events) —
    reusing the stage-1 hashes (each row is hashed exactly once). The
    hot key's 10⁸ heartbeat updates collapse to its version count
    before stage 2; task input is bounded by max(chunk size,
    versions-per-key) instead of events-per-key. Result is IDENTICAL to
    ``scd2_from_changes`` under the monotonicity precondition
    (tests/test_skew_validation.py).
    """
    order_cols = order_cols or [ts_col]
    if chunk_col is None and order_cols[0] != ts_col:
        raise ValueError(
            f"default chunk to_date({ts_col!r}) is not monotone under "
            f"order_cols={order_cols!r} (must lead with {ts_col!r}); pass a "
            f"chunk_col that is a monotone function of the event order"
        )
    chunk = chunk_col if chunk_col is not None else F.to_date(F.col(ts_col))
    hashed = changes.withColumn(
        "record_hash",
        F.when(F.col(op_col) == "d", F.lit(DELETED_HASH)).otherwise(
            record_hash(*attr_cols)
        ),
    ).withColumn("_chunk", chunk)
    w1 = Window.partitionBy(*key_cols, "_chunk").orderBy(
        *[F.col(c) for c in order_cols]
    )
    survivors = (
        hashed.withColumn("_prev_hash", F.lag("record_hash").over(w1))
        .filter(~F.col("record_hash").eqNullSafe(F.col("_prev_hash")))
        .drop("_prev_hash", "_chunk")
    )
    return _scd2_chain(survivors, key_cols, attr_cols, ts_col, op_col, order_cols)


#: Hot-key row count above which `scd2_from_changes_auto` switches to
#: the chunked two-level chain. Measured crossover (round 11, sf0.1
#: skew generator, local[32], min-of-2): at 300k hot rows the two
#: builds are statistically indistinguishable (ordering flips run to
#: run inside the noise band); from 1.2M hot rows up chunked wins
#: monotonically — 4.5 s vs 5.1 s at 1.2M, 10.0 vs 11.4 at 3M, 16.2 vs
#: 22.1 at 6M (1.36x). 500k sits inside the indifference band: below
#: it the single window's lone hot task still beats paying a second
#: window over every key, above it chunking is straggler insurance
#: that only gets more valuable with size.
SCD2_CHUNK_THRESHOLD = 500_000


def scd2_from_changes_auto(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
    threshold: int = SCD2_CHUNK_THRESHOLD,
    chunk_col: Column | None = None,
) -> DataFrame:
    """Measured auto-selection between the single-window and chunked
    SCD2 builds (VERDICT r10 item 8): one map-side-combined groupBy
    probes the max per-key multiplicity; at or above `threshold` rows
    on one key the chunked two-level chain runs (its stage-1 per-chunk
    dedup bounds the hot task), otherwise the plain single window (one
    shuffle, no second window pass). The probe costs one partial-agg
    scan of the batch — at 100 TB that is noise next to either build's
    window shuffle, and it is the ONLY way to see skew the planner
    can't know statically. Callers that already know their key
    distribution should call the specific build directly.

    The chunked branch needs a chunk that is monotone in the event
    order: the default to_date(ts_col) qualifies only when order_cols
    leads with ts_col; for any other order pass `chunk_col` (see
    scd2_from_changes_chunked). Without either, the probe is skipped
    entirely (chunking is unreachable — no point paying the scan) and
    the single-window build runs."""
    order_cols = order_cols or [ts_col]
    can_chunk = chunk_col is not None or order_cols[0] == ts_col
    if not can_chunk:
        return scd2_from_changes(
            changes, key_cols, attr_cols, ts_col, op_col, order_cols
        )
    hot = (
        changes.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("_m"))
        .collect()[0][0]
    )
    if hot is not None and hot >= threshold:
        return scd2_from_changes_chunked(
            changes,
            key_cols,
            attr_cols,
            ts_col,
            op_col,
            order_cols,
            chunk_col=chunk_col,
        )
    return scd2_from_changes(
        changes, key_cols, attr_cols, ts_col, op_col, order_cols
    )


def current_state(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
    deleted_col: str = "is_deleted",
) -> DataFrame:
    """Latest-wins keyed upsert — the Pinot current-state analog.

    Pinot resolves concurrent versions per PRIMARY KEY by max
    comparisonColumn (reference: scripts/pinot_auto/pinot_tables.yaml:32-36);
    deletes are soft flags (scripts/cdc_to_pinot_current.py:216). Batch
    equivalent: row_number()=1 by descending event order per key.
    """
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn(deleted_col, F.col(op_col) == "d")
    )


def close_out_deletes(
    scd2: DataFrame,
    delete_keys: DataFrame,
    key_cols: list[str],
    delete_ts_col: Column,
) -> DataFrame:
    """MERGE #1 analog (reference: libs/scd2_spark_processor.py:438-450):
    close current rows for deleted keys in place. Pure-DataFrame rewrite:
    left join on keys + conditional rewrite of the matched rows.
    """
    marked = scd2.join(
        F.broadcast(delete_keys.select(*key_cols, delete_ts_col.alias("_del_ts"))),
        on=key_cols,
        how="left",
    )
    hit = F.col("_del_ts").isNotNull() & F.col("is_current")
    return (
        marked.withColumn(
            "effective_end_ts",
            F.when(hit, F.col("_del_ts")).otherwise(F.col("effective_end_ts")),
        )
        .withColumn("is_deleted", F.when(hit, F.lit(True)).otherwise(F.col("is_deleted")))
        .withColumn("is_current", F.when(hit, F.lit(False)).otherwise(F.col("is_current")))
        .drop("_del_ts")
    )
