"""CDC / SCD2 query lane — the reference's novel semantics, oracle-checked.

The driver testdata has no Debezium stream, so these queries treat the
`events` table as a deterministic changelog: `user_id` is the business
key, `ts` (+ `event_id` tiebreak) the event order, and event_type maps to
a Debezium op (signup→c, error→d, else u) — mirroring the op whitelist at
reference scripts/cdc_to_parquet.py:204. The full engine (envelope parse,
MERGE apply, checkpointing, streaming) is exercised on source_sales-shaped
fixtures in tests/; here every pipeline is also expressed as ANSI SQL so
the DuckDB oracle verifies the window semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scd2 import current_state, scd2_from_changes
from ..sources import load_table
from .registry import register

# Shared changelog derivation (Spark) + its SQL twin.
_CHANGES_SQL = """
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'error' THEN 'd'
                  WHEN event_type = 'signup' THEN 'c'
                  ELSE 'u' END AS op
      FROM events
"""


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "d")
        .when(F.col("event_type") == "signup", "c")
        .otherwise("u")
    )
    return ev.select("user_id", "event_id", "ts", "event_type", op.alias("op"))


# ---------------------------------------------------------------------------
# The SCD2 build — §2.3 J1/J2 + §2.5 W1-W3 + §2.6 D1 in one pipeline
# (reference: libs/scd2_spark_processor.py:278-369). One shuffle on the
# business key; everything after is partition-local window work.
# ---------------------------------------------------------------------------
# Shared SCD2 CTE chain (DuckDB side): relation `scd2(user_id,
# event_type, record_hash, effective_start_ts, effective_end_ts,
# is_current, is_deleted)` — one definition for the build lane and the
# invariants audit so they cannot drift.
_SCD2_SQL = f"""
    changes AS ({_CHANGES_SQL}),
    hashed AS (
      SELECT *, CASE WHEN op = 'd' THEN 'DELETED'
                     ELSE md5(coalesce(event_type, '')) END AS record_hash
      FROM changes
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, lag(record_hash) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_hash
        FROM hashed
      ) WHERE record_hash IS DISTINCT FROM prev_hash
    ),
    chained AS (
      SELECT *,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
             lead(op) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_op
      FROM deduped
    ),
    scd2 AS (
      SELECT user_id, event_type, record_hash,
             ts AS effective_start_ts,
             next_ts AS effective_end_ts,
             (next_ts IS NULL) AS is_current,
             coalesce(next_op = 'd', false) AS is_deleted
      FROM chained WHERE op <> 'd'
    )
"""


@register(
    "scd2_build",
    oracle=f"""
    WITH {_SCD2_SQL}
    SELECT * FROM scd2
    """,
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_from_changes(
        _changes(spark, sf_dir),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
    )


# ---------------------------------------------------------------------------
# Current-state upsert view — the Pinot REALTIME upsert analog (§2.3 J3):
# latest row per key by comparison column, soft-delete flag
# (reference: scripts/pinot_auto/pinot_tables.yaml:32-36;
# scripts/cdc_to_pinot_current.py:216).
# ---------------------------------------------------------------------------
@register(
    "current_state_upsert",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL})
    SELECT user_id, event_id, ts AS last_updated_ts, event_type,
           (op = 'd') AS is_deleted
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes
    ) WHERE rn = 1
    """,
)
def current_state_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = current_state(
        _changes(spark, sf_dir),
        key_cols=["user_id"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
    )
    return cur.select(
        "user_id",
        "event_id",
        F.col("ts").alias("last_updated_ts"),
        "event_type",
        "is_deleted",
    )


# ---------------------------------------------------------------------------
# History audit lane — append-only, both-images projection with op decode
# (reference: scripts/cdc_to_pinot_history.py:156-185,258-264).
# ---------------------------------------------------------------------------
@register(
    "history_audit",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL})
    SELECT event_id, user_id, op,
           CASE op WHEN 'c' THEN 'CREATE' WHEN 'r' THEN 'READ'
                   WHEN 'u' THEN 'UPDATE' WHEN 'd' THEN 'DELETE'
                   ELSE 'UNKNOWN' END AS operation,
           ts, epoch_ms(ts) AS ts_ms,
           strftime(ts, '%Y-%m-%d') AS dt
    FROM changes
    """,
)
def history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _changes(spark, sf_dir)
    operation = (
        F.when(F.col("op") == "c", "CREATE")
        .when(F.col("op") == "r", "READ")
        .when(F.col("op") == "u", "UPDATE")
        .when(F.col("op") == "d", "DELETE")
        .otherwise("UNKNOWN")
    )
    return ch.select(
        "event_id",
        "user_id",
        "op",
        operation.alias("operation"),
        "ts",
        F.unix_millis("ts").alias("ts_ms"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
    )


# ---------------------------------------------------------------------------
# Retention window view — Pinot's segment retention as a predicate
# (reference: scripts/pinot_auto/pinot_tables.yaml:38-40,121-123).
# Anchored to max(ts) so the query is deterministic on static testdata.
# ---------------------------------------------------------------------------
@register(
    "retention_window",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
)
def retention_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("_cutoff")
    )
    return (
        ev.join(F.broadcast(horizon))
        .filter(F.col("ts") >= F.col("_cutoff"))
        .select("event_id", "user_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# Time travel — point-in-time SCD2 read (reference README.MD:308-313:
# `FOR TIMESTAMP AS OF`). Against a versioned table this is a snapshot
# read (operators/timetravel.py); against the SCD2 chain it's an interval
# predicate — the two are equivalent, which tests/test_scd2.py asserts.
# ---------------------------------------------------------------------------
@register(
    "scd2_point_in_time",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL}),
    hashed AS (
      SELECT *, CASE WHEN op = 'd' THEN 'DELETED'
                     ELSE md5(coalesce(event_type, '')) END AS record_hash
      FROM changes
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, lag(record_hash) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_hash
        FROM hashed
      ) WHERE record_hash IS DISTINCT FROM prev_hash
    ),
    chained AS (
      SELECT *,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM deduped
    )
    SELECT user_id, event_type, ts AS effective_start_ts
    FROM chained
    WHERE op <> 'd'
      AND ts <= TIMESTAMP '2024-01-15 00:00:00'
      AND (next_ts IS NULL OR next_ts > TIMESTAMP '2024-01-15 00:00:00')
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    as_of = F.lit("2024-01-15 00:00:00").cast("timestamp")
    scd2 = scd2_from_changes(
        _changes(spark, sf_dir),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        order_cols=["ts", "event_id"],
    )
    return scd2.filter(
        (F.col("effective_start_ts") <= as_of)
        & (F.col("effective_end_ts").isNull() | (F.col("effective_end_ts") > as_of))
    ).select("user_id", "event_type", "effective_start_ts")


# ---------------------------------------------------------------------------
# CDC envelope round-trip — P1/F1 on a real Debezium-shaped envelope: build
# the nested JSON in-flight, parse it back with the engine's from_json
# flattener, and project typed fields. The oracle is the identity on the
# underlying columns, so any parser/flattener defect hash-mismatches.
# ---------------------------------------------------------------------------
@register(
    "envelope_flatten_roundtrip",
    oracle="""
    SELECT CAST(user_id AS INT) AS after_id,
           event_type AS after_product_name,
           'u' AS op,
           epoch_ms(ts) AS ts_ms,
           strftime(ts, '%Y-%m-%d') AS dt
    FROM events
    """,
)
def envelope_flatten_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import flatten_envelope

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.struct(
                        F.col("user_id").cast("int").alias("id"),
                        F.col("event_type").alias("product_name"),
                    ).alias("after"),
                    F.lit("u").alias("op"),
                    F.unix_millis("ts").alias("ts_ms"),
                ).alias("payload")
            )
        ).alias("raw_message")
    )
    return flatten_envelope(raw).select("after_id", "after_product_name", "op", "ts_ms", "dt")


# ---------------------------------------------------------------------------
# Point-in-time dimension enrichment — each fact row joined to the SCD2
# version valid at its event time: the query SCD2 tables exist to answer
# (reference README's "as-of" reads, generalized from one timestamp to
# every fact row's own timestamp).
# ---------------------------------------------------------------------------
@register(
    "scd2_temporal_enrich",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL}),
    hashed AS (
      SELECT *, CASE WHEN op = 'd' THEN 'DELETED'
                     ELSE md5(coalesce(event_type, '')) END AS record_hash
      FROM changes
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, lag(record_hash) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_hash
        FROM hashed
      ) WHERE record_hash IS DISTINCT FROM prev_hash
    ),
    chained AS (
      SELECT *,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
             lead(op) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_op
      FROM deduped
    ),
    dim AS (
      SELECT user_id, event_type, ts AS effective_start_ts, next_ts AS effective_end_ts
      FROM chained WHERE op <> 'd'
    )
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           d.event_type AS dim_state,
           d.effective_start_ts AS dim_since
    FROM changes e
    LEFT JOIN dim d ON e.user_id = d.user_id
      AND e.ts >= d.effective_start_ts
      AND (d.effective_end_ts IS NULL OR e.ts < d.effective_end_ts)
    """,
)
def scd2_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event annotated with the SCD2 version in force at its own
    timestamp. Events landing in a deleted gap (after a close-out, before
    the next create) legitimately enrich to NULL — the LEFT join keeps
    them visible instead of silently dropping them.

    100 TB: the join has a real equi key (user_id), so Catalyst plans an
    ordinary hash/sort-merge join partitioned on the business key and the
    validity-interval predicate evaluates inside the matched partition —
    no binning needed (unlike the keyless range join), because versions
    of one key are few and contiguous. Both sides derive from the same
    scan; Spark computes the subtree per side, which at scale argues for
    materializing the SCD2 dim once (SnapshotTable) — exactly what the
    pipeline lane does.
    """
    dim = scd2_build(spark, sf_dir).select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("dim_state"),
        F.col("effective_start_ts").alias("dim_since"),
        "effective_end_ts",
    )
    ev = _changes(spark, sf_dir)
    cond = (
        (ev["user_id"] == dim["d_user_id"])
        & (ev["ts"] >= dim["dim_since"])
        & (dim["effective_end_ts"].isNull() | (ev["ts"] < dim["effective_end_ts"]))
    )
    return ev.join(dim, cond, "left").select(
        "event_id", "user_id", "ts", "event_type", "dim_state", "dim_since"
    )


# keep Window import referenced for future queries
_ = Window


@register(
    "scd2_invariants_audit",
    oracle=f"""
    WITH {_SCD2_SQL},
    seq AS (
      SELECT user_id, effective_start_ts, effective_end_ts, is_current,
             is_deleted,
             lead(effective_start_ts) OVER (
               PARTITION BY user_id
               ORDER BY effective_start_ts, record_hash) AS next_start
      FROM scd2
    ),
    v AS (
      SELECT
        CAST(count(*) FILTER (
          effective_end_ts IS NOT NULL
          AND effective_end_ts <= effective_start_ts
        ) AS BIGINT) AS empty_or_negative_interval,
        CAST(count(*) FILTER (
          next_start IS NOT NULL
          AND NOT is_deleted
          AND effective_end_ts IS DISTINCT FROM next_start
        ) AS BIGINT) AS gap_or_overlap,
        CAST(count(*) FILTER (
          is_current AND effective_end_ts IS NOT NULL
        ) AS BIGINT) AS current_with_end,
        (SELECT CAST(count(*) AS BIGINT) FROM (
           SELECT user_id FROM scd2 WHERE is_current
           GROUP BY user_id HAVING count(*) > 1
        )) AS keys_with_multiple_current
      FROM seq
    )
    SELECT 'current_has_open_end' AS invariant, current_with_end AS violations,
           current_with_end = 0 AS passed FROM v
    UNION ALL
    SELECT 'intervals_contiguous', gap_or_overlap, gap_or_overlap = 0 FROM v
    UNION ALL
    SELECT 'intervals_positive', empty_or_negative_interval,
           empty_or_negative_interval = 0 FROM v
    UNION ALL
    SELECT 'one_current_per_key', keys_with_multiple_current,
           keys_with_multiple_current = 0 FROM v
    ORDER BY invariant
    """,
)
def scd2_invariants_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-correctness audit of the SCD2 output itself: versions
    per key must tile time (each version's end equals the next
    version's start — no gaps, no overlaps), EXCEPT across a delete: a
    version closed by a delete legitimately precedes a gap until the
    key's re-insert, so delete-closed rows are exempt from the
    contiguity check. Closed intervals must be positive, current rows
    must be open-ended, and no key may have two current rows. Run after every merge — an SCD2 table that violates
    these silently corrupts every point-in-time join downstream.

    100 TB plan shape: one per-key window over the (already
    version-grained) SCD2 relation plus a per-key current-count
    aggregate — both shuffle on the business key the table is naturally
    clustered by; the verdict table is built from 1-row totals.
    """
    dim = scd2_build(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("effective_start_ts", "record_hash")
    seq = dim.select(
        "user_id",
        "effective_start_ts",
        "effective_end_ts",
        "is_current",
        "is_deleted",
        F.lead("effective_start_ts").over(w).alias("next_start"),
    )
    v = seq.agg(
        F.sum(
            F.when(
                F.col("effective_end_ts").isNotNull()
                & (F.col("effective_end_ts") <= F.col("effective_start_ts")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("empty_or_negative_interval"),
        F.sum(
            F.when(
                F.col("next_start").isNotNull()
                & ~F.col("is_deleted")
                & ~F.col("effective_end_ts").eqNullSafe(F.col("next_start")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("gap_or_overlap"),
        F.sum(
            F.when(F.col("is_current") & F.col("effective_end_ts").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("current_with_end"),
    )
    multi_current = (
        dim.filter("is_current")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("keys_with_multiple_current"))
    )
    v = v.join(F.broadcast(multi_current))
    checks = [
        ("current_has_open_end", "current_with_end"),
        ("intervals_contiguous", "gap_or_overlap"),
        ("intervals_positive", "empty_or_negative_interval"),
        ("one_current_per_key", "keys_with_multiple_current"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("invariant"),
                F.col(col).alias("violations"),
                (F.col(col) == 0).alias("passed"),
            )
            for name, col in checks
        ]
    )
    return (
        v.select(F.explode(rows).alias("c"))
        .select("c.invariant", "c.violations", "c.passed")
        .orderBy("invariant")
    )
