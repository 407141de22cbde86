"""Interval / temporal-join analytics: range joins between events and
time windows, and the two-table as-of join.

The range query uses operators/rangejoin.py's binned interval join so
the plan is a hash join on the bin id — a raw ts-BETWEEN join would
plan as BroadcastNestedLoopJoin (blocked by tests/test_plan_quality.py).
The as-of query uses operators/asof.py's union-window composition; its
oracle is DuckDB's NATIVE ASOF JOIN, so the semantics are checked
against an independent implementation, not a SQL restatement of ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.rangejoin import binned_interval_join
from ..sources import load_table
from .advanced import SESSIONS_SQL
from .registry import register

# Maintenance windows over the events table's Jan-2024 range; W3/W4
# overlap, so events in the overlap legitimately count toward both.
WINDOWS = [
    ("W1", "2024-01-03 00:00:00", "2024-01-05 00:00:00"),
    ("W2", "2024-01-10 12:00:00", "2024-01-11 06:00:00"),
    ("W3", "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    ("W4", "2024-01-20 00:00:00", "2024-01-23 00:00:00"),
    ("W5", "2024-01-29 18:00:00", "2024-01-31 00:00:00"),
]

_W_VALUES = ",\n      ".join(
    f"('{wid}', TIMESTAMP '{ws}', TIMESTAMP '{we}')" for wid, ws, we in WINDOWS
)


@register(
    "range_join_event_windows",
    oracle=f"""
    WITH w(window_id, ws, we) AS (VALUES
      {_W_VALUES})
    SELECT w.window_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN w ON e.ts >= w.ws AND e.ts < w.we
    GROUP BY w.window_id
    ORDER BY window_id
    """,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window event rollup via the binned range join (1-day bins ≈
    the median window duration). The oracle states the plain range
    predicate — DuckDB's IEJoin handles it natively; Spark needs the
    binning to avoid a nested-loop plan."""
    events = load_table(spark, sf_dir, "events")
    w = spark.createDataFrame(WINDOWS, "window_id STRING, ws STRING, we STRING").select(
        "window_id",
        F.col("ws").cast("timestamp").alias("ws"),
        F.col("we").cast("timestamp").alias("we"),
    )
    joined = binned_interval_join(events, w, "ts", "ws", "we", bin_seconds=86400)
    # Stacked aggregation (see q21): countDistinct mixed with plain
    # aggregates makes Catalyst EXPAND every row per distinct class
    # before the shuffle; per-(window,user) partials first keep the
    # fact at natural width through its one exchange.
    per_user = joined.groupBy("window_id", "user_id").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_v")
    )
    return (
        per_user.groupBy("window_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("_v"), 2).alias("total_value"),
        )
        .orderBy("window_id")
    )


@register(
    "asof_join_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           p.ts AS matched_ts,
           round(p.value, 4) AS last_purchase_value
    FROM events e
    ASOF LEFT JOIN (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event annotated with the user's most recent purchase at or
    before it — the trades×quotes shape on this schema. The oracle is
    DuckDB's native ASOF JOIN (independent implementation, not a SQL
    copy of the union-window trick)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "matched_ts",
        F.round("last_purchase_value", 4).alias("last_purchase_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Max concurrency — the sweep-line interval aggregate ("how many user
# sessions were active at the busiest instant of each day"), made
# distributable by clipping sessions to day boundaries so each day's
# sweep is an independent partition.
# ---------------------------------------------------------------------------
@register(
    "events_daily_max_concurrency",
    oracle=f"""
    WITH {SESSIONS_SQL},
    sessions AS (
      SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
      FROM sess GROUP BY user_id, session_id
    ),
    segs AS (
      SELECT t.d::DATE AS day,
             greatest(s, t.d::TIMESTAMP) AS ss,
             least(e, (t.d + INTERVAL 1 DAY)::TIMESTAMP) AS se
      FROM sessions, UNNEST(generate_series(s::DATE, e::DATE, INTERVAL 1 DAY)) AS t(d)
    ),
    bounds AS (
      SELECT day, ss AS ts, 1 AS delta FROM segs
      UNION ALL
      SELECT day, se, -1 FROM segs
    ),
    swept AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM bounds
    )
    SELECT day, CAST(max(conc) AS INT) AS max_concurrency
    FROM swept GROUP BY day ORDER BY day
    """,
)
def events_daily_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions per day, exactly: sessionize (30-min
    gap), clip each session into per-day segments, then sweep each day's
    +1/-1 boundary events with a running sum and take the max. At equal
    timestamps starts sort before ends (delta DESC), so sessions that
    touch at an instant count as concurrent — identically in both
    engines.

    100 TB plan shape: the day-clipping is what makes the classic
    sweep-line DISTRIBUTABLE — each day's sweep is an independent window
    partition over only that day's boundary events (2 rows per
    session-day), never a global ordered scan; the per-day max is a
    tiny aggregate. Capacity planning runs exactly this query.
    """
    from pyspark.sql import Window as W

    from .advanced import sessionized

    sess = (
        sessionized(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    segs = sess.select(
        F.explode(F.sequence(F.to_date("s"), F.to_date("e"))).alias("day"), "s", "e"
    ).select(
        "day",
        F.greatest("s", F.col("day").cast("timestamp")).alias("ss"),
        F.least("e", F.date_add("day", 1).cast("timestamp")).alias("se"),
    )
    bounds = segs.select("day", F.col("ss").alias("ts"), F.lit(1).alias("delta")).unionAll(
        segs.select("day", F.col("se").alias("ts"), F.lit(-1).alias("delta"))
    )
    sweep = W.partitionBy("day").orderBy(F.col("ts"), F.desc("delta")).rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        bounds.select("day", F.sum("delta").over(sweep).alias("conc"))
        .groupBy("day")
        .agg(F.max("conc").cast("int").alias("max_concurrency"))
        .orderBy("day")
    )


@register(
    "events_gap_fill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n_obs,
             CAST(floor(avg(value) * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT event_type,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ),
    j AS (
      SELECT g.event_type, g.h, hr.n_obs, hr.vm
      FROM grid g
      LEFT JOIN hourly hr ON g.event_type = hr.event_type AND g.h = hr.h
    ),
    f AS (
      SELECT event_type, h, COALESCE(n_obs, 0) AS n, vm,
        last_value(vm IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN vm IS NOT NULL THEN h END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        first_value(vm IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN vm IS NOT NULL THEN h END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
      FROM j
    )
    SELECT event_type, h AS bucket, CAST(n AS BIGINT) AS n,
      COALESCE(vm, prev_v) AS locf_micro,
      CAST(CASE WHEN vm IS NOT NULL THEN vm
           ELSE floor((prev_v * ((epoch(next_h) - epoch(h)) / 3600)
                       + next_v * ((epoch(h) - epoch(prev_h)) / 3600))
                      / ((epoch(next_h) - epoch(prev_h)) / 3600))
           END AS BIGINT) AS interp_micro
    FROM f
    """,
)
def events_gap_fill_interpolate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-series RESAMPLE: hourly buckets per event type over a
    sparse user slice, missing buckets materialized and filled two
    ways — LOCF (forward-fill of the last observed hourly mean) and
    LINEAR INTERPOLATION between the neighboring observed buckets
    (the timescaledb `time_bucket_gapfill` + `locf` + `interpolate`
    trio, re-expressed as DataFrame ops).

    Values ride as bigint MICRO-UNITS (floor(avg*1e6+0.5)) and the
    interpolation is exact integer arithmetic
    floor((prev*(m-k) + next*k)/m) — cross-engine `round()` on a
    double diverges by one ulp exactly at the short-decimal boundaries
    linear interpolation produces (see q2_min_cost_supplier's
    docstring); integer micro-units make the comparison stable at
    every SF.

    Plan shape for 100 TB: the fact table collapses FIRST to one row
    per (type, hour) — the only full-data shuffle. The dense grid is
    built from per-type min/max via `sequence` + `explode`
    (O(|types| x |hours|) rows, independent of fact cardinality), the
    left join hits the already-tiny hourly relation, and the fill
    windows partition by type over bounded per-type series — no
    global window, no driver loop, all codegen."""
    from pyspark.sql import Window as W

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 97 == 0)
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.floor(F.avg("value") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("vm"),
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    j = grid.join(hourly, ["event_type", "h"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_h = F.when(F.col("vm").isNotNull(), F.col("h"))
    f = j.select(
        "event_type",
        "h",
        F.coalesce("n_obs", F.lit(0)).alias("n"),
        "vm",
        F.last("vm", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.first("vm", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("next_h"),
    )
    # gap offsets in whole hours: k into the gap, m = gap width
    k = (F.unix_timestamp("h") - F.unix_timestamp("prev_h")) / 3600
    m = (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")) / 3600
    return f.select(
        "event_type",
        F.col("h").alias("bucket"),
        F.col("n").cast("long").alias("n"),
        F.coalesce("vm", "prev_v").alias("locf_micro"),
        F.when(F.col("vm").isNotNull(), F.col("vm"))
        .otherwise(
            F.floor(
                (F.col("prev_v") * (m - k) + F.col("next_v") * k) / m
            )
        )
        .cast("long")
        .alias("interp_micro"),
    )
