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
