"""Behavioral analytics over the events stream: funnel conversion and
the event-type transition matrix — the product-analytics queries a
lakehouse serving layer answers from the same CDC-fed events table the
reference ingests (reference: data_gen_pg2.py event loop).

Both lanes are pure DataFrame/Catalyst: the funnel is three keyed
aggregations that reuse one shuffle key (user_id); the transition
matrix is a single window pass. The streaming twin of the funnel is
``streaming/stateful.py:funnel_stage_stream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Funnel conversion — users progressing view → click → purchase, each
# stage strictly after the previous one (first-touch semantics).
# ---------------------------------------------------------------------------
@register(
    "events_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
        SELECT e.user_id, min(e.ts) AS t0
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id),
    p AS (
        SELECT e.user_id, min(e.ts) AS t0
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t0 GROUP BY e.user_id)
    SELECT stage_idx, stage, n_users FROM (
        SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        UNION ALL
        SELECT 2, 'click', count(*) FROM c
        UNION ALL
        SELECT 3, 'purchase', count(*) FROM p)
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage funnel with strict ordering: a user counts for stage
    N only if their first stage-N event lands strictly after their first
    stage-(N−1) event.

    100 TB: ONE linear chain — stage N is a LEFT join of the stage-(N−1)
    per-user table against the next stage's filtered events, so every
    subtree is consumed exactly once and the fact is scanned once per
    stage (3 pushdown scans total; the previous stage-count UNION
    referenced each stage table from two places, which Spark planned as
    6 recomputed scans — no cross-branch subtree reuse). Users who miss
    a stage carry NULL timestamps forward instead of dropping out, so
    all three counts come from one final 1-row aggregate over the last
    table. Every join/aggregate keys on ``user_id``: one exchange, then
    hash joins on already-partitioned sides.
    """
    ev = load_table(spark, sf_dir, "events")

    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    s2 = (
        s1.join(
            clicks,
            (F.col("user_id") == F.col("c_uid")) & (F.col("c_ts") > F.col("t1")),
            "left",
        )
        .groupBy("user_id", "t1")
        .agg(F.min("c_ts").alias("t2"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    s3 = (
        s2.join(
            purchases,
            (F.col("user_id") == F.col("p_uid")) & (F.col("p_ts") > F.col("t2")),
            "left",
        )
        .groupBy("user_id", "t2")
        .agg(F.min("p_ts").alias("t3"))
    )
    counts = s3.agg(
        F.count(F.lit(1)).alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return counts.selectExpr(
        "stack(3, 1, 'view', n1, 2, 'click', n2, 3, 'purchase', n3)"
        " AS (stage_idx, stage, n_users)"
    )


# ---------------------------------------------------------------------------
# Transition matrix — counts of consecutive event-type pairs per user:
# the Markov-chain view of user behavior (at most |types|² rows out).
# ---------------------------------------------------------------------------
@register(
    "events_type_transitions",
    oracle="""
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events)
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ``lag`` window partitioned by user (a single shuffle), then a
    partial-aggregating groupBy whose output is bounded by the square of
    the event-type cardinality — the classic scalable shape for
    sequence-transition stats (never collects per-user sequences).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Retention cohorts — the week-over-week user-retention matrix: users
# grouped by first-active week, counted in each later week they return.
# ---------------------------------------------------------------------------
@register(
    "events_retention_cohorts",
    oracle="""
    WITH wk AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        FROM events),
    firsts AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY user_id)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, wk.w) // 7 AS INT)
             AS week_offset,
           count(*) AS n_users
    FROM wk JOIN firsts f ON wk.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: (first-active week, weeks-since) → active users.

    The distinct (user, week) projection collapses the fact FIRST (map-side
    combine, then one shuffle on user_id); the cohort join and both
    aggregations reuse that user_id partitioning, and the final output is
    bounded by weeks² regardless of corpus size. The datediff is always a
    multiple of 7 (both sides are week-truncated), so integer division is
    exact in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    firsts = wk.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        wk.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(w, cohort_week) div 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Daily-count anomaly detection — per-type z-scores over the daily event
# volume: the ops-dashboard "did ingest spike/drop" query.
# ---------------------------------------------------------------------------
@register(
    "events_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
        FROM daily GROUP BY event_type)
    SELECT d.event_type, d.day, d.n,
           round((d.n - s.mu) / s.sigma, 4) AS zscore,
           (abs(round((d.n - s.mu) / s.sigma, 4)) > 2.0) AS is_anomaly
    FROM daily d JOIN stats s ON d.event_type = s.event_type
    WHERE s.sigma > 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type daily-volume z-score with a |z| > 2 anomaly flag.

    Two stacked aggregations: daily counts (partial-agg shuffle keyed on
    (type, day)), then the per-type mean/stddev over that already-tiny
    table. The stats side is |types| rows and broadcast back, so the fact
    is never shuffled twice. The anomaly verdict is computed from the
    ROUNDED z-score in both engines, so a boundary value cannot flip the
    flag across engines on floating-point noise.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("sigma") > 0)
        .select(
            "event_type",
            "day",
            "n",
            z.alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


# Exact per-group quantiles already exist as plans/advanced.py:
# quantiles_by_group (median + p95 by event_type, quantile_cont-paired) —
# deliberately NOT duplicated here.


# ---------------------------------------------------------------------------
# Salted (two-phase) aggregation — the explicit skew path driver-visible:
# the oracle is the PLAIN aggregate, so a hash match proves the salted
# decomposition is exactly equivalent.
# ---------------------------------------------------------------------------
@register(
    "events_salted_type_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value,
           round(sum(value) / count(*), 6) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats via operators/skew.py's two-phase salted groupBy.

    event_type is exactly the kind of low-cardinality hot key that melts
    a single reducer at 100 TB: the salt spreads each key over 16
    partial groups, phase 2 merges ≤16 rows per key. avg is expressed as
    sum/count AFTER the merge (the salted phase stays algebraic — an avg
    of partial avgs would be wrong, which is why salted_aggregate bans
    it). Equivalence to the unsalted plan is the oracle check itself.
    """
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    # count() a never-null literal, not `value`: count(value) is the
    # NON-NULL count, which matches the oracle's count(*) only while
    # events.value happens to have no NULLs (ADVICE r2).
    agg = salted_aggregate(
        ev.select("event_type", "value").withColumn("_one", F.lit(1)),
        keys=["event_type"],
        aggs=[
            ("_one", "count", "n"),
            ("value", "sum", "_sum_v"),
        ],
    )
    return agg.select(
        "event_type",
        "n",
        F.round("_sum_v", 2).alias("total_value"),
        F.round(F.col("_sum_v") / F.col("n"), 6).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# Rolling active users — DAU / WAU (7d) / MAU (28d) per day: the iconic
# engagement dashboard query.
# ---------------------------------------------------------------------------
@register(
    "events_active_users_rolling",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day,
           count(DISTINCT CASE WHEN ud.d = days.d
                               THEN ud.user_id END) AS dau,
           count(DISTINCT CASE WHEN ud.d > days.d - INTERVAL 7 DAY
                               THEN ud.user_id END) AS wau,
           count(DISTINCT ud.user_id) AS mau
    FROM days JOIN ud
      ON ud.d <= days.d AND ud.d > days.d - INTERVAL 28 DAY
    GROUP BY 1
    """,
)
def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU per day from one distinct (user, day) projection.

    100 TB shape: the fact collapses map-side to distinct (user, day) —
    at most users × days rows — before any join; the calendar side is
    |days| rows and becomes the broadcast build of a range join whose
    fan-out is bounded by 28 memberships per (user, day). The conditional
    distincts share one aggregation pass. The un-collapsible cost is the
    countDistinct per (day, window) — at extreme scale swap HLL sketches
    per day and merge (sketch_distinct_users documents the pattern).
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    joined = ud.join(
        F.broadcast(days),
        (F.col("d") <= F.col("day"))
        & (F.col("d") > F.date_sub(F.col("day"), 28)),
    )
    # Stacked aggregation: membership flags per (day, user) first, then
    # plain sums — three filtered countDistincts in ONE agg would Expand
    # every row 3× before the shuffle (blocked by the plan gates).
    per_user = joined.groupBy("day", "user_id").agg(
        F.max((F.col("d") == F.col("day")).cast("long")).alias("in_dau"),
        F.max(
            (F.col("d") > F.date_sub(F.col("day"), 7)).cast("long")
        ).alias("in_wau"),
    )
    return per_user.groupBy("day").agg(
        F.sum("in_dau").alias("dau"),
        F.sum("in_wau").alias("wau"),
        F.count(F.lit(1)).alias("mau"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival statistics — per-type gaps between a user's consecutive
# events: the time-series heartbeat query (SLA / engagement cadence).
# ---------------------------------------------------------------------------
@register(
    "events_interarrival_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_ms
        FROM events)
    SELECT event_type,
           count(*) AS n_gaps,
           round(avg(gap_ms) / 1000, 3) AS avg_gap_s,
           round(median(gap_ms) / 1000, 3) AS p50_gap_s
    FROM gaps WHERE gap_ms IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival gaps (same user, consecutive events of that
    type): count, mean, exact median — in ms-epoch arithmetic so both
    engines subtract identical integers before any float math.

    100 TB: one lag window per (user, type) partition — a single shuffle
    of the fact — then a |types|-group aggregate. Exact median exists for
    oracle parity; at scale swap percentile_approx (same plan, mergeable
    sketch), as quantiles_by_group documents.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    gaps = ev.select(
        "event_type", (ms - F.lag(ms).over(w)).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_ms") / 1000, 3).alias("avg_gap_s"),
        F.round(F.expr("percentile(gap_ms, 0.5)") / 1000, 3).alias("p50_gap_s"),
    )


# ---------------------------------------------------------------------------
# Key-skew audit — the diagnostic that decides WHEN the salted-aggregate
# path (events_salted_type_stats) is needed: per-key share of the fact
# in exact integer ppm, flagged against the hot-key threshold.
# ---------------------------------------------------------------------------
SKEW_TOP = 10
SKEW_HOT_PPM = 20_000  # >2% of the fact on one key => salt it


@register(
    "events_key_skew_audit",
    oracle=f"""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM per_key)
    SELECT user_id, n_rows,
           CAST(n_rows * 1000000 // t.total AS BIGINT) AS share_ppm,
           n_rows * 1000000 // t.total >= {SKEW_HOT_PPM} AS needs_salting,
           rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        ORDER BY n_rows DESC, user_id) AS INT) AS rnk
      FROM per_key
    ) p CROSS JOIN tot t
    WHERE rnk <= {SKEW_TOP}
    ORDER BY rnk
    """,
)
def events_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hottest shuffle keys with their exact share of the fact
    (integer ppm — no float, no rounding contract) and the salt/don't
    salt verdict at 2%. Run this before any user_id-keyed join or agg:
    a key above the threshold is the one AQE skew-split or the salted
    two-phase aggregate exists for.

    100 TB plan shape: one map-side-combined count per key, a
    WindowGroupLimit top-10 (per-partition partial top-k — the key
    relation is never globally sorted), and a 1-row total broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per_key.agg(F.sum("n_rows").cast("bigint").alias("total"))
    w = Window.orderBy(F.desc("n_rows"), "user_id")
    share = F.expr("n_rows * 1000000 div total")
    return (
        per_key.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= SKEW_TOP)
        .join(F.broadcast(tot))
        .select(
            "user_id",
            "n_rows",
            share.alias("share_ppm"),
            (share >= SKEW_HOT_PPM).alias("needs_salting"),
            "rnk",
        )
        .orderBy("rnk")
    )
