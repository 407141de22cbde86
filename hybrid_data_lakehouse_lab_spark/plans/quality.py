"""Data-quality / profiling lane over the events stream: burst
debounce, statistical outlier flagging, and cohort bucketing — the
checks a CDC pipeline runs between bronze and silver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Debounce — keep the FIRST event of each burst (same user+type within
# 60 s): the CDC echo/retry suppressor.
# ---------------------------------------------------------------------------
@register(
    "quality_debounce_bursts",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    WHERE prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 60
    """,
)
def quality_debounce_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One window (lag) per (user, type) partition — a single shuffle;
    the dropped rows never leave their map task after the window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", prev.alias("prev_ts"))
        .filter(
            F.col("prev_ts").isNull()
            | ((F.col("ts").cast("long") - F.col("prev_ts").cast("long")) > 60)
        )
        .drop("prev_ts")
    )


# ---------------------------------------------------------------------------
# Z-score outliers — |value − mean| > 3σ within the event type.
# ---------------------------------------------------------------------------
@register(
    "quality_value_outliers",
    oracle="""
    SELECT event_id, event_type, round(value, 4) AS value,
           round((value - m) / s, 4) AS zscore
    FROM (
      SELECT event_id, event_type, value,
             avg(value) OVER (PARTITION BY event_type) AS m,
             stddev_samp(value) OVER (PARTITION BY event_type) AS s
      FROM events)
    WHERE abs(value - m) > 3 * s
    ORDER BY event_id
    """,
)
def quality_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean/σ as an unordered window (one pass, no join-back);
    at 100 TB the same stats come from a tiny groupBy aggregate
    broadcast back — both forms are one shuffle on event_type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    m, s = F.avg("value").over(w), F.stddev_samp("value").over(w)
    return (
        ev.select(
            "event_id",
            "event_type",
            "value",
            m.alias("m"),
            s.alias("s"),
        )
        .filter(F.abs(F.col("value") - F.col("m")) > 3 * F.col("s"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round((F.col("value") - F.col("m")) / F.col("s"), 4).alias("zscore"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Cohort quartiles — ntile over per-user spend.
# ---------------------------------------------------------------------------
@register(
    "quality_user_spend_quartiles",
    oracle="""
    SELECT user_id, total_value,
           CAST(ntile(4) OVER (ORDER BY total_value DESC, user_id) AS INT) AS quartile
    FROM (
      SELECT user_id, round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id)
    ORDER BY user_id
    """,
)
def quality_user_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile after a groupBy: the window input is |users| rows, not
    |events| — aggregate first, rank second. The rank orders on the
    ROUNDED total (with a user_id tie-break) so engine-side ulp
    differences in float summation can't reorder near-ties. A global
    ntile is a single-partition sort; at real scale swap for
    percent_rank over range-partitioned data or approx percentile
    cutpoints."""
    ev = load_table(spark, sf_dir, "events")
    spend = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = Window.orderBy(F.desc("total_value"), "user_id")
    return (
        spend.select(
            "user_id",
            "total_value",
            F.ntile(4).over(w).cast("int").alias("quartile"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Daily activity + next-day retention — the cohort query every product
# analytics surface serves. Counts only: a retained/active RATIO of two
# ints is a short terminating decimal, exactly the shape that lands on
# cross-engine round() boundaries (see q2's docstring) — consumers can
# divide the two columns themselves.
# ---------------------------------------------------------------------------
@register(
    "quality_daily_retention",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    flags AS (
      SELECT user_id, d,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM ud)
    SELECT d AS activity_date,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(count(*) FILTER (WHERE d - prev_d = 1) AS BIGINT) AS retained_users
    FROM flags
    GROUP BY d
    ORDER BY activity_date
    """,
)
def quality_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user, day) first — the fact collapses to at most
    |users|×|days| rows before any window or join; the lag window then
    runs on that small relation. The naive day-over-day SELF-JOIN of
    the distinct relation is equivalent but shuffles it twice."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    flags = ud.withColumn("prev_d", F.lag("d").over(w))
    return (
        flags.groupBy(F.col("d").alias("activity_date"))
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(
                F.when(F.datediff("d", "prev_d") == 1, 1).otherwise(0)
            ).cast("bigint").alias("retained_users"),
        )
        .orderBy("activity_date")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over the document corpus — the governance check a
# training-data release runs before publishing: any combination of
# quasi-identifiers shared by fewer than k documents can single people
# (or sources) out.
# ---------------------------------------------------------------------------
K_ANON = 5


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, CAST(n_chars // 500 AS BIGINT) AS len_bucket,
             CAST(count(*) AS BIGINT) AS group_size
      FROM documents
      GROUP BY lang, source, n_chars // 500
    )
    SELECT c.lang, c.source, c.len_bucket, c.group_size,
           c.group_size >= {K_ANON} AS k_anonymous,
           CAST(sum(CASE WHEN c.group_size < {K_ANON} THEN c.group_size ELSE 0 END)
                OVER () AS BIGINT) AS risky_docs_total
    FROM cells c
    ORDER BY c.lang, c.source, c.len_bucket
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity over the quasi-identifier cell (lang, source,
    500-char length bucket): per-cell size, the k>=5 verdict, and the
    corpus-wide count of documents sitting in risky (sub-k) cells.

    100 TB plan shape: one aggregate keyed on the quasi-identifier cell
    (map-side combine; cell count is bounded by the QI domain, not the
    corpus); the risky-total is a 1-row broadcast back over the cell
    relation — the corpus is scanned once and never re-shuffled.
    All-integer arithmetic; no rounding contract.
    """
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        (F.col("n_chars") / F.lit(500)).cast("bigint").alias("len_bucket"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    risky = cells.agg(
        F.sum(
            F.when(F.col("group_size") < K_ANON, F.col("group_size")).otherwise(0)
        ).cast("bigint").alias("risky_docs_total")
    )
    return (
        cells.join(F.broadcast(risky))
        .select(
            "lang",
            "source",
            "len_bucket",
            "group_size",
            (F.col("group_size") >= K_ANON).alias("k_anonymous"),
            "risky_docs_total",
        )
        .orderBy("lang", "source", "len_bucket")
    )
