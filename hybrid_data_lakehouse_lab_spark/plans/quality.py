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


# ---------------------------------------------------------------------------
# Data-contract audit — declarative expectations over the fact, graded
# in one scan (the Great-Expectations shape as a relational plan):
# each check is a row with its observed value and a pass verdict.
# ---------------------------------------------------------------------------
@register(
    "events_data_contract_audit",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n_rows,
             count(*) - count(event_id) AS null_event_id,
             count(*) - count(user_id) AS null_user_id,
             count(*) - count(ts) AS null_ts,
             count(*) - count(value) AS null_value,
             count(DISTINCT event_id) AS distinct_event_id,
             CAST(count(*) FILTER (value < 0) AS BIGINT) AS neg_value,
             CAST(count(*) FILTER (
               event_type NOT IN ('click','view','purchase','signup','error')
             ) AS BIGINT) AS unknown_type,
             CAST(count(*) FILTER (
               ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2025-01-01'
             ) AS BIGINT) AS ts_out_of_range
      FROM events
    )
    SELECT 'event_id_not_null' AS check_name, null_event_id AS violations,
           null_event_id = 0 AS passed FROM s
    UNION ALL
    SELECT 'event_id_unique', n_rows - distinct_event_id,
           n_rows = distinct_event_id FROM s
    UNION ALL
    SELECT 'no_null_keys', null_user_id + null_ts,
           null_user_id + null_ts = 0 FROM s
    UNION ALL
    SELECT 'ts_in_2024', ts_out_of_range, ts_out_of_range = 0 FROM s
    UNION ALL
    SELECT 'value_non_negative', neg_value + null_value,
           neg_value + null_value = 0 FROM s
    UNION ALL
    SELECT 'event_type_in_domain', unknown_type, unknown_type = 0 FROM s
    ORDER BY check_name
    """,
)
def events_data_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract checks over the events fact — key non-null, key unique,
    timestamp range, value domain, event-type enumeration — each
    reported as (check_name, violations, passed). The audit a pipeline
    gates each ingest batch on before promoting bronze to silver.

    100 TB plan shape: ONE scan computes every check's counters in a
    single aggregate (map-side combine; the distinct-key check rides the
    same pass via count(DISTINCT) over the already-unique key — Spark
    plans it as a two-stage partial distinct, not a fact re-shuffle
    per check); the verdict table is built from the 1-row summary.
    Adding a check adds a counter, not a scan.
    """
    ev = load_table(spark, sf_dir, "events")
    KNOWN = ["click", "view", "purchase", "signup", "error"]
    s = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("event_id")).alias("null_event_id"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("null_user_id"),
        (F.count(F.lit(1)) - F.count("ts")).alias("null_ts"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_value"),
        F.countDistinct("event_id").alias("distinct_event_id"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("neg_value"),
        F.sum(F.when(~F.col("event_type").isin(KNOWN), 1).otherwise(0))
        .cast("bigint")
        .alias("unknown_type"),
        F.sum(
            F.when(
                (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2025-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ts_out_of_range"),
    )
    checks = [
        ("event_id_not_null", F.col("null_event_id"), F.col("null_event_id") == 0),
        (
            "event_id_unique",
            F.col("n_rows") - F.col("distinct_event_id"),
            F.col("n_rows") == F.col("distinct_event_id"),
        ),
        (
            "no_null_keys",
            F.col("null_user_id") + F.col("null_ts"),
            (F.col("null_user_id") + F.col("null_ts")) == 0,
        ),
        ("ts_in_2024", F.col("ts_out_of_range"), F.col("ts_out_of_range") == 0),
        (
            "value_non_negative",
            F.col("neg_value") + F.col("null_value"),
            (F.col("neg_value") + F.col("null_value")) == 0,
        ),
        (
            "event_type_in_domain",
            F.col("unknown_type"),
            F.col("unknown_type") == 0,
        ),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                cnt.cast("bigint").alias("violations"),
                ok.alias("passed"),
            )
            for name, cnt, ok in checks
        ]
    )
    return (
        s.select(F.explode(rows).alias("c"))
        .select("c.check_name", "c.violations", "c.passed")
        .orderBy("check_name")
    )


@register(
    "referential_integrity_audit",
    oracle="""
    WITH li AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IS NULL
    ),
    ord AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_custkey IS NULL
    ),
    cust AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE n.n_nationkey IS NULL
    )
    SELECT 'customer.c_nationkey -> nation' AS relationship,
           orphans, orphans = 0 AS passed FROM cust
    UNION ALL
    SELECT 'lineitem.l_orderkey -> orders', orphans, orphans = 0 FROM li
    UNION ALL
    SELECT 'orders.o_custkey -> customer', orphans, orphans = 0 FROM ord
    ORDER BY relationship
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the warehouse spine
    (lineitem→orders→customer→nation): dangling-reference counts per
    relationship with a pass verdict — the cross-TABLE complement of the
    single-table contract audit, run before trusting any join-based
    metric downstream.

    100 TB plan shape: each relationship is one left-anti-shaped probe —
    the parent key side reduces to its distinct keys (dimension-sized
    for customer/nation; order-keys co-partition with lineitem's
    natural join key), aggregated to a count. No fact ever joins
    another fact's payload; AQE broadcasts the small parents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def orphans(child, key, parent, pkey):
        return (
            child.select(F.col(key))
            .join(parent.select(F.col(pkey).alias(key)).distinct(), key, "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
        )

    def row(name, df):
        return df.select(
            F.lit(name).alias("relationship"),
            F.col("orphans"),
            (F.col("orphans") == 0).alias("passed"),
        )

    return (
        row("customer.c_nationkey -> nation", orphans(c, "c_nationkey", n, "n_nationkey"))
        .unionAll(row("lineitem.l_orderkey -> orders", orphans(li, "l_orderkey", o, "o_orderkey")))
        .unionAll(row("orders.o_custkey -> customer", orphans(o, "o_custkey", c, "c_custkey")))
        .orderBy("relationship")
    )


# ---------------------------------------------------------------------------
# Relative standing — percent_rank / cume_dist per event type: the
# monitoring view behind "is this value in the top decile for its type".
# ---------------------------------------------------------------------------
@register(
    "quality_value_percentile_flags",
    oracle="""
    SELECT event_id, event_type,
           round(value, 2) AS value_r,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_d,
           cume_dist() OVER w * 10 > 9 AS top_decile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def quality_value_percentile_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type relative standing: percent_rank and cume_dist over the
    value distribution, plus a top-decile flag — the remaining two
    analytic window functions in the SQL window family (rank/row_number/
    ntile/lead/lag are covered elsewhere).

    Determinism: both engines define percent_rank=(rank-1)/(n-1) and
    cume_dist=|rows<=x|/n and evaluate the divisions on identical
    integers, so even the unrounded flag comparison is bit-identical;
    displayed ranks round at 1e-6 anyway.

    100 TB: one shuffle keyed by event_type. The type key is low-
    cardinality, so at real scale this is the documented two-level
    pattern (pre-aggregate a per-(type, value-bucket) CDF, then join) —
    here the direct window states the semantics; the flag itself only
    needs the CDF, never a full sort per type —
    quality_value_cdf_scalable implements that two-level CDF shape as a
    registered lane, and a pytest proves it sandwiches this lane's
    cume_dist.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cd = F.cume_dist().over(w)
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value_r"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(cd, 6).alias("cume_d"),
        (cd * 10 > 9).alias("top_decile"),
    )


# ---------------------------------------------------------------------------
# Scalable relative standing — the two-level CDF shape the percent_rank
# lane's docstring promises: per-(type, value-bucket) counts first, then
# flags via a broadcast CDF. The fact is never shuffled.
# ---------------------------------------------------------------------------
@register(
    "quality_value_cdf_scalable",
    oracle="""
    WITH b AS (
        SELECT event_type, CAST(floor(value) AS INT) AS bucket, count(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    cdf AS (
        SELECT event_type, bucket, cnt,
               coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM b
    )
    SELECT e.event_id, e.event_type,
           CAST(floor(e.value) AS INT) AS bucket,
           CAST(c.below * 1000000 // c.n AS BIGINT) AS pct_below_micro,
           CAST((c.below + c.cnt) * 1000000 // c.n AS BIGINT) AS pct_upto_micro,
           c.below * 10 >= c.n * 9 AS top_decile
    FROM events e
    JOIN cdf c ON c.event_type = e.event_type
              AND c.bucket = CAST(floor(e.value) AS INT)
    """,
)
def quality_value_cdf_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-correct form of per-type relative standing (the shape
    quality_value_percentile_flags documents as the 100 TB path, here as
    real code): bucket values at unit granularity, reduce to a
    per-(type, bucket) histogram with map-side combine, turn that tiny
    relation into a CDF with a window bounded by the BUCKET count (never
    by event count), and broadcast it back onto the fact. Each event
    gets its strictly-below / up-to-bucket percentile in integer
    micro-units plus a bucket-granular top-decile flag.

    The fact table is never shuffled and never sorted: both passes are
    scans, the only window runs over the |types|x|buckets| histogram,
    and the join is a broadcast. That is the difference from the exact
    percent_rank lane, whose per-type sort is the stated trade for exact
    rank semantics at audit-sized cardinalities.
    """
    ev = load_table(spark, sf_dir, "events")
    b = F.floor("value").cast("int")
    hist = ev.groupBy("event_type", b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("event_type")
    cdf = hist.select(
        "event_type",
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
        F.sum("cnt").over(wn).alias("n"),
    )
    return (
        ev.select("event_id", "event_type", b.alias("bucket"))
        .join(F.broadcast(cdf), ["event_type", "bucket"])
        .select(
            "event_id",
            "event_type",
            "bucket",
            F.expr("below * 1000000 div n").alias("pct_below_micro"),
            F.expr("(below + cnt) * 1000000 div n").alias("pct_upto_micro"),
            (F.col("below") * 10 >= F.col("n") * 9).alias("top_decile"),
        )
    )
