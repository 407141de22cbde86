"""Advanced operator lane — capabilities beyond the reference's literal
surface that a lakehouse engine at 100 TB needs: window frames (running /
as-of), sessionization, event-time windows, pivot, rollup, semi/anti
joins, and multi-table join pipelines (TPC-H Q3/Q5 shapes) that stress
the join planner. All oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# As-of lookup — Spark has no native as-of join; per-key it is a running
# conditional max over an ordered frame (the composition-of-builtins path,
# preferred over applyInPandas/merge_asof).
# ---------------------------------------------------------------------------
@register(
    "asof_last_signup",
    oracle="""
    SELECT event_id, user_id, ts, event_type,
           max(CASE WHEN event_type = 'signup' THEN ts END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_signup_ts
    FROM events
    """,
)
def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w).alias(
            "last_signup_ts"
        ),
    )


# ---------------------------------------------------------------------------
# Running aggregate over an ordered frame.
# ---------------------------------------------------------------------------
@register(
    "running_total_per_user",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS running_value
    FROM events
    """,
)
def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Sessionization — gap > 30 min starts a new session (lag + running sum;
# the batch twin of streaming session_window).
# ---------------------------------------------------------------------------
SESSION_GAP_US = 1_800_000_000  # 30 min, in microseconds

# Shared sessionization CTE chain (DuckDB side): relation
# `sess(event_id, user_id, ts, session_id)` — one definition for the
# sessionize lane and every session-derived lane (peak concurrency) so
# the gap rule cannot drift between lanes. Gaps compare in MICROSECONDS
# on both engines: Spark's unix_timestamp truncates to whole seconds
# while DuckDB's epoch() keeps fractional parts, so a seconds-based
# comparison diverges on gaps within 1s of the threshold — unix_micros
# vs epoch_us is exact on both sides.
SESSIONS_SQL = f"""
    flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT event_id, user_id, ts,
             CAST(sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    )
"""


def sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of SESSIONS_SQL: (event_id, user_id, ts, session_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev)) > SESSION_GAP_US),
        1,
    ).otherwise(0)
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", is_new.alias("is_new"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum("is_new").over(wf).cast("bigint").alias("session_id"),
        )
    )


@register(
    "sessionize",
    oracle=f"""
    WITH {SESSIONS_SQL}
    SELECT event_id, user_id, ts, session_id FROM sess
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionized(spark, sf_dir)


# ---------------------------------------------------------------------------
# Event-time tumbling window aggregate — the batch twin of the streaming
# groupBy(window(...)); epoch-aligned 6h buckets in both engines.
# ---------------------------------------------------------------------------
@register(
    "tumbling_window_agg",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "6 hours").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) window aggregate — the overlapping-window twin of the
# tumbling lane: 6h windows every 3h, so each event lands in exactly two
# windows. Spark's window(slideDuration) explodes rows into their member
# windows; the oracle derives the same two epoch-aligned starts per event.
# ---------------------------------------------------------------------------
@register(
    "hopping_window_agg",
    oracle="""
    SELECT make_timestamp(
             (CAST(floor(epoch(ts) / 10800) AS BIGINT) - k) * 10800 * 1000000
           ) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events, UNNEST([0, 1]) AS t(k)
    WHERE (CAST(floor(epoch(ts) / 10800) AS BIGINT) - k) >= 0
    GROUP BY 1, 2
    """,
)
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6h windows hopping every 3h (each event in 2 windows).

    100 TB: the ×2 row expansion happens map-side inside the window()
    projection and collapses immediately in the partial aggregate, so the
    shuffle carries only (window, type) groups — same exchange volume as
    the tumbling lane, not 2× the fact. The oracle's k-guard mirrors
    Spark's behavior of never emitting windows that start before epoch 0.
    """
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "6 hours", "3 hours").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot / conditional aggregation.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=_EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Rollup (hierarchical subtotals) — 'ALL' sentinel instead of grouping ids
# so both engines agree without bitmask alignment.
# ---------------------------------------------------------------------------
@register(
    "rollup_agg",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS) — no payload shuffle of the
# probe side's non-key columns.
# ---------------------------------------------------------------------------
@register(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no large order (anti join against a filtered build
    side — the filter lands before the join, shrinking the hash table)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority: selective filters on both join
# sides, 3-way join, agg, top-k. Catalyst pushes both filters to the
# scans; AQE picks the join strategy at runtime.
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local supplier volume: 6-table join where customer and
# supplier must share a nation. The dimension chain (nation ⋈ region) is
# broadcast; the fact join shuffles once on orderkey.
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The region restriction reaches CUSTOMER before any fact join: the
    supplier must share the customer's nation, so r_name='ASIA' prunes
    the customer side to 1/5 up front — every downstream shuffle
    (customer ⋈ orders, ⋈ lineitem) carries a fifth of the rows it
    would if the filter were applied after the supplier join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# Approximate aggregates — the sketch surface (HLL / quantiles). Exact
# oracles exist for the *wrapped* outputs: approx results are compared via
# their deterministic exact twins where the engines' sketches differ, so
# this query exposes percentile/median over a deterministic path.
# ---------------------------------------------------------------------------
@register(
    "quantiles_by_group",
    oracle="""
    SELECT event_type,
           round(median(value), 4) AS median_value,
           round(quantile_cont(value, 0.95), 4) AS p95_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
        )
        .orderBy("event_type")
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube compile to)
    via Spark 4's DataFrame.groupingSets — one pass computes the two
    single-column aggregates plus the grand total (an Expand node feeds
    one shuffle; three separate groupBys would scan and shuffle 3×)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "unpivot_revenue_components",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_revenue,
             round(sum(l_extendedprice * l_discount), 2) AS discount_given,
             round(sum(l_extendedprice * (1 - l_discount) * l_tax), 2) AS tax_collected
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'net_revenue' AS component, net_revenue AS amount FROM agg
    UNION ALL
    SELECT l_returnflag, 'discount_given', discount_given FROM agg
    UNION ALL
    SELECT l_returnflag, 'tax_collected', tax_collected FROM agg
    ORDER BY l_returnflag, component
    """,
)
def unpivot_revenue_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via stack(): three measure columns melt to
    (component, amount) rows AFTER aggregation, so the reshape touches
    |groups|×3 rows, never the fact. The oracle states the same melt as
    UNION ALL (dialect-neutral)."""
    li = _t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(net), 2).alias("net_revenue"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "discount_given"
        ),
        F.round(F.sum(net * F.col("l_tax")), 2).alias("tax_collected"),
    )
    return (
        agg.selectExpr(
            "l_returnflag",
            "stack(3, 'net_revenue', net_revenue, "
            "'discount_given', discount_given, "
            "'tax_collected', tax_collected) AS (component, amount)",
        )
        .orderBy("l_returnflag", "component")
    )
