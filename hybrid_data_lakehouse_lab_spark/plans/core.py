"""Core operator inventory — SURVEY.md §2, one named query per operator,
each with a DuckDB oracle. Queries run on the driver testdata tables
(TESTDATA.md). Every computed column is aliased identically in the Spark
plan and the oracle SQL (the driver hash-compares values after sorting
columns by name).

Float-typed aggregates are rounded on BOTH sides: Spark's partial-agg
ordering differs from DuckDB's sequential scan, so raw double sums differ
in the last ulps; rounding to a fixed scale makes the hash stable without
changing semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import decode_op
from ..operators.util import FAN_OUT_MIN_BYTES, fan_out
from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape) — scan → filter → project →
# hash-agg (8 aggregates) → sort. Exercises the reference's analytical core
# (SURVEY §2.4 A4/A5, §2.7 O1) at full width.
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                       AS avg_qty,
           round(avg(l_extendedprice), 4)                                  AS avg_price,
           round(avg(l_discount), 4)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# A4 — revenue rollup (reference README.MD:281-285: category revenue over
# non-deleted rows, ordered). Transposed: brand revenue via lineitem ⋈ part;
# the dimension side is broadcast (no shuffle of the fact table).
# ---------------------------------------------------------------------------
@register(
    "revenue_rollup",
    oracle="""
    SELECT p.p_brand AS brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue DESC, brand
    """,
)
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "brand")
    )


# ---------------------------------------------------------------------------
# A5 — count + sum multi-aggregate per group (reference README.MD:318-326:
# COUNT(*) records, SUM(price) total_revenue per category).
# ---------------------------------------------------------------------------
@register(
    "count_sum_by_group",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_revenue
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY total_revenue DESC
    """,
)
def count_sum_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
        .orderBy(F.desc("total_revenue"))
    )


# ---------------------------------------------------------------------------
# A1 — group-count diagnostics (reference: libs/scd2_spark_processor.py:220
# groupBy("op").count()).
# ---------------------------------------------------------------------------
@register(
    "group_count_ops",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def group_count_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# A2 — global max checkpoint aggregate (reference:
# libs/scd2_spark_processor.py:496-499 max(event_timestamp), max(lsn)).
# ---------------------------------------------------------------------------
@register(
    "global_max_checkpoint",
    oracle="""
    SELECT max(ts) AS last_processed_timestamp,
           max(event_id) AS last_processed_lsn,
           count(*) AS records_processed
    FROM events
    """,
)
def global_max_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(
        F.max("ts").alias("last_processed_timestamp"),
        F.max("event_id").alias("last_processed_lsn"),
        F.count(F.lit(1)).alias("records_processed"),
    )


# ---------------------------------------------------------------------------
# P1/P2/F1/F2 — JSON-path projection + cast (reference extracts 22 paths
# with JSON_VALUE, scripts/cdc_to_parquet.py:95-119; we use one
# get_json_object per needed field and cast).
# ---------------------------------------------------------------------------
@register(
    "json_extract_typed",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY k
    ORDER BY k
    """,
)
def json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), F.col("value")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# P3 — malformed-event filter (reference: WHERE JSON_VALUE(...op) IS NOT
# NULL, scripts/cdc_to_parquet.py:121) + P4 op whitelist
# (scripts/cdc_to_parquet.py:204).
# ---------------------------------------------------------------------------
@register(
    "malformed_and_whitelist_filter",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND event_type IN ('click', 'purchase', 'signup')
      AND CAST(json_extract_string(props, '$.k') AS INT) < 50
    """,
)
def malformed_and_whitelist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.filter(
        k.isNotNull()
        & F.col("event_type").isin("click", "purchase", "signup")
        & (k.cast("int") < 50)
    ).select("event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# P5 + P7 + U1 + F10 — op-type routing split, alias projection, literal
# markers, schema-aligned union (reference: libs/scd2_spark_processor.py:
# 241-242 split, :293-303/:386-400 alias projections, :253-258 union).
# 'error' events play the delete role; others are inserts/updates.
# ---------------------------------------------------------------------------
@register(
    "op_split_union",
    oracle="""
    SELECT event_id, user_id, 'INSERT_UPDATE' AS operation_type, value AS payload_value
    FROM events WHERE event_type <> 'error'
    UNION ALL
    SELECT event_id, user_id, 'DELETED' AS operation_type, NULL AS payload_value
    FROM events WHERE event_type = 'error'
    """,
)
def op_split_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    upserts = ev.filter(F.col("event_type") != "error").select(
        "event_id",
        "user_id",
        F.lit("INSERT_UPDATE").alias("operation_type"),
        F.col("value").alias("payload_value"),
    )
    deletes = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.lit("DELETED").alias("operation_type"),
        F.lit(None).cast("double").alias("payload_value"),
    )
    return upserts.unionByName(deletes)


# ---------------------------------------------------------------------------
# P6 — incremental timestamp predicate (reference:
# libs/scd2_spark_processor.py:211-213 filter(event_timestamp > last_ts)).
# Pushed to the parquet scan as a row-group stats filter.
# ---------------------------------------------------------------------------
@register(
    "incremental_filter",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM events WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def incremental_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ---------------------------------------------------------------------------
# P8 + O2 — point filter + audit-replay ordering (reference README.MD:
# 288-295: one record's history ordered by event time).
# ---------------------------------------------------------------------------
@register(
    "point_lookup_history",
    oracle="""
    SELECT event_id, event_type, value, ts
    FROM events WHERE user_id = 7
    ORDER BY ts, event_id
    """,
)
def point_lookup_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .select("event_id", "event_type", "value", "ts")
        .orderBy("ts", "event_id")
    )


# ---------------------------------------------------------------------------
# Dimension joins — the analytical join surface (README's federated query
# shape). Small dims are broadcast: zero shuffle of the fact side.
# ---------------------------------------------------------------------------
@register(
    "broadcast_dim_join",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("region", "nation")
    )


@register(
    "order_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def order_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


# ---------------------------------------------------------------------------
# W1/W2 — per-key ordered window + lead (reference:
# libs/scd2_spark_processor.py:322-331). Unique tiebreaker (event_id) makes
# the chain deterministic when timestamps collide.
# ---------------------------------------------------------------------------
@register(
    "lead_window",
    oracle="""
    SELECT user_id, event_id, ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_type
    FROM events
    """,
)
def lead_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


# ---------------------------------------------------------------------------
# W4/J3 — latest-per-key (the Pinot upsert comparison-column semantics,
# scripts/pinot_auto/pinot_tables.yaml:32-36): row_number()=1 descending.
# ---------------------------------------------------------------------------
@register(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


# ---------------------------------------------------------------------------
# D2 — DISTINCT projection (reference: libs/scd2_spark_processor.py:461-465).
# ---------------------------------------------------------------------------
@register(
    "distinct_projection",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------------------
# O1 + O3 — ORDER BY aggregate + row-limit preview (deterministic via
# unique tiebreaker).
# ---------------------------------------------------------------------------
@register(
    "top_orders_preview",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def top_orders_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Top-K per group — window rank pattern (beyond the reference's surface but
# core OLAP; SURVEY §2.5 notes the reference has no rank — we add it).
# ---------------------------------------------------------------------------
@register(
    "top_k_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rnk
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rnk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rnk <= 3
    """,
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregate + approx sketch surface (absent in the reference,
# SURVEY §2.4 note — added as engine capability).
# ---------------------------------------------------------------------------
@register(
    "distinct_agg",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F3-F11 — scalar function bundle: coalesce, 2-arm case, epoch conversions,
# date_format partition derivation, md5/concat_ws hash, arithmetic
# (reference citations in SURVEY §2.9).
# ---------------------------------------------------------------------------
@register(
    "scalar_functions",
    oracle="""
    SELECT event_id,
           coalesce(event_type, 'UNKNOWN') AS op_kind,
           CASE WHEN event_type = 'error' THEN true ELSE false END AS is_deleted,
           epoch_ms(ts) AS ts_ms,
           strftime(ts, '%Y-%m-%d') AS dt,
           md5(concat_ws('|', event_type, CAST(user_id AS VARCHAR))) AS record_hash,
           round(value * 1.1, 4) AS adjusted_value
    FROM events
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.col("event_type"), F.lit("UNKNOWN")).alias("op_kind"),
        F.when(F.col("event_type") == "error", F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_deleted"),
        F.unix_millis("ts").alias("ts_ms"),
        F.date_format("ts", "yyyy-MM-dd").alias("dt"),
        F.md5(
            F.concat_ws("|", F.col("event_type"), F.col("user_id").cast("string"))
        ).alias("record_hash"),
        F.round(F.col("value") * 1.1, 4).alias("adjusted_value"),
    )


# ---------------------------------------------------------------------------
# F5 — 5-arm op decode (reference: scripts/cdc_to_pinot_history.py:258-264).
# ---------------------------------------------------------------------------
@register(
    "op_decode_5arm",
    oracle="""
    SELECT CASE event_type
             WHEN 'signup' THEN 'CREATE'
             WHEN 'view' THEN 'READ'
             WHEN 'click' THEN 'UPDATE'
             WHEN 'error' THEN 'DELETE'
             ELSE 'UNKNOWN'
           END AS operation,
           count(*) AS n
    FROM events GROUP BY 1 ORDER BY operation
    """,
)
def op_decode_5arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    op = (
        F.when(F.col("event_type") == "signup", "CREATE")
        .when(F.col("event_type") == "view", "READ")
        .when(F.col("event_type") == "click", "UPDATE")
        .when(F.col("event_type") == "error", "DELETE")
        .otherwise("UNKNOWN")
    )
    return (
        _t(spark, sf_dir, "events")
        .select(op.alias("operation"))
        .groupBy("operation")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("operation")
    )


# decode_op is used by the CDC lane; reference the helper so both stay in sync
_ = decode_op


# ---------------------------------------------------------------------------
# MapType lane — props parsed as map<string,int> and exploded to
# (key, value) rows; the generic-JSON-document shape (every key
# aggregated without naming it in the query). Spark: from_json + explode
# stay in codegen; DuckDB twin enumerates keys via json_keys.
# ---------------------------------------------------------------------------
@register(
    "json_props_map_agg",
    oracle="""
    SELECT k AS prop_key, count(*) AS n,
           sum(CAST(json_extract_string(props, '$.' || k) AS INT)) AS total
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    ORDER BY prop_key
    """,
)
def json_props_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.select(F.explode(m).alias("prop_key", "prop_value"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("prop_value").cast("bigint").alias("total"),
        )
        .orderBy("prop_key")
    )


@register(
    "json_variant_agg",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY k_bucket
    """,
)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4 VariantType:
    `parse_json` decodes the props string ONCE into the binary variant
    encoding; `variant_get` then does typed path access without
    re-parsing. With several extracted paths (or repeated access under
    a filter + aggregate, as here) this beats `get_json_object`, which
    re-parses the JSON string at every call site — at 100 TB the parse
    is the scan's CPU bill. The oracle uses DuckDB's JSON extraction —
    same values, independent implementation.

    Size-gated fan_out: the variant parse is the lane's CPU bill and a
    single-row-group scan would run it on one core; the gate keeps the
    shuffle away below the measured crossover (FAN_OUT_MIN_BYTES)."""
    ev = fan_out(_t(spark, sf_dir, "events"), min_bytes=FAN_OUT_MIN_BYTES)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).cast("int").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("k_bucket")
    )
