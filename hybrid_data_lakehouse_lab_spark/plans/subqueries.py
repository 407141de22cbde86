"""Subquery, set-operation, cube, and higher-order-function lanes.

Beyond the reference's literal surface (SURVEY §2.3 notes it has no
standalone joins; §2.8 no INTERSECT/EXCEPT) — these are the analytic
shapes a lakehouse SQL layer must answer, expressed so Catalyst plans
them well: correlated subqueries written in their decorrelated join form,
set ops on pruned key projections, array math kept JVM-side via
higher-order functions (no Python UDF in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Correlated EXISTS with a non-equi term (TPC-H Q4 shape): orders that
# have at least one line shipped after the order date. Spark: semi join
# whose condition mixes the key equality with the cross-table predicate —
# the decorrelated plan Catalyst would produce for the EXISTS.
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape): lines whose quantity is
# below 20% of their part's average. Spark side is the decorrelated form —
# per-part aggregate joined back — one shuffle on l_partkey; at 100 TB the
# per-part agg is tiny relative to the fact and broadcastable by AQE.
# ---------------------------------------------------------------------------
@register(
    "q17_below_avg_quantity",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Set operations on key projections (absent from the reference, §2.8).
# ---------------------------------------------------------------------------
_Y96 = "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
_Y97 = "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"


def _buyers(spark: SparkSession, sf_dir: str, pred: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.expr(pred))
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "set_intersect_repeat_buyers",
    oracle=f"""
    SELECT o_custkey AS custkey FROM orders WHERE {_Y96}
    INTERSECT
    SELECT o_custkey FROM orders WHERE {_Y97}
    """,
)
def set_intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1996 and 1997. INTERSECT dedups and
    shuffles only the key column — project before the set op."""
    return _buyers(spark, sf_dir, _Y96).intersect(_buyers(spark, sf_dir, _Y97))


@register(
    "set_except_churned_buyers",
    oracle=f"""
    SELECT o_custkey AS custkey FROM orders WHERE {_Y96}
    EXCEPT
    SELECT o_custkey FROM orders WHERE {_Y97}
    """,
)
def set_except_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in 1996 but not 1997 (churn set). `subtract`
    is EXCEPT DISTINCT — any 1997 occurrence removes the key entirely
    (exceptAll's multiset semantics would be wrong here)."""
    return _buyers(spark, sf_dir, _Y96).subtract(_buyers(spark, sf_dir, _Y97))


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations with an 'ALL' sentinel (the
# rollup_agg twin; §2.4 notes the reference has no grouping sets at all).
# ---------------------------------------------------------------------------
@register(
    "cube_agg",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Array higher-order functions over the embedding column — transform /
# filter / aggregate stay inside codegen (no Python boundary), the idiom
# every vector op in this engine builds on.
# ---------------------------------------------------------------------------
@register(
    "array_hof_vector_stats",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
           round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean_component
    FROM embeddings
    """,
)
def array_hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    )
    sq = "aggregate(transform(v, x -> x * x), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    s = "aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    return e.select(
        "vec_id",
        F.round(F.sqrt(F.expr(sq)), 6).alias("l2_norm"),
        F.expr("size(filter(v, x -> x > 0))").alias("n_positive"),
        F.round(F.expr(s) / F.expr("size(v)"), 6).alias("mean_component"),
    )


# ---------------------------------------------------------------------------
# Regex normalization pipeline over documents (string lane; the reference
# has no regex anywhere, §2.9). DuckDB regexp_replace needs the 'g' flag
# to match Spark's replace-all semantics.
# ---------------------------------------------------------------------------
@register(
    "text_normalize_regex",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) AS norm_text,
           len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')) AS n_tokens
    FROM documents
    """,
)
def text_normalize_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " +")).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Sketch surface — approx_count_distinct (HLL++) next to the exact count.
# Oracle-paired on the DETERMINISTIC surface: the exact count plus a
# within-bound verdict on the sketch (HLL++ raw estimates are
# engine-specific, so the estimate itself can't be value-compared; the
# oracle asserts the documented error bound instead, and
# tests/test_oracle_queries.py checks the tighter observed error).
# ---------------------------------------------------------------------------
@register(
    "sketch_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users and whether the HLL++ sketch
    estimate lands within a 5% relative-error bound (rsd=0.01 targets
    ~1%; 5% is the conservative contract). At 100 TB the sketch is the
    only viable path (fixed-size state, map-side partial merge) — the
    exact count here is the verification twin."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= F.lit(0.05)
            ).alias("approx_within_bound"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Salted (two-phase) aggregation — the explicit skew path surfaced as a
# query: result must equal the plain GROUP BY (the oracle), while the
# plan pre-aggregates per (key, salt) so one hot key spreads over N
# reducers (operators/skew.py; SCALE.md §Joins).
# ---------------------------------------------------------------------------
@register(
    "salted_group_agg",
    oracle="""
    SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    out = salted_aggregate(
        ev, ["user_id"], [("value", "count", "n"), ("value", "sum", "total_value")]
    )
    return out.select("user_id", "n", F.round("total_value", 2).alias("total_value"))
