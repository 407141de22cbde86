"""Additional TPC-H-shaped join/aggregation pipelines, adapted to the
testdata's columns — join-planner stress coverage beyond Q1/Q3/Q4/Q5/Q17
(plans/advanced.py, subqueries.py). Each shape exercises a distinct
planner behavior: bidirectional dim filters (Q7), market-share ratio
aggregation (Q8), returned-item ranking (Q10), conditional CASE
aggregation (Q12), disjunctive multi-predicate scans (Q19), and
anti-join + scalar-average gating (Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations: the customer and
# supplier nations must form one of two ordered pairs. Both dims are
# broadcast; the OR-pair predicate lands on the joined row, after each
# side's nation broadcast-join, not as a join condition (keeps both
# joins hash/broadcast-able).
# ---------------------------------------------------------------------------
@register(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(extract(year FROM l.l_shipdate) AS INT) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_3')
       OR (cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_2')
    GROUP BY cn.n_name, sn.n_name, extract(year FROM l.l_shipdate)
    ORDER BY cust_nation, supp_nation, ship_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_3"))
        | ((F.col("cust_nation") == "NATION_3") & (F.col("supp_nation") == "NATION_2"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(pair)
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share: a ratio of conditional sum over total sum per
# group (two aggregates over one pass, no second scan).
# ---------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(extract(year FROM o.o_orderdate) AS INT) AS order_year,
           round(sum(CASE WHEN n.n_name = 'NATION_0'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY extract(year FROM o.o_orderdate)
    ORDER BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("n_name") == "NATION_0", vol).otherwise(0.0)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.round(F.sum(national) / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-item revenue ranking: selective flag filter on the
# fact, join out to customer + nation, top-k by revenue.
# ---------------------------------------------------------------------------
@register(
    "q10_returned_item_ranking",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape — shipping-mode priority counts: conditional CASE aggregation
# (two counters in one pass) keyed by return flag.
# ---------------------------------------------------------------------------
@register(
    "q12_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-predicate join: three OR'd conjunct
# groups over part attributes × lineitem ranges. The equi-key (partkey)
# stays the join condition; the disjunction filters post-join rows, so
# the join still hash-partitions (same planning note as Q7).
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(clause)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape — customers with above-average balance and no orders:
# scalar-average gate (broadcast single row) + anti join.
# ---------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT substr(c.c_name, 1, 9) AS name_prefix, c.c_custkey,
           round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      )
    ORDER BY c_custkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no 1997 order (every customer
    has *some* order in this testdata, so the anti-join is year-scoped to
    keep the result non-trivial)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.substring("c_name", 1, 9).alias("name_prefix"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy("c_custkey")
    )


@register(
    "supplier_ship_latency_scorecard",
    oracle="""
    SELECT l.l_suppkey AS suppkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(avg(date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE)), 4)
             AS avg_ship_lag_days,
           CAST(median(date_diff('day', o.o_orderdate::DATE, l.l_shipdate::DATE))
             AS DOUBLE) AS p50_ship_lag_days,
           CAST(count(*) FILTER (l.l_returnflag = 'R') * 1000000 // count(*)
             AS BIGINT) AS return_ppm
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_suppkey
    ORDER BY suppkey
    """,
)
def supplier_ship_latency_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier operational scorecard: line volume, revenue, mean
    and median order-to-ship lag in days, and the returned-line rate in
    exact integer ppm — the supplier-reliability view a procurement team
    reviews (the aggregate complement of q21's worst-offender hunt).

    100 TB plan shape: ONE fact-fact join on the order key (lineitem and
    orders co-partition naturally on it — bucketed layouts make it
    exchange-free, see bucketed_join_roundtrip), then a supplier-keyed
    aggregate with map-side combine. The median is exact
    (percentile == DuckDB median on day-integer lags).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
            lag.alias("_lag"),
            (F.col("l_returnflag") == "R").cast("int").alias("_ret"),
        )
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("_rev"), 2).alias("revenue"),
            F.round(F.avg("_lag"), 4).alias("avg_ship_lag_days"),
            F.expr("percentile(_lag, 0.5)").alias("p50_ship_lag_days"),
            F.expr("sum(_ret) * 1000000 div count(1)").alias("return_ppm"),
        )
        .orderBy("suppkey")
    )
