"""Market-basket affinity over the order fact: which part pairs co-occur
in the same order more often than chance (support + lift) — the frequent-
itemset (pairs) query a lakehouse serving layer answers from the same
lineitem fact the TPC-H sweep reads.

Spark-first shape: pair generation is NOT a self-join of lineitem —
``operators.util.bucket_pairs`` groups lines per order once and expands
intra-order pairs inside codegen, so the fact is computed and shuffled a
single time on the order key (the self-join form computes the subtree
twice; Spark does not reuse the exchange across join sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import bucket_pairs
from ..sources import load_table
from .registry import register


@register(
    "orders_market_basket",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pc AS (SELECT l_partkey, count(*) AS n_ord FROM op GROUP BY l_partkey),
    tot AS (SELECT count(*) AS n_orders
            FROM (SELECT DISTINCT l_orderkey FROM op)),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_both
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
    SELECT p.part_a, p.part_b, p.n_both,
           round(CAST(p.n_both AS DOUBLE) * (SELECT n_orders FROM tot)
                 / (pa.n_ord * pb.n_ord), 6) AS lift
    FROM pairs p
    JOIN pc pa ON p.part_a = pa.l_partkey
    JOIN pc pb ON p.part_b = pb.l_partkey
    WHERE p.n_both >= 2
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-pair co-occurrence with lift: support(a,b) vs independence.

    100 TB: one shuffle of the (order, part) projection on the order key;
    pair expansion is O(lines-per-order²) inside each bucket (baskets are
    small by nature — same argument as LSH buckets). The per-part order
    counts are vocabulary-sized and broadcast; the corpus-wide order
    count is a 1-row broadcast (allowlisted BNLJ, like tf-idf's doc
    count). Output is bounded by observed co-occurring pairs, already
    thresholded at support ≥ 2.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    pc = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    tot = (
        op.select("l_orderkey")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    pairs = (
        bucket_pairs(op, ["l_orderkey"], "l_partkey", [])
        .groupBy(F.col("a.id").alias("part_a"), F.col("b.id").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    pa = pc.select(F.col("l_partkey").alias("part_a"), F.col("n_ord").alias("na"))
    pb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n_ord").alias("nb"))
    lift = F.col("n_both").cast("double") * F.col("n_orders") / (
        F.col("na") * F.col("nb")
    )
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .join(F.broadcast(tot))
        .select("part_a", "part_b", "n_both", F.round(lift, 6).alias("lift"))
    )
