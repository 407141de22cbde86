"""Similarity-search extension lane (embeddings table, array<float> 64-d).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (bounded candidate sets instead of the full
cross product). Dot products run JVM-side via zip_with/aggregate — no
Python in the loop. Both engines compute in float64 (arrays cast to
double) so the oracle matches to the ulp, then values are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, match_id,
             list_cosine_similarity(qv, cv) AS sim
      FROM q, c
      WHERE query_id <> match_id
    )
    SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a query set.

    At scale: broadcast the query set (small), stream the corpus once —
    no shuffle of the embedding column; the only exchange is the final
    per-query top-k (tiny). That is exactly this plan: q is broadcast,
    scored is map-side, window input is ≤ |corpus| rows filtered to
    candidates.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("match_id"), _as_double("embedding").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.round("sim", 6).alias("cosine_sim"), "rnk")
    )


@register(
    "similarity_centroid_per_label",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(avg(embedding[1]::DOUBLE), 6) AS centroid_d0,
           round(avg(embedding[2]::DOUBLE), 6) AS centroid_d1
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def similarity_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label (≈ per-cluster) centroid components.

    A full IVF index = k-means centroids + inverted lists; the aggregate
    shape (groupBy label, element-wise mean) is this plan. Only two
    components are exposed so the oracle stays scalar-typed.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(F.element_at(_as_double("embedding"), 1)), 6).alias("centroid_d0"),
            F.round(F.avg(F.element_at(_as_double("embedding"), 2)), 6).alias("centroid_d1"),
        )
        .orderBy("label")
    )


@register(
    "similarity_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id AS match_id,
             list_cosine_similarity(q.qv, c.v) AS sim
      FROM q JOIN e c ON c.label = q.query_label AND c.vec_id <> q.query_id
    )
    SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's partition (label plays the
    cluster-assignment role). The equi-join on the cluster key replaces
    the cross product — at 100 TB this is the difference between scanning
    the corpus per query and scanning one inverted list per query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _as_double("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("v").alias("qv"),
    )
    c = e.select(F.col("vec_id").alias("match_id"), "label", F.col("v").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    scored = (
        F.broadcast(q)
        .join(c, (F.col("label") == F.col("query_label")) & (F.col("match_id") != F.col("query_id")))
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.round("sim", 6).alias("cosine_sim"), "rnk")
    )


# The Arrow/Pandas-UDF twin of similarity_cosine_topk: SAME oracle, so
# the vectorized-Python path is value-checked against DuckDB exactly
# like the JVM path. Exists to prove the numpy escape hatch (BLAS math,
# model scoring) without giving up the correctness gate.
from ..operators.vectorized import cosine_sim_udf  # noqa: E402


@register(
    "similarity_cosine_topk_pandas",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, match_id,
             list_cosine_similarity(qv, cv) AS sim
      FROM q, c
      WHERE query_id <> match_id
    )
    SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k with the similarity computed in an
    Arrow-batched pandas_udf (numpy einsum per batch) instead of
    zip_with/aggregate. Identical join/window plan around it — only the
    scoring expression leaves the JVM."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("match_id"), _as_double("embedding").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id", "match_id", cosine_sim_udf(F.col("qv"), F.col("cv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.round("sim", 6).alias("cosine_sim"), "rnk")
    )
