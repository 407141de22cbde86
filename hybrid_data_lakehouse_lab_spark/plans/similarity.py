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

from ..operators.util import FAN_OUT_MIN_BYTES, fan_out
from ..sources import load_table
from .registry import register

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors

#: Broadcast-side bound for the brute-force ground-truth scans. Their
#: cost is |queries| × |corpus| similarity evaluations plus a full
#: broadcast of the query vectors to every executor — linear-in-corpus
#: only while the query set is genuinely small. Past this bound the
#: caller wants the indexed path (similarity_ivf_kmeans_topk /
#: similarity_ivfpq_topk), whose per-query cost is one inverted list,
#: not one corpus scan. The registered lanes check their compile-time
#: constant (free); dynamic callers go through ``guard_query_set``.
MAX_BRUTE_FORCE_QUERIES = 10_000


def check_brute_force_bound(
    n_queries: int, cap: int = MAX_BRUTE_FORCE_QUERIES
) -> None:
    """Refuse a corpus-sized query set on the brute-force path."""
    if n_queries > cap:
        raise ValueError(
            f"brute-force cosine top-k is the ground-truth path for small "
            f"query sets (got > {cap} queries): each query scans the full "
            f"corpus and the query vectors are broadcast to every executor. "
            f"Use the indexed lanes instead (similarity_ivf_kmeans_topk / "
            f"similarity_ivfpq_topk)."
        )


def guard_query_set(
    q: DataFrame, cap: int = MAX_BRUTE_FORCE_QUERIES
) -> DataFrame:
    """Runtime guard for DYNAMIC query sets: probe at most cap+1 rows
    (limit-count, so the probe cost is bounded regardless of |q|), raise
    past the bound, otherwise return q unchanged for broadcasting."""
    n = q.limit(cap + 1).count()
    check_brute_force_bound(n, cap)
    return q

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
    candidates. Valid ONLY under the query-set bound — see
    MAX_BRUTE_FORCE_QUERIES / check_brute_force_bound.
    """
    check_brute_force_bound(N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    # size-gated fan_out on the STREAM side: the per-row dot products
    # are the lane's CPU bill and a single-row-group corpus scan would
    # run them on one core (the broadcast query side is untouched)
    c = fan_out(emb, min_bytes=FAN_OUT_MIN_BYTES).select(
        F.col("vec_id").alias("match_id"), _as_double("embedding").alias("cv")
    )
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
    scoring expression leaves the JVM. Same query-set bound as the JVM
    twin (see MAX_BRUTE_FORCE_QUERIES)."""
    check_brute_force_bound(N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    # same stream-side fan_out rationale as the JVM twin above
    c = fan_out(emb, min_bytes=FAN_OUT_MIN_BYTES).select(
        F.col("vec_id").alias("match_id"), _as_double("embedding").alias("cv")
    )
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


K_CLUSTERS = 8  # vec_id < 8 seed the clusters (ids are contiguous from 0)

_SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _kmeans_assign(e: DataFrame, cdf: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: corpus × broadcast centroids (k rows),
    argmin via struct-min (no window). Distances round at 1e-5 so the
    cross-engine float-summation jitter (~1e-13) cannot flip the argmin:
    near-ties become exact ties, broken by cluster id in both engines."""
    d = F.round(F.expr(_SQDIST.format(a="v", b="cv")), 5)
    return (
        e.crossJoin(F.broadcast(cdf))
        .select("vec_id", "v", "cluster", d.alias("d"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d", "cluster")).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vec_id", F.col("m.cluster").alias("cluster"), "v")
    )


def _kmeans_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster mean vector: explode dims → avg per (cluster, pos) →
    re-assemble ordered by pos. Coordinates round at 1e-6 so both engines
    continue from bit-identical centroids despite summation-order jitter.

    100 TB: the explode is 64× row inflation but map-side combine
    reduces each partition to ≤ k×64 partial sums before the one shuffle
    on (cluster, pos); the rebuilt centroid table is k rows."""
    dims = assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
    cd = dims.groupBy("cluster", "pos").agg(F.avg("x").alias("cx"))
    cv = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "cx"))),
        lambda s: F.round(s["cx"], 6),
    )
    # Materialize the k-row centroid table: the IVF lanes reference the
    # assignment relation from multiple join branches (query side,
    # corpus side, probe lists) and Spark would re-run the entire
    # training subtree per reference; with the trained state pinned,
    # each reference is one corpus scan + a broadcast join. Same
    # truncate-the-lineage pattern as the label-propagation rounds in
    # operators/graph.py.
    return cd.groupBy("cluster").agg(cv.alias("cv")).localCheckpoint()


# The kmeans assignment CTE chain, shared by the oracle of
# similarity_kmeans_clusters and similarity_ivf_kmeans_topk so the two
# stay in lockstep by construction.
_KMEANS_A1_SQL = f"""
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT vec_id, t.i AS pos, v[t.i] AS x
      FROM e, UNNEST(range(1, 65)) AS t(i)
    ),
    c0 AS (
      SELECT CAST(vec_id AS INT) AS cluster, v AS cv
      FROM e WHERE vec_id < {K_CLUSTERS}
    ),
    d0 AS (
      SELECT d.vec_id, c.cluster,
             round(sum((d.x - c.cv[d.pos]) * (d.x - c.cv[d.pos])), 5) AS d
      FROM dims d CROSS JOIN c0 c
      GROUP BY d.vec_id, c.cluster
    ),
    a0 AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM d0
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT a0.cluster, d.pos, round(avg(d.x), 6) AS cx
      FROM a0 JOIN dims d USING (vec_id)
      GROUP BY a0.cluster, d.pos
    ),
    d1 AS (
      SELECT d.vec_id, c.cluster,
             round(sum((d.x - c.cx) * (d.x - c.cx)), 5) AS d
      FROM dims d JOIN c1 c ON d.pos = c.pos
      GROUP BY d.vec_id, c.cluster
    ),
    a1 AS (
      SELECT vec_id, CAST(cluster AS INT) AS cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM d1
      ) WHERE rn = 1
    )
"""


@register(
    "similarity_kmeans_clusters",
    oracle=f"""
    WITH {_KMEANS_A1_SQL}
    SELECT vec_id, cluster FROM a1
    """,
)
def similarity_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic clustering for embedding-space dedup/mixing: k-means with
    deterministic seeding (the k lowest vec_ids) and two unrolled Lloyd
    iterations, entirely as DataFrame ops — no MLlib, no driver loop
    state. Downstream curation treats same-cluster members as
    near-duplicate candidates (the IVF lane reuses this shape for its
    coarse quantizer).

    Determinism contract (oracle pairs exactly): centroid coordinates
    round at 1e-6 after each mean, distances at 1e-5 before each argmin,
    ties broken by cluster id — so engine-specific float summation order
    cannot change any assignment.

    100 TB: per iteration, one broadcast of k centroids (never a shuffle
    of the corpus), one (cluster, pos)-keyed aggregate with map-side
    combine for the update. Iteration count is fixed (2) — convergence
    loops would re-plan per step; a production run would checkpoint
    centroids between steps exactly like the incremental-rollup lane.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    a0 = _kmeans_assign(e, c0)
    c1 = _kmeans_centroids(a0)
    a1 = _kmeans_assign(e, c1)
    return a1.select("vec_id", "cluster")


@register(
    "similarity_ivf_kmeans_topk",
    oracle=f"""
    WITH {_KMEANS_A1_SQL},
    q AS (
      SELECT a.vec_id AS query_id, a.cluster, e.v AS qv
      FROM a1 a JOIN e ON e.vec_id = a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT q.query_id, a.vec_id AS match_id,
             list_cosine_similarity(q.qv, ec.v) AS sim
      FROM q
      JOIN a1 a ON a.cluster = q.cluster AND a.vec_id <> q.query_id
      JOIN e ec ON ec.vec_id = a.vec_id
    )
    SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF ANN: the k-means lane is the coarse quantizer —
    train centroids (2 deterministic Lloyd steps), build the inverted
    lists (final assignment), then answer each query from ITS OWN
    cluster's list only (nprobe=1). This composes
    ``similarity_kmeans_clusters`` (quantizer) with the
    ``similarity_ivf_topk`` probe shape, replacing that lane's
    pre-labeled stand-in cluster key with learned clusters — the actual
    100 TB ANN architecture (train on a sample, assign corpus once,
    store lists cluster-partitioned, probe per query).

    100 TB plan shape: training/assignment never shuffles the corpus
    (k-row centroid broadcasts, (cluster,pos)-keyed map-side-combined
    update); the probe is one broadcast of the query set joined on the
    cluster key — per query, one inverted list is scanned instead of the
    corpus. Recall improves by probing the nprobe nearest centroid lists
    instead of 1; the join key set per query grows to nprobe, nothing
    else changes.

    Determinism: inherits the k-means rounding contract (centroids 1e-6,
    distances 1e-5, ties by cluster id), so both engines build identical
    inverted lists; cosine is rounded at 1e-6 after ranking on ties by
    match_id.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    a1 = _kmeans_assign(e, _kmeans_centroids(_kmeans_assign(e, c0)))
    q = a1.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster").alias("query_cluster"),
        F.col("v").alias("qv"),
    )
    c = a1.select(F.col("vec_id").alias("match_id"), "cluster", F.col("v").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("cluster") == F.col("query_cluster"))
            & (F.col("match_id") != F.col("query_id")),
        )
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.round("sim", 6).alias("cosine_sim"), "rnk")
    )


N_PROBE = 2

# Probe-cluster selection per query: top-`nprobe` nearest c1 centroids,
# from the d1 distance relation the k-means CTE chain already computes.
_PROBES_SQL = f"""
    probes AS (
      SELECT vec_id AS query_id, CAST(cluster AS INT) AS cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM d1 WHERE vec_id < {N_QUERIES}
      ) WHERE rn <= {N_PROBE}
    )
"""


@register(
    "similarity_ivf_nprobe_topk",
    oracle=f"""
    WITH {_KMEANS_A1_SQL},
    {_PROBES_SQL},
    q AS (
      SELECT p.query_id, p.cluster, e.v AS qv
      FROM probes p JOIN e ON e.vec_id = p.query_id
    ),
    scored AS (
      SELECT q.query_id, a.vec_id AS match_id,
             list_cosine_similarity(q.qv, ec.v) AS sim
      FROM q
      JOIN a1 a ON a.cluster = q.cluster AND a.vec_id <> q.query_id
      JOIN e ec ON ec.vec_id = a.vec_id
    )
    SELECT query_id, match_id, round(sim, 6) AS cosine_sim, rnk
    FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, match_id) AS INT) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def similarity_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query scans the inverted lists of its
    TWO nearest centroids instead of one — the standard recall knob
    (FAISS-style IVF probes, re-expressed as a relational plan). The
    probe set comes from the same rounded distance relation the
    quantizer's assignment uses, so both engines pick identical probe
    clusters (ties at 1e-5 break by cluster id).

    100 TB plan shape: identical to nprobe=1 — the broadcast query
    relation just carries nprobe rows per query, and the probe stays an
    equi-join on the cluster key (never an OR-join or cross product).
    Each corpus vector belongs to exactly one list, so candidates are
    naturally duplicate-free without a dropDuplicates shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    c1 = _kmeans_centroids(_kmeans_assign(e, c0))
    a1 = _kmeans_assign(e, c1)
    d = F.round(F.expr(_SQDIST.format(a="v", b="cv")), 5)
    wq = Window.partitionBy("query_id").orderBy("d", "cluster")
    probes = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(c1))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cluster", d.alias("d"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", F.col("cluster").alias("probe_cluster"), "qv")
    )
    c = a1.select(F.col("vec_id").alias("match_id"), "cluster", F.col("v").alias("cv"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    scored = (
        F.broadcast(probes)
        .join(
            c,
            (F.col("cluster") == F.col("probe_cluster"))
            & (F.col("match_id") != F.col("query_id")),
        )
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "match_id", F.round("sim", 6).alias("cosine_sim"), "rnk")
    )


@register(
    "similarity_ivf_recall_audit",
    oracle=f"""
    WITH {_KMEANS_A1_SQL},
    q AS (
      SELECT a.vec_id AS query_id, a.cluster, e.v AS qv
      FROM a1 a JOIN e ON e.vec_id = a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    ),
    exact_topk AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id
               ) AS rnk
        FROM q JOIN e c ON c.vec_id <> q.query_id
      ) WHERE rnk <= {TOP_K}
    ),
    ivf_topk AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, a.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, ec.v) DESC, a.vec_id
               ) AS rnk
        FROM q
        JOIN a1 a ON a.cluster = q.cluster AND a.vec_id <> q.query_id
        JOIN e ec ON ec.vec_id = a.vec_id
      ) WHERE rnk <= {TOP_K}
    )
    SELECT x.query_id,
           CAST(sum(CASE WHEN i.match_id IS NULL THEN 0 ELSE 1 END) AS INT) AS n_hits,
           round(sum(CASE WHEN i.match_id IS NULL THEN 0 ELSE 1 END) / {TOP_K}.0, 2)
             AS recall_at_{TOP_K}
    FROM exact_topk x
    LEFT JOIN ivf_topk i ON i.query_id = x.query_id AND i.match_id = x.match_id
    GROUP BY x.query_id
    """,
)
def similarity_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the nprobe=1 IVF index against brute-force ground
    truth — the measurement an ANN deployment runs before trusting the
    index (recall tells you whether k/nprobe are sized right for the
    corpus). Output is per-query: hits in the exact top-k and the
    recall fraction.

    100 TB shape: ground truth is only ever computed for the (small)
    query sample, so the brute-force side is the broadcast-query scan of
    the corpus the cosine-topk lane already uses; the IVF side reads one
    inverted list per query; the comparison joins two k-row-per-query
    relations. Grading the index costs one corpus scan per audit, not
    per query.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    a1 = _kmeans_assign(e, _kmeans_centroids(_kmeans_assign(e, c0)))
    q = a1.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster").alias("query_cluster"),
        F.col("v").alias("qv"),
    )
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    nq = F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
    nc = F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "match_id")

    def topk(scored: DataFrame) -> DataFrame:
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "match_id")
        )

    c_all = e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    exact = topk(
        F.broadcast(q)
        .crossJoin(c_all)
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    )
    c_ivf = a1.select(F.col("vec_id").alias("match_id"), "cluster", F.col("v").alias("cv"))
    ivf = topk(
        F.broadcast(q)
        .join(
            c_ivf,
            (F.col("cluster") == F.col("query_cluster"))
            & (F.col("match_id") != F.col("query_id")),
        )
        .select("query_id", "match_id", (dot / (nq * nc)).alias("sim"))
    ).withColumn("hit", F.lit(1))
    return (
        exact.join(ivf, ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("int").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(TOP_K)), 2).alias(f"recall_at_{TOP_K}"),
        )
    )


@register(
    "embedding_centroid_distance",
    oracle="""
    WITH ve AS (
        SELECT vec_id, label, i, embedding[i]::DOUBLE AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)),
    cent AS (SELECT label, i, avg(v) AS c FROM ve GROUP BY label, i),
    per_vec AS (
        SELECT ve.vec_id, ve.label,
               sum(ve.v * cent.c) AS dot,
               sqrt(sum(ve.v * ve.v)) AS nv,
               sqrt(sum(cent.c * cent.c)) AS nc
        FROM ve JOIN cent ON ve.label = cent.label AND ve.i = cent.i
        GROUP BY ve.vec_id, ve.label)
    SELECT label,
           count(*) AS n_vectors,
           round(avg(dot / (nv * nc)), 4) AS avg_cosine,
           round(min(dot / (nv * nc)), 4) AS min_cosine
    FROM per_vec GROUP BY label
    """,
)
def embedding_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-cohesion audit: full-dimension per-label centroids, then
    each vector's cosine to its own centroid, aggregated per label — the
    "is this label/cluster internally consistent" check an embedding-dedup
    or mixing pipeline runs before trusting cluster-level decisions.

    100 TB plan shape: the centroid pass posexplodes to (label, pos) but
    map-side combine collapses each partition to |labels|×dim partial sums
    before the only shuffle, so the exchange is tiny regardless of corpus
    size. The per-vector cosine pass never explodes: centroids come back
    as a broadcast array per label, and the dot/norm reductions run inside
    one codegen projection via zip_with + aggregate (sequential in-order
    folds — deterministic). Only the final |labels|-row aggregate shuffles.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "label", F.posexplode(_as_double("embedding")).alias("pos", "v")
    )
    cent = (
        vals.groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    vd = _as_double("embedding")
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)  # noqa: E731
    dot = fold(F.zip_with(vd, F.col("centroid"), lambda a, b: a * b))
    nv = F.sqrt(fold(F.transform(vd, lambda a: a * a)))
    nc = F.sqrt(fold(F.transform(F.col("centroid"), lambda c: c * c)))
    cos = (dot / (nv * nc)).alias("cos")
    return (
        emb.join(F.broadcast(cent), "label")
        .select("label", cos)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cos"), 4).alias("avg_cosine"),
            F.round(F.min("cos"), 4).alias("min_cosine"),
        )
    )


MRL_DIMS = (8, 16, 32)  # truncation depths audited against full-dim truth


@register(
    "similarity_mrl_truncation_audit",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
    ),
    exact_topk AS (
      SELECT query_id, match_id FROM (
        SELECT q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_cosine_similarity(q.qv, c.v), 6) DESC,
                          c.vec_id
               ) AS rnk
        FROM q JOIN e c ON c.vec_id <> q.query_id
      ) WHERE rnk <= {TOP_K}
    ),
    dims AS (SELECT unnest([{", ".join(str(d) for d in MRL_DIMS)}]) AS trunc_dim),
    trunc_topk AS (
      SELECT trunc_dim, query_id, match_id FROM (
        SELECT d.trunc_dim, q.query_id, c.vec_id AS match_id,
               row_number() OVER (
                 PARTITION BY d.trunc_dim, q.query_id
                 ORDER BY round(list_cosine_similarity(
                            q.qv[1:d.trunc_dim], c.v[1:d.trunc_dim]), 6) DESC,
                          c.vec_id
               ) AS rnk
        FROM dims d, q JOIN e c ON c.vec_id <> q.query_id
      ) WHERE rnk <= {TOP_K}
    )
    SELECT x.trunc_dim, x.query_id,
           CAST(sum(CASE WHEN t.match_id IS NULL THEN 0 ELSE 1 END) AS INT) AS n_hits,
           round(sum(CASE WHEN t.match_id IS NULL THEN 0 ELSE 1 END) / {TOP_K}.0, 2)
             AS recall_at_{TOP_K}
    FROM (SELECT d.trunc_dim, x.query_id, x.match_id
          FROM dims d, exact_topk x) x
    LEFT JOIN trunc_topk t
      ON t.trunc_dim = x.trunc_dim AND t.query_id = x.query_id
     AND t.match_id = x.match_id
    GROUP BY x.trunc_dim, x.query_id
    """,
)
def similarity_mrl_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit (Kusupati et al. 2022,
    MRL): retrieve with only the FIRST d dimensions (d ∈ 8/16/32 of 64)
    and measure recall@10 against full-dimension ground truth, all depths
    in one pass (the pq_refine_sensitivity sweep shape). This completes
    the embedding-compression family — int8 (4×), PQ codes (32×), and
    prefix truncation (the dimension-reduction axis serving systems
    actually tune) — with the measurement that says which depth is safe.

    Determinism: similarities round at 1e-6 BEFORE ranking with vec_id
    tie-break, so summation jitter cannot flip a shortlist.

    Honest result on the gate corpus: mean recall@10 is 0.08/0.18/0.32
    at d=8/16/32 — the synthetic embeddings are isotropic, so NO prefix
    carries concentrated signal (the same honesty as the residual-PQ
    finding in ROUND4.md). That is the audit doing its job: it tells a
    deployment that these embeddings were not MRL-trained and prefix
    truncation is unsafe; on true Matryoshka embeddings the same lane
    certifies the safe depth.

    100 TB: the query set is broadcast and the corpus streams ONCE; the
    3-row depth table multiplies only the broadcast side's scored pairs,
    never the corpus scan. Truncated scoring reads d/64ths of each
    vector's bytes — at serving time the prefix slice IS the I/O saving.
    """
    check_brute_force_bound(N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))

    def topk(scored, part_cols):
        w = Window.partitionBy(*part_cols).orderBy(F.desc("sim"), "match_id")
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .drop("rnk", "sim")
        )

    full_sim = F.round(
        F.expr(_DOT.format(a="qv", b="cv"))
        / (
            F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
            * F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
        ),
        6,
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
    )
    exact = topk(pairs.select("query_id", "match_id", full_sim.alias("sim")), ["query_id"])

    dims = F.explode(F.array(*[F.lit(d) for d in MRL_DIMS])).alias("trunc_dim")
    tq = "slice(qv, 1, trunc_dim)"
    tc = "slice(cv, 1, trunc_dim)"
    t_sim = F.round(
        F.expr(_DOT.format(a=tq, b=tc))
        / (
            F.sqrt(F.expr(_DOT.format(a=tq, b=tq)))
            * F.sqrt(F.expr(_DOT.format(a=tc, b=tc)))
        ),
        6,
    )
    trunc = topk(
        pairs.select("query_id", "match_id", "qv", "cv", dims)
        .select("trunc_dim", "query_id", "match_id", t_sim.alias("sim")),
        ["trunc_dim", "query_id"],
    )
    expanded_exact = exact.select(
        "query_id", "match_id", F.explode(F.array(*[F.lit(d) for d in MRL_DIMS])).alias("trunc_dim")
    )
    hits = F.sum(F.when(F.col("hit").isNull(), 0).otherwise(1))
    return (
        expanded_exact.join(
            trunc.withColumn("hit", F.lit(1)),
            ["trunc_dim", "query_id", "match_id"],
            "left",
        )
        .groupBy("trunc_dim", "query_id")
        .agg(
            hits.cast("int").alias("n_hits"),
            F.round(hits / TOP_K, 2).alias(f"recall_at_{TOP_K}"),
        )
    )


N_HARD_NEG = 5  # hardest negatives mined per anchor


@register(
    "similarity_hard_negatives",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (
      SELECT vec_id AS anchor_id, label AS anchor_label, v AS qv
      FROM e WHERE vec_id < {N_QUERIES}
    )
    SELECT anchor_id, neg_id, neg_label, sim, rnk
    FROM (
      SELECT q.anchor_id, c.vec_id AS neg_id, c.label AS neg_label,
             round(list_cosine_similarity(q.qv, c.v), 6) AS sim,
             CAST(row_number() OVER (
               PARTITION BY q.anchor_id
               ORDER BY round(list_cosine_similarity(q.qv, c.v), 6) DESC,
                        c.vec_id) AS INT) AS rnk
      FROM q JOIN e c
        ON c.vec_id <> q.anchor_id AND c.label <> q.anchor_label
    ) WHERE rnk <= {N_HARD_NEG}
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / retrieval training: for
    each anchor, the top-{N_HARD_NEG} most-similar vectors with a
    DIFFERENT label — the highest-loss negatives a triplet or InfoNCE
    batch wants (random negatives are trivially easy; training signal
    lives in these). The label column is the supervision the embeddings
    table carries.

    Determinism: cosine rounds at 1e-6 before the rank, ties by vec_id.

    100 TB: anchors broadcast, corpus streamed once with the label
    inequality applied during the scan (no shuffle of the embedding
    column); per-anchor top-k is the same WindowGroupLimit partial top-k
    every topk lane compiles to. Mining for ALL anchors (not a sample)
    is the IVF composition: probe each anchor's cluster list and mine
    within it — the similarity_ivf_kmeans_topk shape plus the label
    filter.
    """
    check_brute_force_bound(N_QUERIES)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _as_double("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("v").alias("cv"),
    )
    sim = F.round(
        F.expr(_DOT.format(a="qv", b="cv"))
        / (
            F.sqrt(F.expr(_DOT.format(a="qv", b="qv")))
            * F.sqrt(F.expr(_DOT.format(a="cv", b="cv")))
        ),
        6,
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("neg_label") != F.col("anchor_label"))
        )
        .select("anchor_id", "neg_id", "neg_label", sim.alias("sim"))
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("sim"), "neg_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= N_HARD_NEG)
    )


def kmeans_a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final (vec_id, cluster, v) assignment relation of the shared
    deterministic k-means chain — the Spark twin of ``_KMEANS_A1_SQL``,
    reused by SemDeDup and the cap audit so consumers cannot drift."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double("embedding").alias("v"))
    c0 = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )
    return _kmeans_assign(e, _kmeans_centroids(_kmeans_assign(e, c0)))
