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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.util import bucket_pairs
from ..sources import load_table
from .registry import register


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase pair relation (pa < pb, n_both) — ONE definition of
    what an edge of the part co-occurrence graph is, shared by the
    basket-lift, pagerank, and triangle lanes so they cannot disagree
    about the graph. One shuffle of the distinct (order, part)
    projection on the order key; pair expansion inside codegen
    (bucket_pairs)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    return (
        bucket_pairs(op, ["l_orderkey"], "l_partkey", [])
        .groupBy(F.col("a.id").alias("pa"), F.col("b.id").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )


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
        _copurchase_pairs(spark, sf_dir)
        .select(
            F.col("pa").alias("part_a"), F.col("pb").alias("part_b"), "n_both"
        )
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


# Damping factor / iterations for the PageRank lane. Two UNROLLED
# iterations (like similarity_kmeans_clusters' Lloyd steps): convergence
# loops would re-plan per step; a production run checkpoints ranks
# between steps exactly like the incremental-rollup lane.
PR_DAMPING = 0.85
# Teleport mass is DERIVED from the damping factor (rounded away from
# float artifacts of 1-0.85); both the Spark step and the oracle SQL
# interpolate these same two constants.
PR_TELEPORT = round(1 - PR_DAMPING, 10)


@register(
    "parts_pagerank",
    # One constant drives BOTH engines: damping is interpolated and the
    # teleport mass is derived as (1 - damping), so editing PR_DAMPING
    # cannot desync the oracle from the Spark plan (ADVICE r2).
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    prs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2),
    edges AS (SELECT src, dst FROM prs
              UNION ALL SELECT dst, src FROM prs),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT count(*) AS n FROM deg),
    pr0 AS (SELECT src AS node, 1.0 / (SELECT n FROM n) AS pr FROM deg),
    c1 AS (
        SELECT e.dst AS node, sum(p.pr / d.deg) AS s
        FROM edges e
        JOIN pr0 p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst),
    pr1 AS (SELECT node, {PR_TELEPORT} / (SELECT n FROM n)
                         + {PR_DAMPING} * s AS pr FROM c1),
    c2 AS (
        SELECT e.dst AS node, sum(p.pr / d.deg) AS s
        FROM edges e
        JOIN pr1 p ON e.src = p.node
        JOIN deg d ON e.src = d.src
        GROUP BY e.dst)
    SELECT node, round({PR_TELEPORT} / (SELECT n FROM n)
                       + {PR_DAMPING} * s, 6) AS pagerank
    FROM c2
    """,
)
def parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 unrolled iterations, d=0.85) over the undirected part
    co-occurrence graph — "which parts anchor the catalog": the iterative
    graph-algorithm family (beyond connected components) expressed as
    pure DataFrame joins.

    100 TB plan shape: edge construction is the market-basket
    ``bucket_pairs`` pass (one shuffle on the order key, intra-basket
    expansion in codegen); each iteration is one edges⋈ranks hash join
    keyed on the node id plus a node-keyed aggregate — the degree table
    rides along in the same join, and the rank table is |nodes| rows
    (vocabulary-sized, broadcast by AQE). The 1/N teleport scalar is a
    1-row broadcast gate (allowlisted BNLJ, like tf-idf's doc count).
    """
    prs = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    )
    # Pin the edge relation: it is referenced from five join branches
    # (degree table, both iterations' joins, the rank seed) and Spark
    # re-runs the whole basket-pair subtree per reference (measured 16
    # fact scans unpinned). Caching edges is what every iterative graph
    # engine does; same lineage-truncation pattern as operators/graph.py.
    edges = prs.unionByName(
        prs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))

    def step(pr: DataFrame) -> DataFrame:
        return (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("s"))
            .join(F.broadcast(n))
            .select(
                "node",
                ((PR_TELEPORT) / F.col("n") + PR_DAMPING * F.col("s")).alias(
                    "pr"
                ),
            )
        )

    pr0 = deg.join(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n")).alias("pr")
    )
    pr2 = step(step(pr0))
    return pr2.select("node", F.round("pr", 6).alias("pagerank"))


@register(
    "supplier_revenue_pareto",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS r
        FROM lineitem GROUP BY l_suppkey),
    tot AS (SELECT sum(r) AS t FROM rev),
    deciled AS (
        SELECT l_suppkey, r, ntile(10) OVER (ORDER BY r DESC, l_suppkey) AS decile
        FROM rev)
    SELECT decile,
           count(*) AS n_suppliers,
           round(sum(r), 2) AS revenue,
           round(sum(r) / (SELECT t FROM tot), 6) AS revenue_share
    FROM deciled GROUP BY decile
    """,
)
def supplier_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto) report: suppliers ranked into
    revenue deciles with each decile's share of total — the "do 10% of
    suppliers carry 80% of revenue" audit.

    100 TB: the fact collapses to one row per supplier in the first
    aggregate (map-side partials, one shuffle); the ntile window is
    GLOBAL but over the post-aggregate |suppliers| relation — the same
    provably-small exception as quality_user_spend_quartiles (allowlisted
    with it). The total is a 1-row broadcast gate. Deterministic ntile
    tie-break on (revenue DESC, suppkey).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("t"))
    deciled = rev.withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.col("r").desc(), F.col("l_suppkey").asc())
        ),
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("r"), 2).alias("revenue"),
            F.sum("r").alias("_raw"),
        )
        .join(F.broadcast(tot))
        .select(
            "decile",
            "n_suppliers",
            "revenue",
            F.round(F.col("_raw") / F.col("t"), 6).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# Triangle census over the co-purchase graph — the classic distributed
# graph-analytics kernel (clustering coefficient = how clique-ish the
# product graph is; the signal behind "frequently bought together"
# neighborhoods).
# ---------------------------------------------------------------------------
@register(
    "parts_triangle_census",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.pa = e1.pb
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    deg AS (
        SELECT part, count(*) AS d FROM (
            SELECT pa AS part FROM edges
            UNION ALL SELECT pb FROM edges
        ) GROUP BY part
    ),
    wed AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg),
    ecnt AS (SELECT count(*) AS n_edges FROM edges)
    SELECT CAST(ecnt.n_edges AS BIGINT) AS n_edges,
           CAST(wed.n_wedges AS BIGINT) AS n_wedges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           round(3.0 * tri.n_triangles / wed.n_wedges, 6)
             AS global_clustering_coeff
    FROM ecnt CROSS JOIN wed CROSS JOIN tri
    """,
)
def parts_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge/wedge/triangle counts and the global clustering coefficient
    of the support>=2 co-purchase graph. Triangles are enumerated with
    the ordered-edge (a<b<c) join — each triangle counted exactly once,
    no orientation dedup pass: wedges (a<b, b<c) close iff (a,c) is an
    edge.

    100 TB plan shape: the standard distributed triangle kernel — two
    hash joins on single node keys over the EDGE relation (already
    support-thresholded, far smaller than the fact); the ordering
    constraint means each edge's heavier endpoint never fans out, which
    is what keeps skewed hub nodes from exploding the wedge join. Wedge
    counts come from the degree relation (map-side combine), not from
    materializing wedges.
    """
    # Pinned for the same reason as parts_pagerank: the edge relation
    # feeds six branches (wedge join twice, closure probe, degree,
    # edge count) and would re-run the basket-pair subtree per branch.
    edges = (
        _copurchase_pairs(spark, sf_dir)
        .filter(F.col("n_both") >= 2)
        .select("pa", "pb")
        .localCheckpoint()
    )
    e1 = edges
    e2 = edges.select(F.col("pa").alias("pb"), F.col("pb").alias("pc"))
    wedges = e1.join(e2, "pb")
    tri = wedges.join(
        edges.select(F.col("pa"), F.col("pb").alias("pc")), ["pa", "pc"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        edges.select(F.col("pa").alias("part"))
        .unionAll(edges.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wed = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    ecnt = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        ecnt.join(F.broadcast(wed))
        .join(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("global_clustering_coeff"),
        )
    )
