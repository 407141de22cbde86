"""Connected components — label propagation on a DataFrame edge list.

The near-dup pair graph needs CLUSTERS (keep one doc per component),
not just pairs: greedy per-pair drops can over- or under-delete when
duplicates chain (a~b, b~c but not a~c). Spark has no built-in CC
(GraphFrames is an external package); this is the iterative-join form:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each iteration is one join + one aggregation —
fully distributed; the driver only checks the convergence counter.
Iterations are bounded by the graph diameter (near-dup clusters are
shallow — a handful of rounds). `localCheckpoint` truncates the plan
each round: without it the lineage doubles per iteration and planning
time, not compute, becomes the bottleneck.

At 100 TB scale the same loop runs with edges pre-partitioned by node
id so each round's join reuses the partitioning; the alternating
small-star/large-star optimization (Kiveris et al.) halves rounds on
high-diameter graphs — not needed for dedup clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node in the edge list; component is
    the smallest node id reachable from the node. Deterministic.
    """
    undirected = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        undirected.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            undirected.join(labels, undirected.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
