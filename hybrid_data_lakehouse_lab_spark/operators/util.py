"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for CPU-heavy downstream work.

    A small parquet file scans as ONE partition (maxPartitionBytes), which
    serializes expression-heavy lanes (hashing, shingling, regex) onto one
    core. Repartition up only when the scan is narrower than the cluster —
    at real scale inputs already have thousands of splits and this is a
    no-op (no shuffle added).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Decide from the driver-side file listing, NOT df.rdd.getNumPartitions():
    # the .rdd probe forces a plan-to-RDD physical conversion per call. A scan
    # with >= target input files already parallelizes; at real scale (thousands
    # of splits) this branch makes fan_out a no-op with no shuffle added.
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target)


def bucket_pairs(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    keep_bucket_cols: bool = False,
) -> DataFrame:
    """All intra-bucket pairs (a.id < b.id), computing the input ONCE.

    The naive LSH candidate join is a self-join of the signature relation,
    which Spark plans as two full computations of the signature subtree
    (no exchange reuse across join sides). This operator instead groups
    rows per bucket and generates pairs inside the bucket with
    higher-order array functions — one pass over the input, one shuffle
    on the bucket key, pair expansion entirely inside codegen.

    Output columns: a, b — structs of (id, *payload_cols); with
    keep_bucket_cols=True the bucket key columns are kept alongside
    (multi-band LSH uses them to suppress cross-band duplicate pairs
    with a predicate instead of a dropDuplicates shuffle).

    Scale: per-bucket work is O(bucket²); LSH bucket sizes are small by
    construction. A degenerate corpus (constant documents) would need a
    bucket-size cap / salt before the pair expansion — apply
    `.filter(size(items) <= CAP)` upstream of explode if that arises.
    """
    from pyspark.sql import functions as F

    item = F.struct(F.col(id_col).alias("id"), *[F.col(c) for c in payload_cols])
    grouped = (
        df.groupBy(*[F.col(c) for c in bucket_cols])
        .agg(F.array_sort(F.collect_list(item)).alias("items"))
        .filter(F.size("items") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(items, (x, i) -> "
        "transform(slice(items, i + 2, size(items)), y -> struct(x AS a, y AS b))))"
    )
    keep = list(bucket_cols) if keep_bucket_cols else []
    return grouped.select(*keep, F.explode(pairs).alias("p")).select(
        *keep, "p.a", "p.b"
    )
