"""Driver-visible bucketed-layout round-trip: write both fact tables
bucketed+sorted on the join key, run the co-located sort-merge join
(zero Exchange — asserted structurally in tests/test_scale_toolkit.py),
and value-check the result against the plain declarative join.

This is the one-time-layout-cost / every-run-shuffle-savings trade
SCALE.md prescribes for the orders ⋈ lineitem join at 100 TB, executed
end-to-end inside a registered query so the external gate proves the
bucketed path computes the same answer as the unbucketed one.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.bucketing import colocated_join, write_bucketed
from .registry import register


@register(
    "bucketed_join_roundtrip",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           count(*) AS n_lines,
           round(sum(l_extendedprice), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write (8 buckets, sorted on the key) → co-located SMJ →
    per-year revenue. The tiny final collect (|years| rows) lets the
    scratch tables be dropped before returning; the bucketed write and
    join run distributed.
    """
    uid = uuid.uuid4().hex[:8]
    lt, rt = f"b_orders_{uid}", f"b_lineitem_{uid}"
    tmp = tempfile.mkdtemp(prefix="bucketed_rt_")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate"
        )
        lineitem = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        write_bucketed(
            orders, lt, ["o_orderkey"], 8, os.path.join(tmp, "o"),
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            rt, ["o_orderkey"], 8, os.path.join(tmp, "l"),
            sort_cols=["o_orderkey"],
        )
        got = (
            colocated_join(spark, lt, rt, ["o_orderkey"])
            .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            )
            .collect()
        )
        rows = [(r["order_year"], r["n_lines"], float(r["revenue"])) for r in got]
    finally:
        for t in (lt, rt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "order_year INT, n_lines BIGINT, revenue DOUBLE"
    )


@register(
    "compaction_roundtrip",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction proven lossless under the value gate: write
    the events table dt-partitioned as MANY small files (8 per
    partition), compact every partition to one file via the
    temp-rewrite-and-swap pass, read the compacted directory back, and
    value-check per-partition counts and sums against the source. The
    oracle never sees the file layout — a hash match means compaction
    changed bytes-on-disk organization and nothing else.
    """
    from ..operators.maintenance import compact_partition_dir

    ev = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    tmp = tempfile.mkdtemp(prefix="compact_rt_")
    try:
        path = os.path.join(tmp, "t")
        ev.repartition(8).write.partitionBy("dt").parquet(path)
        compact_partition_dir(spark, path)
        after = spark.read.parquet(path)
        got = (
            after.groupBy("dt")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        )
        rows = [(r["dt"], r["n"], float(r["total_value"])) for r in got]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "dt STRING, n BIGINT, total_value DOUBLE"
    )


@register(
    "schema_evolution_roundtrip",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           count(*) AS n,
           count(o_orderpriority) AS n_with_priority
    FROM (
        SELECT o_orderdate, NULL AS o_orderpriority
        FROM orders WHERE o_orderdate <  DATE '1995-01-01'
        UNION ALL
        SELECT o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate >= DATE '1995-01-01')
    GROUP BY 1
    """,
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-only schema evolution proven under the value gate: batch 1 is
    written WITHOUT the o_orderpriority column, batch 2 (later orders) WITH it;
    a mergeSchema read of the mixed directory must surface the unified
    schema with the old rows NULL-backfilled — exactly the Delta/Iceberg
    add-column contract the SCD2 pipeline documents. The oracle states
    the expected union declaratively.
    """
    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1995-01-01").cast("date")
    tmp = tempfile.mkdtemp(prefix="evolve_rt_")
    try:
        path = os.path.join(tmp, "t")
        orders.filter(F.col("o_orderdate") < cut).select(
            "o_orderkey", "o_orderdate"
        ).write.mode("append").parquet(path)
        orders.filter(F.col("o_orderdate") >= cut).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ).write.mode("append").parquet(path)
        got = (
            spark.read.option("mergeSchema", "true")
            .parquet(path)
            .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("o_orderpriority").alias("n_with_priority"),
            )
            .collect()
        )
        rows = [(r["order_year"], r["n"], r["n_with_priority"]) for r in got]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "order_year INT, n BIGINT, n_with_priority BIGINT"
    )


@register(
    "format_interop_roundtrip",
    oracle="""
    SELECT fmt,
           count(*) AS n_rows,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           max(epoch_us(ts)) AS max_ts_us
    FROM events
    CROSS JOIN (SELECT unnest(['csv', 'json', 'orc']) AS fmt)
    GROUP BY fmt
    """,
)
def format_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format interop: write the events fact to CSV (with header),
    JSON lines, and ORC; read each back with an explicit schema; prove
    every format round-trips losslessly (row count, cent-exact value sum,
    max event time in microseconds must all equal the parquet truth the
    oracle states). Timestamps travel as unix_micros BIGINT — the
    format-agnostic representation — so the check isolates the FORMAT
    plumbing (headers, schema-on-read, encoding) from timestamp-format
    dialects; doubles round-trip CSV via Spark's shortest-roundtrip
    float printing and are checked cent-exact after the read.

    100 TB: each write/read is one distributed pass per format;
    schema-on-read with an explicit schema avoids the inference scan
    (inference = a full extra pass on CSV/JSON at scale). Columnar ORC
    keeps pushdown; row formats are the interchange path, not the query
    path — which is exactly what this lane demonstrates end-to-end.
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    schema = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts_us BIGINT"
    tmp = tempfile.mkdtemp(prefix="fmt_rt_")
    rows = []
    try:
        for fmt in ["csv", "json", "orc"]:
            path = os.path.join(tmp, fmt)
            w = ev.write.mode("overwrite").format(fmt)
            if fmt == "csv":
                w = w.option("header", "true")
            w.save(path)
            r = spark.read.schema(schema).format(fmt)
            if fmt == "csv":
                r = r.option("header", "true")
            back = r.load(path)
            agg = back.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "value_cents"
                ),
                F.max("ts_us").alias("max_ts_us"),
            ).collect()[0]
            rows.append((fmt, agg["n_rows"], agg["value_cents"], agg["max_ts_us"]))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows), "fmt STRING, n_rows BIGINT, value_cents BIGINT, max_ts_us BIGINT"
    )
