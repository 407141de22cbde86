"""SQL surface — the Trino-role entry point: register every table and
serving view once, then answer raw ANSI SQL with `spark.sql`.

The reference serves analysts two SQL doors (Trino federated SQL over
Iceberg, Pinot query console over the realtime tables — README.MD
architecture diagram); in a one-engine stack both collapse to Spark SQL
over registered views. Views are lazy logical plans, so registering
costs nothing and every query through them still gets full Catalyst
optimization (pushdown through the view into the parquet scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view; returns the names.
    Re-registration is idempotent (replace semantics)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL door: ensure views exist, run the query."""
    register_views(spark, sf_dir)
    return spark.sql(query)
