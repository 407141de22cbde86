"""A PySpark-native analytics engine with the query and data-processing
capabilities of the reference lakehouse lab (Shixi99/Hybrid-Data-Lakehouse-Lab).

The reference is an integration of five systems (Debezium CDC, Flink SQL
streaming, Pinot OLAP, Spark SCD2-over-Iceberg, Trino federation). This
package re-expresses *what those systems compute* — the CDC data model,
stream routing, SCD2 merge semantics, the current-state/history duality,
time travel, and the analytical query surface — as one idiomatic Spark
stack: DataFrame/SQL + Structured Streaming + parquet tables with a
snapshot manifest for time travel.

Layout:
    session     SparkSession factory tuned for local[N] test / cluster prod
    schemas     canonical StructTypes (CDC envelope, scd2, checkpoint, ...)
    sources     table loaders / view registration over the testdata parquet
    functions   scalar helpers (record hash, epoch decode, op decode, ...)
    operators   CDC flatten/route, SCD2 build + merge, dedup, text,
                similarity, multimodal
    plans       the named query registry (queries() + oracle_sql() pairs)
    streaming   Structured Streaming lanes (bronze writer, upsert, history)
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
