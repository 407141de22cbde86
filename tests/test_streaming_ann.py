"""Streaming IVF maintenance: stream-assigned inverted lists must equal
the batch assignment exactly, survive replay, and land cluster-
partitioned on disk."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from hybrid_data_lakehouse_lab_spark.plans.similarity import (
    K_CLUSTERS,
    _kmeans_assign,
)
from hybrid_data_lakehouse_lab_spark.sources import load_table
from hybrid_data_lakehouse_lab_spark.streaming.lanes import (
    embedding_assign_stream,
    read_inverted_lists,
)

from conftest import SF_DIR  # single source of truth for the gate corpus

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _trained_centroids(spark):
    """Seed centroids from the k lowest vec_ids (the deterministic
    contract the batch k-means lanes use)."""
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    return e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("cv")
    )


def _write_batch(drop_dir, rows, name):
    with open(drop_dir / name, "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")


def _run(spark, drop_dir, tmp_path):
    vectors = spark.readStream.schema(SCHEMA).json(str(drop_dir))
    q = embedding_assign_stream(
        vectors,
        str(tmp_path / "centroids"),
        str(tmp_path / "lists"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)


def test_stream_assignment_equals_batch(spark, tmp_path):
    cdf = _trained_centroids(spark)
    cdf.write.parquet(str(tmp_path / "centroids"))

    rows = [
        (r["vec_id"], r["embedding"])
        for r in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") < 40)
        .collect()
    ]
    drop = tmp_path / "drop"
    drop.mkdir()
    _write_batch(drop, rows[:20], "b0.json")
    _run(spark, drop, tmp_path)
    _write_batch(drop, rows[20:], "b1.json")
    _run(spark, drop, tmp_path)

    streamed = {
        (r["vec_id"], r["cluster"])
        for r in read_inverted_lists(spark, str(tmp_path / "lists")).collect()
    }
    e = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 40).select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    batch = {
        (r["vec_id"], r["cluster"]) for r in _kmeans_assign(e, cdf).collect()
    }
    assert streamed == batch
    assert len(streamed) == 40

    # layout: cluster-partitioned directories => probe = partition pruning
    parts = [
        p for p in os.listdir(tmp_path / "lists") if p.startswith("cluster=")
    ]
    assert parts, "inverted lists must be cluster-partitioned on disk"

    # replay: re-run the same drop dir with a fresh checkpoint — identical
    # rows re-append; the dedup read must not change
    _run_again = embedding_assign_stream(
        spark.readStream.schema(SCHEMA).json(str(drop)),
        str(tmp_path / "centroids"),
        str(tmp_path / "lists"),
        str(tmp_path / "ckpt2"),
    )
    _run_again.awaitTermination(120)
    replayed = {
        (r["vec_id"], r["cluster"])
        for r in read_inverted_lists(spark, str(tmp_path / "lists")).collect()
    }
    assert replayed == batch
