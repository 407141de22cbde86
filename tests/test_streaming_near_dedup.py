"""Streaming near-duplicate gate: minhash-LSH screening of each
micro-batch against the persistent signature index (streaming twin of
dedup_near_pairs_lsh)."""

from __future__ import annotations

import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from hybrid_data_lakehouse_lab_spark.streaming.lanes import near_dedup_stream

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

T1 = "spark shuffles the fact table once and broadcasts every small dimension"
T2 = "window functions rank rows inside each partition without a global sort"
T3 = "checkpointed streams replay from the last committed micro batch offset"
# near-copy of T2: one word changed in the middle
T2_NEAR = "window functions rank rows beside each partition without a global sort"
T4 = "bucketed tables join with zero exchange when bucket specs line up"


def _write_batch(drop_dir, rows, name):
    with open(drop_dir / name, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run(spark, drop_dir, tmp_path):
    docs = spark.readStream.schema(SCHEMA).json(str(drop_dir))
    q = near_dedup_stream(
        docs,
        str(tmp_path / "out"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)


def test_near_dedup_stream_drops_copies_keeps_fresh(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()

    _write_batch(drop, [(1, T1), (2, T2), (3, T3)], "b0.json")
    _run(spark, drop, tmp_path)
    out = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert out == {1, 2, 3}
    index = spark.read.parquet(str(tmp_path / "index"))
    assert index.count() == 3 * 8  # one signature row per (doc, seed)

    # batch 2: exact copy of T1, near-copy of T2, fresh T4 plus its
    # intra-batch exact copy (higher id must lose)
    _write_batch(
        drop, [(10, T1), (11, T2_NEAR), (12, T4), (13, T4)], "b1.json"
    )
    _run(spark, drop, tmp_path)
    out = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert 10 not in out  # exact copy: all 8 bands collide with doc 1
    assert 11 not in out  # near copy: >= 3 bands collide with doc 2
    assert 12 in out  # fresh text admitted
    assert 13 not in out  # intra-batch duplicate of 12: higher id dropped
    # only admitted docs extend the index
    index = spark.read.parquet(str(tmp_path / "index"))
    assert set(index.select("doc_id").distinct().toPandas()["doc_id"]) == {
        1,
        2,
        3,
        12,
    }
