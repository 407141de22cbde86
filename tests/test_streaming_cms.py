"""Streaming count-min sketch: the stream-merged counter grid must
equal the batch-computed grid exactly (CMS merges are lossless), and a
replayed epoch must not inflate counts."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hybrid_data_lakehouse_lab_spark.plans.sketches import CMS_D, _bucket_spark
from hybrid_data_lakehouse_lab_spark.streaming.lanes import (
    heavy_hitters_stream,
    read_cms_counters,
    write_epoch_grid,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox naps under the warm sun"),
    (3, "spark shuffles the fact table once per stage"),
    (4, "sketch counters merge by addition across batches"),
]


def _write_batch(drop_dir, rows, name):
    with open(drop_dir / name, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run(spark, drop_dir, tmp_path):
    docs = spark.readStream.schema(SCHEMA).json(str(drop_dir))
    q = heavy_hitters_stream(
        docs, str(tmp_path / "counters"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)


def _batch_grid(spark):
    rows = F.array(*[F.lit(i) for i in range(CMS_D)])
    return (
        spark.createDataFrame(DOCS, SCHEMA)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .select("term", F.explode(rows).alias("i"))
        .select("i", _bucket_spark("term", "i"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _as_dict(df):
    return {(r["i"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_stream_merged_grid_equals_batch_grid(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    _write_batch(drop, DOCS[:2], "b0.json")
    _run(spark, drop, tmp_path)
    _write_batch(drop, DOCS[2:], "b1.json")
    _run(spark, drop, tmp_path)

    merged = _as_dict(read_cms_counters(spark, str(tmp_path / "counters")))
    batch = _as_dict(_batch_grid(spark))
    assert merged == batch


def test_replayed_epoch_does_not_inflate(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    _write_batch(drop, DOCS, "b0.json")
    _run(spark, drop, tmp_path)

    # simulate an at-least-once replay through the REAL writer path:
    # re-landing epoch 0's grid overwrites its partition, not appends
    counters = str(tmp_path / "counters")
    write_epoch_grid(
        _batch_grid(spark).withColumn("epoch", F.lit(0)), counters
    )

    merged = _as_dict(read_cms_counters(spark, counters))
    batch = _as_dict(_batch_grid(spark))
    assert merged == batch


def test_reemitted_epoch_with_different_contents_replaces(spark, tmp_path):
    """The failure mode the append+max() reader got WRONG: an epoch
    re-emitted with DIFFERENT contents (e.g. a foreachBatch retry after
    a partial upstream fix) must replace the old grid outright, not be
    element-wise max-merged with it."""
    counters = str(tmp_path / "counters")

    def grid_of(docs):
        rows = F.array(*[F.lit(i) for i in range(CMS_D)])
        return (
            spark.createDataFrame(docs, SCHEMA)
            .select(F.explode(F.split("text", " ")).alias("term"))
            .select("term", F.explode(rows).alias("i"))
            .select("i", _bucket_spark("term", "i"))
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("epoch", F.lit(0))
        )

    write_epoch_grid(grid_of(DOCS[:2]), counters)   # first attempt
    write_epoch_grid(grid_of(DOCS), counters)       # re-emit, more data

    merged = _as_dict(read_cms_counters(spark, counters))
    assert merged == _as_dict(_batch_grid(spark))


def test_replay_of_one_epoch_leaves_other_epochs_intact(spark, tmp_path):
    """Distinguishes DYNAMIC partition overwrite from static overwrite:
    with epochs 0 and 1 both landed, re-landing epoch 0 must replace
    only epoch 0's partition — a static-mode overwrite would silently
    wipe epoch 1 and the single-epoch replay tests above would still
    pass."""
    counters = str(tmp_path / "counters")

    def grid_of(docs, epoch):
        rows = F.array(*[F.lit(i) for i in range(CMS_D)])
        return (
            spark.createDataFrame(docs, SCHEMA)
            .select(F.explode(F.split("text", " ")).alias("term"))
            .select("term", F.explode(rows).alias("i"))
            .select("i", _bucket_spark("term", "i"))
            .groupBy("i", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("epoch", F.lit(epoch))
        )

    write_epoch_grid(grid_of(DOCS[:2], 0), counters)
    write_epoch_grid(grid_of(DOCS[2:], 1), counters)
    # at-least-once replay of epoch 0 only
    write_epoch_grid(grid_of(DOCS[:2], 0), counters)

    # epoch 1's counters must survive: the merged grid is still the
    # full-corpus batch grid (epoch 0 + epoch 1, each counted once)
    merged = _as_dict(read_cms_counters(spark, counters))
    assert merged == _as_dict(_batch_grid(spark))

    # and epoch 1's rows are still physically present
    raw = spark.read.parquet(counters)
    assert raw.filter(F.col("epoch") == 1).count() > 0
