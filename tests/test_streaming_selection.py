"""Streaming selection: batch-trained DSIR weights applied per
micro-batch must equal the batch corpus_selection_pipeline exactly
(even when a micro-batch boundary splits the corpus), and replay must
be a no-op after dedup."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from hybrid_data_lakehouse_lab_spark.plans.data_selection import (
    corpus_selection_pipeline,
    dsir_weight_table,
)
from hybrid_data_lakehouse_lab_spark.sources import load_table
from hybrid_data_lakehouse_lab_spark.streaming.lanes import (
    read_selection,
    selection_stream,
)

from conftest import SF_DIR

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_batch(drop_dir, rows, name):
    with open(drop_dir / name, "w") as f:
        for r in rows:
            f.write(
                json.dumps({"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]})
                + "\n"
            )


def _run(spark, drop_dir, tmp_path, ckpt="ckpt"):
    docs = spark.readStream.schema(SCHEMA).json(str(drop_dir))
    q = selection_stream(
        docs,
        str(tmp_path / "weights"),
        str(tmp_path / "out"),
        str(tmp_path / ckpt),
    )
    q.awaitTermination(120)


def test_stream_selection_equals_batch_and_replays(spark, tmp_path):
    # Train offline on the gate corpus and persist the weight table —
    # the deployment artifact the stream consumes.
    dsir_weight_table(spark, SF_DIR).write.parquet(str(tmp_path / "weights"))

    rows = load_table(spark, SF_DIR, "documents").collect()
    drop = tmp_path / "drop"
    drop.mkdir()
    # Split mid-corpus so neither micro-batch sees the whole corpus:
    # correctness must come from the TRAINED weights, not batch-local
    # statistics.
    _write_batch(drop, rows[: len(rows) // 2], "b0.json")
    _run(spark, drop, tmp_path)
    _write_batch(drop, rows[len(rows) // 2 :], "b1.json")
    _run(spark, drop, tmp_path)

    streamed = {
        r["doc_id"]: (r["selected"], r["verdict"])
        for r in read_selection(spark, str(tmp_path / "out")).collect()
    }
    batch = {
        r["doc_id"]: (r["selected"], r["verdict"])
        for r in corpus_selection_pipeline(spark, SF_DIR).collect()
    }
    assert streamed == batch

    # Replay with a fresh checkpoint: identical verdict rows re-append;
    # the deduped read must not change.
    _run(spark, drop, tmp_path, ckpt="ckpt2")
    replayed = {
        r["doc_id"]: (r["selected"], r["verdict"])
        for r in read_selection(spark, str(tmp_path / "out")).collect()
    }
    assert replayed == batch
    # and the raw file rows really did duplicate (the dedup is doing work)
    raw = spark.read.parquet(str(tmp_path / "out")).count()
    assert raw > len(batch)
