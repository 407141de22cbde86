"""fan_out's size gate: repartition engages only past the uncompressed
crossover (FAN_OUT_MIN_BYTES), sized from parquet footers so compressed
file size cannot under-measure the work (replicated corpora compress
>20x)."""

from __future__ import annotations

import os

import pytest

from hybrid_data_lakehouse_lab_spark.operators.util import (
    FAN_OUT_MIN_BYTES,
    _input_bytes,
    fan_out,
)


@pytest.fixture(scope="module")
def small_big(spark, tmp_path_factory):
    """Two single-file parquet dirs: one far below the gate, one whose
    UNCOMPRESSED size clears it while its compressed size does not
    (highly repetitive text, the replicated-slice regime)."""
    root = tmp_path_factory.mktemp("fan_out_gate")
    small = os.path.join(root, "small")
    big = os.path.join(root, "big")
    spark.range(100).selectExpr("id", "repeat('x', 10) AS text").coalesce(
        1
    ).write.parquet(small)
    n = 40_000
    spark.range(n).selectExpr(
        # distinct per row so parquet dictionary encoding cannot
        # collapse the pages (~290 B/row, ~11 MB encoded), yet snappy
        # still compresses the repetitive text far below the gate
        "id", "concat(repeat('abc123 ', 40), id) AS text"
    ).coalesce(1).write.parquet(big)
    return small, big


def test_small_scan_skips_repartition(spark, small_big):
    small, _ = small_big
    df = spark.read.parquet(small)
    assert (
        fan_out(df, min_bytes=FAN_OUT_MIN_BYTES).rdd.getNumPartitions()
        == df.rdd.getNumPartitions()
    )


def test_big_uncompressed_scan_engages(spark, small_big):
    _, big = small_big
    df = spark.read.parquet(big)
    files = [f for f in os.listdir(big) if f.endswith(".parquet")]
    compressed = sum(os.path.getsize(os.path.join(big, f)) for f in files)
    # the trap this gate exists for: compressed size alone would skip
    assert compressed < FAN_OUT_MIN_BYTES
    out = fan_out(df, min_bytes=FAN_OUT_MIN_BYTES)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_ungated_call_keeps_old_behavior(spark, small_big):
    small, _ = small_big
    df = spark.read.parquet(small)
    assert (
        fan_out(df).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_input_bytes_uses_uncompressed_footer_size(spark, small_big):
    _, big = small_big
    files = [
        os.path.join(big, f)
        for f in os.listdir(big)
        if f.endswith(".parquet")
    ]
    total = _input_bytes(files)
    compressed = sum(os.path.getsize(f) for f in files)
    assert total is not None and total > compressed


def test_unknown_size_repartitions(spark, tmp_path):
    # a checkpointed relation has no file listing: cannot prove small,
    # so the gated call must still repartition
    df = spark.range(10).localCheckpoint()
    out = fan_out(df, min_bytes=FAN_OUT_MIN_BYTES)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
