"""Z-order layout: row-group min/max spans must tighten on BOTH
interleaved columns versus an unclustered write — measured from real
parquet footer statistics via pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.sources import load_table
from hybrid_data_lakehouse_lab_spark.sources.zorder import write_zordered


def _avg_span(dirname: str, col: str) -> float:
    """Mean (max-min) of `col` across all row groups of all files."""
    spans = []
    for f in glob.glob(dirname + "/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            spans.append(float(st.max - st.min))
    assert spans
    return sum(spans) / len(spans)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_timestamp("ts").alias("epoch")
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("epoch"), F.max("epoch")
    ).collect()[0]
    plain_dir = str(tmp_path_factory.mktemp("plain"))
    z_dir = str(tmp_path_factory.mktemp("zord"))
    # 16 files = 4 z-curve bits = 2 bits per dimension: each chunk
    # covers ~1/4 of each domain (8 files would give only ~1/2 on one
    # dim — too coarse to assert against)
    ev.repartition(16).write.mode("overwrite").parquet(plain_dir)
    write_zordered(
        ev, z_dir,
        [(F.col("user_id"), lo_u, hi_u), (F.col("epoch"), lo_t, hi_t)],
        num_files=16,
    )
    return plain_dir, z_dir


@pytest.mark.parametrize("col", ["user_id", "epoch"])
def test_both_dimensions_tighten(spark, layouts, col):
    plain_dir, z_dir = layouts
    plain, z = _avg_span(plain_dir, col), _avg_span(z_dir, col)
    # hash-partitioned files span ~the full domain; z-ordered row groups
    # must cover well under half of it on EVERY interleaved dimension
    assert z < 0.5 * plain, (col, z, plain)


def test_zorder_preserves_rows(spark, layouts, sf_dir):
    _, z_dir = layouts
    n = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(z_dir).count() == n


def test_bit_budget_guard(spark):
    from hybrid_data_lakehouse_lab_spark.sources.zorder import zorder_key

    with pytest.raises(ValueError, match="exceeds bigint"):
        zorder_key([(F.col("a"), 0, 1)] * 4, bits=16)
