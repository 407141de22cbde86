"""SCD2 property + golden tests on the deterministic CDC fixture
(FIXTURES.md §B invariants; semantics from reference
libs/scd2_spark_processor.py:229-276 and README.MD:250-256)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.functions.scalars import HASH_COLUMNS
from hybrid_data_lakehouse_lab_spark.operators.cdc import flatten_envelope
from hybrid_data_lakehouse_lab_spark.operators.merge import merge_scd2_batch
from hybrid_data_lakehouse_lab_spark.operators.pipeline import Scd2Pipeline
from hybrid_data_lakehouse_lab_spark.operators.scd2 import scd2_from_changes
from hybrid_data_lakehouse_lab_spark.testing.compare import frames_equal
from hybrid_data_lakehouse_lab_spark.testing.fixtures import raw_envelope_df

KEYS = ["id"]
ATTRS = ["product_name", "category", "price", "quantity", "sale_date"]


@pytest.fixture(scope="module")
def changes(spark):
    """Flattened CDC fixture → business-column change records."""
    flat = flatten_envelope(raw_envelope_df(spark))
    cols = [
        F.coalesce(F.col(f"after_{c}"), F.col(f"before_{c}")).alias(c)
        for c in ["id", "product_name", "category", "quantity", "sale_date"]
    ]
    return flat.select(
        *cols,
        F.coalesce(F.col("after_price"), F.col("before_price"))
        .cast("double")
        .alias("price"),
        "op",
        "event_timestamp",
        "lsn",
        "dt",
    ).cache()


@pytest.fixture(scope="module")
def scd2(changes):
    return scd2_from_changes(
        changes, KEYS, ATTRS, "event_timestamp", order_cols=["event_timestamp", "lsn"]
    ).cache()


def test_at_most_one_current_per_key(scd2):
    bad = (
        scd2.filter("is_current")
        .groupBy(*KEYS)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert bad == 0


def test_intervals_non_overlapping_and_contiguous(scd2):
    from pyspark.sql import Window

    w = Window.partitionBy(*KEYS).orderBy("effective_start_ts")
    chk = scd2.withColumn("next_start", F.lead("effective_start_ts").over(w))
    # a non-last version closes at its successor's start — except across a
    # deletion, where a gap (key nonexistent) is correct; never overlap
    broken = chk.filter(
        F.col("next_start").isNotNull()
        & (
            F.col("effective_end_ts").isNull()
            | (F.col("effective_end_ts") > F.col("next_start"))
            | (
                (F.col("effective_end_ts") != F.col("next_start"))
                & ~F.col("is_deleted")
            )
        )
    ).count()
    assert broken == 0
    # open versions are exactly the is_current ones
    assert chk.filter(
        F.col("effective_end_ts").isNull() != F.col("is_current")
    ).count() == 0


def test_noop_update_creates_no_version(scd2):
    # id 3: insert + no-op update → exactly one version
    assert scd2.filter("id = 3").count() == 1


def test_changed_update_creates_version(scd2):
    rows = scd2.filter("id = 2").orderBy("effective_start_ts").collect()
    assert len(rows) == 2
    assert rows[0]["is_current"] is False and rows[1]["is_current"] is True
    assert rows[0]["effective_end_ts"] == rows[1]["effective_start_ts"]
    assert rows[0]["price"] == 20.0 and rows[1]["price"] == 25.0


def test_delete_closes_with_flag(scd2):
    # id 5: insert → delete: single closed version, deleted, not current
    rows = scd2.filter("id = 5").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["is_deleted"] is True and r["is_current"] is False
    assert r["effective_end_ts"] is not None


def test_out_of_order_within_batch_sorted(scd2):
    # id 7: events emitted out of ts order still chain by event time
    rows = scd2.filter("id = 7").orderBy("effective_start_ts").collect()
    assert [r["price"] for r in rows] == [70.0, 77.0]
    assert rows[1]["is_current"] is True


def test_reinsert_after_delete_restarts_chain(scd2):
    # id 8: insert → delete → identical re-insert = two versions (the
    # delete breaks the dedupe run)
    rows = scd2.filter("id = 8").orderBy("effective_start_ts").collect()
    assert len(rows) == 2
    assert rows[0]["is_deleted"] is True
    assert rows[1]["is_current"] is True and rows[1]["is_deleted"] is False


def test_hash_covers_all_business_columns():
    assert "sale_date" in HASH_COLUMNS  # documented divergence (SURVEY §4)


def test_incremental_merge_equals_full_build(spark, changes, scd2):
    """Splitting the stream into two checkpointed batches must produce the
    same table as one-shot processing — the reference's T6 incremental
    contract, minus its non-atomicity."""
    cutoff = "2026-01-01 00:16:00"
    b1 = changes.filter(F.col("event_timestamp") <= F.lit(cutoff))
    b2 = changes.filter(F.col("event_timestamp") > F.lit(cutoff))
    t1 = merge_scd2_batch(None, b1, KEYS, ATTRS, "event_timestamp",
                          order_cols=["event_timestamp", "lsn"])
    t2 = merge_scd2_batch(t1, b2, KEYS, ATTRS, "event_timestamp",
                          order_cols=["event_timestamp", "lsn"])
    ok, why = frames_equal(t2.toPandas(), scd2.toPandas())
    assert ok, why


def test_pipeline_checkpoint_replay_is_noop(spark, changes, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scd2_pipeline"))
    pipe = Scd2Pipeline(
        spark, root, KEYS, ATTRS,
        ts_col="event_timestamp", order_cols=["event_timestamp", "lsn"],
    )
    n1 = pipe.process_batch(changes, committed_at_ms=1_000)
    assert n1 > 0
    before = pipe.scd2().toPandas()
    n2 = pipe.process_batch(changes, committed_at_ms=2_000)  # replay
    assert n2 == 0
    after = pipe.scd2().toPandas()
    ok, why = frames_equal(before, after)
    assert ok, why
    # time travel: version 1 still readable and identical
    ok, why = frames_equal(pipe.scd2(version=1).toPandas(), before)
    assert ok, why
    # as-of commit time resolves to snapshot 1
    ok, why = frames_equal(pipe.scd2(as_of_ms=1_500).toPandas(), before)
    assert ok, why


def test_scd2_auto_selection_matches_both_paths(spark):
    """scd2_from_changes_auto picks by measured hot-key multiplicity
    (SCD2_CHUNK_THRESHOLD) and both selections produce the identical
    chain. threshold=3 forces the chunked branch on a small frame; the
    default threshold keeps it plain."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.scd2 import (
        scd2_from_changes,
        scd2_from_changes_auto,
        scd2_from_changes_chunked,
    )

    changes = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", "c"),
            (1, "a", "2024-01-01 01:00:00", "u"),  # heartbeat: same hash
            (1, "b", "2024-01-02 00:00:00", "u"),
            (1, "b", "2024-01-03 00:00:00", "u"),  # heartbeat next day
            (2, "x", "2024-01-01 00:00:00", "c"),
        ],
        "id INT, payload STRING, ts_s STRING, op STRING",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    args = (changes, ["id"], ["payload"], "ts", "op")
    plain = sorted(map(tuple, scd2_from_changes(*args).collect()))
    chunked = sorted(map(tuple, scd2_from_changes_chunked(*args).collect()))
    auto_lo = sorted(
        map(tuple, scd2_from_changes_auto(*args, threshold=3).collect())
    )
    auto_hi = sorted(map(tuple, scd2_from_changes_auto(*args).collect()))
    assert plain == chunked == auto_lo == auto_hi
    assert len(plain) == 3  # (1,a), (1,b), (2,x) — heartbeats collapsed


def test_merge_scd2_batch_chunked_auto(spark):
    """chunked='auto' routes through the measured auto-selection and
    stays identical to the plain path on a multi-batch merge."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.operators.merge import (
        merge_scd2_batch,
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "id INT, payload STRING, ts_s STRING, op STRING"
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")

    b1 = batch([(1, "a", "2024-01-01 00:00:00", "c"),
                (2, "x", "2024-01-01 00:00:00", "c")])
    b2 = batch([(1, "b", "2024-01-02 00:00:00", "u"),
                (2, "x", "2024-01-02 00:00:00", "u")])  # heartbeat
    out = {}
    for mode in (False, True, "auto"):
        t1 = merge_scd2_batch(None, b1, ["id"], ["payload"], "ts",
                              chunked=mode)
        t2 = merge_scd2_batch(t1, b2, ["id"], ["payload"], "ts",
                              chunked=mode)
        out[mode] = sorted(map(tuple, t2.collect()))
    assert out[False] == out[True] == out["auto"]
