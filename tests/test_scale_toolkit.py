"""Scale toolkit: salted aggregation equals direct aggregation on skewed
data; bucketed tables join with zero Exchange; observe-metrics collect
in one pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.operators.metrics import with_batch_metrics
from hybrid_data_lakehouse_lab_spark.operators.skew import salted_aggregate
from hybrid_data_lakehouse_lab_spark.sources.bucketing import (
    colocated_join,
    write_bucketed,
)
from hybrid_data_lakehouse_lab_spark.sources.tables import load_table


def test_salted_aggregate_equals_direct(spark):
    # 90% of rows on one hot key — the skew shape salting exists for
    rows = [(0 if i % 10 else i % 7, float(i), i) for i in range(5000)]
    df = spark.createDataFrame(rows, "key INT, v DOUBLE, n LONG")
    direct = {
        r["key"]: (r["s"], r["c"], r["mx"])
        for r in df.groupBy("key")
        .agg(F.sum("v").alias("s"), F.count("n").alias("c"), F.max("n").alias("mx"))
        .collect()
    }
    salted = {
        r["key"]: (r["s"], r["c"], r["mx"])
        for r in salted_aggregate(
            df, ["key"], [("v", "sum", "s"), ("n", "count", "c"), ("n", "max", "mx")]
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_rejects_non_algebraic(spark):
    df = spark.range(5)
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(df, ["id"], [("id", "avg", "a")])


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Same-bucketed orders/lineitem sort-merge join without any shuffle
    (the 100 TB co-location strategy, SCALE.md §Joins)."""
    write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("orderkey"), "o_totalprice"
        ),
        "orders_b", ["orderkey"], 8, str(tmp_path / "orders_b"), ["orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("orderkey"), "l_quantity"
        ),
        "lineitem_b", ["orderkey"], 8, str(tmp_path / "lineitem_b"), ["orderkey"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "orders_b", "lineitem_b", on=["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_observe_metrics_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "c", None), (2, "u", 5.0), (3, "u", 6.0), (4, "d", None)],
        "id INT, op STRING, v DOUBLE",
    )
    observed, obs = with_batch_metrics(df, null_check_cols=["v"])
    observed.write.format("noop").mode("overwrite").save()  # the ONE action
    m = obs.get
    assert m["n_rows"] == 4
    assert m["n_op_c"] == 1 and m["n_op_u"] == 2 and m["n_op_d"] == 1
    assert m["n_null_v"] == 2
