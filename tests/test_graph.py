"""connected_components: chains, multiple components, determinism."""

from __future__ import annotations


def test_chain_and_separate_components(spark):
    from hybrid_data_lakehouse_lab_spark.operators.graph import connected_components

    # chain 1-2-3-4 (diameter 3: needs multiple iterations), pair 10-11,
    # and 20-21-22 sharing hub 20
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        "a BIGINT, b BIGINT",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    from hybrid_data_lakehouse_lab_spark.operators.graph import connected_components

    n = 12  # diameter 11 — forces ~a dozen propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a BIGINT, b BIGINT"
    )
    got = connected_components(edges, "a", "b", max_iter=20).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n + 1
