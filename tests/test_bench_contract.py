"""Bench harness contract guards (no SparkSession): every name bench.py
sweeps must exist in the registry, and the skewed slice builder must
produce a Zipf mass profile with FK integrity — cheap duckdb-only
checks so a renamed lane or a broken skew transform fails in pytest,
not mid-bench."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(module_path, name):
    spec = importlib.util.spec_from_file_location(name, module_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_names_are_registered():
    sys.path.insert(0, REPO)
    from hybrid_data_lakehouse_lab_spark.plans import QUERIES

    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod")
    missing = [
        n
        for n in bench.HEADLINE + bench.MULTIMODAL_10X + bench.LAKEHOUSE_10X
        if n not in QUERIES
    ]
    assert not missing, missing
    assert len(bench.MULTIMODAL_10X) == 7
    assert len(bench.LAKEHOUSE_10X) == 8  # round 10: + sorted rewrite


@pytest.fixture(scope="module")
def skew_slice(tmp_path_factory):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_scaled_slice import build

    dst = str(tmp_path_factory.mktemp("skew") / "s")
    build("/root/testdata/sf0.001", dst, 3, skewed=True)
    return dst


def test_skewed_slice_zipf_mass(skew_slice):
    con = duckdb.connect()
    top, total = con.sql(
        f"""SELECT (SELECT max(n) FROM (
               SELECT count(*) n FROM '{skew_slice}/events.parquet' GROUP BY user_id)),
               (SELECT count(*) FROM '{skew_slice}/events.parquet')"""
    ).fetchone()
    # Zipf(~1): the heaviest key holds a CONSTANT, large share of all
    # rows — a uniform shift would put ~1/n_users here (<1%)
    assert top / total > 0.05, (top, total)
    # deterministic: same inputs, same draw
    ids = con.sql(
        f"SELECT user_id FROM '{skew_slice}/events.parquet' ORDER BY event_id LIMIT 5"
    ).fetchall()
    assert ids == con.sql(
        f"SELECT user_id FROM '{skew_slice}/events.parquet' ORDER BY event_id LIMIT 5"
    ).fetchall()


def test_skewed_slice_fk_integrity(skew_slice):
    con = duckdb.connect()
    src = "/root/testdata/sf0.001"
    for fact, fk, dim, pk in [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
    ]:
        orphans = con.sql(
            f"""SELECT count(*) FROM '{skew_slice}/{fact}.parquet' f
                LEFT JOIN '{src}/{dim}.parquet' d ON f.{fk} = d.{pk}
                WHERE d.{pk} IS NULL"""
        ).fetchone()[0]
        assert orphans == 0, (fact, fk, orphans)
    # replication factor holds
    n = con.sql(f"SELECT count(*) FROM '{skew_slice}/orders.parquet'").fetchone()[0]
    n0 = con.sql(f"SELECT count(*) FROM '{src}/orders.parquet'").fetchone()[0]
    assert n == 3 * n0
