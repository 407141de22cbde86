"""Property tests for the round-3 operators: the guarantees their
docstrings claim, verified directly rather than via the oracle hash.

- table_content_fingerprint: invariant under repartitioning (the claim
  that makes it a valid cross-cluster replication check), and sensitive
  to any single-row change.
- count-min sketch: estimate >= exact for EVERY term, not just the
  reported top-20 (the one-sided error guarantee).
- PQ encoding: invariant under input partitioning (assignment must
  depend on values only, never on physical layout).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.plans import QUERIES
from hybrid_data_lakehouse_lab_spark.plans.sketches import CMS_D, _bucket_spark
from hybrid_data_lakehouse_lab_spark.sources import load_table


def test_fingerprint_invariant_under_repartition(spark, sf_dir, tmp_path):
    """Rewrite customer with a different partitioning and row order; the
    fingerprint of the rewritten copy must equal the original's."""
    base = QUERIES["table_content_fingerprint"](spark, sf_dir).toPandas()
    orig = base[base.table_name == "customer"].iloc[0]

    shuffled_dir = str(tmp_path / "customer_shuffled")
    (
        load_table(spark, sf_dir, "customer")
        .repartition(7)
        .sortWithinPartitions(F.desc("c_name"))
        .write.parquet(shuffled_dir)
    )
    c = spark.read.parquet(shuffled_dir)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    "c_custkey",
                    "c_name",
                    "c_nationkey",
                    F.round(F.col("c_acctbal") * 100).cast("bigint"),
                    "c_mktsegment",
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    got = c.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("fp")
    ).collect()[0]
    assert got["n"] == orig.n_rows
    assert got["fp"] == orig.fingerprint

    # ...and a single-row mutation must change it
    mutated = c.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 1, F.col("c_acctbal") + 0.01).otherwise(
            F.col("c_acctbal")
        ),
    )
    got2 = mutated.agg(F.sum(h).alias("fp")).collect()[0]
    assert got2["fp"] != orig.fingerprint


def test_cms_never_underestimates_any_term(spark, sf_dir):
    """The one-sided CMS guarantee must hold for every term in the
    vocabulary, not just the top-20 the lane reports."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term"))
    rows = F.array(*[F.lit(i) for i in range(CMS_D)])
    upd = terms.select("term", F.explode(rows).alias("i")).select(
        "i", _bucket_spark("term", "i")
    )
    counters = upd.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probes = exact.select("term", "exact_cnt", F.explode(rows).alias("i")).select(
        "term", "exact_cnt", "i", _bucket_spark("term", "i")
    )
    est = (
        probes.join(counters, ["i", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    violations = est.filter(F.col("est_cnt") < F.col("exact_cnt")).count()
    assert violations == 0


def test_pq_codes_invariant_under_partitioning(spark, sf_dir, tmp_path):
    """Re-lay the embeddings table (different partition count and order)
    and re-run the encoder against the relaid copy: identical codes."""
    from hybrid_data_lakehouse_lab_spark.plans import pq as pq_mod

    relaid = str(tmp_path / "relaid")
    (
        load_table(spark, sf_dir, "embeddings")
        .repartition(11)
        .sortWithinPartitions(F.desc("vec_id"))
        .write.parquet(relaid + "/embeddings.parquet")
    )
    base = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in QUERIES["embedding_pq_codes"](spark, sf_dir).collect()
    }
    alt = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_mod.embedding_pq_codes(spark, relaid).collect()
    }
    assert base == alt
