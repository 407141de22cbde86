"""Round-4 scale-hardening regression tests.

1. table_content_fingerprint's hash sum must survive row counts where a
   plain BIGINT sum of 40-bit hashes overflows int64 (~1.7e7 rows) —
   accumulation is decimal(38,0)/HUGEINT, published mod a 63-bit prime,
   identical in Spark and DuckDB.
2. The canonical row serialization is microsecond-exact: DuckDB epoch()
   ROUNDS sub-second timestamps while Spark unix_timestamp TRUNCATES, so
   the contract pins epoch_us/unix_micros where both are exact integers.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.plans.stats import _FP_MOD, _fp_sum, _fp_sum_sql

# 2^40 - 1: the largest value the 40-bit row hash can produce.
H_MAX = (1 << 40) - 1
# Enough rows that sum(h) > 2^63 — the exact regime where the previous
# BIGINT accumulation threw under ANSI in Spark (and silently promoted
# to HUGEINT in DuckDB, so the two engines *diverged in failure mode*).
N_ROWS = 20_000_000


def test_fp_sum_survives_int64_overflow(spark):
    assert N_ROWS * H_MAX > (1 << 63)  # the scenario is real
    got = (
        spark.range(N_ROWS)
        .select(F.lit(H_MAX).alias("h"))
        .agg(_fp_sum(F.col("h")).alias("fp"))
        .collect()[0]["fp"]
    )
    expected = (N_ROWS * H_MAX) % _FP_MOD
    assert got == expected

    duck = duckdb.sql(
        f"SELECT {_fp_sum_sql()} AS fp FROM "
        f"(SELECT {H_MAX}::BIGINT AS h FROM range({N_ROWS}))"
    ).fetchone()[0]
    assert duck == expected


def test_canonical_ts_is_microsecond_exact_cross_engine(spark):
    # 00:00:00.7 — DuckDB epoch()::BIGINT rounds this UP to the next
    # second while Spark unix_timestamp truncates; epoch_us/unix_micros
    # agree exactly.
    ts = "2024-03-01 00:00:00.700000"
    got_spark = (
        spark.sql(f"SELECT unix_micros(CAST(TIMESTAMP '{ts}' AS TIMESTAMP)) AS us")
        .collect()[0]["us"]
    )
    got_duck = duckdb.sql(f"SELECT epoch_us(TIMESTAMP '{ts}') AS us").fetchone()[0]
    assert got_spark == got_duck
    # and the whole-second forms genuinely disagree on this input,
    # which is why the contract must NOT use them:
    trunc = spark.sql(f"SELECT unix_timestamp(TIMESTAMP '{ts}') AS s").collect()[0]["s"]
    rounded = duckdb.sql(f"SELECT epoch(TIMESTAMP '{ts}')::BIGINT AS s").fetchone()[0]
    assert trunc != rounded


# ---------------------------------------------------------------------------
# Shingle document-frequency cap (hot-shingle pair explosion guard)
# ---------------------------------------------------------------------------


import pandas as pd
import pytest

from hybrid_data_lakehouse_lab_spark.plans.dedup import (
    SHINGLE_DF_CAP,
    _shingles,
    dedup_containment,
    dedup_lsh_calibration,
    dedup_ngram_jaccard,
)
from hybrid_data_lakehouse_lab_spark.sources import load_table


@pytest.fixture()
def boilerplate_sf(tmp_path):
    """200 byte-identical documents (the degenerate class: every shingle
    has document frequency 200) plus one genuine near-dup pair whose
    shingles are unique to the pair."""
    n = 200
    sf = tmp_path / "sf_boilerplate"
    sf.mkdir()
    boiler = "all rights reserved copyright notice terms of service apply here"
    texts = [boiler] * n + [
        "quick brown fox jumps over the lazy dog tonight",
        "quick brown fox jumps over the lazy dog today",
    ]
    ids = list(range(n)) + [1000, 1001]
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


def test_jaccard_pairs_bounded_on_boilerplate(spark, boilerplate_sf):
    """With df_cap=8, the 200-identical-doc class (19,900 all-pairs rows
    uncapped) contributes ZERO candidate pairs — its shingles are dropped
    as boilerplate — while the informative near-dup pair is still found."""
    rows = dedup_ngram_jaccard(spark, boilerplate_sf, df_cap=8).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1000, 1001)]
    assert rows[0].jaccard > 0.5


def test_containment_pairs_bounded_on_boilerplate(spark, boilerplate_sf):
    rows = dedup_containment(spark, boilerplate_sf, df_cap=8).collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(1000, 1001)]
    assert rows[0].containment > 0.5


def test_calibration_bounded_on_boilerplate(spark, boilerplate_sf):
    """The calibration audit joins LSH candidates against exact Jaccard
    over informative shingles only: the degenerate class (whose LSH side
    is already star-capped) simply drops out of the exact join instead
    of exploding it."""
    rows = dedup_lsh_calibration(spark, boilerplate_sf, df_cap=8).collect()
    # only the informative pair survives: one band-count group, one pair
    assert len(rows) == 1 and rows[0].n_pairs == 1


def test_gate_corpora_below_shingle_df_cap(spark, sf_dir):
    """The default cap must be a NO-OP on the gate corpora (max DF 25 at
    sf0.1) — if the test data drifts into cap territory this fails with
    a number rather than silently changing lane results."""
    from pyspark.sql import functions as F

    max_df = (
        _shingles(load_table(spark, sf_dir, "documents"))
        .groupBy("shingle")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_df <= SHINGLE_DF_CAP, max_df


# ---------------------------------------------------------------------------
# Brute-force similarity query-set bound
# ---------------------------------------------------------------------------


def test_brute_force_bound_static_and_dynamic(spark):
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.plans.similarity import (
        check_brute_force_bound,
        guard_query_set,
    )

    check_brute_force_bound(5)  # registered lanes: fine
    with pytest.raises(ValueError, match="similarity_ivf_kmeans_topk"):
        check_brute_force_bound(10_001)

    q = spark.range(50).select(F.col("id").alias("query_id"))
    assert guard_query_set(q, cap=100) is q
    with pytest.raises(ValueError, match="brute-force"):
        guard_query_set(q, cap=10)


# ---------------------------------------------------------------------------
# PQ refine: the compression lane must be USABLE, not just honest
# ---------------------------------------------------------------------------


def test_pq_rerank_recall_clears_bar(spark, sf_dir):
    """Mean recall@10 of the PQ-ADC + exact-refine pipeline at the
    production config (M=8, K=16, scale-aware shortlist) must be ≥ 0.85
    — the round-4 verdict bar, raised from 0.7. The r=10 row is the
    plain-ADC baseline and is expected to sit far lower; the gap is the
    refine step's value. (The sf0.1 twin of this gate lives in
    tests/test_round5_hardening.py, where the shortlist law actually
    engages.)"""
    from hybrid_data_lakehouse_lab_spark.plans.pq import (
        SHORTLIST_FLOOR,
        similarity_pq_refine_sensitivity,
    )

    rows = {
        r.shortlist: r.mean_recall
        for r in similarity_pq_refine_sensitivity(spark, sf_dir).collect()
    }
    # gate corpus N=500 -> the law sits at the floor (s=100)
    assert rows[SHORTLIST_FLOOR] >= 0.85, rows
    assert rows[10] < rows[SHORTLIST_FLOOR], rows  # refine genuinely adds recall


# ---------------------------------------------------------------------------
# Line-level (repeated-span) dedup — the C4/CCNet boilerplate pass
# ---------------------------------------------------------------------------


def test_line_dedup_semantics(spark, tmp_path):
    from hybrid_data_lakehouse_lab_spark.plans.dedup import LINE_W, corpus_line_dedup

    assert LINE_W == 8
    span_a = "a1 a2 a3 a4 a5 a6 a7 a8"      # shared boilerplate span
    span_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    span_c = "c1 c2 c3 c4 c5 c6 c7 c8"
    texts = {
        0: f"{span_a} {span_b}",             # first owner of a and b
        1: f"{span_a} {span_c}",             # loses a, keeps c
        2: f"{span_c} {span_c}",             # loses both: c seen in doc 1,
                                             # and its own within-doc repeat
    }
    sf = tmp_path / "sf_lines"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(sf / "documents.parquet")

    rows = {r.doc_id: r for r in corpus_line_dedup(spark, str(sf)).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (rows[0].n_chunks, rows[0].n_dropped) == (2, 0)
    assert rows[0].cleaned_md5 == md5(f"{span_a} {span_b}")
    assert (rows[1].n_chunks, rows[1].n_dropped) == (2, 1)
    assert rows[1].cleaned_md5 == md5(span_c)
    assert (rows[2].n_chunks, rows[2].n_dropped) == (2, 2)
    assert rows[2].cleaned_md5 == md5("")
