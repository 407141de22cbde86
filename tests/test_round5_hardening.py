"""Round-5 hardening regressions.

1. Budget-planner arithmetic survives the ADVICE-flagged overflow point:
   a single source past ~8.5e13 tokens pushes sqrt_micro * 1e6 (and
   n_tokens * epochs_micro) past int64 — the decimal(38,0) widening must
   keep the lanes alive under ANSI mode, and the values must still equal
   the DuckDB HUGEINT chain exactly.
2. The PQ-rerank shortlist law holds recall across scale: at sf0.1
   (N=2000, where the fixed s=100 had decayed to 0.76) the scale-aware
   shortlist must keep recall@10 >= 0.85.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hybrid_data_lakehouse_lab_spark.plans.data_selection import (
    BUDGET_TOKENS,
    MAX_EPOCHS_MICRO,
    _budget_arith,
    _redistribute_arith,
)

# Three sources straddling the overflow edge: one at the ADVICE threshold
# (~8.5e13 tokens -> sqrt_micro ~9.2e12), one 100x past it (approaching the
# full 100 TB corpus in ONE source), one tiny (stays uncapped and absorbs
# redistribution).
HUGE_SOURCES = [
    ("edge", 1_000_000, 85_000_000_000_000),
    ("whale", 5_000_000, 8_500_000_000_000_000),
    ("tiny", 100, 50_000),
]


def _per_src_df(spark):
    df = spark.createDataFrame(
        HUGE_SOURCES, "source string, n_docs long, n_tokens long"
    )
    return df.select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("sqrt_micro"),
    )


def _duck_budget(con):
    rows = ", ".join(f"('{s}', {d}, {t})" for s, d, t in HUGE_SOURCES)
    return con.sql(
        f"""
        WITH bp_s AS (
            SELECT source, n_docs, n_tokens,
                   CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000) AS BIGINT) AS sqrt_micro
            FROM (VALUES {rows}) AS v(source, n_docs, n_tokens)
        ),
        bp_tot AS (SELECT sum(sqrt_micro) AS denom FROM bp_s)
        SELECT source,
               CAST(CAST(sqrt_micro AS HUGEINT) * 1000000 // denom AS BIGINT) AS weight_micro,
               CAST({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom AS BIGINT) AS target_tokens,
               CAST(({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom) * 1000000 // n_tokens AS BIGINT)
                   AS epochs_micro,
               CAST({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom
                   - CAST(n_tokens AS HUGEINT)
                     * least(({BUDGET_TOKENS} * CAST(sqrt_micro AS HUGEINT) // denom) * 1000000 // n_tokens,
                             {MAX_EPOCHS_MICRO}) // 1000000 AS BIGINT) AS shortfall_tokens
        FROM bp_s, bp_tot
        ORDER BY source
        """
    ).fetchall()


def test_budget_arith_survives_int64_edge(spark):
    # ANSI mode is on in the test session: a raw BIGINT product here
    # would throw ARITHMETIC_OVERFLOW, not silently wrap.
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    out = _budget_arith(_per_src_df(spark)).orderBy("source").collect()
    assert len(out) == 3
    duck = _duck_budget(duckdb.connect())
    for srow, drow in zip(out, duck):
        assert srow["source"] == drow[0]
        assert srow["weight_micro"] == drow[1]
        assert srow["target_tokens"] == drow[2]
        assert srow["epochs_micro"] == drow[3]
        assert srow["shortfall_tokens"] == drow[4]
    # sanity: the whale really is past the raw-product overflow point
    whale = next(r for r in out if r["source"] == "whale")
    assert whale["sqrt_micro"] * 1_000_000 > 2**63 - 1


def test_redistribute_arith_survives_int64_edge(spark):
    r1 = _budget_arith(_per_src_df(spark))
    out = _redistribute_arith(r1).orderBy("source").collect()
    assert len(out) == 3
    # conservation: final targets + residuals == round-1 targets
    # (water-filling moves tokens, never creates them)
    total_target = sum(r["target_tokens"] for r in out)
    total_final = sum(r["final_target_tokens"] for r in out)
    total_resid = sum(r["residual_tokens"] for r in out)
    assert total_final - total_resid <= total_target
    for r in out:
        assert r["final_target_tokens"] >= 0
        assert r["residual_tokens"] >= 0


# ---------------------------------------------------------------------------
# PQ rerank: the scale-aware shortlist must hold recall where fixed
# s=100 decayed (0.96 -> 0.90 -> 0.76 across N=500/500/2000)
# ---------------------------------------------------------------------------


def test_pq_shortlist_law_engages_at_sf01(spark):
    """At sf0.1 the law leaves the floor: N=2000 -> s=400, and the
    production-s sensitivity row must clear the 0.85 verdict bar
    (measured 0.94; fixed s=100 measured 0.76)."""
    from hybrid_data_lakehouse_lab_spark.plans.pq import (
        SHORTLIST_DIV,
        SHORTLIST_FLOOR,
        similarity_pq_refine_sensitivity,
    )

    sf_dir = "/root/testdata/sf0.1"
    rows = {
        r.shortlist: r.mean_recall
        for r in similarity_pq_refine_sensitivity(spark, sf_dir).collect()
    }
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    s = max(SHORTLIST_FLOOR, -(-n // SHORTLIST_DIV))
    assert s > SHORTLIST_FLOOR, (n, s)  # the law actually engaged
    assert s in rows, rows  # production row is carried by the sweep
    assert rows[s] >= 0.85, rows
    assert rows[SHORTLIST_FLOOR] < rows[s], rows  # the law is the win
