"""Semantic checks on the hybrid-retrieval lanes beyond the oracle
hash: rank-provenance invariants and the two-stage candidate contract."""

from __future__ import annotations

from hybrid_data_lakehouse_lab_spark.plans import QUERIES
from hybrid_data_lakehouse_lab_spark.plans.hybrid_search import (
    K_RETRIEVE,
    N_QUERIES,
    TOP_K,
)


def test_rrf_rank_provenance(spark, sf_dir):
    """Every fused row was retrieved by at least one system, ranks stay
    inside the per-system depth, and each query yields a full top-k."""
    fused = QUERIES["hybrid_search_rrf"](spark, sf_dir).toPandas()
    assert len(fused) == N_QUERIES * TOP_K
    assert fused.groupby("query_id").size().eq(TOP_K).all()
    assert ((fused.kw_rank > 0) | (fused.vec_rank > 0)).all()
    assert fused.kw_rank.between(0, K_RETRIEVE).all()
    assert fused.vec_rank.between(0, K_RETRIEVE).all()


def test_rerank_candidates_come_from_keyword_stage(spark, sf_dir):
    """The reranker may only reorder the keyword stage's candidates —
    a reranked (query, match) pair outside the lexical top-K_RETRIEVE
    would mean the 'cheap recall, expensive rerank' contract is broken."""
    from hybrid_data_lakehouse_lab_spark.plans.hybrid_search import _kw_topk

    kw = {
        (r.query_id, r.match_id)
        for r in _kw_topk(spark, sf_dir).collect()
    }
    rr = QUERIES["hybrid_search_rerank"](spark, sf_dir).toPandas()
    assert len(rr) == N_QUERIES * TOP_K
    assert all((q, m) in kw for q, m in zip(rr.query_id, rr.match_id))
