"""Property-based invariants (hypothesis) for the data-selection lanes:
classifier linearity, budget-plan accounting on arbitrary corpora, and
DSIR order-invariance. Each example spins real Spark jobs, so examples
are few but shrink to minimal corpora on failure."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hybrid_data_lakehouse_lab_spark.plans.data_selection import (
    BUDGET_TOKENS,
    MAX_EPOCHS_MICRO,
    corpus_quality_classifier,
    corpus_token_budget_plan,
)

_WORDS = ["spark", "merge", "key", "row", "batch", "the", "a", "vector"]
_counter = itertools.count()

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _write_docs(tmp_path, texts, sources=None):
    sf = tmp_path / f"sf_prop_{next(_counter)}"
    sf.mkdir()
    sources = sources or ["s"] * len(texts)
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


@_SETTINGS
@given(
    a=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
    b=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
)
def test_classifier_score_is_additive(spark, tmp_path, a, b):
    """A linear model over token features MUST satisfy
    score(A ++ B) == score(A) + score(B) for any token sequences — the
    property that makes hash-kernel scoring shard- and order-agnostic."""
    sf = _write_docs(tmp_path, [" ".join(a), " ".join(b), " ".join(a + b)])
    s = {r["doc_id"]: r["score"] for r in corpus_quality_classifier(spark, sf).collect()}
    assert s[2] == s[0] + s[1]


@_SETTINGS
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=2, max_size=6)
)
def test_budget_plan_accounting_on_arbitrary_corpora(spark, tmp_path, sizes):
    """The accounting identities must hold for ANY per-source token
    distribution, not just the gate corpus: ppm weights sum to 1e6 minus
    floor loss, allocations exhaust the budget likewise, the epoch cap
    verdict is consistent, and shortfall is exactly the unabsorbed
    allocation."""
    texts, sources = [], []
    for i, n in enumerate(sizes):
        texts.append(" ".join(_WORDS[j % len(_WORDS)] for j in range(n)))
        sources.append(f"src{i}")
    sf = _write_docs(tmp_path, texts, sources)
    rows = corpus_token_budget_plan(spark, sf).collect()
    assert len(rows) == len(sizes)
    n_src = len(rows)
    assert 1_000_000 - n_src <= sum(r["weight_micro"] for r in rows) <= 1_000_000
    assert (
        BUDGET_TOKENS - n_src
        <= sum(r["target_tokens"] for r in rows)
        <= BUDGET_TOKENS
    )
    for r in rows:
        assert r["n_tokens"] == sizes[int(r["source"][3:])]
        assert r["epochs_micro"] == r["target_tokens"] * 1_000_000 // r["n_tokens"]
        assert r["capped"] == (r["epochs_micro"] > MAX_EPOCHS_MICRO)
        absorbed = r["n_tokens"] * min(r["epochs_micro"], MAX_EPOCHS_MICRO) // 1_000_000
        assert r["shortfall_tokens"] == r["target_tokens"] - absorbed
        assert r["shortfall_tokens"] >= 0
