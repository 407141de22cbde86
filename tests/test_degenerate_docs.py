"""Round-2 advisory regression: 0/1-token documents must produce zero
bigrams, not a runtime error (sequence(1, size-1) on size<=1 yields the
descending [1, 0] and element_at/slice at index 0 throws)."""

from __future__ import annotations

import pandas as pd
import pytest

from hybrid_data_lakehouse_lab_spark.plans.llm_extras import (
    bpe_pair_merge_counts,
    text_bigram_conditionals,
)


@pytest.fixture()
def degenerate_sf(tmp_path):
    sf = tmp_path / "sf_short_docs"
    sf.mkdir()
    texts = ["", "one", "two tokens", "a b c d"]
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


def test_bigram_conditionals_survive_short_docs(spark, degenerate_sf):
    # No doc reaches the n1 >= 50 context threshold; the point is the
    # plan RUNS (no element_at(words, 0) error) and yields no rows.
    assert text_bigram_conditionals(spark, degenerate_sf).count() == 0


def test_bpe_pairs_survive_short_docs(spark, degenerate_sf):
    rows = bpe_pair_merge_counts(spark, degenerate_sf).collect()
    got = {r.pair: r.n for r in rows}
    # Only docs with >= 2 tokens contribute adjacent pairs.
    assert got == {
        "two tokens": 1,
        "a b": 1,
        "b c": 1,
        "c d": 1,
    }
