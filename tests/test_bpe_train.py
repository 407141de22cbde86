"""Properties of the multi-step BPE trainer (plans/llm_extras.py:
bpe_train_merges): classic BPE invariants plus degenerate corpora."""

from __future__ import annotations

import pandas as pd
import pytest

from hybrid_data_lakehouse_lab_spark.plans.llm_extras import (
    BPE_MERGE_STEPS,
    bpe_train_merges,
)


def test_merge_counts_non_increasing_and_distinct(spark, sf_dir):
    rows = sorted(bpe_train_merges(spark, sf_dir).collect(), key=lambda r: r["step"])
    assert [r["step"] for r in rows] == list(range(1, BPE_MERGE_STEPS + 1))
    # The max-pair count can only shrink: any round-N+1 pair either
    # existed in round N or contains the new symbol (count <= the merged
    # pair's count).
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    merges = {(r["left_sym"], r["right_sym"]) for r in rows}
    assert len(merges) == BPE_MERGE_STEPS
    for r in rows:
        assert r["merged"] == r["left_sym"] + r["right_sym"]


@pytest.fixture()
def single_char_sf(tmp_path):
    sf = tmp_path / "sf_single_chars"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b c", "c b a a"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [5, 7],
        }
    ).to_parquet(sf / "documents.parquet")
    return str(sf)


def test_no_pairs_yields_no_merges(spark, single_char_sf):
    # Every word is one symbol: there is nothing to merge, and the
    # unrolled rounds must survive the empty argmax (not crash).
    assert bpe_train_merges(spark, single_char_sf).count() == 0


def test_greedy_merge_overlap_semantics(spark, tmp_path):
    # 'aaaa' = pairs (a,a) x3, but a greedy left-to-right merge produces
    # 'aa aa'; round 2 must therefore see (aa,aa) — the non-overlapping
    # application, not a re-count of raw overlaps.
    sf = tmp_path / "sf_overlap"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["aaaa aaaa"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [9],
        }
    ).to_parquet(sf / "documents.parquet")
    rows = {r["step"]: r for r in bpe_train_merges(spark, str(sf)).collect()}
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("a", "a")
    assert rows[1]["pair_count"] == 6  # 3 overlapping pairs x 2 words
    assert (rows[2]["left_sym"], rows[2]["right_sym"]) == ("aa", "aa")
    assert rows[2]["pair_count"] == 2  # one per word after greedy merge


def test_regex_metachar_words_excluded_from_training(spark, tmp_path):
    # Words containing regex metacharacters are outside the normalized
    # vocab: they must be dropped from training (both engines share the
    # filter) rather than corrupting the \b merge pattern.
    sf = tmp_path / "sf_meta"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["a.b a.b a.b (x) ab ab ab"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [24],
        }
    ).to_parquet(sf / "documents.parquet")
    rows = bpe_train_merges(spark, str(sf)).collect()
    syms = {s for r in rows for s in (r["left_sym"], r["right_sym"])}
    assert "." not in "".join(syms) and "(" not in "".join(syms)
    # the clean word still trains
    assert any((r["left_sym"], r["right_sym"]) == ("a", "b") for r in rows)


def test_encode_applies_trained_merges(spark, tmp_path):
    """Encoder invariants on a corpus with a known dominant pair: token
    count = char count minus one per applied merge occurrence, stream
    md5 reconstructs the exact symbolization."""
    import hashlib

    from hybrid_data_lakehouse_lab_spark.plans.llm_extras import (
        bpe_encode_corpus,
    )

    sf = tmp_path / "sf_enc"
    sf.mkdir()
    # 'ab' dominates -> merge1 = (a,b); the encoder must then tokenize
    # 'ab' as 1 token and 'ba' as 2.
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["ab ab ab ab ba", "ab cd"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [14, 5],
        }
    ).to_parquet(sf / "documents.parquet")
    rows = {r["doc_id"]: r for r in bpe_encode_corpus(spark, str(sf)).collect()}
    assert rows[0]["n_words"] == 5
    assert rows[1]["n_words"] == 2
    # every word is 2 chars -> without merges n_tokens would be 2/word
    assert rows[0]["n_tokens"] < 2 * rows[0]["n_words"]
    # merges never split: tokens per word in [1, len(word)]
    for r in rows.values():
        assert r["n_words"] <= r["n_tokens"] <= 2 * r["n_words"]


def test_encode_token_totals_bounded(spark, sf_dir):
    """On the gate corpus: n_words <= n_tokens <= total chars of the
    normalized words, and at least one document actually compressed
    (a trained merge fired somewhere)."""
    from pyspark.sql import functions as F

    from hybrid_data_lakehouse_lab_spark.plans.llm_extras import (
        bpe_encode_corpus,
    )
    from hybrid_data_lakehouse_lab_spark.sources import load_table

    enc = bpe_encode_corpus(spark, sf_dir)
    chars = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("doc_id")
        .agg(F.sum(F.length("w")).alias("n_chars"))
    )
    j = enc.join(chars, "doc_id").collect()
    assert j
    assert all(r["n_words"] <= r["n_tokens"] <= r["n_chars"] for r in j)
    assert any(r["n_tokens"] < r["n_chars"] for r in j)
