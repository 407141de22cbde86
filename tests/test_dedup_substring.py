"""Exact-substring dedup lanes (plans/dedup_substring.py): planted-span
semantics, maximal-merge behavior, degenerate inputs, and the DuckDB
oracle pairing on a corpus that exercises every branch."""

from __future__ import annotations

import pandas as pd
import pytest

from hybrid_data_lakehouse_lab_spark.plans.dedup_substring import (
    SPAN_K,
    dedup_substring_doc_stats,
    dedup_substring_spans,
)
from hybrid_data_lakehouse_lab_spark.plans import ORACLES
import duckdb

from hybrid_data_lakehouse_lab_spark.testing.compare import frames_equal


def _write_docs(tmp_path, texts):
    sf = tmp_path / "sf_substring"
    sf.mkdir()
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


# Distinct filler vocab per doc so nothing duplicates except the plants.
def _filler(tag: str, n: int) -> list[str]:
    return [f"{tag}{i}" for i in range(n)]


SHARED8 = ["s1", "s2", "s3", "s4", "s5", "s6", "s7", "s8"]  # 8-token plant
SHARED6 = ["u1", "u2", "u3", "u4", "u5", "u6"]  # exactly k tokens


@pytest.fixture()
def planted_sf(tmp_path):
    assert SPAN_K == 6, "plants below are built for k=6"
    texts = [
        # doc 0: shared 8-token span at positions 4-11, then the exact
        # 6-token plant at 17-22 — two disjoint islands in one doc
        " ".join(_filler("a", 3) + SHARED8 + _filler("b", 5) + SHARED6),
        # doc 1: the 8-token span at positions 1-8
        " ".join(SHARED8 + _filler("c", 4)),
        # doc 2: the 6-token plant at positions 6-11
        " ".join(_filler("d", 5) + SHARED6),
        # doc 3: within-doc repetition ONLY (same 6 tokens twice) —
        # count(DISTINCT doc_id) = 1, must NOT count as duplicated
        " ".join(["r1", "r2", "r3", "r4", "r5", "r6"] * 2),
        # doc 4: shorter than k — no grams at all
        "tiny doc here",
        # doc 5: unique content, nothing duplicated
        " ".join(_filler("e", 12)),
    ]
    return _write_docs(tmp_path, texts)


def test_planted_spans_are_maximal_and_positioned(spark, planted_sf):
    rows = dedup_substring_spans(spark, planted_sf).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in rows}
    assert spans == {
        (0, 4, 11, 8),  # 8-token plant: 3 dup grams merged into ONE span
        (0, 17, 22, 6),  # second island in the same doc
        (1, 1, 8, 8),
        (2, 6, 11, 6),
    }
    # the 8-token span is shared by exactly 2 docs
    by_doc = {(r.doc_id, r.span_start): r.max_gram_docs for r in rows}
    assert by_doc[(0, 4)] == 2 and by_doc[(1, 1)] == 2


def test_within_doc_repeats_and_short_docs_excluded(spark, planted_sf):
    got = {r.doc_id for r in dedup_substring_spans(spark, planted_sf).collect()}
    assert 3 not in got  # intra-doc repeat is not cross-doc duplication
    assert 4 not in got  # < k tokens: no grams
    assert 5 not in got  # unique content


def test_doc_stats_arithmetic(spark, planted_sf):
    rows = {
        r.doc_id: r
        for r in dedup_substring_doc_stats(spark, planted_sf).collect()
    }
    assert set(rows) == {0, 1, 2, 3, 4, 5}  # every doc, zeros included
    d0 = rows[0]
    assert (d0.dup_spans, d0.dup_tokens, d0.n_tokens) == (2, 14, 22)
    assert d0.dup_frac_ppm == 14 * 1_000_000 // 22
    d1 = rows[1]
    assert (d1.dup_spans, d1.dup_tokens, d1.n_tokens) == (1, 8, 12)
    for quiet in (3, 4, 5):
        r = rows[quiet]
        assert (r.dup_spans, r.dup_tokens, r.dup_frac_ppm) == (0, 0, 0)


def test_oracle_pairing_on_planted_corpus(spark, planted_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{planted_sf}/documents.parquet'"
    )
    for name, fn in (
        ("dedup_substring_spans", dedup_substring_spans),
        ("dedup_substring_doc_stats", dedup_substring_doc_stats),
    ):
        sdf = fn(spark, planted_sf).toPandas()
        ddf = con.execute(ORACLES[name]).fetchdf()
        ok, why = frames_equal(sdf, ddf)
        assert ok, f"{name}: {why}"


def test_empty_and_no_dup_corpora(spark, tmp_path):
    sf = _write_docs(tmp_path, [" ".join(_filler("x", 10)), "short one"])
    assert dedup_substring_spans(spark, sf).count() == 0
    stats = {
        r.doc_id: r for r in dedup_substring_doc_stats(spark, sf).collect()
    }
    assert stats[0].dup_tokens == 0 and stats[1].n_tokens == 2


def test_hash_gram_variant_matches_exact_path(spark):
    # the 100 TB shuffle-byte variant (xxhash64 group/join key) must
    # produce identical spans on the gate corpus
    from hybrid_data_lakehouse_lab_spark.plans.dedup_substring import (
        _dup_spans,
    )

    sf = "/root/testdata/sf0.001"
    exact = {tuple(r) for r in _dup_spans(spark, sf).collect()}
    hashed = {
        tuple(r) for r in _dup_spans(spark, sf, hash_grams=True).collect()
    }
    assert exact == hashed and exact, "variants diverged (or empty corpus)"
