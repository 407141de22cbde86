"""Binary-quantization ANN lanes (plans/similarity_binary.py):
hand-computed code packing, planted near-duplicate retrieval, and the
doc-stats of the recall audit on a corpus where binary search must be
perfect."""

from __future__ import annotations

import pandas as pd
import pytest

from hybrid_data_lakehouse_lab_spark.plans.similarity_binary import (
    embedding_quantize_binary,
    similarity_hamming_topk,
)


def _write_embeddings(tmp_path, vecs, labels=None):
    sf = tmp_path / "sf_binary"
    sf.mkdir()
    pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [
                pd.array(v, dtype="float32").tolist() for v in vecs
            ],
            "label": labels or [0] * len(vecs),
        }
    ).to_parquet(sf / "embeddings.parquet")
    return str(sf)


def test_code_packing_hand_computed(spark, tmp_path):
    # vec 0: only dim 0 positive -> lo = 1, hi = 0
    # vec 1: only dim 31 positive -> lo = 2^31, hi = 0
    # vec 2: only dim 32 positive -> lo = 0, hi = 1
    # vec 3: only dim 63 positive -> lo = 0, hi = 2^31
    # vec 4: all positive -> lo = hi = 2^32 - 1; zeros are NOT positive
    def onehot(i):
        v = [-1.0] * 64
        v[i] = 1.0
        return v

    sf = _write_embeddings(
        tmp_path, [onehot(0), onehot(31), onehot(32), onehot(63), [1.0] * 64]
    )
    got = {
        r.vec_id: (r.hi, r.lo, r.n_pos)
        for r in embedding_quantize_binary(spark, sf).collect()
    }
    assert got[0] == (0, 1, 1)
    assert got[1] == (0, 2**31, 1)
    assert got[2] == (1, 0, 1)
    assert got[3] == (2**31, 0, 1)
    assert got[4] == (2**32 - 1, 2**32 - 1, 64)


def test_zero_is_not_positive(spark, tmp_path):
    sf = _write_embeddings(tmp_path, [[0.0] * 64])
    (r,) = embedding_quantize_binary(spark, sf).collect()
    assert (r.hi, r.lo, r.n_pos) == (0, 0, 0)


def test_planted_near_duplicate_ranks_first(spark, tmp_path):
    # query (vec 0) and vec 7 share all but one sign; everything else
    # is the inverted pattern -> vec 7 must be rank 1 with hamming 1
    base = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    near = list(base)
    near[5] = -near[5]
    inverted = [-x for x in base]
    vecs = [base] + [inverted] * 6 + [near]
    sf = _write_embeddings(tmp_path, vecs)
    rows = [
        r
        for r in similarity_hamming_topk(spark, sf).collect()
        if r.query_id == 0
    ]
    top = min(rows, key=lambda r: r.rnk)
    assert (top.match_id, top.hamming, top.rnk) == (7, 1, 1)
    # the inverted crowd sits at distance 64
    assert {r.hamming for r in rows if r.match_id != 7} == {64}


def test_hamming_symmetry(spark, tmp_path):
    # queries are vec_id < 5; distances between two in-query vectors
    # must be symmetric
    import random

    rng = random.Random(7)
    vecs = [
        [rng.choice([-1.0, 1.0]) for _ in range(64)] for _ in range(12)
    ]
    sf = _write_embeddings(tmp_path, vecs)
    d = {
        (r.query_id, r.match_id): r.hamming
        for r in similarity_hamming_topk(spark, sf).collect()
    }
    seen = 0
    for (a, b), h in d.items():
        if (b, a) in d:
            assert d[(b, a)] == h
            seen += 1
    assert seen > 0, "no symmetric pairs landed in top-k; widen the test"


def test_rerank_recovers_what_raw_hamming_misses(spark):
    # on the real gate corpus: rerank recall@10 must strictly beat raw
    # Hamming recall@10 and clear 0.7 (measured 0.82 at sf0.01)
    from hybrid_data_lakehouse_lab_spark.plans.similarity import (
        similarity_cosine_topk,
    )
    from hybrid_data_lakehouse_lab_spark.plans.similarity_binary import (
        similarity_hamming_rerank_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.query_id, r.match_id)
        for r in similarity_cosine_topk(spark, sf).collect()
    }
    raw = {
        (r.query_id, r.match_id)
        for r in similarity_hamming_topk(spark, sf).collect()
    }
    rer = {
        (r.query_id, r.match_id)
        for r in similarity_hamming_rerank_topk(spark, sf).collect()
    }
    raw_recall = len(exact & raw) / len(exact)
    rer_recall = len(exact & rer) / len(exact)
    assert rer_recall > raw_recall
    assert rer_recall >= 0.7, (raw_recall, rer_recall)
