"""Engaged-cap regression gate (round 5).

The dedup caps (SHINGLE_DF_CAP, LSH max_bucket, SemDeDup cluster cap,
simhash band cap) are no-ops on the gate corpora — the canary tests
assert headroom, but nothing in the default suite used to prove the
lanes behave correctly when a cap actually BINDS. This module builds a
replicated slice (40 copies of the first 100 sf0.001 documents, each
document in a 40-member exact-duplicate class) where shingle DF reaches
40x its base value (max base DF in the subset is 4 -> 160 > 128), and asserts:

1. the caps really engage (dedup_cap_audit reports n_capped > 0), and
2. the df-capped lanes stay EXACTLY oracle-paired in that regime —
   the cap is lane semantics mirrored in the oracle SQL, not a silent
   engine-side truncation.

(The star-pair fallback lanes — semdedup, simhash pairs — are expected
to DIVERGE from their full-quadratic oracles when capped; that loss is
what the audit lane publishes, so they are deliberately absent here.)
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from hybrid_data_lakehouse_lab_spark.plans import ORACLES, QUERIES
from hybrid_data_lakehouse_lab_spark.testing.compare import duck_con, frames_equal

from conftest import SF_DIR

EXACT_UNDER_CAP = [
    "dedup_cap_audit",
    "dedup_ngram_jaccard",
    "dedup_containment",
]


@pytest.fixture(scope="module")
def slice_dir(tmp_path_factory):
    from make_scaled_slice import build

    dst = tmp_path_factory.mktemp("engaged") / "slice"
    build(SF_DIR, str(dst), k=40, doc_limit=100)
    return str(dst)


@pytest.fixture(scope="module")
def slice_con(slice_dir):
    return duck_con(slice_dir)


def test_caps_actually_engage(spark, slice_dir):
    audit = {
        r["lane"]: r for r in QUERIES["dedup_cap_audit"](spark, slice_dir).collect()
    }
    assert set(audit) == {
        "lsh_bucket",
        "semdedup_cluster",
        "shingle_df",
        "simhash_band",
    }
    # 40-member duplicate classes push shingle DF to 40x base — past 128
    assert audit["shingle_df"]["n_capped"] > 0, audit["shingle_df"]
    assert audit["shingle_df"]["max_group_size"] > 128
    # 20000 vectors over 8 clusters -> every cluster past the 1024 cap
    assert audit["semdedup_cluster"]["n_capped"] > 0, audit["semdedup_cluster"]


@pytest.mark.parametrize("name", EXACT_UNDER_CAP)
def test_df_capped_lanes_stay_oracle_exact(name, spark, slice_dir, slice_con):
    sdf = QUERIES[name](spark, slice_dir).toPandas()
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
    ddf = slice_con.execute(ORACLES[name]).fetchdf()
    ok, why = frames_equal(sdf, ddf)
    assert ok, f"{name} under engaged caps: {why}"
