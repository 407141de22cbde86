"""Every audit gate must report ALL-PASS on the pristine test corpora —
a gate that cries wolf on healthy data is useless as a promotion gate
(both wolf-crying bugs this guards against were real: an SCD2
contiguity check that flagged legitimate delete-closed versions, and a
contract enum that listed 'login' instead of the corpus's 'error')."""

from __future__ import annotations

import pytest

from hybrid_data_lakehouse_lab_spark.plans import QUERIES

GATES = [
    ("events_data_contract_audit", "passed"),
    ("referential_integrity_audit", "passed"),
    ("scd2_invariants_audit", "passed"),
]


@pytest.mark.parametrize("lane,flag", GATES)
def test_gate_all_pass_on_pristine_data(spark, sf_dir, lane, flag):
    rows = QUERIES[lane](spark, sf_dir).collect()
    failing = [r for r in rows if not r[flag]]
    assert not failing, f"{lane} flags pristine data: {failing}"
