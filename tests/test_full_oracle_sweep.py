"""VERDICT r2 item 8: the driver-mirror tool itself (tools/check_oracle.py)
runs the FULL registered-query sweep in a fresh bare-session subprocess as
one slow-marked test, so the out-of-window queries — and the tool the
judge/driver use to check them — can never silently rot between rounds.

This intentionally duplicates test_oracle_queries.py's in-process sweep
with a different harness: a subprocess with a bare SparkSession (no
builder confs), exactly how the external driver runs queries.

Runs as part of the default suite (the gate must not be opt-in); skip
during quick local iteration with  pytest -m "not slow".
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from conftest import SF_DIR


@pytest.mark.slow
def test_check_oracle_full_sweep_bare_session():
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "--bare-session", SF_DIR],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=3600,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    assert proc.returncode == 0, f"sweep failed: {tail}\n{proc.stderr[-2000:]}"
    # final line is "N/N passed"
    n, slash_n = tail.split(" ")[0].split("/")
    assert n == slash_n and int(n) > 0, tail
