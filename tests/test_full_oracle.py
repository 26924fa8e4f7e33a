"""CI-style full-board oracle sweep (VERDICT r8 Next #8): the driver
checks a rotating 50-slot window per round, so a query registered today
may first get driver evidence rounds later — the dq_null_profile oracle
typo shipped exactly that way (registered r5, first checked r8).  This
target re-runs EVERY registered oracle pair locally:

    SPARK_GRAFT_FULL_ORACLE=1 python -m pytest tests/test_full_oracle.py -q

Kept out of the default suite (~8 min at sf0.01) behind the env var; the
per-round green log is committed at tools/full_oracle_r{N}.log."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_ORACLE") != "1",
    reason="full-board sweep: set SPARK_GRAFT_FULL_ORACLE=1 to run",
)
def test_every_registered_oracle_pair_is_green():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_correctness.py")],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    tail = [l for l in proc.stdout.replace("\r", "\n").splitlines() if l.strip()]
    summary = tail[-1] if tail else ""
    assert proc.returncode == 0, f"sweep failed: {summary}\n{proc.stderr[-2000:]}"
    n, _, total = summary.partition("/")
    assert n.strip().isdigit() and total.split()[0] == n.strip(), summary
