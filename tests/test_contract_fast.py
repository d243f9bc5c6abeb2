"""Fast pre-commit lane (``pytest -m contract``): the 49 SURVEY §2
contract queries against the DuckDB oracle at sf0.001, reusing the
session-scoped Spark fixture so no second JVM spins up.  The full
sf0.01 sweep (``tools/check_oracle.py``) remains the round gate;
this lane exists so iteration stays under ~3 minutes (VERDICT r7 #8).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import run_sweep  # noqa: E402
from test_registry_contract import CONTRACT  # noqa: E402

pytestmark = pytest.mark.contract


def test_contract_queries_match_oracle_sf0001(spark, sf_dir):
    failures = run_sweep(sf_dir, only=set(CONTRACT), spark=spark)
    assert not failures, f"contract oracle mismatches: {failures}"
