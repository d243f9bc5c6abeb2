"""The shared AQE-hang guard (VERDICT r11 #1).

``bench.exec_with_timeout`` defends every sequential harness — the
bench suite, the oracle correctness sweep, and both scale audits —
against the jstack-verified driver-side wedge class (an eager
localCheckpoint's AdaptiveSparkPlanExec parked forever in
``withFinalPlanUpdate``, zero CPU, no cancellable job). These tests
pin the guard's contract: values pass through, exceptions re-raise,
a wedge raises TimeoutError promptly, and a wedged query inside the
oracle sweep records as ITS OWN failure instead of stalling (and so
erasing the correctness signal of) every query behind it.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bench import exec_with_timeout  # noqa: E402


def test_value_passes_through():
    assert exec_with_timeout(lambda: 41 + 1, timeout_s=5.0) == 42


def test_exception_reraises():
    with pytest.raises(ValueError, match="boom"):
        exec_with_timeout(lambda: (_ for _ in ()).throw(ValueError("boom")),
                          timeout_s=5.0)


def test_hang_raises_timeout_promptly():
    t0 = time.time()
    with pytest.raises(TimeoutError, match="exceeded"):
        exec_with_timeout(lambda: time.sleep(30), timeout_s=0.3)
    # the guard must return right after the deadline, not after the
    # abandoned thread finishes
    assert time.time() - t0 < 5.0


def test_hang_cancels_jobs_best_effort():
    """A timeout with a spark handle calls cancelAllJobs (the slow-
    query case: unlike the AQE wedge, a genuinely slow query still has
    running jobs that would contend with everything measured after
    it). A broken handle must not mask the TimeoutError."""

    class _Ctx:
        cancelled = False

        def cancelAllJobs(self):
            _Ctx.cancelled = True

    class _Spark:
        sparkContext = _Ctx()

    with pytest.raises(TimeoutError):
        exec_with_timeout(lambda: time.sleep(30), timeout_s=0.3, spark=_Spark())
    assert _Ctx.cancelled

    class _Broken:
        @property
        def sparkContext(self):
            raise RuntimeError("gateway down")

    with pytest.raises(TimeoutError):
        exec_with_timeout(lambda: time.sleep(30), timeout_s=0.3, spark=_Broken())


def test_oracle_sweep_survives_wedged_query(spark, sf_dir, monkeypatch):
    """A query that wedges mid-sweep records as its own FAIL (HANG)
    and the sweep CONTINUES — the queries after it still get real
    verdicts. This is the exact failure mode VERDICT r11 #1 names:
    without the guard, one wedge turns every remaining CORRECTNESS
    row into `err`."""
    import __spark_entry__ as entrymod
    import check_oracle

    real_qs = entrymod.queries()

    def hang(_spark, _sf):
        time.sleep(60)

    fake = {
        "agg_total_count": real_qs["agg_total_count"],
        "wedged_query": hang,
        "filter_valid": real_qs["filter_valid"],
    }
    # warm the two real queries once so the sweep measures them hot —
    # a cold first toPandas pays several seconds of codegen that the
    # deliberately tight test timeout must not count against it
    for name in ("agg_total_count", "filter_valid"):
        real_qs[name](spark, sf_dir).toPandas()
    monkeypatch.setattr(entrymod, "queries", lambda: fake)
    failures = check_oracle.run_sweep(
        sf_dir, spark=spark, timeout_s=10.0
    )
    assert failures == ["wedged_query"]
