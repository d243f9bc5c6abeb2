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


def test_hang_cancels_only_its_job_group():
    """A timeout with a spark handle cancels the GUARDED CALL'S job
    group, not all jobs (VERDICT r12 #6: cancelAllJobs was correct
    for the sequential harnesses, but would kill innocent concurrent
    jobs if the guard were reused from a session with parallel work).
    The group is set from inside the guarded thread and the same id
    is cancelled on timeout. A broken handle must not mask the
    TimeoutError."""

    class _Ctx:
        set_group = None
        cancelled_group = None

        def setJobGroup(self, gid, desc, interrupt):
            _Ctx.set_group = (gid, interrupt)

        def setLocalProperty(self, k, v):
            pass

        def cancelJobGroup(self, gid):
            _Ctx.cancelled_group = gid

    class _Spark:
        sparkContext = _Ctx()

    with pytest.raises(TimeoutError):
        exec_with_timeout(lambda: time.sleep(30), timeout_s=0.3, spark=_Spark())
    assert _Ctx.set_group is not None
    gid, interrupt = _Ctx.set_group
    assert gid.startswith("swg-guard-")
    assert interrupt is True  # running tasks get interrupted, not just queued
    assert _Ctx.cancelled_group == gid

    class _Broken:
        @property
        def sparkContext(self):
            raise RuntimeError("gateway down")

    with pytest.raises(TimeoutError):
        exec_with_timeout(lambda: time.sleep(30), timeout_s=0.3, spark=_Broken())


def test_timeout_spares_unrelated_concurrent_job(spark):
    """VERDICT r12 #6 acceptance: an UNRELATED Spark job running
    concurrently in another thread survives a guard timeout — the
    cancel is scoped to the guarded call's job group. Under the old
    cancelAllJobs cleanup the bystander below was killed."""
    import threading

    def _sleep_partitions(secs):
        def gen(it):
            import time as _t

            for pdf in it:
                _t.sleep(secs)
                yield pdf

        return gen

    bystander_out = {}

    def bystander():
        try:
            df = spark.range(2).repartition(2)
            bystander_out["n"] = len(
                df.mapInPandas(_sleep_partitions(4.0), df.schema).collect()
            )
        except Exception as e:  # noqa: BLE001 — assert below surfaces it
            bystander_out["e"] = e

    b = threading.Thread(target=bystander)
    b.start()
    time.sleep(1.0)  # let the bystander's tasks actually start
    slow = spark.range(1).repartition(1)
    with pytest.raises(TimeoutError):
        exec_with_timeout(
            lambda: slow.mapInPandas(_sleep_partitions(30.0), slow.schema)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            timeout_s=1.5,
            spark=spark,
        )
    b.join(timeout=60.0)
    assert not b.is_alive()
    assert "e" not in bystander_out, f"bystander killed: {bystander_out.get('e')}"
    assert bystander_out["n"] == 2


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
