"""Full-registry physical-plan sweep — every registered batch query
audited for CartesianProduct / stray BatchEvalPython / unpartitioned
windows.  Deliberately NOT in the ``-m contract`` fast lane (it costs
~3.5 min on its own); the lane covers the 49 contract queries via
tests/test_plans.py::test_contract_query_plans_are_scale_clean and
this module remains the round-gate backstop for the zx_ extras.
"""

from __future__ import annotations

from eventstream_notify_spark.registry import queries
from test_plans import scale_clean_failures


def test_every_query_plan_is_scale_clean(spark):
    failures = scale_clean_failures(spark, set(queries()))
    assert not failures, "\n".join(failures)
