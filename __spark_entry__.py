"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`eventstream_notify_spark.registry`, which holds
every implemented operator from SURVEY.md §2 as a named query builder
plus its DuckDB oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from eventstream_notify_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the composed reference pipeline (B5: scan -> filter_valid ->
    ttl-dedup -> per-user rate limit -> per-user admission stats).
    """
    return registry.queries()["pipeline_e2e"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted keys => rows-only check."""
    return registry.oracle_sql()
