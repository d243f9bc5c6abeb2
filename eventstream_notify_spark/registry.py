"""Central operator registry — the driver contract's backbone.

Every operator from SURVEY.md §2 registers here as a named query
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
a DuckDB oracle SQL twin. ``__spark_entry__.py`` exposes these to the
driver verbatim.

Convention for oracle compatibility (see SURVEY.md §7 risk register):
- alias every computed column identically on both sides;
- never emit raw TIMESTAMP columns — emit ``unix_micros`` bigints or
  formatted date strings (tz/precision-proof);
- round floating aggregates (6 d.p. for scores/avgs); use decimal
  accumulation for money sums where drift could flip a rounding;
- deterministic tie-breaks on every rank/limit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Registered:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => rows-only check


_REGISTRY: dict[str, Registered] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under its SURVEY §2 name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = Registered(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so decorators run."""
    from eventstream_notify_spark.operators import (  # noqa: F401
        alerts,
        events,
        multimodal,
        relational,
        temporal,
        text,
        tpch,
        timeseries,
        vectors,
    )
    from eventstream_notify_spark.streaming import pipeline  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: reg.fn for name, reg in sorted(_REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: reg.oracle
        for name, reg in sorted(_REGISTRY.items())
        if reg.oracle is not None
    }
