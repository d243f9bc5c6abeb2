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

# Queries beyond the SURVEY §2 contract register with a sort-late prefix:
# the driver's correctness gate verifies the first 50 names in sorted
# order, and the 49 contract names must all land inside that window.
# Extras still run (bench, tests, driver overflow slots) — they just
# never displace a contract row from driver verification.
EXTRA_PREFIX = "zx_"


def register(
    name: str, oracle: str | None = None, extra: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under its SURVEY §2 name.

    ``extra=True`` marks a beyond-contract query; it registers under
    ``zx_<name>`` so every §2 contract name sorts ahead of it.
    """
    reg_name = EXTRA_PREFIX + name if extra else name

    def deco(fn: QueryFn) -> QueryFn:
        if reg_name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {reg_name}")
        _REGISTRY[reg_name] = Registered(name=reg_name, fn=fn, oracle=oracle)
        return fn

    return deco


def lookup(name: str) -> Registered:
    """Resolve a query by its bare name, prefix-agnostic (for tests/tools)."""
    _load_all()
    reg = _REGISTRY.get(name) or _REGISTRY.get(EXTRA_PREFIX + name)
    if reg is None:
        raise KeyError(name)
    return reg


def _load_all() -> None:
    """Import every operator module so decorators run."""
    from eventstream_notify_spark.operators import (  # noqa: F401
        alerts,
        analytics,
        curation,
        events,
        layout,
        modern,
        multimodal,
        relational,
        sampling,
        temporal,
        text,
        tpch,
        timeseries,
        vectors,
    )
    from eventstream_notify_spark.streaming import (  # noqa: F401
        dedup,
        pipeline,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: reg.fn for name, reg in sorted(_REGISTRY.items())}


def registered() -> dict[str, Registered]:
    """The full registry records (name -> Registered) — for tools that
    need implementation sites or verification mode, not just the fn."""
    _load_all()
    return dict(sorted(_REGISTRY.items()))


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: reg.oracle
        for name, reg in sorted(_REGISTRY.items())
        if reg.oracle is not None
    }
