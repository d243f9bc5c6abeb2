"""eventstream_notify_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference
event-stream notification pipeline (unspokenmyth/EventStream-Notify:
Kafka -> dedup/rate-limit/micro-batch -> Redis KV + Pub/Sub -> WS
dashboard), re-expressed Spark-first:

- Structured Streaming for the pipeline semantics (dedup-with-TTL,
  per-key rate limiting, micro-batching, checkpoint/restore, fan-out).
- DataFrame/SQL for the query surface (the dashboard aggregations and
  a full relational substrate).
- LLM-data-pipeline extension operators (dedup families, similarity
  search, multimodal columns, text analysis) designed for 100 TB.

Every batch operator is a thin declarative query builder: Catalyst
handles pushdown, pruning, join selection and codegen; we only add
semantics Spark lacks.

Public surface (see README "Quickstart"):

>>> from eventstream_notify_spark import get_spark, queries, table
>>> spark = get_spark()
>>> events = table(spark, "/root/testdata/sf0.001", "events")
>>> result = queries()["pipeline_e2e"](spark, "/root/testdata/sf0.001")

- :func:`get_spark` — the engine SparkSession factory (AQE, RocksDB
  state store, UTC, Arrow; ``session.py``).
- :func:`table` / :data:`TABLES` — the schema'd parquet catalog
  (``catalog.py``).
- :func:`queries` / :func:`oracle_sql` / :func:`lookup` /
  :func:`registered` — the operator registry: every named operator as
  a ``(spark, sf_dir) -> DataFrame`` builder plus its DuckDB oracle
  twin (``registry.py``).
- :class:`ServingHub` / :class:`EventsHttpServer` — the serving shell
  (REST snapshot, SSE, WebSocket, dashboard; ``serving.py``).
- Operator families as submodules: ``operators.events``,
  ``operators.relational``, ``operators.text``, ``operators.vectors``,
  ``operators.multimodal``, ``operators.timeseries``, ``streaming.*``
  (each function documented in place; the registry is the index).

Imports are lazy (module ``__getattr__``): ``import
eventstream_notify_spark`` stays cheap; pulling a name loads only the
module that defines it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

__version__ = "0.1.0"

__all__ = [
    "EventsHttpServer",
    "ServingHub",
    "TABLES",
    "get_spark",
    "lookup",
    "oracle_sql",
    "queries",
    "registered",
    "table",
]

_EXPORTS = {
    "get_spark": "eventstream_notify_spark.session",
    "table": "eventstream_notify_spark.catalog",
    "TABLES": "eventstream_notify_spark.catalog",
    "queries": "eventstream_notify_spark.registry",
    "oracle_sql": "eventstream_notify_spark.registry",
    "lookup": "eventstream_notify_spark.registry",
    "registered": "eventstream_notify_spark.registry",
    "ServingHub": "eventstream_notify_spark.serving",
    "EventsHttpServer": "eventstream_notify_spark.serving",
}

if TYPE_CHECKING:  # pragma: no cover — static-analysis aliases only
    from eventstream_notify_spark.catalog import TABLES, table  # noqa: F401
    from eventstream_notify_spark.registry import (  # noqa: F401
        lookup,
        oracle_sql,
        queries,
        registered,
    )
    from eventstream_notify_spark.serving import (  # noqa: F401
        EventsHttpServer,
        ServingHub,
    )
    from eventstream_notify_spark.session import get_spark  # noqa: F401


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__() -> list[str]:
    return sorted(set(globals()) | set(_EXPORTS))
