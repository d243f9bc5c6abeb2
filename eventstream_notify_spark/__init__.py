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
"""

__version__ = "0.1.0"
