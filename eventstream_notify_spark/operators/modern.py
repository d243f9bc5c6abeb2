"""Spark 4.x-native surface — VARIANT, SQL pipe syntax, Python UDTFs,
and the Python DataSource API.

These are the engine's NEWEST extension points, demonstrated the same
way D20 demonstrates the pandas-UDF surface: one oracle-checked query
each, so the repo proves the modern API breadth a reference user
would expect from an actively-maintained Spark-native engine — not
just the classic DataFrame operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register


@register(
    "scalar_variant",
    extra=True,
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` once into a binary
    semi-structured value, then typed ``variant_get`` paths — the
    engine-native answer to repeated ``get_json_object`` calls, which
    re-parse the JSON text per extraction (VARIANT parses once and
    the shredded binary encodes field offsets). Same answers as the
    string-path D17 ``scalar_json``; at 100 TB the parse-once
    difference is a full scan's worth of CPU per extra field."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
    )


@register(
    "sql_pipe_syntax",
    extra=True,
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>`): the same logical plan as the
    classic SELECT, written as a left-to-right pipeline — Catalyst
    parses both to identical plans, so pushdown/pruning/partial agg
    all fire unchanged. Semantics pinned by the plain-SQL oracle."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |> AGGREGATE CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
                     COUNT(*) AS n
           GROUP BY l_returnflag
        |> SELECT l_returnflag, sum_qty, n
        """
    )


@register(
    "udtf_surface",
    extra=True,
    oracle="""
    WITH words AS (
        SELECT d.doc_id, u.pos, u.word
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents WHERE doc_id % 100 = 0) d,
             LATERAL (SELECT UNNEST(ws[1:5]) AS word,
                             UNNEST(range(1, least(len(ws), 5) + 1)) AS pos) u
    )
    SELECT doc_id, CAST(pos AS INT) AS pos, word FROM words
    """,
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF surface (the table-function analogue of
    D20's scalar pandas-UDF surface): one input row fans out to N
    output rows from Python. Like every Python seam in this repo it
    is the DELIBERATE slow path — the same expansion is a posexplode
    one line away (and that is what the oracle uses); the point is
    the API: lateral-join semantics, typed output schema, executor-
    side Python iteration."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: int, word: string")
    class FirstWords:
        def eval(self, text: str, k: int):  # noqa: ANN001
            import re

            for i, w in enumerate(
                re.findall("[a-z0-9]+", (text or "").lower())[:k]
            ):
                yield i + 1, w

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    return d.lateralJoin(
        FirstWords(F.col("text").outer(), lit(5))
    ).select("doc_id", "pos", "word")


@register(
    "pyds_eventgen",
    extra=True,
    oracle="""
    SELECT i AS event_id,
           i % 7 AS user_id,
           CAST(i % 100 AS DOUBLE) / 4 AS value,
           1704067200000000 + i * 250000 AS ts_us
    FROM range(400) t(i)
    """,
)
def pyds_eventgen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API: a custom ``format("esn_gen")``
    source generating the reference's deterministic event shape
    (auto_kafka_redis.py:191-207's producer, minus randomness) from
    pure arithmetic — the extension point you'd use to wrap a real
    external system (the reference's Kafka producer, a REST feed)
    as a first-class readable source. Partition-aware: the reader
    splits the id range into 4 partitions, so the scan parallelizes
    exactly like a built-in source; each partition's rows derive from
    the global row index, so the output is partitioning-independent."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangePart(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _GenReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 400))

        def partitions(self):
            step = (self.n + 3) // 4
            return [
                _RangePart(b, min(self.n, b + step))
                for b in range(0, self.n, step)
            ]

        def read(self, part):
            for i in range(part.start, part.end):
                yield (i, i % 7, (i % 100) / 4.0, 1704067200000000 + i * 250000)

    class EventGenSource(DataSource):
        @classmethod
        def name(cls):
            return "esn_gen"

        def schema(self):
            return (
                "event_id bigint, user_id bigint, value double, ts_us bigint"
            )

        def reader(self, schema):
            return _GenReader(self.options)

    # idempotent per session: re-registering the same source is fine
    spark.dataSource.register(EventGenSource)
    return spark.read.format("esn_gen").option("n", "400").load()


@register(
    "pyds_event_stream",
    extra=True,
    oracle="""
    SELECT i AS event_id,
           i % 7 AS user_id,
           CAST(i % 50 AS DOUBLE) / 2 AS value
    FROM range(400) t(i)
    """,
)
def pyds_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API, STREAMING side: a
    ``SimpleDataSourceStreamReader`` that serves deterministic
    100-row micro-batches with real offset bookkeeping
    (initialOffset → read → readBetweenOffsets replay), consumed
    through the live micro-batch engine until the 400-row generator
    drains. This is the extension seam for wrapping an external feed
    (the reference's Kafka topic, a REST poll) as a first-class
    STREAMING source when no built-in connector exists; offsets make
    it exactly-once replayable from the checkpoint. The engine sees
    4 incremental batches — not one bounded scan — so the test
    covers the offset-advance path availableNow short-circuits.
    Output is the full drained stream (stateless projection ⇒ batch
    boundaries can't affect row content), so the oracle is exact."""
    import tempfile
    import time

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    N, STEP = 400, 100

    class _StreamGenReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            s = start["i"]
            e = min(s + STEP, N)
            return (
                iter([(i, i % 7, (i % 50) / 2.0) for i in range(s, e)]),
                {"i": e},
            )

        def readBetweenOffsets(self, start, end):
            return iter(
                [(i, i % 7, (i % 50) / 2.0) for i in range(start["i"], end["i"])]
            )

    class EventStreamGenSource(DataSource):
        @classmethod
        def name(cls):
            return "esn_stream_gen"

        def schema(self):
            return "event_id bigint, user_id bigint, value double"

        def simpleStreamReader(self, schema):
            return _StreamGenReader()

    spark.dataSource.register(EventStreamGenSource)
    name = f"q_pyds_stream_{int(time.time() * 1000) % 10_000_000}"
    q = (
        spark.readStream.format("esn_stream_gen")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pyds_stream_"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while spark.table(name).count() < N:
            if time.time() > deadline:
                raise TimeoutError("python stream source never drained")
            time.sleep(0.2)
    finally:
        q.stop()
    return spark.table(name)
