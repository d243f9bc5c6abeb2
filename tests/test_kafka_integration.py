"""Wire-transport integration round trip.

The full loop — produce wire JSON → streaming ingest →
``parse_wire_events`` → pipeline → keyed sink → egress serialization
→ re-consume — runs UNCONDITIONALLY against the file transport
(``wire_file_stream`` / ``wire_file_sink``: identical code path with
a parquet 'topic' directory standing in for the broker), mirroring
the reference's producer/consumer pair (auto_kafka_redis.py:191-229
produce, :296-304 consume).

The live-broker variant of the same loop stays env-gated: set
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (and put the Spark Kafka connector on
the classpath, e.g. ``--packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``) to run
it — the only lines it adds over the file variant are broker options.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

needs_broker = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no Kafka broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP to run",
)


def _canonical_fixture(spark, n=50):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        (F.col("id") % 5 + 1).alias("user_id"),
        F.lit("event").alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
        F.format_string('{"k": %d}', F.col("id") % 100).alias("props"),
    )


def test_wire_file_transport_produce_pipeline_sink_roundtrip(
    spark, tmp_path
):
    """The full wire loop with the parquet-dir transport: produce
    wire rows → ``wire_file_stream`` (same parse_wire_events as the
    Kafka reader) → REAL pipeline → MergeKeyedStore, then
    ``wire_file_sink`` egress (same to_wire as the Kafka writer) →
    batch re-read → parse: both hops preserve the canonical columns.
    Runs in every CI — no broker required."""
    from eventstream_notify_spark.sources.events import (
        parse_wire_events,
        to_wire,
        wire_file_sink,
        wire_file_stream,
    )
    from eventstream_notify_spark.streaming.pipeline import start_pipeline
    from eventstream_notify_spark.streaming.sinks import MergeKeyedStore

    topic_in = str(tmp_path / "topic_in")
    topic_out = str(tmp_path / "topic_out")
    events = _canonical_fixture(spark)

    # 1. produce the wire shape onto the file transport
    to_wire(events).write.parquet(topic_in)

    # 2. consume through the REAL pipeline into the keyed sink
    store = MergeKeyedStore(str(tmp_path / "store"))
    q = start_pipeline(
        wire_file_stream(spark, topic_in),
        str(tmp_path / "ckpt_in"),
        store.upsert_batch,
        rate_window_s=86400,
        rate_limit=10**9,  # ingest-parity run: no admission drops
        available_now=True,
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.user_id, r.value)
        for r in store.current(spark).collect()
    }
    want = {(r.event_id, r.user_id, r.value) for r in events.collect()}
    assert got == want

    # 3. egress the stored state and re-consume it batch-side
    sink_q = wire_file_sink(
        _bounded_stream(spark, store, tmp_path),
        topic_out,
        str(tmp_path / "ckpt_out"),
    )
    sink_q.awaitTermination(120)
    sink_q.stop()
    back = spark.read.parquet(topic_out)
    reparsed = {
        (r.event_id, r.user_id, r.value)
        for r in parse_wire_events(back).collect()
    }
    assert reparsed == want


@needs_broker
def test_kafka_produce_pipeline_sink_roundtrip(spark, tmp_path):
    """produce(wire) → kafka_events_stream → start_pipeline →
    MergeKeyedStore, then kafka_events_sink egress → batch re-consume
    → parse: both hops preserve the canonical columns."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.sources.events import (
        kafka_events_sink,
        kafka_events_stream,
        parse_wire_events,
        to_wire,
    )
    from eventstream_notify_spark.streaming.pipeline import start_pipeline
    from eventstream_notify_spark.streaming.sinks import MergeKeyedStore

    topic_in = f"esn_it_in_{uuid.uuid4().hex[:8]}"
    topic_out = f"esn_it_out_{uuid.uuid4().hex[:8]}"
    events = _canonical_fixture(spark)

    # 1. produce the wire shape (batch Kafka write)
    (
        to_wire(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic_in)
        .save()
    )

    # 2. consume through the REAL pipeline into the keyed sink
    store = MergeKeyedStore(str(tmp_path / "store"))
    q = start_pipeline(
        kafka_events_stream(spark, BOOTSTRAP, topic_in),
        str(tmp_path / "ckpt_in"),
        store.upsert_batch,
        rate_window_s=86400,
        rate_limit=10**9,  # ingest-parity run: no admission drops
        available_now=True,
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.user_id, r.value)
        for r in store.current(spark).collect()
    }
    want = {
        (r.event_id, r.user_id, r.value) for r in events.collect()
    }
    assert got == want

    # 3. egress the stored state and re-consume it batch-side
    sink_q = kafka_events_sink(
        _bounded_stream(spark, store, tmp_path),
        BOOTSTRAP,
        topic_out,
        str(tmp_path / "ckpt_out"),
    )
    sink_q.awaitTermination(120)
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic_out)
        .option("startingOffsets", "earliest")
        .load()
    )
    reparsed = {
        (r.event_id, r.user_id, r.value)
        for r in parse_wire_events(back).collect()
    }
    assert reparsed == want


def _bounded_stream(spark, store, tmp_path):
    """Replay the store's state as a bounded stream for the egress leg."""
    path = str(tmp_path / "egress_src")
    store.current(spark).select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).write.mode("overwrite").parquet(path)
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ).parquet(path)
    )
