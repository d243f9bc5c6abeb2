"""Live-Kafka integration round trip — env-gated.

The container CI has no broker, so this module SKIPS cleanly unless
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` points at one (and the Spark Kafka
connector is on the classpath, e.g. ``--packages
org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``). With a
broker it exercises the one path the wire round-trip inverse test
(test_sources.py) cannot: the real produce → ``kafka_events_stream``
→ pipeline → keyed sink → ``kafka_events_sink`` → re-consume loop,
mirroring the reference's producer/consumer pair
(auto_kafka_redis.py:191-229 produce, :296-304 consume).
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
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
