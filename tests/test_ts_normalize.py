"""Guard tests for events.ts physical-layout normalization.

The driver has regenerated the testdata with different parquet
physical types for ``events.ts`` across rounds — TIMESTAMP(NANOS)
(read as int64 via the nanosAsLong legacy conf) and
TIMESTAMP_NTZ(MICROS). A layout change must never silently mis-scale
event time: both the batch catalog and the streaming file source
route through ``catalog.normalize_events_ts``, and these tests pin
the resulting epoch-micros against DuckDB reading the SAME file
(DuckDB interprets naive parquet timestamps as-written, i.e. the
same UTC wall-clock the engine pins via the session timezone).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import normalize_events_ts, table


def _duck_bounds(sf_dir: str) -> tuple[int, int, int]:
    row = duckdb.sql(
        "select count(*), min(epoch_us(ts)), max(epoch_us(ts)) "
        f"from read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    return int(row[0]), int(row[1]), int(row[2])


def test_batch_ts_matches_duckdb_epoch_micros(spark, sf_dir):
    cnt, lo, hi = _duck_bounds(sf_dir)
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.agg(
        F.count("*").alias("n"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).first()
    assert (got["n"], got["lo"], got["hi"]) == (cnt, lo, hi)


def test_streaming_source_ts_matches_batch(spark, sf_dir):
    """The streaming file source must yield bit-identical event time to
    the batch catalog — a unit mismatch here collapses every window
    (the round-4 failure mode: micros div 1000 -> everything in 1970)."""
    from eventstream_notify_spark.sources.events import file_events_stream

    stream = file_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    agg = stream.groupBy().agg(
        F.count("*").alias("n"),
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ts_guard")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from ts_guard").first()
    cnt, lo, hi = _duck_bounds(sf_dir)
    assert (got["n"], got["lo"], got["hi"]) == (cnt, lo, hi)


def test_normalize_is_layout_insensitive(spark, sf_dir):
    """All three historical layouts of ts converge to the same instant:
    nanos-as-bigint, TIMESTAMP_NTZ micros, and instant TIMESTAMP."""
    base = table(spark, sf_dir, "events").select("event_id", "ts").limit(100)
    want = {r["event_id"]: r["us"] for r in
            base.select("event_id", F.unix_micros("ts").alias("us")).collect()}

    as_nanos = base.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    as_ntz = base.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    for variant in (as_nanos, as_ntz, base):
        norm = normalize_events_ts(variant)
        assert dict(norm.dtypes)["ts"] == "timestamp"
        got = {r["event_id"]: r["us"] for r in
               norm.select("event_id", F.unix_micros("ts").alias("us")).collect()}
        assert got == want
