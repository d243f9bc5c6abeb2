"""End-to-end notification tests: the reference's raison d'être —
accepted events fan out as notifications (store + alert channel),
exactly once (reference: SET + PUBLISH per flush,
auto_kafka_redis.py:370-380)."""

from __future__ import annotations

import datetime as dt

from eventstream_notify_spark.streaming.pipeline import notify_sink, start_pipeline
from eventstream_notify_spark.streaming.sinks import ParquetKeyedStore

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def ev(i, ts_s, uid, etype="click", value=1.0):
    return (
        i,
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
        uid,
        etype,
        value,
        '{"k": 1}',
    )


def test_streaming_alerts_land_in_alert_store(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [
        ev(1, 0, 1, "error", 200.0),     # fires rules 1 (+2)
        ev(2, 1, 2, "view", 100.0),      # fires nothing
        ev(3, 2, 3, "purchase", 5.0),    # fires rule 3
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src + "/b0")
    store = ParquetKeyedStore(str(tmp_path / "store"))
    alerts = ParquetKeyedStore(str(tmp_path / "alerts"), key="alert_id")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = start_pipeline(
        stream,
        str(tmp_path / "ckpt"),
        notify_sink(store, alerts),
        available_now=True,
    )
    q.awaitTermination()

    assert sorted(r.event_id for r in store.compacted(spark).collect()) == [1, 2, 3]
    fired = {
        (r.rule_id, r.event_id) for r in alerts.compacted(spark).collect()
    }
    assert fired == {(1, 1), (2, 1), (3, 3)}


def test_store_compaction_preserves_kv_view(spark, tmp_path):
    store = ParquetKeyedStore(str(tmp_path / "store"))
    df1 = spark.createDataFrame([ev(1, 0, 1, value=1.0), ev(2, 0, 1)], SCHEMA)
    df2 = spark.createDataFrame([ev(1, 60, 1, value=9.0)], SCHEMA)
    store.upsert_batch(df1, 0)
    store.upsert_batch(df2, 1)
    before = {(r.event_id, r.value) for r in store.compacted(spark).collect()}
    store.compact(spark)
    after = {(r.event_id, r.value) for r in store.compacted(spark).collect()}
    assert before == after == {(1, 9.0), (2, 1.0)}
    # the log itself shrank to exactly the KV view
    assert store.log(spark).count() == 2
