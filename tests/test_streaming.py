"""Streaming-semantics tests: multi-batch behavior the bounded oracle
runs can't observe — cross-batch TTL dedup, late-data handling,
first-event-anchored rate limiting (the '25-invariant'), exactly-once
checkpoint recovery, idempotent epoch overwrite (SURVEY §5.2 items
3-5)."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eventstream_notify_spark.streaming.pipeline import (
    run_bounded,
    start_pipeline,
    streaming_dedup,
)
from eventstream_notify_spark.streaming.sinks import ParquetKeyedStore
from eventstream_notify_spark.streaming.state import rate_limit_stream

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def ev(i, ts_s, uid, value=1.0):
    return (
        i,
        dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
        uid,
        "click",
        value,
        '{"k": 1}',
    )


def write_batch(spark, path, rows, batch_no):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, f"batch_{batch_no}")
    )


def stream_from(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def test_streaming_dedup_across_batches(spark, tmp_path):
    path = str(tmp_path / "src")
    # batch files are discovered in one availableNow run but processed
    # as separate micro-batches (maxFilesPerTrigger=1) -> dedup state
    # must carry across batches
    write_batch(spark, path, [ev(1, 0, 1), ev(2, 1, 1)], 0)
    write_batch(spark, path, [ev(1, 5, 1), ev(3, 6, 1)], 1)  # dup id=1
    out = run_bounded(streaming_dedup(stream_from(spark, path), ttl="10 minutes"))
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]


def test_stateful_rate_limit_25_invariant(spark, tmp_path):
    path = str(tmp_path / "src")
    rows = [ev(u * 1000 + i, i, u) for u in range(5) for i in range(40)]
    write_batch(spark, path, rows, 0)
    out = run_bounded(
        rate_limit_stream(stream_from(spark, path), limit=5, window_s=60)
    )
    assert out.count() == 25  # 5 users x 5 admitted
    per_user = out.groupBy("user_id").count().collect()
    assert all(r["count"] == 5 for r in per_user)


def test_stateful_rate_limit_anchored_window(spark, tmp_path):
    # Redis semantics: window anchors at FIRST event, not epoch
    # boundaries. Events at t=50..54 (5 admitted), t=55..59 dropped,
    # t=111 admitted (first window [50,110) expired).
    path = str(tmp_path / "src")
    rows = [ev(i, 50 + i, 1) for i in range(10)] + [ev(99, 111, 1)]
    write_batch(spark, path, rows, 0)
    out = run_bounded(
        rate_limit_stream(stream_from(spark, path), limit=5, window_s=60)
    )
    kept = sorted(r.event_id for r in out.collect())
    assert kept == [0, 1, 2, 3, 4, 99]


def test_pipeline_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """Kill-and-restart: a second run over the same checkpoint must not
    re-emit already-committed events (the reference's seek-to-stored+1,
    auto_kafka_redis.py:261-270 — ours via the checkpoint WAL)."""
    src_path = str(tmp_path / "src")
    store = ParquetKeyedStore(str(tmp_path / "store"))
    ckpt = str(tmp_path / "ckpt")
    write_batch(spark, src_path, [ev(1, 0, 1), ev(2, 1, 2)], 0)
    q = start_pipeline(
        stream_from(spark, src_path), ckpt, store.upsert_batch, available_now=True
    )
    q.awaitTermination()
    first_epochs = {r._epoch for r in store.log(spark).select("_epoch").collect()}

    # new data arrives; restart from the same checkpoint
    write_batch(spark, src_path, [ev(3, 2, 1)], 1)
    q2 = start_pipeline(
        stream_from(spark, src_path), ckpt, store.upsert_batch, available_now=True
    )
    q2.awaitTermination()

    compacted = store.compacted(spark)
    assert sorted(r.event_id for r in compacted.collect()) == [1, 2, 3]
    # old epochs were not rewritten (no reprocessing of committed data)
    log = store.log(spark)
    assert log.count() == 3
    new_epochs = {r._epoch for r in log.select("_epoch").collect()}
    assert first_epochs < new_epochs


def test_keyed_store_epoch_overwrite_idempotent(spark, tmp_path):
    """A replayed micro-batch (same epoch id) overwrites itself —
    the exactly-once guarantee of the sink."""
    store = ParquetKeyedStore(str(tmp_path / "store"))
    df = spark.createDataFrame([ev(1, 0, 1, value=1.0)], SCHEMA)
    store.upsert_batch(df, 7)
    store.upsert_batch(df, 7)  # replay
    assert store.log(spark).count() == 1
    assert store.compacted(spark).first().value == 1.0


def test_keyed_store_latest_wins(spark, tmp_path):
    store = ParquetKeyedStore(str(tmp_path / "store"))
    df1 = spark.createDataFrame([ev(1, 0, 1, value=1.0)], SCHEMA)
    df2 = spark.createDataFrame([ev(1, 60, 1, value=2.0)], SCHEMA)
    store.upsert_batch(df1, 0)
    store.upsert_batch(df2, 1)
    assert store.compacted(spark).first().value == 2.0


def test_rate_source_generator_runs(spark):
    from eventstream_notify_spark.sources.events import rate_events_stream

    # the rate source never terminates, so assert plan properties only
    df = rate_events_stream(spark)
    assert df.isStreaming
    assert set(df.columns) == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }


def test_parse_wire_events_corrupt_path(spark):
    from eventstream_notify_spark.sources.events import parse_wire_events

    raw = spark.createDataFrame(
        [
            ('{"id": 1, "value": "event-1", "user_id": "u1", "timestamp": 1704067200.5}',),
            ("not json at all",),
        ],
        "value string",
    )
    parsed = parse_wire_events(raw)
    # Wire events normalize to the canonical EVENT_SCHEMA types so the
    # Kafka path plugs into the stateful operators unchanged.
    from eventstream_notify_spark.catalog import EVENT_SCHEMA

    canon = {f.name: f.dataType for f in EVENT_SCHEMA.fields}
    got = {f.name: f.dataType for f in parsed.schema.fields
           if f.name != "_corrupt_record"}
    assert got == canon
    out = parsed.collect()
    good = [r for r in out if r.event_id is not None]
    bad = [r for r in out if r.event_id is None]
    assert len(good) == 1
    assert good[0].user_id == 1 and good[0].value == 1.0
    assert good[0].event_type == "event" and '"k"' in good[0].props
    assert len(bad) == 1 and bad[0]._corrupt_record == "not json at all"


class _FakeState:
    """Minimal GroupState double for driving stateful kernels directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def setTimeoutTimestamp(self, _ms):
        pass


def test_stream_ewma_kernel_multibatch_equals_whole_window():
    """Feed the EWMA kernel the same rows as ONE batch and as TWO
    batches split mid-window: outputs must be identical — the carried
    state (last 19 values) plus the sliding recurrence must reproduce
    the whole-history window exactly."""
    import pandas as pd

    from eventstream_notify_spark.streaming.state import ewma_fn

    rows = pd.DataFrame(
        {
            "user_id": [7] * 50,
            "event_id": list(range(50)),
            "ts_us": [1_000_000 * (i + 1) for i in range(50)],
            "v_int": [((i * 37) % 101) * 1_000_000 for i in range(50)],
        }
    )

    def run(splits):
        state = _FakeState()
        outs = []
        for part in splits:
            outs.extend(ewma_fn((7,), iter([part]), state))
        return pd.concat(outs, ignore_index=True)

    one = run([rows])
    two = run([rows.iloc[:23], rows.iloc[23:]])
    three = run([rows.iloc[:5], rows.iloc[5:30], rows.iloc[30:]])
    pd.testing.assert_frame_equal(one, two)
    pd.testing.assert_frame_equal(one, three)
    # spot-check the first value: window of itself only
    assert one["ewma"].iloc[0] == rows["v_int"].iloc[0] / 1e6


def test_stream_cep_kernel_burst_across_batches_fires_once():
    """A 3+-error run split across micro-batches must alert exactly
    once (on the 3rd error), wherever the split falls; a non-error
    resets the run; out-of-order chunks within one batch are sorted
    before the scan."""
    import pandas as pd

    from eventstream_notify_spark.streaming.state import cep_burst_fn

    types = ["error", "error", "error", "error", "view",
             "error", "error", "error", "click"]
    rows = pd.DataFrame(
        {
            "user_id": [7] * len(types),
            "event_id": list(range(len(types))),
            "ts_us": [1_000_000 * (i + 1) for i in range(len(types))],
            "event_type": types,
        }
    )

    def run(splits):
        state = _FakeState()
        outs = []
        for part in splits:
            outs.extend(cep_burst_fn((7,), iter([part]), state))
        return pd.concat(outs, ignore_index=True)

    want_ids = [2, 7]  # 3rd error of each maximal burst
    for splits in (
        [rows],
        [rows.iloc[:1], rows.iloc[1:2], rows.iloc[2:]],
        [rows.iloc[:4], rows.iloc[4:]],
        [rows.iloc[:6], rows.iloc[6:]],
    ):
        got = run(splits)
        assert list(got["event_id"]) == want_ids, splits
    # chunk-interleave within one batch: kernel must sort first
    shuffled = rows.sample(frac=1.0, random_state=5).reset_index(drop=True)
    got = run([shuffled])
    assert list(got["event_id"]) == want_ids


def test_cep_buffered_late_event_folds_in_event_time_order(
    spark, tmp_path
):
    """E4-pattern late-data injection: an in-watermark late error
    arriving in a LATER micro-batch. The buffered kernel folds it in
    event-time order and fires the alert on the true 3rd error; the
    ordered-replay kernel folds arrival-order and anchors the alert on
    the late row instead — the documented contract difference."""
    from eventstream_notify_spark.streaming.state import (
        cep_burst_buffered_stream,
        cep_burst_stream,
    )

    def err(i, ts_s, uid):
        return (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
            uid,
            "error",
            1.0,
            '{"k": 1}',
        )

    def build(path):
        # user 1: errors at t=0 and t=60 arrive first; the t=30 error
        # arrives one batch later (within the 10 min watermark)
        write_batch(spark, path, [err(1, 0, 1), err(3, 60, 1)], 0)
        write_batch(spark, path, [err(2, 30, 1)], 1)
        # flush sentinel: a far-future non-error pushes the watermark
        # past every buffered row so the frontier timeout fires
        write_batch(spark, path, [ev(999, 90_000, 99)], 2)

    base_us = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    ) * 1_000_000

    p1 = str(tmp_path / "buffered")
    build(p1)
    buffered = sorted(
        (r.user_id, r.event_id, r.ts_us)
        for r in run_bounded(
            cep_burst_buffered_stream(
                stream_from(spark, p1), watermark="10 minutes"
            )
        ).collect()
    )
    # event-time truth: errors 1(t0), 2(t30), 3(t60) -> alert on id 3
    assert buffered == [(1, 3, base_us + 60 * 1_000_000)]

    p2 = str(tmp_path / "ordered")
    build(p2)
    ordered = sorted(
        (r.user_id, r.event_id, r.ts_us)
        for r in run_bounded(
            cep_burst_stream(stream_from(spark, p2), watermark="10 minutes")
        ).collect()
    )
    # arrival-order fold anchors the alert on the late row (id 2)
    assert ordered == [(1, 2, base_us + 30 * 1_000_000)]


def test_cep_buffered_matches_ordered_on_ordered_source(spark, tmp_path):
    """On a per-user-ordered multi-batch source both kernels emit the
    identical alert set (the buffered variant is a superset contract,
    not a different semantics)."""
    from eventstream_notify_spark.streaming.state import (
        cep_burst_buffered_stream,
        cep_burst_stream,
    )

    def err(i, ts_s, uid):
        return (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s),
            uid,
            "error",
            1.0,
            '{"k": 1}',
        )

    def build(path):
        # burst of 4 for user 1 split across batches (alert on 3rd),
        # burst of 2 for user 2 (no alert), per-user arrival = ts order
        write_batch(
            spark, path, [err(1, 0, 1), err(2, 10, 1), err(10, 5, 2)], 0
        )
        write_batch(spark, path, [err(3, 20, 1), err(4, 30, 1)], 1)
        write_batch(spark, path, [err(11, 40, 2), ev(999, 90_000, 99)], 2)

    p1 = str(tmp_path / "b")
    build(p1)
    buffered = sorted(
        (r.user_id, r.event_id)
        for r in run_bounded(
            cep_burst_buffered_stream(
                stream_from(spark, p1), watermark="10 minutes"
            )
        ).collect()
    )
    p2 = str(tmp_path / "o")
    build(p2)
    ordered = sorted(
        (r.user_id, r.event_id)
        for r in run_bounded(
            cep_burst_stream(stream_from(spark, p2), watermark="10 minutes")
        ).collect()
    )
    assert buffered == ordered == [(1, 3)]
