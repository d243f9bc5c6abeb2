"""Unit tests for the reference-semantics batch twins (SURVEY §2.A-§2.C).

Edge cases from SURVEY §5.2: all-duplicates dedup, burst-over-limit
rate limiting (the "25-invariant"), null ids, lexicographic replay
boundary (event:999 vs event:1000).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eventstream_notify_spark.operators import events as ops


def ev(i, ts_s, uid, etype="click", value=1.0, props='{"k": 1}'):
    return (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts_s), uid, etype, value, props)


def make_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_dedup_all_duplicates(spark):
    df = make_events(spark, [ev(1, i, 7) for i in range(10)])
    out = ops.first_per_key(df, ["event_id"], [F.col("ts")]).collect()
    assert len(out) == 1
    assert out[0].ts == dt.datetime(2024, 1, 1)


def test_dedup_idempotent(spark):
    df = make_events(spark, [ev(i % 3, i, 1) for i in range(12)])
    once = ops.first_per_key(df, ["event_id"], [F.col("ts")])
    twice = ops.first_per_key(once, ["event_id"], [F.col("ts")])
    assert sorted(r.event_id for r in once.collect()) == sorted(
        r.event_id for r in twice.collect()
    )
    assert once.count() == 3


def test_rate_limit_25_invariant(spark):
    # 5 users x 40 events in one 60s window -> exactly 5*5=25 admitted
    rows = [ev(u * 1000 + i, i, u) for u in range(5) for i in range(40)]
    df = make_events(spark, rows)
    out = ops.rate_limit(df, window_s=60, limit=5)
    assert out.count() == 25
    per_user = {r.user_id: r.cnt for r in out.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert per_user == {u: 5 for u in range(5)}


def test_rate_limit_window_reset(spark):
    # one user, 10 events in window 1, 3 in window 2 -> 5 + 3 admitted
    rows = [ev(i, i, 1) for i in range(10)] + [ev(100 + i, 70 + i, 1) for i in range(3)]
    df = make_events(spark, rows)
    out = ops.rate_limit(df, window_s=60, limit=5)
    assert out.count() == 8


def test_rate_limit_keeps_earliest(spark):
    rows = [ev(i, 10 - i, 1) for i in range(10)]  # reversed arrival order
    out = ops.rate_limit(make_events(spark, rows), window_s=60, limit=5)
    kept = sorted(r.event_id for r in out.collect())
    assert kept == [5, 6, 7, 8, 9]  # the 5 earliest timestamps


def test_filter_valid_null_paths(spark):
    rows = [
        ev(1, 0, 1),
        (None, dt.datetime(2024, 1, 1), 1, "click", 1.0, '{"k": 1}'),
        (2, dt.datetime(2024, 1, 1), None, "click", 1.0, '{"k": 1}'),
        (3, dt.datetime(2024, 1, 1), 1, "click", 1.0, "not json"),
    ]
    out = ops.filter_valid(make_events(spark, rows))
    assert [r.event_id for r in out.collect()] == [1]


def test_latest_per_key_upsert(spark):
    rows = [ev(1, 0, 1, value=1.0), ev(1, 5, 1, value=2.0), ev(2, 0, 1, value=3.0)]
    out = ops.latest_per_key(
        make_events(spark, rows), ["event_id"], [F.col("ts"), F.col("value")]
    )
    got = {r.event_id: r.value for r in out.collect()}
    assert got == {1: 2.0, 2: 3.0}


def test_replay_lexicographic_quirk(spark, sf_dir):
    # 'event:999' sorts AFTER 'event:1000' lexicographically — the
    # reference's string-sort semantics (websocket_server.py:54-56).
    df = make_events(spark, [ev(999, 0, 1), ev(1000, 0, 1), ev(998, 0, 1)])
    keys = (
        df.select(F.format_string("event:%d", F.col("event_id")).alias("key"))
        .orderBy(F.col("key").desc())
        .limit(2)
        .collect()
    )
    assert [r.key for r in keys] == ["event:999", "event:998"]


def test_pipeline_composition_order(spark):
    # duplicate floods must be deduped BEFORE rate limiting: 10 copies of
    # one id + 6 distinct events for the same user in one window
    rows = [ev(1, 0, 1) for _ in range(10)] + [ev(10 + i, i + 1, 1) for i in range(6)]
    out = ops.events_pipeline(make_events(spark, rows), window_s=60)
    # dedup -> 7 events; rate limit 5/window -> 5 admitted
    assert out.count() == 5


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "admitted", "sum_value"} <= set(df.columns)
