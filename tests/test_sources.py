"""Source-format generality: the wire JSON path (A1) round-trips
through files with explicit schemas and observable corrupt records —
no schema inference anywhere (implicit schemas don't survive 100 TB
or schema drift)."""

from __future__ import annotations

import json

from eventstream_notify_spark.sources.events import parse_wire_events


def test_json_lines_wire_roundtrip(spark, tmp_path):
    path = str(tmp_path / "wire")
    lines = [
        json.dumps({"id": 1, "value": "event-1", "user_id": "u1",
                    "timestamp": 1704067200.5}),
        json.dumps({"id": 2, "value": "event-2", "user_id": "u2",
                    "timestamp": 1704067201.0}),
        "corrupt {not json",
        json.dumps({"value": "no-id", "user_id": "u3",
                    "timestamp": 1704067202.0}),  # null id: B4 path
    ]
    (tmp_path / "wire").mkdir()
    (tmp_path / "wire" / "part-0.txt").write_text("\n".join(lines))

    raw = spark.read.text(path)  # value: string — same shape as Kafka
    events = parse_wire_events(raw)
    rows = events.collect()
    good = [r for r in rows if r._corrupt_record is None]
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert {r.event_id for r in good} == {1, 2, None}
    assert len(corrupt) == 1
    # event-time preserved to the microsecond through the double field
    e1 = next(r for r in good if r.event_id == 1)
    assert e1.ts.microsecond == 500000
    # stringly-typed wire fields normalized to canonical types
    assert e1.user_id == 1 and e1.value == 1.0 and e1.event_type == "event"


def test_csv_events_with_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "csv")
    (tmp_path / "csv").mkdir()
    (tmp_path / "csv" / "events.csv").write_text(
        "event_id,ts,user_id,event_type,value,props\n"
        '1,2024-01-01T00:00:00.5,7,click,1.5,"{""k"": 3}"\n'
        "bad-row,nope,x,y,z,w\n"
    )
    df = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(p)
    )
    rows = df.collect()
    ok = [r for r in rows if r.event_id is not None]
    assert len(ok) == 1 and ok[0].user_id == 7 and ok[0].value == 1.5
    assert len(rows) == 2  # malformed row kept as all-null (observable)


def test_wire_roundtrip_inverse(spark):
    """to_wire (Kafka egress serialization) inverts parse_wire_events'
    normalization losslessly for reference-shaped events (alpha
    event_type, integral value — the only shape the reference's
    digit-suffix wire format can carry): canonical -> wire JSON ->
    canonical survives with identical values INCLUDING event_type and
    value, which really ride the wire (not event_id-derived)."""
    import datetime as dt

    from eventstream_notify_spark.sources.events import (
        parse_wire_events,
        to_wire,
    )

    events = spark.createDataFrame(
        [
            (7, dt.datetime(2024, 1, 1, 0, 0, 0, 500000,
                            tzinfo=dt.timezone.utc), 3, "event", 123.0),
            (1_000_001, dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc),
             12, "click", 9.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    back = parse_wire_events(to_wire(events)).collect()
    cols = lambda r: (r.event_id, r.user_id, r.ts, r.event_type, r.value)  # noqa: E731
    assert {cols(r) for r in back} == {cols(r) for r in events.collect()}
    assert all(r._corrupt_record is None for r in back)
    # the wire payload carries the REAL value, not an event_id echo
    wire = to_wire(events).collect()
    assert any('"value":"event-123"' in r.value for r in wire)
    assert any('"value":"click-9"' in r.value for r in wire)


def test_wire_stream_drops_corrupt_payloads_explicitly(spark, tmp_path):
    """The pipeline-facing wire view must drop undecodable messages
    (the reference drops them silently; we drop them at a named seam)
    while parse_wire_events keeps them observable in _corrupt_record
    for batch consumers."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.sources.events import (
        parse_wire_events,
        wire_file_stream,
    )
    from eventstream_notify_spark.streaming.pipeline import run_bounded

    topic = str(tmp_path / "topic")
    good = '{"id": 1, "value": "event-7", "user_id": "user3", "timestamp": 1704067200.0}'
    rows = [("1", good), ("2", "not json at all"), ("3", "{}")]
    spark.createDataFrame(rows, "key string, value string").write.parquet(
        topic
    )
    # batch view: corrupt rows visible
    batch = parse_wire_events(spark.read.parquet(topic))
    corrupt = batch.filter(F.col("_corrupt_record").isNotNull()).count()
    assert corrupt == 2
    # stream view: only the decodable row reaches the pipeline
    out = run_bounded(wire_file_stream(spark, topic))
    got = [(r.event_id, r.user_id, r.value) for r in out.collect()]
    assert got == [(1, 3, 7.0)]
