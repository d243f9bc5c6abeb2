"""Serving-shell parity tests: the REST snapshot and the SSE
replay-then-tail endpoint against the in-process hub, end to end
through the REAL streaming pipeline (reference: app.py /events;
websocket_server.py /ws replay+subscribe)."""

from __future__ import annotations

import json
import socket
import urllib.request

from eventstream_notify_spark.serving import EventsHttpServer, ServingHub


def _get_json(port: int, path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as resp:
        return json.loads(resp.read())


def _read_sse_events(port: int, path: str, n: int) -> list[dict]:
    """Read n SSE data frames with a raw socket (urllib buffers)."""
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.sendall(
        f"GET {path} HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n".encode()
    )
    buf = b""
    out = []
    s.settimeout(10)
    while len(out) < n:
        chunk = s.recv(4096)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            frame, buf = buf.split(b"\n\n", 1)
            for line in frame.split(b"\n"):
                if line.startswith(b"data: "):
                    out.append(json.loads(line[6:]))
    s.close()
    return out[:n]


def test_rest_snapshot_and_sse_replay_then_tail():
    """Hub-level: publish 60 events, snapshot returns all; /stream
    replays the LEXICOGRAPHIC last 50 (the reference quirk: 'event:99'
    > 'event:100') then tails a live publish."""
    hub = ServingHub()
    hub.publish(
        [(str(i), json.dumps({"id": i, "value": f"event-{i}"})) for i in range(60)]
    )
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        snap = _get_json(port, "/events")
        assert {e["id"] for e in snap} == set(range(60))

        # lexicographic replay: sorted("event:0".."event:59") last 5
        want_keys = sorted(f"event:{i}" for i in range(60))[-5:]
        want_ids = [int(k.split(":")[1]) for k in want_keys]
        got = _read_sse_events(port, "/stream?last_n=5", 5)
        assert [e["id"] for e in got] == want_ids

        # replay then TAIL: publish after the stream is open
        import threading
        import time

        def late_publish():
            time.sleep(0.5)
            hub.publish([("999", json.dumps({"id": 999, "value": "event-999"}))])

        t = threading.Thread(target=late_publish)
        t.start()
        got6 = _read_sse_events(port, "/stream?last_n=5", 6)
        t.join()
        assert got6[-1]["id"] == 999
        assert [e["id"] for e in got6[:5]] == want_ids
    finally:
        srv.stop()


def test_pipeline_to_serving_end_to_end(spark, sf_dir, tmp_path):
    """The full reference shape: replayed stream → dedup → rate limit
    → hub sink (SET + PUBLISH per micro-batch) → REST snapshot shows
    the accepted events in wire format."""
    from eventstream_notify_spark.streaming.pipeline import start_pipeline
    from eventstream_notify_spark.sources.events import file_events_stream

    hub = ServingHub()
    q = start_pipeline(
        file_events_stream(spark, sf_dir),
        str(tmp_path / "ckpt"),
        hub.sink,
        rate_window_s=86400,
        rate_limit=10**9,  # parity run: admit everything deduped
        available_now=True,
    )
    q.awaitTermination()
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        snap = _get_json(port, "/events")
        assert len(snap) > 0
        # wire-format payloads: reference shape {id, value, user_id, timestamp}
        sample = snap[0]
        assert set(sample) == {"id", "value", "user_id", "timestamp"}
        assert sample["user_id"].startswith("user")
    finally:
        srv.stop()


def test_stats_endpoint_matches_payloads():
    """/stats = the dashboard aggregates (C1-C4 shapes) over the hub."""
    hub = ServingHub()
    hub.publish(
        [
            (
                str(i),
                json.dumps(
                    {
                        "id": i,
                        "value": f"event-{i}",
                        "user_id": f"user{i % 3}",
                        "timestamp": 1_704_067_200.0 + i * 30,
                    }
                ),
            )
            for i in range(12)
        ]
    )
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        stats = _get_json(port, "/stats")
        assert stats["total_events"] == 12
        assert stats["distinct_users"] == 3
        assert stats["events_per_user"] == {"user0": 4, "user1": 4, "user2": 4}
        # 12 events at 30 s spacing = 2 per minute over 6 minutes
        assert list(stats["events_per_minute"].values()) == [2] * 6
    finally:
        srv.stop()
