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


class _BufSock:
    """Socket shim that replays bytes read past the handshake first.

    Under suite load the server's first WS frames can land in the
    same recv() as the 101 response; asserting the buffer ENDS at the
    handshake boundary made the e2e test flaky (seen once per full
    suite). Frame bytes pre-read during the handshake are buffered
    and consumed by _ws_recv_frame before touching the socket."""

    def __init__(self, s: socket.socket, rest: bytes) -> None:
        self.s, self.buf = s, rest

    def recv(self, n: int) -> bytes:
        if self.buf:
            out, self.buf = self.buf[:n], self.buf[n:]
            return out
        return self.s.recv(n)

    def sendall(self, data: bytes) -> None:
        self.s.sendall(data)

    def close(self) -> None:
        self.s.close()


def _ws_connect(port: int, path: str) -> "_BufSock":
    """Minimal stdlib RFC 6455 client: handshake + accept check."""
    import base64
    import hashlib

    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (
            f"GET {path} HTTP/1.1\r\nHost: x\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += s.recv(4096)
    head, rest = buf.split(b"\r\n\r\n", 1)
    head = head.decode()
    assert "101" in head.split("\r\n")[0]
    want = base64.b64encode(
        hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
        ).digest()
    ).decode()
    assert f"Sec-WebSocket-Accept: {want}" in head
    return _BufSock(s, rest)


def _ws_recv_frame(s: socket.socket) -> tuple[int, bytes]:
    """Read one unmasked server frame (lengths <= 64 KiB)."""
    import struct

    def rd(n: int) -> bytes:
        out = b""
        while len(out) < n:
            c = s.recv(n - len(out))
            if not c:
                raise ConnectionError("EOF")
            out += c
        return out

    b0, b1 = rd(2)
    ln = b1 & 0x7F
    if ln == 126:
        ln = struct.unpack("!H", rd(2))[0]
    elif ln == 127:
        ln = struct.unpack("!Q", rd(8))[0]
    return b0 & 0x0F, rd(ln)


def _ws_send(s: socket.socket, payload: bytes, opcode: int) -> None:
    """Send one MASKED client frame (RFC 6455 requires client masking)."""
    import struct

    mask = b"\x37\xfa\x21\x3d"
    assert len(payload) < 126
    s.sendall(
        struct.pack("!BB", 0x80 | opcode, 0x80 | len(payload))
        + mask
        + bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    )


def test_websocket_replay_then_tail_and_control_frames():
    """Real RFC 6455 round trip against /ws: handshake accept key,
    lexicographic last-n replay as text frames, live tail of a
    publish, ping->pong, and close-frame echo — the reference's
    actual client protocol (websocket_server.py:48-77), no SSE."""
    hub = ServingHub()
    hub.publish(
        [(str(i), json.dumps({"id": i})) for i in range(60)]
    )
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        s = _ws_connect(port, "/ws?last_n=5")
        want_ids = [
            int(k.split(":")[1])
            for k in sorted(f"event:{i}" for i in range(60))[-5:]
        ]
        got = []
        while len(got) < 5:
            op, data = _ws_recv_frame(s)
            if op == 0x9:  # server keep-alive ping — ignore
                continue
            assert op == 0x1
            got.append(json.loads(data)["id"])
        assert got == want_ids

        # live tail: publish after replay must arrive as a text frame
        hub.publish([("live", json.dumps({"id": "live"}))])
        while True:
            op, data = _ws_recv_frame(s)
            if op == 0x1:
                break
        assert json.loads(data)["id"] == "live"

        # ping -> pong with payload echo
        _ws_send(s, b"hi", 0x9)
        while True:
            op, data = _ws_recv_frame(s)
            if op == 0xA:
                break
        assert data == b"hi"

        # close -> echoed close
        _ws_send(s, b"", 0x8)
        while True:
            op, data = _ws_recv_frame(s)
            if op == 0x8:
                break
        s.close()
    finally:
        srv.stop()


def test_pipeline_to_websocket_end_to_end(spark, sf_dir, tmp_path):
    """The reference's FULL client path over its real protocol:
    replayed stream → dedup → rate limit → hub sink → a WebSocket
    client receives the replay buffer as RFC 6455 text frames in
    wire format, then a live publish arrives as a tailed frame."""
    from eventstream_notify_spark.sources.events import file_events_stream
    from eventstream_notify_spark.streaming.pipeline import start_pipeline

    hub = ServingHub()
    q = start_pipeline(
        file_events_stream(spark, sf_dir),
        str(tmp_path / "ckpt_ws"),
        hub.sink,
        rate_window_s=86400,
        rate_limit=10**9,
        available_now=True,
    )
    q.awaitTermination()
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        s = _ws_connect(port, "/ws?last_n=10")
        frames = []
        while len(frames) < 10:
            op, data = _ws_recv_frame(s)
            if op == 0x1:
                frames.append(json.loads(data))
        # wire-format payloads straight from the pipeline sink
        assert all(
            set(f) == {"id", "value", "user_id", "timestamp"}
            for f in frames
        )
        # live tail after replay
        hub.publish([("tail", json.dumps({"id": "tail"}))])
        while True:
            op, data = _ws_recv_frame(s)
            if op == 0x1 and json.loads(data).get("id") == "tail":
                break
        _ws_send(s, b"", 0x8)
        s.close()
    finally:
        srv.stop()


def test_dashboard_page_served():
    """GET / serves the static dashboard (the reference React UI's
    counterpart, WebUI.jpg): HTML that wires itself to /ws with an
    SSE /stream fallback and renders the C1-C4 stat panels."""
    hub = ServingHub()
    srv = EventsHttpServer(hub)
    port = srv.start()
    try:
        for path in ("/", "/dashboard"):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10
            ) as resp:
                assert resp.status == 200
                assert resp.headers["Content-Type"].startswith("text/html")
                page = resp.read().decode()
            assert "event-stream" in page
            assert "/ws?last_n=" in page  # live protocol
            assert "/stream?last_n=" in page  # SSE fallback
            for panel in ("USER STATS", "RATE", "events/min"):
                assert panel in page
    finally:
        srv.stop()
