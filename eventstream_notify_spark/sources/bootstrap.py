"""Engine bootstrap — ops-side parity with the reference's startup
sequence (SURVEY §2.A A7/A8, §3.1 step 1):

- wait_for dependencies (reference: wait_for_redis/wait_for_kafka,
  auto_kafka_redis.py:116-143) → here: the source existence probe;
- idempotent topic creation (ensure_topic_exists, :149-164, incl. the
  already-exists race) → ensure_topic below;
- offset restore (:231-270) → nothing to do: Structured Streaming's
  checkpointLocation WAL restores exactly-once positions itself.

Kafka admin is imported lazily so the engine runs in brokerless
environments (CI uses file/rate sources).
"""

from __future__ import annotations

import time


def ensure_topic(
    bootstrap_servers: str,
    topic: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
    timeout_s: float = 60.0,
) -> bool:
    """Create ``topic`` if absent; tolerate the concurrent-create race.
    Returns True if the topic exists on exit. Mirrors the reference's
    ensure_topic_exists semantics (idempotent, race-tolerant)."""
    try:
        from kafka.admin import KafkaAdminClient, NewTopic
        from kafka.errors import TopicAlreadyExistsError
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "kafka-python not installed; ensure_topic requires a Kafka "
            "environment (CI uses file/rate sources instead)"
        ) from e

    deadline = time.monotonic() + timeout_s
    last_err: Exception | None = None
    while time.monotonic() < deadline:  # pragma: no cover - needs broker
        try:
            admin = KafkaAdminClient(bootstrap_servers=bootstrap_servers)
            try:
                if topic in admin.list_topics():
                    return True
                try:
                    admin.create_topics(
                        [NewTopic(topic, num_partitions, replication_factor)]
                    )
                except TopicAlreadyExistsError:
                    pass  # concurrent creator won the race — fine
                return True
            finally:
                admin.close()
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(1.0)
    raise TimeoutError(f"Kafka not reachable within {timeout_s}s: {last_err}")
