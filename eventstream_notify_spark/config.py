"""Engine configuration — the reference's ``config.yaml`` surface.

The reference loads an optional ``config.yaml`` next to the script and
shallow-merges it over defaults (auto_kafka_redis.py:43-67). This
module mirrors that contract exactly — same section/key names, same
defaults, same merge semantics — and maps the result onto engine
options:

- ``kafka.*``            -> source options for ``kafka_events_stream``
- ``producer.*``         -> ``rate_events_stream`` events/second
- ``consumer.*``         -> dedup TTL, rate-limit count/window, sink
                            batch size (``start_pipeline`` kwargs)
- ``redis.*``            -> accepted and surfaced (the engine's keyed
                            sink replaces Redis; the values are kept so
                            a reference config file loads verbatim)

A user of the reference can point the engine at their existing
config.yaml unchanged.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any

# Same defaults as the reference (auto_kafka_redis.py:43-53).
DEFAULT_CONFIG: dict[str, dict[str, Any]] = {
    "kafka": {
        "bootstrap_servers": "127.0.0.1:9092",
        "topic": "test_topic",
        "num_partitions": 1,
        "replication_factor": 1,
    },
    "redis": {"host": "127.0.0.1", "port": 6379, "db": 0},
    "producer": {"enabled": True, "produce_interval_s": 0.05},
    "consumer": {
        "batch_size": 32,
        "dedup_ttl_s": 60,
        "rate_limit_count": 5,
        "rate_limit_window_s": 60,
    },
}


@dataclass(frozen=True)
class EngineConfig:
    """Typed view of the merged configuration."""

    bootstrap_servers: str
    topic: str
    num_partitions: int
    producer_enabled: bool
    events_per_second: float  # 1 / produce_interval_s
    batch_size: int
    dedup_ttl_s: int
    rate_limit_count: int
    rate_limit_window_s: int
    raw: dict[str, dict[str, Any]] = field(repr=False, default_factory=dict)

    def kafka_source_options(self) -> dict[str, str]:
        """Options for ``readStream.format("kafka")``."""
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": "earliest",
        }

    def pipeline_kwargs(self) -> dict[str, Any]:
        """kwargs for ``streaming.pipeline.start_pipeline``."""
        return {
            "ttl": f"{self.dedup_ttl_s} seconds",
            "rate_limit": self.rate_limit_count,
            "rate_window_s": self.rate_limit_window_s,
        }


def _merge(base: dict[str, Any], overlay: dict[str, Any]) -> dict[str, Any]:
    """The reference's shallow merge: section dicts update, scalars
    replace (auto_kafka_redis.py:58-64)."""
    cfg = copy.deepcopy(base)
    for k, v in (overlay or {}).items():
        if isinstance(v, dict) and isinstance(cfg.get(k), dict):
            cfg[k].update(v)
        else:
            cfg[k] = v
    return cfg


def load_config(path: str | None = "config.yaml") -> EngineConfig:
    """Load ``config.yaml`` if present, else defaults — same missing-
    file behavior as the reference (FileNotFoundError -> defaults)."""
    overlay: dict[str, Any] = {}
    if path is not None:
        # open BEFORE importing yaml: when no config file exists, pure
        # defaults must work even without PyYAML (the reference
        # degrades to defaults). A present file with no yaml module
        # still raises ImportError — silently ignoring a real config
        # would be worse.
        try:
            f = open(path)
        except FileNotFoundError:
            overlay = {}
        else:
            with f:
                import yaml

                overlay = yaml.safe_load(f) or {}
    cfg = _merge(DEFAULT_CONFIG, overlay)
    interval = float(cfg["producer"].get("produce_interval_s", 0.05)) or 0.05
    return EngineConfig(
        bootstrap_servers=cfg["kafka"]["bootstrap_servers"],
        topic=cfg["kafka"]["topic"],
        num_partitions=int(cfg["kafka"].get("num_partitions", 1)),
        producer_enabled=bool(cfg["producer"].get("enabled", True)),
        events_per_second=1.0 / interval,
        batch_size=int(cfg["consumer"].get("batch_size", 32)),
        dedup_ttl_s=int(cfg["consumer"].get("dedup_ttl_s", 60)),
        rate_limit_count=int(cfg["consumer"].get("rate_limit_count", 5)),
        rate_limit_window_s=int(cfg["consumer"].get("rate_limit_window_s", 60)),
        raw=cfg,
    )
