"""Custom stateful streaming operators — the one reference semantics
Spark has no built-in for: the first-event-anchored per-user rate
limiter (reference: INCR + EXPIRE-on-first, auto_kafka_redis.py:
348-366 — the window starts at the first event and expires TTL later,
unlike tumbling epoch windows).

Implemented with ``applyInPandasWithState``: state per user =
(window_start_us, admitted_count); event-time timeout evicts idle
state one window after the watermark passes it (bounded state at
100 TB — SURVEY §2 scale notes).
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator
from typing import Any

import pandas as pd

# Python workers import this module while unpickling the stateful
# kernel; PySpark's state serializer concat of empty frames trips a
# pandas FutureWarning once per (worker, batch, key-group) — pure noise
# in any harness log. Scope the filter to that message, not the class.
warnings.filterwarnings(
    "ignore",
    message=".*DataFrame concatenation with empty or all-NA entries.*",
    category=FutureWarning,
)
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_OUTPUT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
RATE_STATE_SCHEMA = "win_start_us long, admitted int"


def make_rate_limiter(limit: int, window_s: int):
    """Build the per-key kernel. Kept importable/picklable at module
    scope via closure over plain ints."""
    window_us = window_s * 1_000_000

    def limit_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        win_start, admitted = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            import numpy as np

            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
            n = len(ts_us)
            keep = np.zeros(n, dtype=bool)
            # windows anchor at their first event and admit the first
            # `limit` rows before the next anchor — so the scan jumps
            # window-by-window via searchsorted (iterations = number of
            # WINDOWS in the batch, not number of rows; the per-row
            # Python loop this replaces was the pipeline's hot spot)
            i = 0
            if win_start is not None:
                # continue the window left open by the previous batch
                j = int(np.searchsorted(ts_us, win_start + window_us, "left"))
                room = limit - admitted
                if room > 0:
                    k = min(room, j - i)
                    keep[i : i + k] = True
                    admitted += k
                i = j
            while i < n:
                win_start = int(ts_us[i])
                j = int(np.searchsorted(ts_us, win_start + window_us, "left"))
                admitted = min(limit, j - i)
                keep[i : i + admitted] = True
                i = j
            if keep.any():
                yield pdf[keep]
        state.update((win_start, admitted))
        if win_start is not None:
            # evict once the watermark passes the window end
            state.setTimeoutTimestamp((win_start + window_us) // 1000)

    return limit_fn


def rate_limit_stream(
    events: DataFrame,
    limit: int = 5,
    window_s: int = 60,
    watermark: str | None = "60 seconds",
) -> DataFrame:
    """First-event-anchored rate limit over a stream. ``events`` must
    carry event-time column ``ts``. Pass ``watermark=None`` when an
    upstream operator already declared one (Spark disallows
    redefinition past a stateful operator)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            make_rate_limiter(limit, window_s),
            RATE_OUTPUT_SCHEMA,
            RATE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
