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
        # Grouping by key is the only ordering guarantee; a group that
        # spans several Arrow chunks can interleave, and the
        # window-anchor recurrence is order-sensitive — materialize
        # the group and sort once (same hazard as ewma_fn below).
        chunks = [c for c in pdfs if len(c)]
        for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
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

EWMA_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, ewma double"
)
EWMA_STATE_SCHEMA = "vals array<long>"
EWMA_LOOKBACK = 20  # window: current row + 19 predecessors


def ewma_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful streaming EWMA — the exact-integer ts_ewma kernel
    (alpha = 1/2 as power-of-two weights over a 20-row lookback)
    carried across micro-batches: state is the last 19 quantized
    values, so the first rows of batch N+1 see exactly the window the
    batch operator would. Weighted sums run in arbitrary-precision
    Python ints with an O(1) sliding recurrence
    (num_p = 2*num_{p-1} + v_p, minus the evicted 2^19 term when the
    window is full); the only floats are the final two IEEE divisions
    — bit-identical to the batch/oracle formula."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    hist: list[int] = list(state.get[0]) if state.exists else []
    last_ts = None
    # applyInPandasWithState guarantees only grouping by key — a
    # group's micro-batch rows can arrive as MULTIPLE Arrow chunks in
    # shuffle-interleave order (>~10k rows per group, or rows from
    # several map tasks). Sorting each chunk independently would run
    # the recurrence over mis-ordered frames, so materialize the whole
    # group and sort ONCE before computing.
    chunks = [c for c in pdfs if len(c)]
    pdf = (
        pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        if chunks
        else None
    )
    if pdf is not None:
        vints = [int(v) for v in pdf["v_int"]]
        arr = hist + vints
        h = len(hist)
        out = []
        num = 0
        for p in range(h, len(arr)):
            lo = max(0, p - (EWMA_LOOKBACK - 1))
            length = p - lo + 1
            if p == h or lo == 0 and length < EWMA_LOOKBACK:
                # (re)seed: window still growing or first row of batch
                num = sum(
                    v << (length - 1 - i)
                    for i, v in enumerate(arr[lo : p + 1])
                )
            elif length == EWMA_LOOKBACK and p - 1 >= h and lo - 1 >= 0:
                # full window sliding: evict oldest (weight 2^19)
                num = 2 * (num - (arr[lo - 1] << (EWMA_LOOKBACK - 1))) + arr[p]
            else:
                num = 2 * num + arr[p]
            den = (1 << length) - 1
            out.append((float(num) / float(den)) / 1e6)
        res = pdf[["event_id", "ts_us"]].copy()
        res.insert(0, "user_id", user_id)
        res["ewma"] = out
        if len(res):
            last_ts = int(res["ts_us"].iloc[-1])
        hist = arr[-(EWMA_LOOKBACK - 1):]
        yield res
    state.update((hist,))
    if last_ts is not None:
        # evict users idle for one full day of event time
        state.setTimeoutTimestamp(last_ts // 1000 + 86_400_000)


def ewma_stream(events: DataFrame, watermark: str | None = "60 seconds") -> DataFrame:
    """Streaming twin of ts_ewma. ``events`` must carry event-time
    ``ts``; emits (user_id, event_id, ts_us, ewma) per input row."""
    from pyspark.sql import functions as F

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keyed = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1e6).cast("long").alias("v_int"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        ewma_fn,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


MEDIAN_OUTPUT_SCHEMA = "user_id long, event_id long, ts_us long, med_mv double"
MEDIAN_STATE_SCHEMA = "vals array<long>"
MEDIAN_LOOKBACK = 21  # current row + 20 predecessors


def rolling_median_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful streaming rolling median — the zx_rolling_median
    kernel carried across micro-batches: state is the last 20
    quantized values per user, so batch N+1's first rows see exactly
    the frame the batch window operator would. Median of <= 21 ints
    per row; even warm-up frames average the two middles — the same
    interpolation the batch twin and DuckDB's window median use."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    hist: list[int] = list(state.get[0]) if state.exists else []
    last_ts = None
    # Same chunk-ordering hazard as ewma_fn: materialize the whole
    # group and sort once — per-chunk sorting is wrong when a group
    # spans multiple Arrow chunks.
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        out = []
        for v in pdf["v"]:
            hist.append(int(v))
            if len(hist) > MEDIAN_LOOKBACK:
                hist.pop(0)
            w = sorted(hist)
            n = len(w)
            med = (
                float(w[n // 2])
                if n % 2 == 1
                else (w[n // 2 - 1] + w[n // 2]) / 2.0
            )
            out.append(med)
        res = pdf[["event_id", "ts_us"]].copy()
        res.insert(0, "user_id", user_id)
        res["med_mv"] = out
        if len(res):
            last_ts = int(res["ts_us"].iloc[-1])
        yield res
    state.update((hist[-(MEDIAN_LOOKBACK - 1):],))
    if last_ts is not None:
        state.setTimeoutTimestamp(last_ts // 1000 + 86_400_000)


def rolling_median_stream(
    events: DataFrame, watermark: str | None = "60 seconds"
) -> DataFrame:
    """Streaming twin of zx_rolling_median; emits one median per input
    row, continuing each user's 21-row frame across micro-batches."""
    from pyspark.sql import functions as F

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keyed = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        rolling_median_fn,
        MEDIAN_OUTPUT_SCHEMA,
        MEDIAN_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


CEP_OUTPUT_SCHEMA = "user_id long, event_id long, ts_us long"
CEP_STATE_SCHEMA = "run int"
CEP_BURST_LEN = 3  # alert fires on the 3rd consecutive error


def cep_burst_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful streaming CEP: per-user consecutive-error-run
    detector. State is ONE int — the length of the error run in
    progress at the batch boundary — so a burst spanning micro-batches
    still fires exactly once, on its 3rd error. Emits the alert row
    (the 3rd error's identity); runs longer than 3 fire no further
    alerts until a non-error resets the run — i.e. one alert per
    maximal burst, anchored at its 3rd element, which is what the
    gaps-and-islands oracle counts."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    run = int(state.get[0]) if state.exists else 0
    chunks = [c for c in pdfs if len(c)]
    last_ts = None
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        out_ids, out_ts = [], []
        for eid, ts_us, et in zip(
            pdf["event_id"], pdf["ts_us"], pdf["event_type"]
        ):
            if et == "error":
                run += 1
                if run == CEP_BURST_LEN:
                    out_ids.append(int(eid))
                    out_ts.append(int(ts_us))
            else:
                run = 0
        last_ts = int(pdf["ts_us"].iloc[-1])
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "ts_us": out_ts,
            }
        )
    state.update((run,))
    if last_ts is not None:
        state.setTimeoutTimestamp(last_ts // 1000 + 86_400_000)


def cep_burst_stream(
    events: DataFrame, watermark: str | None = "60 seconds"
) -> DataFrame:
    """Streaming CEP over the event stream; emits one alert row per
    per-user burst of 3+ consecutive errors (at the 3rd error).

    ORDERED-REPLAY CONTRACT: the run counter carried across batch
    boundaries assumes batches deliver each user's events in event-time
    order (true for the bounded file replay and any log-ordered source,
    e.g. a per-user-keyed Kafka partition — the reference's layout).
    An in-watermark late event arriving in a LATER batch is folded
    after newer events, so on a genuinely out-of-order source alerts
    can diverge from the batch gaps-and-islands oracle. Handling that
    source class needs a buffer-until-watermark variant (hold rows in
    state until ts <= watermark, then fold in ts order) — a deliberate
    state-size trade this operator does not pay."""
    from pyspark.sql import functions as F

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keyed = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        cep_burst_fn,
        CEP_OUTPUT_SCHEMA,
        CEP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


CEP_BUF_STATE_SCHEMA = (
    "run int, bts array<long>, bid array<long>, berr array<boolean>"
)


def cep_burst_buffered_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Late-event-safe CEP variant: buffer rows in state until the
    watermark passes them, then fold in (ts_us, event_id) order — the
    buffer-until-watermark contract cep_burst_fn documents but does
    not pay for. State = run counter + the in-flight rows between the
    watermark and the frontier (bounded by the lateness budget x
    per-user rate, NOT by stream length). The event-time timeout is
    set just past the newest buffered row, so when the watermark
    passes the frontier a timed-out invocation flushes the remainder
    — on a bounded replay every row eventually folds."""
    (user_id,) = key
    wm_us = state.getCurrentWatermarkMs() * 1000

    def fold(run: int, ts, eid, err):
        out_ids, out_ts = [], []
        for t, i, e in zip(ts, eid, err):
            if e:
                run += 1
                if run == CEP_BURST_LEN:
                    out_ids.append(int(i))
                    out_ts.append(int(t))
            else:
                run = 0
        return run, out_ids, out_ts

    if state.hasTimedOut:
        run, bts, bid, berr = state.get
        if not bts:
            state.remove()  # idle GC: nothing buffered, nothing due
            return
        order = sorted(range(len(bts)), key=lambda i: (bts[i], bid[i]))
        run, out_ids, out_ts = fold(
            int(run),
            [bts[i] for i in order],
            [bid[i] for i in order],
            [berr[i] for i in order],
        )
        if out_ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ids),
                    "event_id": out_ids,
                    "ts_us": out_ts,
                }
            )
        state.update((run, [], [], []))
        state.setTimeoutTimestamp(wm_us // 1000 + 86_400_000)
        return

    run, bts, bid, berr = (
        (int(state.get[0]), list(state.get[1]), list(state.get[2]),
         list(state.get[3]))
        if state.exists
        else (0, [], [], [])
    )
    for pdf in pdfs:
        if len(pdf):
            bts.extend(int(t) for t in pdf["ts_us"])
            bid.extend(int(i) for i in pdf["event_id"])
            berr.extend(bool(e) for e in (pdf["event_type"] == "error"))
    order = sorted(range(len(bts)), key=lambda i: (bts[i], bid[i]))
    ready = [i for i in order if bts[i] <= wm_us]
    pend = [i for i in order if bts[i] > wm_us]
    run, out_ids, out_ts = fold(
        run,
        [bts[i] for i in ready],
        [bid[i] for i in ready],
        [berr[i] for i in ready],
    )
    if out_ids:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "ts_us": out_ts,
            }
        )
    state.update(
        (
            run,
            [bts[i] for i in pend],
            [bid[i] for i in pend],
            [berr[i] for i in pend],
        )
    )
    if pend:
        # fire once the watermark reaches the frontier; clamp above
        # the current watermark (event-time timeout must be strictly
        # later) without overshooting — a +1 ms overshoot would miss
        # the bounded replay's final no-data batch, where the
        # watermark stops exactly at the frontier
        state.setTimeoutTimestamp(
            max(max(bts[i] for i in pend) // 1000, wm_us // 1000 + 1)
        )
    else:
        last = max(bts) // 1000 if bts else wm_us // 1000
        state.setTimeoutTimestamp(last + 86_400_000)


def cep_burst_buffered_stream(
    events: DataFrame, watermark: str = "60 seconds"
) -> DataFrame:
    """Buffer-until-watermark CEP burst detector — same alert
    semantics and output schema as cep_burst_stream, but correct on
    genuinely out-of-order sources: in-watermark late events fold in
    event-time order, at the cost of holding the in-flight rows
    (watermark..frontier) in state. Pick this off log-ordered
    sources; pick cep_burst_stream when the source preserves per-key
    order (one int of state instead of a row buffer)."""
    from pyspark.sql import functions as F

    keyed = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        cep_burst_buffered_fn,
        CEP_OUTPUT_SCHEMA,
        CEP_BUF_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


CUSUM_OUTPUT_SCHEMA = "user_id long, event_id long, ts_us long, s_scaled long"
CUSUM_STATE_SCHEMA = "pre long, minp long, sprev long"


def cusum_alert_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful streaming CUSUM (Page): per-user reflected statistic
    S = max(0, S + x - k) carried across micro-batches as THREE
    bigints (prefix sum, running min incl. the virtual 0, previous
    S), emitting one alert row per excursion at the h-crossing. The
    integer recurrence is the exact closed form the batch twin
    (operators/timeseries.cusum_alert) evaluates with windows, so a
    bounded replay hash-matches the same DuckDB oracle. Same
    ordered-replay contract as cep_burst_stream (state.py)."""
    from eventstream_notify_spark.operators.timeseries import (
        CUSUM_H,
        CUSUM_K,
    )

    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    pre, minp, sprev = (
        (int(state.get[0]), int(state.get[1]), int(state.get[2]))
        if state.exists
        else (0, 0, 0)
    )
    chunks = [c for c in pdfs if len(c)]
    last_ts = None
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        out_uid, out_eid, out_ts, out_s = [], [], [], []
        for eid, ts_us, v in zip(
            pdf["event_id"], pdf["ts_us"], pdf["v_int"]
        ):
            pre += int(v) - CUSUM_K
            if pre < minp:
                minp = pre
            s = pre - minp  # minp <= 0 always (seeded with virtual 0)
            if sprev < CUSUM_H <= s:
                out_uid.append(int(user_id))
                out_eid.append(int(eid))
                out_ts.append(int(ts_us))
                out_s.append(s)
            sprev = s
        last_ts = int(pdf["ts_us"].iloc[-1])
        yield pd.DataFrame(
            {
                "user_id": pd.Series(out_uid, dtype="int64"),
                "event_id": pd.Series(out_eid, dtype="int64"),
                "ts_us": pd.Series(out_ts, dtype="int64"),
                "s_scaled": pd.Series(out_s, dtype="int64"),
            }
        )
    state.update((pre, minp, sprev))
    if last_ts is not None:
        state.setTimeoutTimestamp(last_ts // 1000 + 86_400_000)


def cusum_alert_stream(
    events: DataFrame, watermark: str | None = "60 seconds"
) -> DataFrame:
    """Streaming twin of cusum_alert: emits one alert row per
    excursion crossing, exactly the batch operator's output."""
    from pyspark.sql import functions as F

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keyed = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 1000).cast("long").alias("v_int"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        cusum_alert_fn,
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ----------------------------------------------- absence detection

ABSENCE_OUTPUT_SCHEMA = (
    "user_id long, gap_start_us long, gap_end_us long, gap_us long"
)
ABSENCE_STATE_SCHEMA = "last_ts_us long"
ABSENCE_GAP_US = 2 * 86_400 * 1_000_000  # silent > 2 days => alert
# Gaps LONGER than the state TTL are never alertable: in a
# multi-microbatch run the watermark passes last_ts + TTL, the state
# times out, and the user's next event re-enters as NEW — the gap is
# structurally unobservable. The kernel drops such gaps explicitly so
# single-batch replays (where eviction cannot fire mid-corpus) agree
# with multi-batch runs, and the batch oracle carries the same bound.
ABSENCE_TTL_US = 30 * 86_400 * 1_000_000


def absence_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Heartbeat-absence detector: per user, remember only the LAST
    event time; when the next event arrives more than ABSENCE_GAP_US
    later, emit the silence interval it closes. Retrospective
    emission (on the closing event, not a wall-clock timer) is what
    keeps the operator deterministic under replay — processing-time
    timers fire differently per run, event gaps do not.

    State is ONE bigint per user — the cheapest stateful operator in
    the module — with the family's standard 30-day event-time idle
    eviction (a user silent past eviction re-enters as new; the
    churn report, not this alert, owns that regime). Gaps exceeding
    the TTL are dropped IN the kernel — see ABSENCE_TTL_US — so
    replays agree regardless of how the corpus splits into
    micro-batches."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    last_ts = int(state.get[0]) if state.exists else None
    chunks = [c for c in pdfs if len(c)]
    if chunks:
        # Same chunk-ordering hazard as ewma_fn: materialize the
        # whole group and sort once.
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        out = []
        for ts_us in pdf["ts_us"]:
            ts_us = int(ts_us)
            if (
                last_ts is not None
                and ABSENCE_GAP_US < ts_us - last_ts <= ABSENCE_TTL_US
            ):
                out.append(
                    (user_id, last_ts, ts_us, ts_us - last_ts)
                )
            if last_ts is None or ts_us > last_ts:
                last_ts = ts_us
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "gap_start_us",
                    "gap_end_us",
                    "gap_us",
                ],
            )
    if last_ts is not None:
        state.update((last_ts,))
        state.setTimeoutTimestamp(last_ts // 1000 + ABSENCE_TTL_US // 1000)


def absence_stream(
    events: DataFrame, watermark: str | None = "60 seconds"
) -> DataFrame:
    """Streaming absence alerts over an event-time stream carrying
    ``ts``; emits one row per closed silence interval > 2 days."""
    from pyspark.sql import functions as F

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    keyed = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        absence_fn,
        ABSENCE_OUTPUT_SCHEMA,
        ABSENCE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
