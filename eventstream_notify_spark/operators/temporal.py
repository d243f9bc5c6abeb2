"""Temporal operators Spark lacks as built-ins — SURVEY §2 'custom
operators' guidance: composed from existing DataFrame ops, never a
Python loop.

- as-of join: the union + keyed last-non-null-carry-forward pattern —
  O(n log n) sort within key partitions, ZERO range join. This is the
  only as-of shape that survives 100 TB (a range/theta join degrades
  to nested loops; this is one shuffle on the key + one window sort).
- hypertable rollup: cascaded time-grain aggregates (minute → hour →
  day), each level computed FROM the previous level's partials, the
  continuous-aggregate pattern of time-series stores: the raw table
  is scanned once, coarser grains reuse finer sums.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

# incremental_rollup's standing materialized view, keyed by
# (sf_dir, cutoff_us); populated lazily, removed at interpreter exit.
_IVM_VIEW_CACHE: dict[tuple[str, int], str] = {}


@atexit.register
def _cleanup_ivm_views() -> None:
    for d in _IVM_VIEW_CACHE.values():
        shutil.rmtree(d, ignore_errors=True)
    _IVM_VIEW_CACHE.clear()


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts within the same ``on`` key.

    Pattern: tag and union both sides, sort within key by (ts, side),
    carry the right side's values forward with last(ignorenulls), then
    keep left rows. One shuffle on the key; no range predicates."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in value_cols:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    lcols = [c for c in left.columns]
    merged = lt.select(
        *lcols, "__side", "__ts", *value_cols
    ).unionByName(
        rt.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on else F.col(on)
              for c in lcols],
            "__side",
            "__ts",
            *value_cols,
        )
    )
    # right rows sort before left rows at equal timestamps => a right
    # row AT the left ts is visible to it (<= semantics, like ASOF)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *lcols,
        "__side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


@register(
    "join_asof",
    extra=True,
    oracle="""
    WITH snap AS (
        SELECT user_id,
               (epoch_us(ts) // 86400000000) * 86400000000 AS day_us,
               COUNT(*) AS day_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
           s.day_us AS snap_day_us, s.day_events
    FROM (SELECT * FROM events WHERE event_id % 10 = 0) e
    ASOF LEFT JOIN snap s
      ON e.user_id = s.user_id AND epoch_us(e.ts) >= s.day_us
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each sampled event picks up the most recent daily
    per-user activity snapshot at-or-before its timestamp. Oracle uses
    DuckDB's native ASOF JOIN; the engine uses the union/carry-forward
    pattern (asof_join above) — same semantics, shuffle-minimal."""
    e = table(spark, sf_dir, "events")
    snap = (
        e.groupBy(
            "user_id",
            (F.expr("unix_micros(ts) div 86400000000") * 86_400_000_000).alias(
                "day_us"
            ),
        )
        .agg(F.count("*").alias("day_events"))
        .withColumn("snap_day_us", F.col("day_us"))
        .withColumn("__rts", F.timestamp_micros(F.col("day_us")))
        .drop("day_us")
    )
    left = e.filter(F.col("event_id") % 10 == 0).select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        left,
        snap,
        on="user_id",
        left_ts="ts",
        right_ts="__rts",
        value_cols=["snap_day_us", "day_events"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "snap_day_us",
        "day_events",
    )


@register(
    "rollup_hypertable",
    extra=True,
    oracle="""
    WITH minute AS (
        SELECT (epoch_us(ts) // 60000000) * 60000000 AS bucket_us,
               COUNT(*) AS cnt,
               SUM(CAST(value AS DECIMAL(12,2))) AS sum_dec
        FROM events GROUP BY 1
    ),
    hour AS (
        SELECT (bucket_us // 3600000000) * 3600000000 AS bucket_us,
               CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(sum_dec) AS sum_dec
        FROM minute GROUP BY 1
    ),
    day AS (
        SELECT (bucket_us // 86400000000) * 86400000000 AS bucket_us,
               CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(sum_dec) AS sum_dec
        FROM hour GROUP BY 1
    )
    SELECT 'minute' AS grain, bucket_us, cnt,
           CAST(sum_dec AS DOUBLE) AS sum_value FROM minute
    UNION ALL
    SELECT 'hour' AS grain, bucket_us, cnt,
           CAST(sum_dec AS DOUBLE) AS sum_value FROM hour
    UNION ALL
    SELECT 'day' AS grain, bucket_us, cnt,
           CAST(sum_dec AS DOUBLE) AS sum_value FROM day
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascaded rollup: minute aggregates from raw,
    hour from minute, day from hour — coarse grains reuse fine-grain
    partials (the raw table is scanned exactly once; each cascade step
    aggregates ~60x fewer rows). Decimal sums make the cascade
    bit-stable in any order.

    Fine grains are materialized via ``localCheckpoint`` rather than
    ``persist``: a query builder returns a lazy frame, so it has no
    hook to unpersist after the caller materializes — persisted plans
    would accumulate in the session CacheManager forever in a
    long-lived session (bench/oracle loops run every query on one
    session). Checkpoint blocks are reference-counted by the
    ContextCleaner and vanish when the frame is GC'd."""
    e = table(spark, sf_dir, "events")
    minute = e.groupBy(
        (F.expr("unix_micros(ts) div 60000000") * 60_000_000).alias("bucket_us")
    ).agg(
        F.count("*").alias("cnt"),
        # decimal through the whole cascade: coarse sums stay exact
        # regardless of aggregation order at any level
        F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_dec"),
    )
    # scanned by hour AND the final union — materialize once
    minute = minute.localCheckpoint(eager=True)

    def up(df: DataFrame, us: int) -> DataFrame:
        return df.groupBy(
            F.expr(f"bucket_us div {us}").cast("long").alias("b")
        ).agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("sum_dec").alias("sum_dec"),
        ).select((F.col("b") * us).alias("bucket_us"), "cnt", "sum_dec")

    hour = up(minute, 3_600_000_000).localCheckpoint(eager=True)
    day = up(hour, 86_400_000_000)

    def tag(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_us",
            "cnt",
            F.col("sum_dec").cast("double").alias("sum_value"),
        )

    return (
        tag(minute, "minute").unionByName(tag(hour, "hour")).unionByName(
            tag(day, "day")
        )
    )

@register(
    "gap_fill_locf",
    extra=True,
    oracle="""
    WITH perm AS (
        SELECT user_id, epoch_us(ts) // 60000000 AS minute,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                     / COUNT(*), 6) AS v
        FROM events
        WHERE user_id % 50 = 0
        GROUP BY 1, 2
    ),
    b AS (
        SELECT user_id, MIN(minute) AS mn, MAX(minute) AS mx
        FROM perm GROUP BY 1
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(mn, mx)) AS minute FROM b
    ),
    j AS (
        SELECT g.user_id, g.minute, p.v
        FROM grid g LEFT JOIN perm p USING (user_id, minute)
    )
    SELECT user_id, minute AS minute_idx,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_locf,
           CAST(v IS NULL AS INT) AS was_gap
    FROM j
    """,
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling with last-observation-carried-
    forward (the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape):
    densify each sampled user's minute series over its own [min, max]
    span via ``sequence``+``explode`` (no driver loop, no UDF — the
    grid is generated executor-side), left-join the observed buckets,
    and carry the last non-null value forward with an
    ``ignorenulls`` running window. Decimal per-bucket means keep the
    carried values bit-stable for the oracle."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    perm = e.groupBy(
        "user_id", F.expr("unix_micros(ts) div 60000000").alias("minute")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("v")
    )
    grid = (
        perm.groupBy("user_id")
        .agg(F.min("minute").alias("mn"), F.max("minute").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("minute"),
        )
    )
    j = grid.join(perm, ["user_id", "minute"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.col("minute").alias("minute_idx"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v").isNull().cast("int").alias("was_gap"),
    )


# ------------------------------------------------- point-in-time join


PIT_LOOKBACK_US = 3_600_000_000  # probe = 1 h before each purchase
SCD2_EOT_US = 253_402_300_800_000_000  # year-9999 sentinel (scd2 twin)


@register(
    "scd2_point_in_time",
    extra=True,
    oracle=f"""
    WITH changes AS (
        SELECT user_id, state, ts_us, event_id FROM (
            SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us,
                   event_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ) WHERE state <> prev OR prev IS NULL
    ),
    scd AS (
        SELECT user_id, state,
               ts_us AS valid_from_us,
               COALESCE(LEAD(ts_us) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
               ), {SCD2_EOT_US}) AS valid_to_us
        FROM changes
    ),
    probes AS (
        SELECT event_id, user_id,
               epoch_us(ts) - {PIT_LOOKBACK_US} AS probe_ts_us
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.probe_ts_us,
           COALESCE(s.state, 'none') AS state_at
    FROM probes p LEFT JOIN scd s
      ON p.user_id = s.user_id
     AND p.probe_ts_us >= s.valid_from_us
     AND p.probe_ts_us <  s.valid_to_us
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: each purchase probes the SCD2 user
    -state dimension (zx_scd2_user_state's intervals) for the state
    valid one hour BEFORE the purchase — the leakage-free feature
    lookup every ML feature store must answer ("what did we know at
    prediction time?").

    The oracle expresses it as the textbook interval-containment LEFT
    join. A range join like that degrades to per-key nested loops at
    scale, so the engine instead rides the as-of kernel shape: tag and
    union state-change rows (side 0) with probe rows (side 1), sort
    within user by (ts, side, event_id), carry the last non-null state
    forward, keep probes. ONE shuffle on user_id, no range predicate.
    The event_id tie-break makes same-timestamp state flips
    deterministic: the later change wins, exactly matching the
    zero-width intervals the LEAD-based SCD2 build produces.

    Probes earlier than a user's first state resolve to 'none'
    (LEFT-join parity).
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter((F.col("event_type") != F.col("prev")) | F.col("prev").isNull())
        .select(
            "user_id",
            F.col("ts_us").alias("ord_us"),
            F.lit(0).alias("side"),
            "event_id",
            F.col("event_type").alias("state"),
        )
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts_us") - PIT_LOOKBACK_US).alias("ord_us"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ord_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        changes.unionByName(probes)
        .withColumn("state_at", F.last("state", ignorenulls=True).over(wc))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ord_us").alias("probe_ts_us"),
            F.coalesce("state_at", F.lit("none")).alias("state_at"),
        )
    )


# ------------------------------------------- incremental rollup (IVM)


@register(
    "incremental_rollup",
    extra=True,
    oracle="""
    SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS hour_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_mv
    FROM events GROUP BY 1, 2
    """,
)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for the hourly rollup: history is
    materialized ONCE as partial aggregates; a new day of events
    merges into it by re-aggregating PARTIALS (count and sum are
    algebraic: merge = sum of partials) — the continuous-aggregate
    refresh that never rescans history. At 100 TB the base rollup is
    ~5 orders of magnitude smaller than the fact; refresh cost is
    O(delta + view), not O(history).

    This query RUNS the full cycle: split the fact at the last-day
    cutoff, materialize the base rollup to parquet (the standing
    view), aggregate only the delta, merge. The oracle recomputes
    from scratch — equality IS the IVM correctness proof. Holistic
    aggregates (distinct users) need sketch partials instead
    (zx_agg_sketches' HLL path); only algebraic ones merge exactly.

    Plan shape (asserted in tests): the returned merge reads the
    materialized view + a parquet scan of events with the cutoff
    PUSHED DOWN — history rows never reach Spark.
    """
    ev = table(spark, sf_dir, "events")
    cutoff_us = ev.agg(
        F.max(F.expr("unix_micros(ts) div 86400000000"))
    ).first()[0] * 86_400_000_000
    cutoff_lit = F.expr(f"timestamp_micros({cutoff_us})")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.expr("(unix_micros(ts) div 3600000000) * 3600000000").alias(
                "hour_us"
            ),
            "event_type",
        ).agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias(
                "sum_mv"
            ),
        )

    # The standing view is materialized ONCE per (data dir, cutoff)
    # and reused across invocations — a builder that mkdtemp'd a fresh
    # copy on every call (every bench rep / oracle check) leaked temp
    # dirs and hid eager I/O inside an otherwise-lazy builder. Cache
    # dirs are removed at interpreter exit.
    cache_key = (sf_dir, cutoff_us)
    view_dir = _IVM_VIEW_CACHE.get(cache_key)
    if view_dir is None:
        view_dir = tempfile.mkdtemp(prefix="ivm_rollup_")
        rollup(ev.filter(F.col("ts") < cutoff_lit)).write.mode(
            "overwrite"
        ).parquet(view_dir)
        _IVM_VIEW_CACHE[cache_key] = view_dir

    base = spark.read.parquet(view_dir)
    delta = rollup(ev.filter(F.col("ts") >= cutoff_lit))
    return (
        base.unionByName(delta)
        .groupBy("hour_us", "event_type")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_mv").alias("sum_mv"),
        )
    )


# -------------------------------------------------- forward as-of


@register(
    "join_asof_forward",
    extra=True,
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           MIN(e.ts_us) - p.ts_us AS us_to_error
    FROM p LEFT JOIN e ON e.user_id = p.user_id AND e.ts_us > p.ts_us
    GROUP BY p.event_id, p.user_id, p.ts_us
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each purchase is paired with the user's NEXT
    error strictly after it (time-to-failure after purchase — the
    survival-analysis join; zx_join_asof is the backward twin). NULL
    when no later error exists.

    Same union + carry kernel as the backward as-of, run in REVERSE
    time order: sort within user by ts DESC with error rows before
    purchase rows at equal ts excluded by the strict inequality
    (side 0 = error sorts AFTER side 1 = purchase at equal ts under
    the side ASC tie-break, so an error AT the purchase instant is
    not visible — '>' semantics). min-of-future becomes
    last-non-null-carry over the reversed stream. One user_id
    shuffle; the oracle's theta-join formulation would be a per-key
    nested loop at scale.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts_us").alias("ord_us"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts_us").alias("err_us"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("ord_us"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("err_us"),
    )
    # DESC time: rows later in real time come FIRST; carrying the last
    # non-null error ts forward = the MINIMUM future error. side ASC at
    # equal ord_us puts the error (side 0) BEFORE the purchase in the
    # reversed stream, i.e. visible — so exclude the equal instant by
    # carrying from strictly-preceding rows only after ordering on
    # (ord_us DESC, side ASC): at equal ts the error row precedes and
    # WOULD be visible, violating '>'; order side DESC instead so the
    # purchase row comes first and never sees the same-instant error.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ord_us").desc(), F.col("side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        err.unionByName(pur)
        .withColumn("next_err", F.last("err_us", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ord_us").alias("ts_us"),
            (F.col("next_err") - F.col("ord_us")).alias("us_to_error"),
        )
    )


# -------------------------------------------------- nearest as-of


@register(
    "join_asof_nearest",
    extra=True,
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'purchase'
    ),
    e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'error'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           MIN(abs(e.ts_us - p.ts_us)) AS nearest_err_us
    FROM p LEFT JOIN e ON e.user_id = p.user_id
    GROUP BY p.event_id, p.user_id, p.ts_us
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: each purchase paired with the user's closest
    error in EITHER time direction — the third member of the as-of
    family (zx_join_asof backward, zx_join_asof_forward forward). The
    nearest error is necessarily either the last one at-or-before or
    the first one after, so two IGNORE-NULLS carry windows over ONE
    user_id shuffle replace the oracle's per-key theta join:
    least(t - prev_err, next_err - t).

    Ties at equal distance both yield the same |Δ|, so the output is
    order-independent. NULL when the user has no errors.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    ).filter(F.col("event_type").isin("purchase", "error"))
    err_ts = F.when(F.col("event_type") == "error", F.col("ts_us"))
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(err_ts, ignorenulls=True).over(w_back).alias("prev_err"),
        F.first(err_ts, ignorenulls=True).over(w_fwd).alias("next_err"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        F.least(
            F.col("ts_us") - F.col("prev_err"),
            F.col("next_err") - F.col("ts_us"),
        ).alias("nearest_err_us"),
    )


# ------------------------------------------------ SCD2 maintenance


@register(
    "scd2_merge_upsert",
    extra=True,
    oracle=f"""
    WITH changes AS (
        SELECT user_id, state, ts_us, event_id FROM (
            SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us,
                   event_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ) WHERE state <> prev OR prev IS NULL
    )
    SELECT user_id, state,
           ts_us AS valid_from_us,
           COALESCE(LEAD(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ), {SCD2_EOT_US}) AS valid_to_us
    FROM changes
    """,
)
def scd2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension MAINTENANCE — the producer side of
    zx_scd2_point_in_time's consumer: the standing dimension is built
    from history only (events before the last-day cutoff), then the
    last day's events are applied as the classic warehouse MERGE:
    delta rows join the OPEN dimension rows to seed change detection
    (a delta event equal to the user's current state is NOT a
    change), changed users' open intervals CLOSE at their first new
    change, and the chained delta changes INSERT. The oracle builds
    the dimension from FULL history in one pass — equality IS the
    merge-correctness proof (the incremental_rollup trick, applied to
    interval semantics).

    Scale: the merge touches history only through the OPEN rows (one
    row per user — the dimension head, not the fact); delta work is
    one user_id shuffle of one day of events. Refresh cost is
    O(delta + dim), never O(history).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    cutoff_us = ev.agg(
        F.max(F.expr("ts_us div 86400000000"))
    ).first()[0] * 86_400_000_000

    def scd2(changes: DataFrame) -> DataFrame:
        w_next = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        return changes.select(
            "user_id",
            "state",
            F.col("ts_us").alias("valid_from_us"),
            F.coalesce(
                F.lead("ts_us").over(w_next), F.lit(SCD2_EOT_US)
            ).alias("valid_to_us"),
        )

    w_seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    hist_changes = (
        ev.filter(F.col("ts_us") < cutoff_us)
        .withColumn("prev", F.lag("state").over(w_seq))
        .filter((F.col("state") != F.col("prev")) | F.col("prev").isNull())
        .drop("prev")
    )
    hist_dim = scd2(hist_changes)

    open_rows = hist_dim.filter(F.col("valid_to_us") == SCD2_EOT_US)
    delta = ev.filter(F.col("ts_us") >= cutoff_us)
    # seed each user's delta sequence with their current open state
    seeded = delta.join(
        open_rows.select("user_id", F.col("state").alias("cur_state")),
        "user_id",
        "left",
    )
    delta_changes = (
        seeded.withColumn(
            "prev", F.coalesce(F.lag("state").over(w_seq), F.col("cur_state"))
        )
        .filter((F.col("state") != F.col("prev")) | F.col("prev").isNull())
        .select("user_id", "state", "ts_us", "event_id")
    )
    # new intervals from the delta changes (chained within the delta)
    inserts = scd2(delta_changes)
    # close changed users' open intervals at their FIRST delta change
    first_chg = delta_changes.groupBy("user_id").agg(
        F.min("ts_us").alias("close_us")
    )
    closed = (
        open_rows.join(first_chg, "user_id")
        .select(
            "user_id",
            "state",
            "valid_from_us",
            F.col("close_us").alias("valid_to_us"),
        )
    )
    untouched = open_rows.join(first_chg, "user_id", "left_anti")
    return (
        hist_dim.filter(F.col("valid_to_us") != SCD2_EOT_US)
        .unionByName(untouched)
        .unionByName(closed)
        .unionByName(inserts)
    )


# ---------------------------------------------- changefeed producer


@register(
    "cdc_changefeed_diff",
    extra=True,
    oracle="""
    WITH snap AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
             CAST(round(value * 1000) AS BIGINT) AS value_mv,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn,
             epoch_us(ts) < (SELECT (MAX(epoch_us(ts)) // 86400000000)
                             * 86400000000 FROM events) AS is_old
      FROM events
    ),
    old AS (SELECT * FROM (
        SELECT user_id, event_id, value_mv,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts_us DESC, event_id DESC) AS rn2,
               event_type
        FROM snap WHERE is_old) WHERE rn2 = 1 AND event_type <> 'error'
    ),
    new AS (SELECT user_id, event_id, value_mv FROM snap
            WHERE rn = 1 AND event_type <> 'error')
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'I'
                WHEN n.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           n.event_id AS new_event_id,
           n.value_mv AS new_value_mv
    FROM old o FULL OUTER JOIN new n ON n.user_id = o.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.event_id <> n.event_id OR o.value_mv <> n.value_mv
    """,
)
def cdc_changefeed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed PRODUCER — the inverse of zx_stream_cdc_apply: diff
    two keyed snapshots (state as of the last-day cutoff vs state
    now, presence rule: a user whose latest event is an error is
    absent) into the minimal changelog — INSERT for newly present
    keys, DELETE for newly absent, UPDATE only when the row actually
    changed. Apply(diff(A, B)) onto A reproduces B — the table-format
    change-data-feed contract.

    Scale: both snapshots collapse to one row per user at the first
    exchange (arg-max compaction); the diff is ONE full-outer join on
    the key with change predicates — no history re-scan, no window
    over the fact.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("value_mv"),
    )
    cutoff_us = ev.agg(
        F.max(F.expr("ts_us div 86400000000"))
    ).first()[0] * 86_400_000_000

    def snapshot(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_us").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("event_type") != "error"))
            .select("user_id", "event_id", "value_mv")
        )

    old = snapshot(ev.filter(F.col("ts_us") < cutoff_us)).alias("o")
    new = snapshot(ev).alias("n")
    joined = old.join(new, F.col("o.user_id") == F.col("n.user_id"), "full_outer")
    return joined.filter(
        F.col("o.user_id").isNull()
        | F.col("n.user_id").isNull()
        | (F.col("o.event_id") != F.col("n.event_id"))
        | (F.col("o.value_mv") != F.col("n.value_mv"))
    ).select(
        F.coalesce(F.col("o.user_id"), F.col("n.user_id")).alias("user_id"),
        F.when(F.col("o.user_id").isNull(), "I")
        .when(F.col("n.user_id").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("n.event_id").alias("new_event_id"),
        F.col("n.value_mv").alias("new_value_mv"),
    )
