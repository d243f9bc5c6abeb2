"""Reference-derived event-stream operators, batch twins.

These re-express the reference pipeline's semantics (reference:
auto_kafka_redis.py:276-416 — Kafka consume -> TTL dedup -> per-user
rate limit -> micro-batch -> keyed upsert + pub/sub) as declarative
DataFrame transformations over the ``events`` table, so the DuckDB
oracle can check them and Catalyst can optimize them.

Scale notes (100 TB posture):
- every operator here is a single keyed shuffle (window function over
  ``partition by key``) or a pure map — no collect, no driver loops;
- dedup/latest-per-key are arg-min/arg-max compactions: at scale they
  shuffle once on the key and never materialize a global sort;
- rate limiting is ``row_number <= N`` inside a (user, window) group:
  state is bounded by the window, the exact analogue of the
  reference's TTL'd Redis counters (auto_kafka_redis.py:352-357).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

# Reference defaults (auto_kafka_redis.py:51-52,80-92): dedup TTL 60 s,
# rate limit 5 events / 60 s / user, micro-batch 32, run 10 s @ 20 ev/s.
DEDUP_TTL_S = 60
RATE_LIMIT_COUNT = 5
RATE_LIMIT_WINDOW_S = 60
BATCH_SIZE = 32

# The testdata events table is ~0.23 ev/min overall, so the literal
# 60 s reference window admits everything; registered queries use a
# 1-day window to actually exercise the drop path. Semantics identical.
DEMO_WINDOW_S = 86400

_TS_US = "unix_micros(ts)"


# --------------------------------------------------------------------
# Reusable operator primitives (composed by the registered queries and
# by the streaming pipeline's foreachBatch twin).
# --------------------------------------------------------------------


def _argmin_per_key(
    df: DataFrame, keys: list[str], order: list[Column], agg_fn
) -> DataFrame:
    """arg-min/arg-max compaction via min_by/max_by over an ordering
    struct. Unlike a row_number window (sort-based, whole rows
    shuffled), this is a hash aggregation with MAP-SIDE COMBINE: each
    input partition pre-reduces to one row per key before the shuffle,
    so shuffled volume shrinks by the duplication factor — the shape
    that survives 100 TB dedup. The ordering struct must be unique per
    key (include tiebreak columns) for determinism."""
    payload_cols = [c for c in df.columns if c not in keys]
    out = df.groupBy(*keys).agg(
        agg_fn(
            F.struct(*[F.col(c) for c in payload_cols]), F.struct(*order)
        ).alias("__payload")
    )
    return out.select(*keys, *[F.col(f"__payload.{c}").alias(c) for c in payload_cols])


def first_per_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the first row per key under a deterministic order.

    Batch twin of the reference's SETNX dedup probe
    (auto_kafka_redis.py:332-346): one keyed shuffle, combiner-reduced.
    """
    return _argmin_per_key(df, keys, order, F.min_by)


def latest_per_key(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the last row per key (keyed upsert: latest write wins).

    Batch twin of the Redis ``SET event:{id}`` store
    (auto_kafka_redis.py:372-373).
    """
    return _argmin_per_key(df, keys, order, F.max_by)


def rate_limit(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_s: int = RATE_LIMIT_WINDOW_S,
    limit: int = RATE_LIMIT_COUNT,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Admit the first ``limit`` events per user per tumbling window.

    Batch twin of the Redis INCR+EXPIRE counter
    (auto_kafka_redis.py:348-366). The reference window anchors at the
    first event; the batch twin uses tumbling epoch windows (documented
    delta, SURVEY.md §4.2#1). One shuffle on (user, window).
    """
    window_us = window_s * 1_000_000
    win = F.expr(f"unix_micros({ts_col}) div {window_us}")
    w = Window.partitionBy(F.col(user_col), win).orderBy(
        F.col(ts_col), F.col(tiebreak)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )


def filter_valid(df: DataFrame) -> DataFrame:
    """Drop null/unparseable records (reference: the ``msg is None`` /
    JSON-decode guard, auto_kafka_redis.py:301,322-323)."""
    return df.filter(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & F.get_json_object(F.col("props"), "$.k").isNotNull()
    )


def events_pipeline(df: DataFrame, window_s: int = DEMO_WINDOW_S) -> DataFrame:
    """The composed flagship pipeline (B5): validity filter -> dedup ->
    rate limit. Operator order preserved from the reference consumer
    loop (:332 dedup before :348 rate-limit)."""
    df = filter_valid(df)
    # Ordering struct includes user_id so the dedup winner is unique even
    # when duplicate event_ids tie on (ts, value, event_type) — otherwise
    # the choice is partition-order-dependent and the divergence reaches
    # the per-user rate limit downstream.
    df = first_per_key(
        df,
        ["event_id"],
        [F.col("ts"), F.col("value"), F.col("event_type"), F.col("user_id")],
    )
    return rate_limit(df, window_s=window_s)


# --------------------------------------------------------------------
# Registered queries — SURVEY.md §2.A/§2.B/§2.C
# --------------------------------------------------------------------


@register(
    "scan_events",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
           value, props
    FROM events
    """,
)
def scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — source scan with explicit schema (batch twin of the Kafka
    consume + JSON deserialize, auto_kafka_redis.py:296-304).
    Timestamps are emitted as unix micros (oracle determinism)."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_TS_US).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@register(
    "sink_keyed_upsert",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_id
        ORDER BY ts DESC, value DESC, event_type DESC, user_id DESC
    ) = 1
    """,
)
def sink_keyed_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — keyed upsert store: latest write per ``event:{id}`` wins
    (auto_kafka_redis.py:370-380). Arg-max compaction, one shuffle."""
    df = table(spark, sf_dir, "events")
    df = latest_per_key(
        df,
        ["event_id"],
        [F.col("ts"), F.col("value"), F.col("event_type"), F.col("user_id")],
    )
    return df.select(
        "event_id", F.expr(_TS_US).alias("ts_us"), "user_id", "event_type", "value"
    )


@register(
    "sink_pubsub",
    oracle="""
    SELECT 'events' AS channel, event_id, user_id,
           'event-' || CAST(event_id AS VARCHAR) AS payload
    FROM events
    """,
)
def sink_pubsub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — broadcast channel publish: pass-through projection of
    accepted rows onto the channel (auto_kafka_redis.py:374,389)."""
    return table(spark, sf_dir, "events").select(
        F.lit("events").alias("channel"),
        "event_id",
        "user_id",
        F.format_string("event-%d", F.col("event_id")).alias("payload"),
    )


@register(
    "scan_kv_all",
    oracle="""
    SELECT 'event:' || CAST(event_id AS VARCHAR) AS key,
           event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_id
        ORDER BY ts DESC, value DESC, event_type DESC, user_id DESC
    ) = 1
    """,
)
def scan_kv_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — full KV-store scan (the REST ``/events`` endpoint,
    app.py:17-21): scan of the compacted keyed store. At scale this is
    a partition-pruned table scan, never a KEYS-* blocking sweep."""
    df = sink_keyed_upsert(spark, sf_dir)
    return df.select(
        F.format_string("event:%d", F.col("event_id")).alias("key"), "*"
    )


@register(
    "replay_last_n",
    oracle="""
    SELECT key, event_id, ts_us
    FROM (
        SELECT 'event:' || CAST(event_id AS VARCHAR) AS key,
               event_id, epoch_us(ts) AS ts_us
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY event_id
            ORDER BY ts DESC, value DESC, event_type DESC, user_id DESC
        ) = 1
    )
    ORDER BY key DESC
    LIMIT 50
    """,
)
def replay_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — last-50 replay buffer in *lexicographic key order* — the
    reference's real (string-sorted) semantics where ``event:999`` >
    ``event:1000`` (websocket_server.py:52-59). TakeOrdered top-k:
    no global sort at scale."""
    df = sink_keyed_upsert(spark, sf_dir)
    return (
        df.select(
            F.format_string("event:%d", F.col("event_id")).alias("key"),
            "event_id",
            "ts_us",
        )
        .orderBy(F.col("key").desc())
        .limit(50)
    )


@register(
    "multi_topic_fanout",
    oracle="""
    SELECT t.topic, e.event_id,
           'event-' || CAST(e.event_id AS VARCHAR) AS payload
    FROM events e
    CROSS JOIN (VALUES ('topic_a'), ('topic_b'), ('topic_c')) t(topic)
    """,
)
def multi_topic_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — producer fan-out: each event to every configured topic
    (producer.py:27-35). Broadcast cross join against the tiny topic
    dim — no shuffle of the fact side."""
    topics = spark.createDataFrame([("topic_a",), ("topic_b",), ("topic_c",)], ["topic"])
    return (
        table(spark, sf_dir, "events")
        .crossJoin(F.broadcast(topics))
        .select(
            "topic",
            "event_id",
            F.format_string("event-%d", F.col("event_id")).alias("payload"),
        )
    )


@register(
    "dedup_ttl",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_id
        ORDER BY ts, value, event_type, user_id
    ) = 1
    """,
)
def dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — TTL dedup, batch twin: first occurrence per id survives
    (auto_kafka_redis.py:332-346; TTL=60 s at :83). Streaming twin is
    ``dropDuplicatesWithinWatermark`` (streaming/pipeline.py)."""
    df = first_per_key(
        table(spark, sf_dir, "events"),
        ["event_id"],
        [F.col("ts"), F.col("value"), F.col("event_type"), F.col("user_id")],
    )
    return df.select(
        "event_id", F.expr(_TS_US).alias("ts_us"), "user_id", "event_type", "value"
    )


@register(
    "rate_limit_user",
    oracle=f"""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, epoch_us(ts) // {DEMO_WINDOW_S * 1_000_000}
        ORDER BY ts, event_id
    ) <= {RATE_LIMIT_COUNT}
    """,
)
def rate_limit_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — per-user rate limit, batch twin: first 5 per user per
    tumbling window (auto_kafka_redis.py:348-366; params :84-85).
    Registered with a 1-day window so the drop path is exercised at
    testdata density; reference params are 5/60 s."""
    df = rate_limit(table(spark, sf_dir, "events"), window_s=DEMO_WINDOW_S)
    return df.select(
        "event_id", F.expr(_TS_US).alias("ts_us"), "user_id", "event_type", "value"
    )


@register(
    "filter_valid",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id
    FROM events
    WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      AND json_extract(props, '$.k') IS NOT NULL
    """,
)
def filter_valid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — validity filter (null guard + parseability,
    auto_kafka_redis.py:301,322-323). Pure predicate — pushed to scan."""
    return filter_valid(table(spark, sf_dir, "events")).select(
        "event_id", F.expr(_TS_US).alias("ts_us"), "user_id"
    )


@register(
    "pipeline_e2e",
    oracle=f"""
    WITH valid AS (
        SELECT * FROM events
        WHERE event_id IS NOT NULL AND user_id IS NOT NULL
          AND json_extract(props, '$.k') IS NOT NULL
    ),
    deduped AS (
        SELECT * FROM valid
        QUALIFY row_number() OVER (
            PARTITION BY event_id ORDER BY ts, value, event_type, user_id
        ) = 1
    ),
    admitted AS (
        SELECT * FROM deduped
        QUALIFY row_number() OVER (
            PARTITION BY user_id, epoch_us(ts) // {DEMO_WINDOW_S * 1_000_000}
            ORDER BY ts, event_id
        ) <= {RATE_LIMIT_COUNT}
    )
    SELECT user_id,
           COUNT(*) AS admitted,
           ROUND(SUM(value), 6) AS sum_value
    FROM admitted
    GROUP BY user_id
    """,
)
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 — the flagship composed pipeline: scan -> filter_valid ->
    dedup -> rate-limit -> per-user stats (reference consumer loop,
    auto_kafka_redis.py:276-416). Operator order preserved: dedup
    before rate limit."""
    df = events_pipeline(table(spark, sf_dir, "events"))
    return df.groupBy("user_id").agg(
        F.count("*").alias("admitted"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "event_generator",
    oracle="""
    SELECT
        i % 1000000 AS id,
        'event-' || CAST(i % 1000000 AS VARCHAR) AS value,
        'user' || CAST((i % 5) + 1 AS VARCHAR) AS user_id,
        1704067200000000 + i * 50000 AS ts_us
    FROM range(0, 200) t(i)
    """,
)
def event_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 — synthetic producer: monotone id wrapping at 10^6, 5 users,
    20 ev/s for 10 s (auto_kafka_redis.py:191-219; wrap :216-217).
    Deterministic twin of the rate-source generator so the oracle can
    check it; the streaming variant uses format('rate')."""
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    return spark.range(0, 200).select(
        (F.col("id") % 1_000_000).alias("id"),
        F.format_string("event-%d", F.col("id") % 1_000_000).alias("value"),
        F.format_string("user%d", (F.col("id") % 5) + 1).alias("user_id"),
        (F.lit(base_us) + F.col("id") * 50_000).alias("ts_us"),
    )


# ----------------------------- §2.C dashboard aggregations -----------


@register("agg_total_count", oracle="SELECT COUNT(*) AS total FROM events")
def agg_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — dashboard 'total' counter (WebUI header). Partial+final
    count — no data movement beyond one long per partition."""
    return table(spark, sf_dir, "events").agg(F.count("*").alias("total"))


@register(
    "agg_user_counts",
    oracle="SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id",
)
def agg_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — dashboard USER STATS panel: events per user."""
    return table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("cnt")
    )


@register(
    "agg_distinct_users",
    oracle="SELECT COUNT(DISTINCT user_id) AS distinct_users FROM events",
)
def agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — dashboard 'users' counter. Exact here; at 100 TB prefer
    ``approx_count_distinct`` (HLL, no exact-distinct shuffle)."""
    return table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("distinct_users")
    )


@register(
    "agg_rate_per_min",
    oracle="""
    SELECT (epoch_us(ts) // 60000000) * 60000000 AS minute_us,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    """,
)
def agg_rate_per_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — events/min rate (dashboard RATE panel): tumbling 1-minute
    counts. Streaming twin: window(ts,'1 minute') + watermark (E1)."""
    minute = (F.expr("unix_micros(ts) div 60000000") * 60_000_000).alias("minute_us")
    return table(spark, sf_dir, "events").groupBy(minute).agg(
        F.count("*").alias("cnt")
    )


# Count-min sketch geometry: 4 independent hash rows x 1024 buckets.
_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_HEAVY_HITTER_MIN = 70  # events per user


@register(
    "heavy_hitters_cms",
    extra=True,
    oracle="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 70
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection with a Count-Min sketch PROPOSE phase
    and an exact VERIFY phase — the two-pass shape that makes sketch
    output certifiable: CMS estimates only ever overcount, so users
    whose estimate clears the threshold are a SUPERSET of the true
    heavy hitters; the second pass counts exactly, but only over
    that small candidate set. Output is therefore EXACT (and the
    oracle is plain GROUP BY/HAVING) while the scan-side state is a
    fixed 4x1024 grid of counters regardless of key cardinality —
    at 100 TB the first pass shuffles 4096 cells, not 10^9 users,
    and the verify pass's semi-join prunes the re-scan to candidate
    rows. The sketch rides back as a broadcast (it IS tiny — that's
    the point); per-user estimate = min over the 4 row counters.
    """
    ev = table(spark, sf_dir, "events").select("user_id")
    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("h"),
                            F.pmod(
                                F.xxhash64(F.lit(i), F.col("user_id")),
                                F.lit(_CMS_WIDTH),
                            ).alias("bucket"),
                        )
                        for i in range(_CMS_DEPTH)
                    ]
                )
            ).alias("s")
        )
        .select("s.*")
        .groupBy("h", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    users = ev.distinct()
    est = users
    for i in range(_CMS_DEPTH):
        est = est.join(
            F.broadcast(
                cells.filter(F.col("h") == i).select(
                    F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
                )
            ),
            F.pmod(F.xxhash64(F.lit(i), F.col("user_id")), F.lit(_CMS_WIDTH))
            == F.col(f"b{i}"),
        )
    candidates = est.select(
        "user_id",
        F.least(*[F.col(f"c{i}") for i in range(_CMS_DEPTH)]).alias("est"),
    ).filter(F.col("est") >= _HEAVY_HITTER_MIN)
    return (
        ev.join(F.broadcast(candidates.select("user_id")), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .filter(F.col("n_events") >= _HEAVY_HITTER_MIN)
    )

@register(
    "scan_multiformat",
    extra=True,
    oracle="""
    WITH base AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS BIGINT)
                   AS sum_v_int,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(epoch_us(ts) // 1000000000) AS BIGINT)
                   AS sum_ts_hi,
               CAST(SUM(epoch_us(ts) % 1000000000) AS BIGINT)
                   AS sum_ts_lo
        FROM events
    )
    SELECT f.fmt, b.n_rows, b.sum_v_int, b.n_users,
           b.sum_ts_hi, b.sum_ts_lo
    FROM base b CROSS JOIN (VALUES ('csv'), ('json'), ('orc')) f(fmt)
    """,
)
def scan_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-format breadth: the events table round-trips through
    the JSON, CSV and ORC connectors (write with explicit schema, read
    back with explicit schema — never inferSchema, which is a full
    extra pass at scale), then per-format lossless-ness is proven by
    exact aggregates: row count, bigint-quantized value sum, distinct
    users, timestamp-micros sum. The oracle computes the same numbers
    straight off parquet — any encode/decode drift in either text
    format breaks the hash.

    Timestamps travel as unix-micros BIGINTs (text-format timestamp
    rendering is locale/zone bait); doubles rely on the writer's
    round-trippable shortest repr, which both connectors guarantee.

    Scale: format conversion is an embarrassingly parallel
    per-partition rewrite; the aggregates are one partial-agg scan
    per format."""
    import tempfile

    e = table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    schema = (
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string"
    )
    root = tempfile.mkdtemp(prefix="esn_multiformat_")
    e.write.mode("overwrite").json(f"{root}/json")
    e.write.mode("overwrite").option("header", True).csv(f"{root}/csv")
    e.write.mode("overwrite").orc(f"{root}/orc")
    js = spark.read.schema(schema).json(f"{root}/json")
    cs = (
        spark.read.schema(schema)
        .option("header", True)
        .csv(f"{root}/csv")
    )
    oc = spark.read.schema(schema).orc(f"{root}/orc")

    def summarize(df: DataFrame, fmt: str) -> DataFrame:
        # ts sums split hi/lo around 1e9: SUM(raw micros) overflows
        # int64 past ~5k rows; the pair pins every microsecond with
        # headroom to billions of rows
        return df.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.floor(F.col("value") * 1e6).cast("bigint")).alias(
                "sum_v_int"
            ),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.expr("ts_us div 1000000000")).alias("sum_ts_hi"),
            F.sum(F.col("ts_us") % 1_000_000_000).alias("sum_ts_lo"),
        ).select(F.lit(fmt).alias("fmt"), "*")

    return (
        summarize(cs, "csv")
        .unionByName(summarize(js, "json"))
        .unionByName(summarize(oc, "orc"))
    )
