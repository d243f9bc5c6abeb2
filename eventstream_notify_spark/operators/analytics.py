"""Event-analytics operators — sessionization, funnels, retention.

The reference's domain is a user-event stream (auto_kafka_redis.py
events carry user_id / event_type / ts); these are the standard
product-analytics questions asked of exactly that shape, each as one
declarative plan over the ``events`` table.

Scale design: everything partitions by ``user_id`` — per-user windows
(sessionize), per-user conditional aggregates (funnel), and per-user
firsts (retention) all shuffle each event AT MOST once on the user
key, then aggregate; no self-joins of the fact table against itself
except the funnel's step joins, which join the FULL fact only against
per-user 1-row step frames. All timestamps are emitted as epoch-µs
bigints (oracle parity rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
WEEK_US = 7 * 86_400 * 1_000_000


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )


@register(
    "sessionize_events",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US}
                         OR LAG(ts_us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
        SELECT user_id, ts_us,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sess
    GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch formulation: a session breaks
    after 30 idle minutes. One pass: lag → new-session flag → running
    sum (the session index) → per-session aggregate. Both windows and
    the aggregate share the ``user_id`` partitioning, so the whole
    plan is ONE shuffle of the fact (plan-asserted in tests); ties
    break on event_id so the flags are deterministic. The streaming
    twin is ``stream_session`` (session_window)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = _ev(spark, sf_dir).withColumn(
        "is_new",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "funnel_conversion",
    extra=True,
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    v AS (
        SELECT user_id, MIN(ts_us) AS view_us
        FROM ev WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts_us) AS click_us
        FROM ev e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts_us > v.view_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts_us) AS purchase_us
        FROM ev e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts_us > c.click_us
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
           1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each step's timestamp
    is the user's first qualifying event STRICTLY AFTER the previous
    step (the order constraint is what distinguishes a funnel from
    three independent mins). Each step joins the fact against the
    previous step's per-user 1-row frame (broadcastable: one row per
    funnel-entered user), filters, and re-aggregates — the fact is
    never self-joined. ``stage`` is how far the user got."""
    ev = _ev(spark, sf_dir)

    def first_after(
        etype: str, prev: DataFrame, prev_ts: str, out: str
    ) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts_us")
        return (
            e.join(F.broadcast(prev), "user_id")
            .filter(F.col("ts_us") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_us"))
    )
    c = first_after("click", v, "view_us", "click_us")
    p = first_after("purchase", c, "click_us", "purchase_us")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_us",
            "click_us",
            "purchase_us",
            (
                F.lit(1)
                + F.col("click_us").isNotNull().cast("int")
                + F.col("purchase_us").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


@register(
    "retention_cohorts",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1),
    active AS (SELECT DISTINCT user_id, week FROM ev)
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active a JOIN cohort c ON c.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users cohorted by first-activity week,
    counted in every later week they return. Two aggregations over
    the same user-keyed shuffle plus a broadcast of the per-user
    cohort frame (one row per user — at 100 TB this is the frame you
    bucket, not broadcast; the join stays key-local either way)."""
    # integer DIV, not double division + cast: a double quotient can
    # round UP across a week boundary (µs offsets are far below ulp at
    # this magnitude), silently disagreeing with DuckDB's `//`
    ev = _ev(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {WEEK_US}").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "scd2_user_state",
    extra=True,
    oracle="""
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
           ), 253402300800000000) AS valid_to_us,
           CAST(LEAD(ts_us) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
           ) IS NULL AS INT) AS is_current
    FROM changes
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build — each user's
    event_type treated as a state machine: collapse consecutive
    repeats, then close each state's validity interval with the next
    change's timestamp (LEAD), open-ended rows marked current with
    the conventional year-9999 sentinel. The canonical
    change-data-capture → warehouse-dimension derivation, as two
    windows over ONE user_id shuffle. At 100 TB this runs
    incrementally per partition-day with the previous day's open rows
    carried forward; the full-history formulation here is its exact
    batch spec."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = _ev(spark, sf_dir)
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(
            (F.col("event_type") != F.col("prev")) | F.col("prev").isNull()
        )
        .select("user_id", F.col("event_type").alias("state"), "ts_us", "event_id")
    )
    v = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(v)
    return changes.select(
        "user_id",
        "state",
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(253402300800000000)).alias("valid_to_us"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register(
    "event_transitions",
    extra=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst
        FROM events
    ),
    cnt AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL
        GROUP BY src, dst
    ),
    tot AS (
        SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM cnt GROUP BY src
    )
    SELECT c.src, c.dst, c.n,
           c.n / CAST(t.total AS DOUBLE) AS p
    FROM cnt c JOIN tot t ON t.src = c.src
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    each (event_type → next event_type) edge per user timeline, the
    count and conditional probability. One LEAD window over the
    user_id shuffle, then two narrow aggregations; probabilities are
    single exactly-rounded divisions of exact integer counts. The
    matrix is the 'what usually happens after an error?' view the
    reference's dashboard gestures at."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = (
        _ev(spark, sf_dir)
        .withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .select(F.col("event_type").alias("src"), "dst")
    )
    cnt = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = cnt.groupBy(F.col("src").alias("ts_src")).agg(
        F.sum("n").alias("total")
    )
    return (
        cnt.join(F.broadcast(tot), cnt.src == F.col("ts_src"))
        .select(
            "src",
            "dst",
            "n",
            (F.col("n") / F.col("total").cast("double")).alias("p"),
        )
    )


@register(
    "journey_trigrams",
    extra=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS journey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, journey
    LIMIT 15
    """,
)
def journey_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the 15 most common 3-step event-type
    paths across all user timelines (the n-gram view of behavior —
    'view>click>purchase' vs 'error>error>error'). Two LEAD offsets
    over the same window spec share one user_id shuffle; top-k is
    TakeOrdered with the journey string as tie-break."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = (
        _ev(spark, sf_dir)
        .select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
    )
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("journey")
        )
        .groupBy("journey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "journey")
        .limit(15)
    )


@register(
    "assoc_rules",
    extra=True,
    oracle="""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM li),
    cnt AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_b
        FROM li GROUP BY 1
    ),
    pairs AS (
        SELECT a.p_brand AS ba, b.p_brand AS bb,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    ),
    rules AS (
        SELECT ba AS antecedent, bb AS consequent, n_ab FROM pairs
        UNION ALL
        SELECT bb, ba, n_ab FROM pairs
    )
    SELECT r.antecedent, r.consequent,
           CAST(r.n_ab AS DOUBLE) / (SELECT n_orders FROM n) AS support,
           CAST(r.n_ab AS DOUBLE) / ca.n_b AS confidence,
           CAST(r.n_ab * (SELECT n_orders FROM n) AS DOUBLE)
               / (ca.n_b * cc.n_b) AS lift
    FROM rules r
    JOIN cnt ca ON r.antecedent = ca.p_brand
    JOIN cnt cc ON r.consequent = cc.p_brand
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 25
    """,
)
def assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets (items =
    part brands): support, confidence, lift for brand→brand rules,
    top-25 by lift — the co-occurrence mining pass behind 'frequently
    bought together'. Brands (25 values) rather than raw part keys
    keep the pair space dense at every scale factor (raw keys dilute:
    at sf0.1 the max part-pair count is 3).

    Shape: basket×item pairs dedupe scan-side, the pair self-join
    shuffles ONCE on the basket key (per-basket fan-out is C(k,2)
    with k = distinct brands per order, bounded by 25), and item
    frequencies ride back as a broadcast. All three metrics are exact
    integer ratios evaluated in one fixed order — products stay under
    2^53, so the IEEE divisions are bit-identical cross-engine. The
    symmetric-lift tie between a rule and its reverse is broken by
    (antecedent, consequent). At 100 TB: identical plan, with heavy
    baskets (k near the domain size) the only skew risk — bounded
    here by the 25-brand domain, salted otherwise."""
    # r13 opt (guide §5): five consumers (n, cnt, both self-join
    # sides, and the rule expansion) each re-derived this
    # join+distinct over lineitem — one lazy checkpoint materializes
    # the basket table once (before-plan had 32 Exchanges from the
    # repeated subtrees)
    li = (
        table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(table(spark, sf_dir, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    cnt = li.groupBy("p_brand").agg(F.count("*").cast("bigint").alias("n_b"))
    a = li.select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("ba"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("bb"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("ba") < F.col("bb"))
        .groupBy("ba", "bb")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    rules = pairs.select(
        F.col("ba").alias("antecedent"), F.col("bb").alias("consequent"), "n_ab"
    ).union(
        pairs.select(
            F.col("bb").alias("antecedent"),
            F.col("ba").alias("consequent"),
            "n_ab",
        )
    )
    return (
        rules.join(
            F.broadcast(
                cnt.select(F.col("p_brand").alias("antecedent"), F.col("n_b").alias("na"))
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                cnt.select(F.col("p_brand").alias("consequent"), F.col("n_b").alias("nc"))
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            (F.col("n_ab").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("na")).alias("confidence"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nc"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(25)
    )

@register(
    "feature_binning",
    extra=True,
    oracle="""
    WITH t AS (
        SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS bin
        FROM events
    )
    SELECT bin, COUNT(*) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi,
           ROUND(CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1e6, 6) AS mean
    FROM t
    GROUP BY 1
    """,
)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature binning (decile bucketizer): NTILE(10)
    over a total order of the metric, then per-bin boundaries and
    means — the discretization pass an ML feature pipeline runs
    before one-hot/WOE encoding, and the exact-quantile sibling of
    the sketch-based approxQuantile path (zx_agg_sketches).

    Determinism: the NTILE order carries an event_id tie-break, and
    bin means accumulate in exact bigint micro-units (the ts_ewma
    trick) so no cross-engine float-summation drift exists.

    Scale: the NTILE rides ``global_ntile`` (functions/ranking.py) —
    value-range buckets, per-bucket parallel rank, driver-folded
    prefix offsets — bit-identical to the single-window form with no
    unpartitioned window in the plan. The groupBy after it is 10
    partial-aggregated rows. (At 100 TB the approx sibling is
    zx_agg_sketches' approx_percentile + width_bucket.)"""
    from eventstream_notify_spark.functions.ranking import global_ntile

    e = table(spark, sf_dir, "events")
    t = global_ntile(
        e.select("value", "event_id"), 10, "value", ["event_id"], out="bin"
    )
    return t.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(
            F.sum(F.floor(F.col("value") * 1e6).cast("bigint")).cast(
                "double"
            )
            / F.count("*")
            / F.lit(1e6),
            6,
        ).alias("mean"),
    )

@register(
    "attribution_last_touch",
    extra=True,
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               MAX(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) * 4 + 1
                        WHEN event_type = 'view'
                            THEN epoch_us(ts) * 4 + 2
                        WHEN event_type = 'signup'
                            THEN epoch_us(ts) * 4 + 3
                   END) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS touch_code
        FROM events
    )
    SELECT CASE touch_code % 4 WHEN 1 THEN 'click' WHEN 2 THEN 'view'
                WHEN 3 THEN 'signup' ELSE 'organic' END AS channel,
           COUNT(*) AS conversions,
           COUNT(DISTINCT user_id) AS users
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding touch channel (click / view /
    signup), 'organic' when none precedes — the standard conversion-
    credit query of product analytics.

    The "latest preceding qualifying event" is ONE windowed MAX over
    an encoded (ts_us * 4 + channel_id) bigint — an argmax without a
    self-join or a second window pass; ties at equal microsecond
    resolve to the larger channel code identically in both engines.
    Scale: single (user_id) window — the partition axis every other
    per-user op here shuffles on — then a 4-row aggregate."""
    e = table(spark, sf_dir, "events")
    code = F.when(
        F.col("event_type") == "click", F.col("ts_us") * 4 + 1
    ).when(
        F.col("event_type") == "view", F.col("ts_us") * 4 + 2
    ).when(
        F.col("event_type") == "signup", F.col("ts_us") * 4 + 3
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    ).select(
        "user_id",
        "event_type",
        F.max(code).over(w).alias("touch_code"),
    )
    channel = (
        F.when(F.col("touch_code") % 4 == 1, "click")
        .when(F.col("touch_code") % 4 == 2, "view")
        .when(F.col("touch_code") % 4 == 3, "signup")
        .otherwise("organic")
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(channel.alias("channel"))
        .agg(
            F.count("*").alias("conversions"),
            F.countDistinct("user_id").alias("users"),
        )
    )


# ------------------------------------------------------- percentiles


@register(
    "agg_percentiles",
    extra=True,
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.90), 6) AS p90,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (linear interpolation): the latency/
    value-distribution readout every dashboard needs. Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the SQL-standard
    interpolation, so parity is exact at 6 d.p.

    Scale: exact percentile buffers each group's values — fine for
    bounded group counts (5 event types). The unbounded-cardinality
    scale path is ``zx_agg_sketches``'s KLL/approx_percentile; this
    operator is its exact twin on low-cardinality groups.
    """
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ------------------------------------------------------ corr matrix


@register(
    "corr_matrix",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day, event_type,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.v AS x, b.v AS y
      FROM daily a JOIN daily b
        ON a.user_id = b.user_id AND a.day = b.day
       AND a.event_type < b.event_type
    )
    SELECT type_a, type_b, COUNT(*) AS n,
      ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE)
             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
       / sqrt((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
               - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
            * (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y*y) AS DOUBLE)
               - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))), 6)
        AS pearson_r
    FROM pairs GROUP BY 1, 2
    HAVING (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) > 0
       AND (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y*y) AS DOUBLE)
            - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)) > 0
    """,
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event types' per-(user,day)
    activity totals — the behavioral co-occurrence matrix.

    Cross-engine float parity trick (same as zx_ts_ewma): every
    aggregate is an EXACT bigint (milli-unit quantized sums), and the
    correlation is one deterministic double expression over those six
    exact integers — identical IEEE evaluation on both engines, so the
    result hash-matches at 6 d.p. Degenerate (zero-variance) pairs are
    filtered on both sides rather than risking NaN-vs-NULL skew.

    Scale: one shuffle of the fact on (user_id, day, event_type) to
    build `daily`, then a self-equi-join on (user_id, day) — both sides
    co-partitioned, candidate width bounded by types-per-user-day (<=5)
    — then a 10-row aggregate. No driver loops, no wide pivot.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "event_type",
    ).agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("v"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.v").alias("x"),
        F.col("b.v").alias("y"),
    )
    agg = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return (
        agg.filter((var_x > 0) & (var_y > 0))
        .select(
            "type_a",
            "type_b",
            "n",
            F.round((nd * sxy - sx * sy) / F.sqrt(var_x * var_y), 6).alias(
                "pearson_r"
            ),
        )
    )


# --------------------------------------------------------- skyline


_SKY_BUCKETS = 64


@register(
    "skyline_pareto_bucketed",
    extra=True,
    oracle="""
    WITH g AS (
        SELECT o_totalprice AS p, max(o_orderdate) AS gmax
        FROM orders GROUP BY 1
    ),
    gm AS (
        SELECT p, gmax,
               max(gmax) OVER (ORDER BY p DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
        FROM g
    )
    SELECT o.o_orderkey, o.o_totalprice,
           epoch_us(o.o_orderdate) AS date_us
    FROM orders o JOIN gm ON o.o_totalprice = gm.p
    WHERE (gm.m1 IS NULL OR gm.m1 < o.o_orderdate)
      AND o.o_orderdate = gm.gmax
    """,
)
def skyline_pareto_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over ORDERS with the DISTRIBUTED sweep (cf.
    zx_skyline_pareto in relational.py: same operator class, single
    global-window sweep over `part`): orders not dominated on
    (o_totalprice, o_orderdate) — no other order is >= on both axes and
    strictly greater on one. The classic multi-criteria shortlist
    operator (Borzsony/Kossmann/Stocker, ICDE'01 'The Skyline
    Operator').

    Dominance decomposes per price group: a row survives iff it carries
    its price group's max date AND no strictly-higher price group
    reaches that date. The oracle computes "max date over all strictly
    higher prices" with ONE global window — correct, but a single
    ordering task at scale.

    Scale shape instead: the same distributed-prefix pattern as
    zx_llm_epoch_shuffle — range-bucket prices (fixed-width bins off a
    1-row min/max agg), compute the per-bucket date max, prefix-max the
    TINY bucket table (64 rows) for "max date in all higher buckets",
    broadcast it back, and run the strictly-higher-price window
    PARTITIONED BY BUCKET (parallel; higher bucket => strictly higher
    price, proven by fixed-width binning). Every step is a bounded
    shuffle or a broadcast; nothing funnels the fact through one task.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("p"),
        F.col("o_orderdate").alias("d"),
    )
    lohi = o.agg(F.min("p").alias("lo"), F.max("p").alias("hi")).first()
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / _SKY_BUCKETS or 1.0
    bucket = F.least(
        F.lit(_SKY_BUCKETS - 1),
        F.floor((F.col("p") - F.lit(lo)) / F.lit(width)),
    ).alias("bucket")

    g = o.select(bucket, "p", "d").groupBy("bucket", "p").agg(
        F.max("d").alias("gmax")
    )
    from eventstream_notify_spark.functions.ranking import (
        bucket_prefix_expr,
    )

    b = g.groupBy("bucket").agg(F.max("gmax").alias("bmax"))
    # "max date in any strictly higher bucket": the 64-row bucket
    # table folds on the driver into a literal-map lookup (constant-
    # bounded — no unpartitioned window even over the tiny table)
    m_above = bucket_prefix_expr(b, "bucket", "bmax", "max", descending=True)
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(F.col("p").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gm = (
        g.withColumn("m_local", F.max("gmax").over(w_local))
        .withColumn("m_above", m_above)
        # greatest() skips NULLs: null m_local/m_above mean "no higher
        # price exists on that side"
        .withColumn("m1", F.greatest("m_local", "m_above"))
    )
    return (
        o.select(bucket, "o_orderkey", "p", "d")
        .join(gm.select("bucket", "p", "gmax", "m1"), ["bucket", "p"])
        .filter(
            (F.col("m1").isNull() | (F.col("m1") < F.col("d")))
            & (F.col("d") == F.col("gmax"))
        )
        .select(
            "o_orderkey",
            F.col("p").alias("o_totalprice"),
            F.unix_micros(F.col("d").cast("timestamp")).alias("date_us"),
        )
    )


# ----------------------------------------------------- sliding DAU


@register(
    "sliding_dau",
    extra=True,
    oracle="""
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      FROM events
    ),
    days AS (SELECT day, COUNT(*) AS dau1 FROM du GROUP BY day),
    exp AS (
      SELECT du.day + o.o AS day, du.user_id
      FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) o
    )
    SELECT e.day, COUNT(DISTINCT e.user_id) AS dau7, d.dau1
    FROM exp e JOIN days d ON e.day = d.day
    GROUP BY e.day, d.dau1
    """,
)
def sliding_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (DAU/WAU) — the
    canonical hard sliding-window op, because COUNT(DISTINCT) does not
    decompose over window frames.

    Scale shape: distinct (day,user) pairs once, then EXPLODE each
    pair into the 7 window-end days it contributes to (narrow 7x
    expansion of the already-deduped pairs, not of the fact), and
    count distinct per day. A days-x-pairs BETWEEN join would plan a
    nested loop; the expansion is a generator + one exchange. Days
    with no events of their own are dropped by the broadcast join
    against the real-day list (window ends only where data exists).
    """
    e = table(spark, sf_dir, "events")
    du = (
        e.select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
        )
        .distinct()
    )
    days = du.groupBy("day").agg(F.count("*").alias("dau1"))
    exp = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "day", "user_id"
    ).select((F.col("day") + F.col("o")).alias("day"), "user_id")
    return (
        exp.join(F.broadcast(days), "day")
        .groupBy("day", "dau1")
        .agg(F.countDistinct("user_id").alias("dau7"))
        .select("day", "dau7", "dau1")
    )


# ------------------------------------------------------- A/B stats


@register(
    "ab_test_stats",
    extra=True,
    oracle="""
    WITH assigned AS (
      SELECT CAST(user_id % 2 AS INT) AS variant, event_type,
             CAST(round(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    m AS (
      SELECT event_type, variant, COUNT(*) AS n,
             SUM(v) AS s, SUM(v*v) AS ss
      FROM assigned GROUP BY 1, 2
    ),
    w AS (
      SELECT a.event_type,
             a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
             a.ss AS ss_a, b.ss AS ss_b
      FROM m a JOIN m b
        ON a.event_type = b.event_type AND a.variant = 0 AND b.variant = 1
    )
    SELECT event_type, n_a, n_b,
      ROUND((CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / 1000.0, 6)
        AS lift,
      ROUND((CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
       / sqrt((CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                 * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
                 / CAST(n_a AS DOUBLE)
            + (CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
               - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
                 / CAST(n_b AS DOUBLE)), 6) AS z_score
    FROM w
    """,
)
def ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B readout per event type: deterministic variant
    assignment (user_id parity — in production, a salted hash bucket),
    mean lift, and Welch z-score.

    Same cross-engine float discipline as zx_corr_matrix: the only
    aggregates are exact bigints (count, milli-unit sum, milli-unit
    sum of squares); means, variances, and the z-score are one
    deterministic double expression over those integers, evaluated
    with identical structure on both engines.

    Scale: one partial+final aggregation of the fact into 10 rows
    (type x variant), then a self-join of the 10-row table. Nothing
    after the first exchange depends on data volume.
    """
    e = table(spark, sf_dir, "events")
    m = (
        e.select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "event_type",
            F.round(F.col("value") * 1000).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "variant")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
    )
    a = m.filter(F.col("variant") == 0).alias("a")
    b = m.filter(F.col("variant") == 1).alias("b")
    w = a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.s").alias("s_a"),
        F.col("b.s").alias("s_b"),
        F.col("a.ss").alias("ss_a"),
        F.col("b.ss").alias("ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    ssa, ssb = F.col("ss_a").cast("double"), F.col("ss_b").cast("double")
    mean_a, mean_b = sa / na, sb / nb
    var_term = (ssa / na - mean_a * mean_a) / na + (
        ssb / nb - mean_b * mean_b
    ) / nb
    return w.select(
        "event_type",
        "n_a",
        "n_b",
        F.round((mean_b - mean_a) / 1000.0, 6).alias("lift"),
        F.round((mean_b - mean_a) / F.sqrt(var_term), 6).alias("z_score"),
    )


# ------------------------------------------------ interval concurrency


_CONC_BUCKETS = 64


@register(
    "max_concurrent_sessions",
    extra=True,
    oracle="""
    WITH se AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    sess AS (
      SELECT user_id, MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
      FROM (SELECT user_id, ts_us,
                   SUM(is_start) OVER (
                       PARTITION BY user_id ORDER BY ts_us) AS sid
            FROM se)
      GROUP BY user_id, sid
    ),
    deltas AS (
      SELECT s_us AS t, 1 AS d FROM sess
      UNION ALL
      SELECT e_us + 1 AS t, -1 FROM sess
    ),
    sweep AS (
      SELECT t, CAST(SUM(SUM(d)) OVER (ORDER BY t) AS BIGINT) AS concurrent
      FROM deltas GROUP BY t
    )
    SELECT t AS ts_us, concurrent FROM sweep
    ORDER BY concurrent DESC, t LIMIT 10
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency: sessionize (30-min gaps, same islands as
    zx_sessionize_events), then the classic +1/-1 interval sweep — the
    'max simultaneous connections' / capacity-planning query.

    The sweep's running sum is a GLOBAL prefix over session-boundary
    deltas, so it gets the same range-bucket treatment as
    zx_skyline_pareto_bucketed: fixed-width TIME bins off one min/max
    row, per-bin delta totals prefix-summed on the tiny bin table and
    broadcast back, running sum inside each bin in parallel plus its
    bin offset. Deltas are 2 rows/session (<< events), and no stage
    funnels them through one task.
    """
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "is_start",
            (
                F.col("prev_us").isNull()
                | ((F.col("ts_us") - F.col("prev_us")) > SESSION_GAP_US)
            ).cast("int"),
        )
        .withColumn(
            "sid",
            F.sum("is_start").over(
                Window.partitionBy("user_id")
                .orderBy("ts_us", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))
    )
    deltas = sess.select(
        F.col("s_us").alias("t"), F.lit(1).alias("d")
    ).unionByName(sess.select((F.col("e_us") + 1).alias("t"), F.lit(-1).alias("d")))
    from eventstream_notify_spark.functions.ranking import (
        bucket_prefix_expr,
    )

    grouped = deltas.groupBy("t").agg(F.sum("d").alias("dd"))
    lohi = grouped.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).first()
    lo, hi = int(lohi["lo"]), int(lohi["hi"])
    width = max(1, (hi - lo) // _CONC_BUCKETS + 1)
    b = grouped.withColumn("bucket", ((F.col("t") - lo) / width).cast("bigint"))
    btot = b.groupBy("bucket").agg(F.sum("dd").alias("bsum"))
    # per-bin offsets: the ≤64-row bin-total table folds on the driver
    # into a literal-map lookup (constant-bounded, window-free)
    boff = F.coalesce(
        bucket_prefix_expr(btot, "bucket", "bsum", "sum"), F.lit(0)
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        b.withColumn("concurrent", boff + F.sum("dd").over(w_local))
        .select(F.col("t").alias("ts_us"), "concurrent")
        .orderBy(F.col("concurrent").desc(), "ts_us")
        .limit(10)
    )


@register(
    "sliding_dau_hll",
    extra=True,
    oracle="""
    WITH du AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    exp AS (
      SELECT du.day + o.o AS day, du.user_id
      FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) o
    )
    SELECT e.day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS dau7_est
    FROM exp e JOIN days d ON e.day = d.day
    GROUP BY e.day
    """,
)
def sliding_dau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path for zx_sliding_dau: per-day HyperLogLog
    sketches (Spark's DataSketches HLL, lgK=14 => ~0.8% rel. error),
    merged over each 7-day window — COUNT DISTINCT becomes a
    MERGEABLE aggregate, so window reuse costs a tiny sketch union
    instead of re-touching (day,user) pairs.

    Exact twin zx_sliding_dau expands deduped pairs 7x; that is fine
    while distinct users per day fit a shuffle, but sketches make the
    rollup O(days x 16KB) regardless of cardinality — the same
    partial-merge property zx_incremental_rollup exploits for
    algebraic aggregates, extended to the holistic one.

    ORACLE-PAIRED at driver scale (r9, was rows-only): a DataSketches
    HLL_4 sketch at lgK=14 stays in its exact coupon-SET mode until
    thousands of uniques, so below that threshold the "estimate" IS
    the exact distinct count — verified bit-equal to the exact twin
    at sf0.001 (15 users/window) and sf0.01 (150). The oracle is the
    exact-distinct SQL twin, valid precisely in that regime (the
    driver gate runs at sf0.01); at production cardinalities the
    contract degrades to the pinned <=2% accuracy band vs
    zx_sliding_dau (tests/test_scale_paths.py), which is the honest
    spec of a sketch.
    """
    e = table(spark, sf_dir, "events")
    du = (
        e.select(
            F.expr("unix_micros(ts) div 86400000000").alias("day"), "user_id"
        )
        .distinct()
    )
    sketches = du.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    days = du.select("day").distinct()
    exp = sketches.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "day", "sk"
    ).select((F.col("day") + F.col("o")).alias("day"), "sk")
    return (
        exp.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("dau7_est")
        )
    )


# -------------------------------------------------- windowed funnel


DAY_US = 86_400_000_000


@register(
    "funnel_windowed",
    extra=True,
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
                FROM events),
    v AS (SELECT user_id, MIN(ts_us) AS view_us FROM ev
          WHERE event_type='view' GROUP BY 1),
    c AS (
      SELECT e.user_id, MIN(e.ts_us) AS click_us
      FROM ev e JOIN v USING (user_id)
      WHERE e.event_type='click' AND e.ts_us > v.view_us
        AND e.ts_us <= v.view_us + {DAY_US}
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts_us) AS purchase_us
      FROM ev e JOIN c USING (user_id) JOIN v USING (user_id)
      WHERE e.event_type='purchase' AND e.ts_us > c.click_us
        AND e.ts_us <= v.view_us + {7 * DAY_US}
      GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_view,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_click_1d,
           CAST(COUNT(p.user_id) AS BIGINT) AS n_purchase_7d
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel (the product-analytics default):
    view → click within 1 DAY of the view → purchase within 7 DAYS of
    the view (and after the click). Unlike zx_funnel_conversion's
    unbounded ordering, each step carries a deadline anchored at
    funnel entry — the extra per-user frame columns ride the same
    broadcastable 1-row step frames; the fact is still never
    self-joined.
    """
    ev = _ev(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(
            (F.col("ts_us") > F.col("view_us"))
            & (F.col("ts_us") <= F.col("view_us") + DAY_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_us"))
    )
    cv = c.join(F.broadcast(v), "user_id")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cv), "user_id")
        .filter(
            (F.col("ts_us") > F.col("click_us"))
            & (F.col("ts_us") <= F.col("view_us") + 7 * DAY_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("*").alias("n_view"),
            F.count("click_us").alias("n_click_1d"),
            F.count("purchase_us").alias("n_purchase_7d"),
        )
    )


# ------------------------------------------------------------- RFM


@register(
    "rfm_segments",
    extra=True,
    oracle="""
    WITH anchor AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
    per_user AS (
      SELECT user_id,
             (SELECT now_us FROM anchor) - MAX(epoch_us(ts)) AS recency_us,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(value*1000) AS BIGINT)) AS BIGINT)
                 AS monetary_mv
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, monetary_mv,
             NTILE(5) OVER (ORDER BY recency_us ASC, user_id) AS r,
             NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             NTILE(5) OVER (ORDER BY monetary_mv DESC, user_id) AS m
      FROM per_user
    )
    SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(monetary_mv) AS BIGINT) AS segment_mv
    FROM scored GROUP BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user Recency / Frequency / Monetary
    quintiles over purchases (NTILE with deterministic user_id
    tie-breaks — identical bucket boundaries cross-engine), rolled up
    to segment sizes and value — the classic CRM cut.

    Scale: the fact collapses to one row per purchasing user at the
    first exchange. The three NTILEs run distributed via
    ``global_ntile`` (functions/ranking.py) — per-metric range
    buckets, parallel within-bucket rank, driver-folded prefix
    offsets — so user cardinality never funnels through one task
    (DESC metrics rank on the negated key). Monetary stays in exact
    milli-unit bigints.
    """
    from eventstream_notify_spark.functions.ranking import global_ntile
    e = table(spark, sf_dir, "events")
    pu = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.unix_micros("ts")).alias("last_us"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias(
                "monetary_mv"
            ),
        )
    )
    # Anchor "now" at MAX(ts) over ALL events, matching the oracle —
    # anchoring at the last PURCHASE would shift every recency by a
    # constant (NTILE-invariant today, but a trap the moment
    # recency_us is emitted or binned by absolute value).
    now = e.agg(F.max(F.unix_micros("ts")).alias("now_us"))
    scored = pu.crossJoin(F.broadcast(now)).select(
        "user_id",
        "monetary_mv",
        (F.col("now_us") - F.col("last_us")).alias("recency_us"),
        "frequency",
    )
    tiled = global_ntile(scored, 5, "recency_us", ["user_id"], out="r")
    tiled = global_ntile(
        tiled, 5, -F.col("frequency"), ["user_id"], out="f"
    )
    tiled = global_ntile(
        tiled, 5, -F.col("monetary_mv"), ["user_id"], out="m"
    )
    return (
        tiled.select("r", "f", "m", "monetary_mv")
        .groupBy("r", "f", "m")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("monetary_mv").alias("segment_mv"),
        )
    )


# -------------------------------------------------------- YoY / LTV


@register(
    "yoy_growth",
    extra=True,
    oracle="""
    WITH yearly AS (
      SELECT n.n_name,
             CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y') AS INT) AS yr,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name, yr, revenue,
           ROUND(CASE WHEN LAG(revenue) OVER w > 0
                THEN revenue / LAG(revenue) OVER w - 1.0 END, 6)
               AS yoy_growth
    FROM yearly WINDOW w AS (PARTITION BY n_name ORDER BY yr)
    """,
)
def yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the standard BI
    trend readout: decimal-exact yearly sums (order-independent),
    then LAG on the tiny (nation x year) grid. First years emit NULL
    growth on both engines. Scale: the fact reduces at the first
    exchange; the window runs over ~175 rows.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    yearly = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "n_name",
        "yr",
        "revenue",
        F.round(
            F.when(prev > 0, F.col("revenue") / prev - 1.0), 6
        ).alias("yoy_growth"),
    )


@register(
    "cohort_ltv_curve",
    extra=True,
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // 604800000000 AS week,
             CAST(round(value*1000) AS BIGINT) AS mv
      FROM events WHERE event_type = 'purchase'
    ),
    cohort AS (SELECT user_id, MIN(week) AS cw FROM ev GROUP BY 1),
    wk AS (
      SELECT c.cw, e.week - c.cw AS off, CAST(SUM(e.mv) AS BIGINT) AS wk_mv
      FROM ev e JOIN cohort c USING (user_id) GROUP BY 1, 2
    )
    SELECT cw AS cohort_week, off AS week_offset,
           CAST(SUM(wk_mv) OVER (PARTITION BY cw ORDER BY off) AS BIGINT)
               AS cum_mv
    FROM wk
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime-value curve per first-purchase cohort —
    zx_retention_cohorts' monetary sibling: purchases bucket into
    (cohort week, week offset), then a running sum per cohort gives
    the LTV trajectory. Exact milli-unit bigints end to end; the
    cumsum runs over the tiny cohort-week triangle. Same one-shuffle
    cohort-join shape as retention (per-user 1-row cohort frame,
    broadcastable).
    """
    e = table(spark, sf_dir, "events")
    ev = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr("unix_micros(ts) div 604800000000").alias("week"),
        F.round(F.col("value") * 1000).cast("bigint").alias("mv"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cw"))
    wk = (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy("cw", (F.col("week") - F.col("cw")).alias("off"))
        .agg(F.sum("mv").alias("wk_mv"))
    )
    w = (
        Window.partitionBy("cw")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return wk.select(
        F.col("cw").alias("cohort_week"),
        F.col("off").alias("week_offset"),
        F.sum("wk_mv").over(w).alias("cum_mv"),
    )


# ------------------------------------------- shares / cumulative / IAT


@register(
    "revenue_share",
    extra=True,
    oracle="""
    WITH nr AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY r_name), 6)
               AS region_share,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS global_share
    FROM nr
    """,
)
def revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region
    and of the world — the percent-of-total window every BI layer
    names. Decimal-exact sums reduce the fact to 25 rows first; both
    share windows run over that grid, and the empty-frame global
    window is a 25-row broadcast-scale concern, not a fact scan.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    nr = (
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    wr = Window.partitionBy("r_name")
    wg = Window.partitionBy()
    return nr.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "region_share"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(wg), 6).alias(
            "global_share"
        ),
    )


@register(
    "cumulative_distinct_users",
    extra=True,
    oracle="""
    WITH fa AS (
      SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day
      FROM events GROUP BY 1
    ),
    daily_new AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM fa GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
               AS cum_distinct_users
    FROM daily_new
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — a HOLISTIC running aggregate
    made algebraic by the first-appearance identity: cumulative
    COUNT(DISTINCT user) = running SUM of per-day FIRST APPEARANCES
    (each user counts exactly once, on their min day). One shuffle to
    per-user min-day, a daily count, and a cumsum over the tiny day
    series — where the naive framing re-scans an ever-growing prefix
    per day.
    """
    e = table(spark, sf_dir, "events")
    fa = e.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts) div 86400000000")).alias("first_day")
    )
    daily_new = fa.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily_new.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    )


@register(
    "interarrival_histogram",
    extra=True,
    oracle="""
    WITH gaps AS (
      SELECT (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
          PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS gap_s
      FROM events
    )
    SELECT CAST(CAST(gap_s >= 4 AS BIGINT) + CAST(gap_s >= 16 AS BIGINT) + CAST(gap_s >= 64 AS BIGINT) + CAST(gap_s >= 256 AS BIGINT) + CAST(gap_s >= 1024 AS BIGINT) + CAST(gap_s >= 4096 AS BIGINT) + CAST(gap_s >= 16384 AS BIGINT) + CAST(gap_s >= 65536 AS BIGINT) + CAST(gap_s >= 262144 AS BIGINT) + CAST(gap_s >= 1048576 AS BIGINT) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM gaps WHERE gap_s IS NOT NULL GROUP BY 1
    """,
)
def interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per user stream (point-process
    fingerprint: bursts vs idle tails), bucketed on a base-4 log grid.

    The log bucket is computed WITHOUT logs: bucket = sum of
    integer-threshold indicators (gap >= 4^k), because ln() differs
    in the last ulp between libm and the JVM and floor(ln(x)/ln(4))
    can flip at bin edges — the indicator sum is exact on both
    engines. One user_id-partitioned lag + a 10-bucket aggregate.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us")
    ).select(F.expr("gap_us div 1000000").alias("gap_s"))
    bucket = sum(
        (F.col("gap_s") >= 4 ** k).cast("bigint") for k in range(1, 11)
    )
    return (
        gaps.filter(F.col("gap_s").isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------- exact global order stats


@register(
    "global_median_exact",
    extra=True,
    oracle="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, l_orderkey, l_linenumber)
                 AS i
      FROM c
    ),
    n AS (SELECT COUNT(*) AS n FROM c)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*) / 100, 6)
               AS median_price
    FROM ranked
    WHERE i IN ((SELECT (n + 1) // 2 FROM n), (SELECT n // 2 + 1 FROM n))
    """,
)
def global_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median over an unbounded-domain metric
    (l_extendedprice) — the order statistic approx_percentile
    approximates, computed exactly WITHOUT a single-partition sort:
    ``global_row_number`` (functions/ranking.py) ranks the fact in
    value-range buckets (parallel within-bucket windows + driver-
    folded prefix offsets), the two middle positions fall out of the
    bucket counts for free, and only those ≤2 rows survive to the
    final 1-row aggregate. Exact cents end to end; the half-cent
    interpolation for even n is the same two-middle average DuckDB's
    median() uses.

    Scale: one fact shuffle (by value bucket) + one tiny filter — vs
    the naive ORDER BY's all-rows-to-one-task plan.
    """
    from eventstream_notify_spark.functions.ranking import (
        global_row_number,
    )

    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked, n = global_row_number(
        li, "v", ["l_orderkey", "l_linenumber"], out="i"
    )
    mid = ranked.filter(F.col("i").isin((n + 1) // 2, n // 2 + 1))
    return mid.agg(
        F.lit(n).cast("bigint").alias("n_rows"),
        F.round(
            F.sum("v").cast("double") / F.count("*") / 100, 6
        ).alias("median_price"),
    )


@register(
    "sample_reservoir",
    extra=True,
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(round(value * 1000) AS BIGINT) AS value_mv
    FROM events
    ORDER BY md5('smp:' || CAST(event_id AS STRING)), event_id
    LIMIT 500
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-uniform sample (reservoir-sampling semantics
    without reservoir state): rank every row by a keyed hash and keep
    the k smallest — each row's hash is i.i.d.-uniform, so the k
    smallest ARE a uniform k-subset, and the same k rows come back on
    every run/engine (the property seed-based sampling can't give
    cross-engine).

    Scale: ORDER BY hash LIMIT k compiles to TakeOrderedAndProject —
    per-partition top-k heaps + a k-row driver merge; no global sort,
    no state, no second pass (how you sample 500 rows from 100 TB
    with one scan).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.round(F.col("value") * 1000).cast("bigint").alias("value_mv"),
            F.md5(
                F.concat(F.lit("smp:"), F.col("event_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "event_id")
        .limit(500)
        .drop("_h")
    )


# ------------------------------------------------------ spatial join


_GEO_GRID = 10_000  # integer coordinate space side
_GEO_R = 150        # radius in grid units; cell size == R


@register(
    "geo_radius_join",
    extra=True,
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(CAST(('0x' || substring(
                 md5('gx:' || CAST(user_id AS STRING)),
                 1, 15)) AS UBIGINT) % {_GEO_GRID} AS BIGINT) AS x,
             CAST(CAST(('0x' || substring(
                 md5('gy:' || CAST(user_id AS STRING)),
                 1, 15)) AS UBIGINT) % {_GEO_GRID} AS BIGINT) AS y
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
    FROM pts a JOIN pts b
      ON a.user_id < b.user_id
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
         <= {_GEO_R} * {_GEO_R}
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join — find all point pairs within distance
    R — via GRID-CELL BLOCKING (the geohash/S2 pattern): points land
    in cells of side R, so any pair within R sits in the same or an
    adjacent cell; one side explodes into its 3x3 neighborhood and the
    candidate join is a plain EQUI-join on cell id, with the exact
    integer distance² predicate as a post-filter. Each qualifying
    pair is found exactly once (the probe side's cell is unexploded).
    The oracle states the same result as the O(n²) theta join —
    equality proves the blocking loses nothing.

    Coordinates are deterministic md5-derived grid integers (the
    testdata has no geo columns); everything is exact int64 —
    cross-engine float-free.

    Scale: candidate volume = density x 9 cells, independent of total
    point count spread over more cells; the all-pairs product never
    exists. Skewed cells (urban hot spots) get the same salting
    treatment as any hot equi-join key.
    """
    e = table(spark, sf_dir, "events")

    def coord(prefix: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(prefix), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % _GEO_GRID
        )

    pts = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            coord("gx:").alias("x"),
            coord("gy:").alias("y"),
        )
        .withColumn("cx", F.expr(f"x div {_GEO_R}"))
        .withColumn("cy", F.expr(f"y div {_GEO_R}"))
    )
    nbr = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("cx") + dx).alias("ncx"),
                    (F.col("cy") + dy).alias("ncy"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probe = pts.select(
        F.col("user_id").alias("user_a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        nbr.alias("n"),
    ).select("user_a", "ax", "ay", "n.ncx", "n.ncy")
    build = pts.select(
        F.col("user_id").alias("user_b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        probe.join(build, ["ncx", "ncy"])
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (d2 <= _GEO_R * _GEO_R)
        )
        .select("user_a", "user_b", d2.cast("bigint").alias("d2"))
    )


# ---------------------------------------------------- z-order layout


_Z_BITS = 16
_Z_FILE_ROWS = 4096


def _interleave_sql(x: str, y: str) -> str:
    """Bit-interleave two {_Z_BITS}-bit ints into a Morton z-value —
    identical integer expression in Spark SQL and DuckDB."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_layout",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_custkey % 65536 AS BIGINT) AS x,
             CAST(epoch_us(o_orderdate) // 86400000000
                  - (SELECT MIN(epoch_us(o_orderdate) // 86400000000)
                     FROM orders) AS BIGINT) AS y
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, x, y,
             {_interleave_sql('x', 'y')} AS zval
      FROM base
    ),
    ranked AS (
      SELECT x, y,
             (ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1)
                 // {_Z_FILE_ROWS} AS file_id
      FROM z
    )
    SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS min_cust, MAX(x) AS max_cust,
           MIN(y) AS min_day, MAX(y) AS max_day
    FROM ranked GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER data layout (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
    interleave the bits of two filter dimensions (customer, order
    day) into a Morton curve value, pack rows into fixed-size files
    in z order, and emit each file's per-dimension min/max — the
    skipping-index stats that make a point/range query on EITHER
    dimension prune most files (a single-column sort clusters one
    dimension perfectly and the other not at all; the z curve trades
    a little of each — THE data-layout lever at 100 TB).

    The global z rank rides `global_row_number` (bucket-partitioned,
    no single-task sort); the interleave is pure integer bit math,
    identical in both engines.
    """
    from eventstream_notify_spark.functions.ranking import (
        global_row_number,
    )

    o = table(spark, sf_dir, "orders")
    d0 = o.agg(
        F.min(
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        )
    ).first()[0]
    base = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("bigint").alias("x"),
        (
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            )
            - int(d0)
        ).cast("bigint").alias("y"),
    ).withColumn("zval", F.expr(_interleave_sql("x", "y")))
    ranked, _n = global_row_number(
        base, "zval", ["o_orderkey"], out="pos"
    )
    return (
        ranked.withColumn(
            "file_id", F.expr(f"(pos - 1) div {_Z_FILE_ROWS}")
        )
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("min_cust"),
            F.max("x").alias("max_cust"),
            F.min("y").alias("min_day"),
            F.max("y").alias("max_day"),
        )
    )


@register(
    "zorder_prune_audit",
    extra=True,
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey,
             CAST(o_custkey % 65536 AS BIGINT) AS x,
             CAST(epoch_us(o_orderdate) // 86400000000
                  - (SELECT MIN(epoch_us(o_orderdate) // 86400000000)
                     FROM orders) AS BIGINT) AS y
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, x, y, {_interleave_sql('x', 'y')} AS zval
      FROM base
    ),
    layouts AS (
      SELECT 'zorder' AS layout, x, y,
             (ROW_NUMBER() OVER (ORDER BY zval, o_orderkey) - 1)
                 // {_Z_FILE_ROWS} AS file_id
      FROM z
      UNION ALL
      SELECT 'linear' AS layout, x, y,
             (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
                 // {_Z_FILE_ROWS} AS file_id
      FROM z
    ),
    stats AS (
      SELECT layout, file_id,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y
      FROM layouts GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT x AS px FROM base WHERE o_orderkey % 293 = 0
    ),
    dprobes AS (
      SELECT DISTINCT y AS py FROM base WHERE o_orderkey % 293 = 0
    )
    SELECT s.layout,
           (SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) FROM stats s2
            WHERE s2.layout = s.layout) AS n_files,
           CAST(SUM(CASE WHEN p.px BETWEEN s.min_x AND s.max_x
                THEN 1 ELSE 0 END) AS BIGINT) AS cust_files_admitted,
           CAST(SUM(CASE WHEN d.py BETWEEN s.min_y AND s.max_y
                THEN 1 ELSE 0 END) AS BIGINT) AS day_files_admitted
    FROM stats s, probes p, dprobes d
    GROUP BY 1
    """,
)
def zorder_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEASUREMENT behind zx_zorder_layout: for a probe set of
    point queries on EACH dimension, count how many files the per-file
    min/max stats admit under the z-order layout vs a linear
    (insertion-order) layout. Z-order should admit far fewer files for
    customer probes (linear clusters neither dimension) while staying
    competitive on day probes — the quantified justification for
    paying the z-order rewrite. Repo discipline: every layout
    mechanism ships with the audit that would justify it in
    production.

    Scale: file-stats tables are rows/{_Z_FILE_ROWS} — thousands of
    rows at 100 TB; probes are a fixed sample; everything after the
    two global ranks is tiny-table arithmetic.
    """
    from eventstream_notify_spark.functions.ranking import (
        global_row_number,
    )

    o = table(spark, sf_dir, "orders")
    d0 = o.agg(
        F.min(
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        )
    ).first()[0]
    base = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("bigint").alias("x"),
        (
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            )
            - int(d0)
        ).cast("bigint").alias("y"),
    ).localCheckpoint(eager=True)
    z = base.withColumn("zval", F.expr(_interleave_sql("x", "y")))

    def stats(df: DataFrame, key: str, layout: str) -> DataFrame:
        ranked, _n = global_row_number(df, key, ["o_orderkey"], out="pos")
        return (
            ranked.withColumn(
                "file_id", F.expr(f"(pos - 1) div {_Z_FILE_ROWS}")
            )
            .groupBy("file_id")
            .agg(
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
            )
            .withColumn("layout", F.lit(layout))
        )

    st = stats(z, "zval", "zorder").unionByName(
        stats(base.withColumn("ok", F.col("o_orderkey")), "ok", "linear")
        .drop("ok")
    )
    probes = F.broadcast(
        base.filter(F.col("o_orderkey") % 293 == 0).select("x").distinct()
        .withColumnRenamed("x", "px")
    )
    dprobes = F.broadcast(
        base.filter(F.col("o_orderkey") % 293 == 0).select("y").distinct()
        .withColumnRenamed("y", "py")
    )
    n_files = st.groupBy("layout").agg(
        F.countDistinct("file_id").alias("n_files")
    )
    joined = st.crossJoin(probes).crossJoin(dprobes)
    agg = joined.groupBy("layout").agg(
        F.sum(
            F.col("px").between(F.col("min_x"), F.col("max_x")).cast("bigint")
        ).alias("cust_files_admitted"),
        F.sum(
            F.col("py").between(F.col("min_y"), F.col("max_y")).cast("bigint")
        ).alias("day_files_admitted"),
    )
    return agg.join(F.broadcast(n_files), "layout").select(
        "layout", "n_files", "cust_files_admitted", "day_files_admitted"
    )


@register(
    "cep_pattern_match",
    extra=True,
    oracle="""
    WITH ch AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               substr(event_type, 1, 1) AS ch
        FROM events
    ),
    seq AS (
        SELECT user_id,
               string_agg(ch, '' ORDER BY ts_us, event_id) AS seq
        FROM ch GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(length(regexp_extract_all(seq, 'eee+'))
                AS BIGINT) AS n_error_burst,
           CAST(length(regexp_extract_all(seq, 's[cev]*p'))
                AS BIGINT) AS n_signup_to_purchase,
           CAST(length(regexp_extract_all(seq, 'e[csv]{0,3}p'))
                AS BIGINT) AS n_quick_recovery
    FROM seq
    """,
)
def cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern detection (the MATCH_RECOGNIZE
    / Flink-CEP shape) over each user's event timeline: encode the
    per-user event-type sequence as a character string (the 5 types
    have distinct initials: c/e/p/s/v), then count non-overlapping
    regex matches of three behavioral patterns — error bursts
    (``eee+``: 3+ consecutive errors, greedy = maximal runs),
    signup-to-purchase journeys (``s[cev]*p``: a signup reaching its
    first purchase with no intervening signup), and quick recoveries
    (``e[csv]{0,3}p``: an error followed by a purchase within 3
    steps). Left-to-right non-overlapping greedy scan semantics are
    identical in Java regex (Spark) and RE2 (DuckDB) for these
    backtracking-free patterns — counts are exact integers.

    Shape: one user_id shuffle builds each ordered sequence
    (array_sort over collected (ts, id, ch) structs — no window, no
    second shuffle), then the regex counting is per-row JVM-side
    codegen. Per-user state is the user's own history — the same
    boundedness contract as sessionize/funnel; a pathological
    mega-user would be capped by splitting timelines at session
    boundaries first. At 100 TB the plan is unchanged: sequences
    build in one exchange and patterns evaluate embarrassingly
    parallel. Reference tie-in: this is the engine-side version of
    the notify rules the reference's dashboard implies (alert when a
    user hits an error streak — auto_kafka_redis.py's event_type
    field is exactly this alphabet's source)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "ch"))
                ),
                lambda s: s.ch,
            ),
            "",
        ).alias("seq")
    )

    def n_matches(pat: str):
        return F.size(
            F.expr(f"regexp_extract_all(seq, '{pat}', 0)")
        ).cast("bigint")

    return seq.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        n_matches("eee+").alias("n_error_burst"),
        n_matches("s[cev]*p").alias("n_signup_to_purchase"),
        n_matches("e[csv]{0,3}p").alias("n_quick_recovery"),
    )


_QTILES = ((50, "p50_mv"), (90, "p90_mv"), (99, "p99_mv"))


@register(
    "quantile_exact_grouped",
    extra=True,
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(round(value * 1000) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, v, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS total
        FROM q
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n,
           MIN(CASE WHEN cum * 100 >= 50 * total THEN v END) AS p50_mv,
           MIN(CASE WHEN cum * 100 >= 90 * total THEN v END) AS p90_mv,
           MIN(CASE WHEN cum * 100 >= 99 * total THEN v END) AS p99_mv
    FROM cum
    GROUP BY event_type
    """,
)
def quantile_exact_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (p50/p90/p99 of the milli-quantized
    value per event_type) without sorting the fact table: aggregate to
    (group, value) counts first — the window then runs over the VALUE
    DOMAIN (≤ ~1e6 quantized values per group, invariant to corpus
    row count), not over rows, and the percentile is the smallest
    value whose cumulative count clears ⌈q·n⌉ (discrete/lower
    quantile, the integer-exact convention; the comparison is the
    cross-multiplied cum*100 >= q*total so no division ever happens).
    This is the exact-percentile companion to zx_agg_percentiles'
    sketched approx_percentile and global_median_exact's single
    global median: grouped, multi-quantile, and domain-windowed.

    Scale: one fact shuffle (the group-by), then all window work on
    the bounded counts table; group partitions keep the window
    parallel across event types and the domain bound keeps each
    partition constant-sized as the corpus grows."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    cnt = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    cum = cnt.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(wt)
    )
    aggs = [F.sum("c").cast("bigint").alias("n")] + [
        F.min(
            F.when(F.col("cum") * 100 >= q * F.col("total"), F.col("v"))
        ).alias(name)
        for q, name in _QTILES
    ]
    return cum.groupBy("event_type").agg(*aggs)


_KMV_K = 256
_KMV_P = 2_147_483_647  # Lehmer modulus; h uniform on [1, P)
_KMV_A = 48_271


@register(
    "join_cardinality_est",
    extra=True,
    oracle=f"""
    WITH a AS (SELECT DISTINCT o_orderkey AS k FROM orders),
    b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    ha AS (SELECT k, (k % {_KMV_P}) * {_KMV_A} % {_KMV_P}
                     * {_KMV_A} % {_KMV_P} * {_KMV_A} % {_KMV_P} AS h
           FROM a),
    hb AS (SELECT k, (k % {_KMV_P}) * {_KMV_A} % {_KMV_P}
                     * {_KMV_A} % {_KMV_P} * {_KMV_A} % {_KMV_P} AS h
           FROM b),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    un AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
           ORDER BY h LIMIT {_KMV_K}),
    theta AS (SELECT MAX(h) AS th, COUNT(*) AS ku FROM un),
    common AS (
        SELECT COUNT(*) AS c
        FROM un WHERE h IN (SELECT h FROM ka)
                  AND h IN (SELECT h FROM kb)
    ),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS inter
        FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
    )
    SELECT CAST((SELECT ku FROM theta) AS BIGINT) AS k_used,
           CAST((SELECT c FROM common) AS BIGINT) AS k_common,
           ROUND(((SELECT ku FROM theta) - 1) * {float(_KMV_P)!r}
                 / (SELECT th FROM theta), 6) AS est_union,
           ROUND((SELECT c FROM common)
                 * (((SELECT ku FROM theta) - 1) * {float(_KMV_P)!r}
                    / (SELECT th FROM theta))
                 / (SELECT ku FROM theta), 6) AS est_intersection,
           (SELECT inter FROM exact) AS exact_intersection
    """,
)
def join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-CARDINALITY ESTIMATION via KMV/theta sketches — the
    planner-side primitive behind join reordering and broadcast
    decisions: estimate |keys(orders) ∩ keys(lineitem)| WITHOUT
    running the join, from two 256-value sketches. Each side keeps
    its K minimum hash values (deterministic Lehmer hash, so both
    engines draw the identical sketch); the union's kth minimum sets
    theta, est_union = (K-1)·P/theta (the KMV estimator), and the
    intersection scales by the sketch-measured Jaccard — the theta-
    sketch set-operation algebra (Dasgupta et al.). The exact
    intersection rides along so the output itself quantifies the
    estimator's error. Everything is deterministic, so even the
    ESTIMATES hash-match the oracle.

    Scale: per-side cost is a distinct + TakeOrdered(K) — partial
    per-partition heaps, K rows to the driver-side merge, never a
    global sort; sketches are mergeable, so per-partition/per-day
    sketches roll up the same way (the same property sliding_dau_hll
    exploits for HLL)."""
    K, P, A = _KMV_K, _KMV_P, _KMV_A

    def kmin(df: DataFrame, col: str) -> DataFrame:
        return (
            df.select(F.col(col).alias("k"))
            .distinct()
            .select(
                (((F.col("k") % P) * A % P) * A % P * A % P).alias("h")
            )
            .orderBy("h")
            .limit(K)
        )

    ka = kmin(table(spark, sf_dir, "orders"), "o_orderkey")
    kb = kmin(table(spark, sf_dir, "lineitem"), "l_orderkey")
    un = ka.union(kb).distinct().orderBy("h").limit(K)
    theta = un.agg(
        F.max("h").alias("th"), F.count("*").alias("ku")
    )
    common = (
        un.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
        .join(
            table(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("k"))
            .distinct(),
            "k",
            "left_semi",
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    est_union = F.round((F.col("ku") - 1) * float(P) / F.col("th"), 6)
    return (
        theta.crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("ku").cast("bigint").alias("k_used"),
            F.col("c").cast("bigint").alias("k_common"),
            est_union.alias("est_union"),
            F.round(
                F.col("c")
                * ((F.col("ku") - 1) * float(P) / F.col("th"))
                / F.col("ku"),
                6,
            ).alias("est_intersection"),
            F.col("inter").alias("exact_intersection"),
        )
    )


_CF_TOPK = 3


@register(
    "recsys_item_cf",
    extra=True,
    oracle=f"""
    WITH ui AS (
        SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS item
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_u FROM ui GROUP BY 1),
    co AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM ui a JOIN ui b
          ON a.cust = b.cust AND a.item <> b.item
        GROUP BY 1, 2
    )
    SELECT item_a, item_b,
           ROUND(n_ab / sqrt(na.n_u * nb.n_u), 6) AS sim,
           rank
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
                   PARTITION BY item_a
                   ORDER BY n_ab / sqrt(
                       (SELECT n_u FROM n WHERE item = co.item_a)
                       * (SELECT n_u FROM n WHERE item = co.item_b)
                   ) DESC, item_b) AS BIGINT) AS rank
        FROM co
    ) r
    JOIN n na ON na.item = r.item_a
    JOIN n nb ON nb.item = r.item_b
    WHERE rank <= {_CF_TOPK}
    """,
)
def recsys_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item COLLABORATIVE FILTERING (the 'customers who bought X
    also bought Y' recommender): cosine similarity between items'
    customer sets — co(a,b)/√(n_a·n_b) over distinct (customer, brand)
    interactions — with the top-3 neighbors per item. The similarity
    normalization is what separates this from zx_assoc_rules' lift:
    cosine discounts blockbuster items symmetrically, the standard
    item-CF scoring (Sarwar et al., WWW'01).

    Shape: interactions dedupe scan-side; the co-occurrence self-join
    shuffles ONCE on the customer key (per-customer fan-out bounded
    by the 25-brand catalog — at real catalog sizes you cap per-user
    history and block by item popularity, declared); item counts ride
    back as broadcasts; top-k per item is a window over a 25x24
    frame. Exact integer counts; one exactly-rounded sqrt/division
    per pair evaluated identically on both engines."""
    ui = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(table(spark, sf_dir, "part")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("item"))
        .distinct()
        # r13 opt (guide §5): three consumers (item counts, both
        # co-occurrence self-join sides) each re-derived the
        # orders⋈lineitem⋈part + distinct — at scale that is three
        # fact-fact shuffle joins; one lazy checkpoint pays it once
        .localCheckpoint(eager=False)
    )
    n = ui.groupBy("item").agg(F.count("*").cast("bigint").alias("n_u"))
    a = ui.select("cust", F.col("item").alias("item_a"))
    b = ui.select("cust", F.col("item").alias("item_b"))
    co = (
        a.join(b, "cust")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
    )
    sim = (
        co.join(
            F.broadcast(n.select(F.col("item").alias("item_a"), F.col("n_u").alias("na"))),
            "item_a",
        )
        .join(
            F.broadcast(n.select(F.col("item").alias("item_b"), F.col("n_u").alias("nb"))),
            "item_b",
        )
        .withColumn("s", F.col("n_ab") / F.sqrt(F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("item_a").orderBy(F.col("s").desc(), "item_b")
    return (
        sim.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _CF_TOPK)
        .select("item_a", "item_b", F.round("s", 6).alias("sim"), "rank")
    )


# ---------------------------------------------- Hilbert vs Morton


_HB_ORDER = 6  # 64 x 64 grid
_HB_N = 1 << _HB_ORDER


def _hilbert_d(x: int, y: int, n: int = _HB_N) -> int:
    """xy -> Hilbert-curve distance (standard bitwise rotate/reflect
    walk, Hamilton's convert_to_d)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:  # rotate
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _morton_d(x: int, y: int) -> int:
    d = 0
    for b in range(_HB_ORDER):
        d |= ((x >> b) & 1) << (2 * b + 1)
        d |= ((y >> b) & 1) << (2 * b)
    return d


def _curve_arrays() -> tuple[list, list]:
    """cell (x*64+y) -> curve rank, for both space-filling curves —
    precomputed once in python and embedded as literal arrays on both
    engines (engine-neutral by construction)."""
    h = [0] * (_HB_N * _HB_N)
    m = [0] * (_HB_N * _HB_N)
    for x in range(_HB_N):
        for y in range(_HB_N):
            h[x * _HB_N + y] = _hilbert_d(x, y)
            m[x * _HB_N + y] = _morton_d(x, y)
    return h, m


def _hilbert_oracle() -> str:
    h, m = _curve_arrays()
    parts = []
    for layout, arr in (("hilbert", h), ("morton", m)):
        lit = "[" + ",".join(str(v) for v in arr) + "]"
        parts.append(f"""
        SELECT '{layout}' AS layout, n_files,
               cust_files_admitted, day_files_admitted
        FROM (
            WITH consts AS (
                SELECT MAX(o_custkey) // {_HB_N} + 1 AS cdiv,
                       (MAX(epoch_us(o_orderdate) // 86400000000)
                        - MIN(epoch_us(o_orderdate) // 86400000000))
                           // {_HB_N} + 1 AS ddiv,
                       MIN(epoch_us(o_orderdate) // 86400000000) AS d0
                FROM orders
            ),
            base AS (
                SELECT o_orderkey,
                       o_custkey // (SELECT cdiv FROM consts) AS x,
                       (epoch_us(o_orderdate) // 86400000000
                        - (SELECT d0 FROM consts))
                           // (SELECT ddiv FROM consts) AS y
                FROM orders
            ),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                    ORDER BY ({lit}::BIGINT[])[x * {_HB_N} + y + 1],
                             o_orderkey) AS pos
                FROM base
            ),
            files AS (
                SELECT (pos - 1) // {_Z_FILE_ROWS} AS file_id,
                       MIN(x) AS min_x, MAX(x) AS max_x,
                       MIN(y) AS min_y, MAX(y) AS max_y
                FROM ranked GROUP BY 1
            ),
            probes AS (SELECT DISTINCT x AS px FROM base
                       WHERE o_orderkey % 293 = 0),
            dprobes AS (SELECT DISTINCT y AS py FROM base
                        WHERE o_orderkey % 293 = 0)
            SELECT CAST(COUNT(DISTINCT f.file_id) AS BIGINT) AS n_files,
                   CAST((SELECT COUNT(*) FROM files f2, probes p
                         WHERE p.px BETWEEN f2.min_x AND f2.max_x)
                       AS BIGINT) AS cust_files_admitted,
                   CAST((SELECT COUNT(*) FROM files f2, dprobes p
                         WHERE p.py BETWEEN f2.min_y AND f2.max_y)
                       AS BIGINT) AS day_files_admitted
            FROM files f
        )""")
    return " UNION ALL ".join(parts)


@register("hilbert_layout_audit", extra=True, oracle=_hilbert_oracle())
def hilbert_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT vs MORTON clustering — the layout debate behind
    Databricks liquid clustering replacing ZORDER: both space-filling
    curves interleave two filter dimensions, but Hilbert preserves
    locality strictly better (every curve step is distance 1; Morton
    takes long diagonal jumps at power-of-two boundaries), so
    Hilbert-packed files have tighter per-dimension min/max envelopes
    and probes admit fewer files. This operator lays the SAME orders
    table out both ways on a shared 64x64 (customer, order-day) grid
    — curve ranks precomputed in python and embedded as 4096-entry
    literal arrays on both engines, so the entire study is
    engine-neutral integer math — and emits each layout's file count
    and probe-admission counts, the direct head-to-head measurement.

    Scale: ranking rides global_row_number (bucket-partitioned, no
    single-task sort); file-stats frames are rows/4096; the curve
    lookup is an element_at against a broadcast-literal array inside
    codegen."""
    from eventstream_notify_spark.functions.ranking import (
        global_row_number,
    )

    h, m = _curve_arrays()
    o = table(spark, sf_dir, "orders")
    consts = o.agg(
        (F.max("o_custkey") / _HB_N).cast("bigint") + 1,
        (
            (
                F.max(F.expr(
                    "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                    " div 86400000000"
                ))
                - F.min(F.expr(
                    "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                    " div 86400000000"
                ))
            )
            / _HB_N
        ).cast("bigint") + 1,
        F.min(F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        )),
    ).first()
    cdiv, ddiv, d0 = int(consts[0]), int(consts[1]), int(consts[2])
    base = o.select(
        "o_orderkey",
        (F.col("o_custkey") / cdiv).cast("bigint").alias("x"),
        (
            (
                F.expr(
                    "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                    " div 86400000000"
                )
                - d0
            )
            / ddiv
        ).cast("bigint").alias("y"),
    )
    # curve ranks as a 4096-row broadcast dim, NOT a 4096-child
    # literal-array expression: CreateArray with 4096 children made
    # every re-analysis of the plan (global_row_number runs several)
    # take seconds — the join is a constant-time hash probe and keeps
    # the plan tree small (measured: 26 s -> ~3 s build)
    cells = spark.createDataFrame(
        [(i, h[i], m[i]) for i in range(_HB_N * _HB_N)],
        "cell int, hrank bigint, mrank bigint",
    )
    # r13 opt (guide §5): the two global_row_number calls below each
    # run TWO driver actions (min/max + bucket counts), and the probe
    # frames add two more — every one re-derived this scan+join chain.
    # One lazy checkpoint materializes it on the first action; the
    # remaining ~7 consumers read the RDD.
    basec = (
        base.withColumn(
            "cell", (F.col("x") * _HB_N + F.col("y")).cast("int")
        )
        .join(F.broadcast(cells), "cell")
        .localCheckpoint(eager=False)
    )
    # probe sets are layout-independent — build ONCE, not per layout
    probes = F.broadcast(
        basec.filter(F.col("o_orderkey") % 293 == 0)
        .select(F.col("x").alias("px"))
        .distinct()
    )
    dprobes = F.broadcast(
        basec.filter(F.col("o_orderkey") % 293 == 0)
        .select(F.col("y").alias("py"))
        .distinct()
    )
    outs = []
    for layout, rank_col in (("hilbert", "hrank"), ("morton", "mrank")):
        ranked, _n = global_row_number(
            basec.withColumn("cv", F.col(rank_col)),
            "cv",
            ["o_orderkey"],
            out="pos",
        )
        # three consumers (file count + two probe-admission folds) —
        # checkpoint the rows/4096-sized stats frame so the global
        # sort behind it runs once per layout, not three times
        files = (
            ranked.withColumn(
                "file_id", F.expr(f"(pos - 1) div {_Z_FILE_ROWS}")
            )
            .groupBy("file_id")
            .agg(
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
            )
            .localCheckpoint(eager=False)
        )
        nf = files.agg(
            F.countDistinct("file_id").cast("bigint").alias("n_files")
        )
        cadm = files.crossJoin(probes).agg(
            F.sum(
                F.col("px").between(F.col("min_x"), F.col("max_x"))
                .cast("bigint")
            ).alias("cust_files_admitted")
        )
        dadm = files.crossJoin(dprobes).agg(
            F.sum(
                F.col("py").between(F.col("min_y"), F.col("max_y"))
                .cast("bigint")
            ).alias("day_files_admitted")
        )
        outs.append(
            nf.crossJoin(F.broadcast(cadm))
            .crossJoin(F.broadcast(dadm))
            .select(
                F.lit(layout).alias("layout"),
                "n_files",
                "cust_files_admitted",
                "day_files_admitted",
            )
        )
    return outs[0].unionByName(outs[1])


# ---------------------------------------------- Markov attribution


def markov_removal_effects(trans: dict) -> dict:
    """Driver-side absorption math on the BOUNDED state graph (states
    = channels + START/CONV/NULL, never more than a handful):
    conversion probability from START via iterative absorption, then
    the removal effect of each channel — recompute with the channel's
    outgoing mass redirected to NULL, the drop in conversion is the
    channel's causal credit (Anderl et al. 2014, the 'Markov chain
    attribution' standard). Pure python on a <=7x7 dict matrix.

    Every float reduction iterates states in SORTED order (dict
    insertion order would depend on the nondeterministic collect()
    order of the transition counts) — defined order is what lets the
    DuckDB oracle replay the absorption fixpoint bit-for-bit."""
    states = sorted({s for s, _ in trans} | {d for _, d in trans})
    channels = [s for s in states if s not in ("START", "CONV", "NULL")]

    def conv_prob(removed: str | None) -> float:
        # row-stochastic transition probs, with `removed`'s outgoing
        # edges dropped and incoming edges redirected to NULL
        probs: dict = {}
        for (s, d), n in trans.items():
            if s == removed:
                continue
            d2 = "NULL" if d == removed else d
            probs.setdefault(s, {})
            probs[s][d2] = probs[s].get(d2, 0) + n
        for s, outs in probs.items():
            tot = sum(outs.values())  # int — order-free
            probs[s] = {d: n / tot for d, n in outs.items()}
        # iterate absorption: p[s] = P(absorb at CONV | at s)
        p = {s: 0.0 for s in probs}
        p["CONV"], p["NULL"] = 1.0, 0.0
        for _ in range(200):
            nxt = dict(p)
            for s in sorted(probs):
                outs = probs[s]
                nxt[s] = sum(
                    outs[d] * p.get(d, 1.0 if d == "CONV" else 0.0)
                    for d in sorted(outs)
                )
            if max(abs(nxt[s] - p[s]) for s in p) < 1e-12:
                p = nxt
                break
            p = nxt
        return p.get("START", 0.0)

    base = conv_prob(None)
    rem = {
        c: (base - conv_prob(c)) / base if base > 0 else 0.0
        for c in channels
    }
    tot = sum(rem[c] for c in channels)  # sorted-order float fold
    return {
        c: (rem[c], rem[c] / tot if tot > 0 else 0.0, base)
        for c in channels
    }


# The Markov absorption fixpoint replayed in DuckDB: the same journey
# SQL builds the transition counts, then ONE recursive CTE runs every
# removal experiment in parallel rows (channels + '__BASE__'), each
# carrying its redirected row-stochastic matrix in the recursion
# state. All literals CAST to DOUBLE (a bare 1.0 is DECIMAL and the
# UNION ALL would quantize the probability vector every iteration);
# list_reduce is a left fold over states in sorted order, matching
# the kernel's sorted-iteration discipline.
MARKOV_ORACLE = f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    sess AS (
      SELECT *, SUM(new_sess) OVER (
          PARTITION BY user_id ORDER BY ts_us, event_id) AS sess_id
      FROM (SELECT *, CASE WHEN prev_ts IS NULL
                                OR ts_us - prev_ts > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END AS new_sess
            FROM (SELECT *, LAG(ts_us) OVER (
                      PARTITION BY user_id ORDER BY ts_us, event_id
                  ) AS prev_ts FROM ev))
    ),
    jour AS (
      SELECT *, CASE WHEN event_type = 'purchase' THEN 'CONV'
                     ELSE event_type END AS state
      FROM (SELECT *, SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id, sess_id
                      ORDER BY ts_us, event_id) AS purch_seen
            FROM sess)
      WHERE purch_seen = 0
         OR (purch_seen = 1 AND event_type = 'purchase')
    ),
    tr AS (
      SELECT COALESCE(LAG(state) OVER (
                 PARTITION BY user_id, sess_id
                 ORDER BY ts_us, event_id), 'START') AS src,
             state AS dst
      FROM jour
      UNION ALL
      SELECT s, 'NULL' FROM (
        SELECT (list(state ORDER BY ts_us, event_id))[-1] AS s,
               MAX(CASE WHEN state = 'CONV' THEN 1 ELSE 0 END) AS conv
        FROM jour GROUP BY user_id, sess_id
      ) WHERE conv = 0
    ),
    counts AS MATERIALIZED (
      SELECT src, dst, COUNT(*) AS n FROM tr GROUP BY 1, 2
    ),
    states AS (
      SELECT list_sort(list(DISTINCT x)) AS s FROM
        (SELECT src AS x FROM counts UNION SELECT dst FROM counts)
    ),
    sidx AS (
      SELECT UNNEST(s) AS name, UNNEST(range(1, len(s) + 1)) AS i
      FROM states
    ),
    removes AS (
      SELECT name AS removed FROM sidx
      WHERE name NOT IN ('START', 'CONV', 'NULL')
      UNION ALL SELECT '__BASE__'
    ),
    redir AS (
      SELECT r.removed, c.src,
             CASE WHEN c.dst = r.removed THEN 'NULL' ELSE c.dst END
                 AS dst,
             SUM(c.n) AS n
      FROM counts c CROSS JOIN removes r
      WHERE c.src != r.removed
      GROUP BY 1, 2, 3
    ),
    rowtot AS (
      SELECT removed, src, SUM(n) AS tot FROM redir GROUP BY 1, 2
    ),
    probs AS (
      SELECT rd.removed, rd.src, rd.dst,
             CAST(rd.n AS DOUBLE) / CAST(rt.tot AS DOUBLE) AS pr
      FROM redir rd
      JOIN rowtot rt ON rd.removed = rt.removed AND rd.src = rt.src
    ),
    mrows AS (
      SELECT g.removed, si.i AS i,
             list(COALESCE(p.pr, CAST(0.0 AS DOUBLE))
                  ORDER BY sj.i) AS row,
             MAX(CASE WHEN rt.src IS NOT NULL THEN 1 ELSE 0 END)
                 AS is_src
      FROM removes g
      CROSS JOIN sidx si
      CROSS JOIN sidx sj
      LEFT JOIN probs p ON p.removed = g.removed
                       AND p.src = si.name AND p.dst = sj.name
      LEFT JOIN rowtot rt ON rt.removed = g.removed
                         AND rt.src = si.name
      GROUP BY 1, 2
    ),
    mats AS (
      SELECT removed,
             list(row ORDER BY i) AS M,
             list(is_src ORDER BY i) AS mask,
             len(list(row)) AS ns
      FROM mrows GROUP BY removed
    ),
    itM AS (
      SELECT m.removed, m.M, m.mask, m.ns, 0 AS it,
             list_transform(st.s,
                 x -> CASE WHEN x = 'CONV' THEN CAST(1.0 AS DOUBLE)
                           ELSE CAST(0.0 AS DOUBLE) END) AS p,
             FALSE AS done
      FROM mats m, states st
      UNION ALL
      SELECT removed, M, mask, ns, it + 1,
             t.nxt,
             list_max(list_transform(range(1, ns + 1),
                      i -> abs(t.nxt[i] - itM.p[i]))) < 1e-12
      FROM itM,
           LATERAL (SELECT list_transform(range(1, itM.ns + 1),
                      i -> CASE WHEN itM.mask[i] = 1
                           THEN list_reduce(
                                  list_transform(range(1, itM.ns + 1),
                                    j -> itM.M[i][j] * itM.p[j]),
                                  (a, b) -> a + b)
                           ELSE itM.p[i] END) AS nxt) t
      WHERE it < 200 AND NOT done
    ),
    finals AS (
      SELECT removed,
             p[(SELECT i FROM sidx WHERE name = 'START')] AS cv
      FROM (SELECT removed, p, ROW_NUMBER() OVER (
                PARTITION BY removed ORDER BY it DESC) AS rn
            FROM itM)
      WHERE rn = 1
    ),
    base AS (SELECT cv AS b FROM finals WHERE removed = '__BASE__'),
    eff AS (
      SELECT f.removed AS channel,
             CASE WHEN base.b > 0 THEN (base.b - f.cv) / base.b
                  ELSE CAST(0.0 AS DOUBLE) END AS rem,
             base.b AS b
      FROM finals f, base WHERE f.removed != '__BASE__'
    ),
    tot AS (
      SELECT list_reduce(list(rem ORDER BY channel),
                         (a, b) -> a + b) AS t
      FROM eff
    )
    SELECT e.channel,
           ROUND(e.rem, 6) AS removal_effect,
           CASE WHEN tot.t > 0 THEN ROUND(e.rem / tot.t, 6)
                ELSE CAST(0.0 AS DOUBLE) END AS attribution_share,
           ROUND(e.b, 6) AS base_cvr
    FROM eff e, tot
    """


@register("attribution_markov", extra=True, oracle=MARKOV_ORACLE)
def attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TOUCH ATTRIBUTION by Markov-chain removal effects — the
    data-driven answer to zx_attribution_last_touch's heuristic:
    sessionize each user's timeline (30-min gap), read each session
    as a START → touchpoints → CONV/NULL journey (truncated at the
    first purchase), count state transitions DISTRIBUTED (one
    user-key shuffle + one tiny hash-agg), then compute each
    channel's removal effect on the absorbed conversion probability
    driver-side — the state space is the CHANNEL ALPHABET (bounded,
    ~7 states), the canonical distributed-count / driver-solve split.
    Emits (channel, removal_effect, attribution_share, base_cvr).

    Oracle-paired (was rows-only): the kernel's sorted-order float
    folds make the absorption fixpoint replayable — one DuckDB
    recursive CTE runs all removal experiments as parallel rows, each
    carrying its redirected transition matrix in the recursion state.
    The math is additionally pinned by a hand-computable constructed-
    corpus unit test (a corpus where one channel provably carries all
    conversions must attribute 1.0 removal to it)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (F.col("ts_us") - F.col("prev_ts") > SESSION_GAP_US)
            ).cast("int"),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sw = Window.partitionBy("user_id", "sess_id").orderBy(
        "ts_us", "event_id"
    )
    # truncate each session at its first purchase (events after the
    # conversion belong to no journey)
    jour = (
        sess.withColumn(
            "purch_seen",
            F.sum((F.col("event_type") == "purchase").cast("int")).over(
                sw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(
            (F.col("purch_seen") == 0)
            | (
                (F.col("purch_seen") == 1)
                & (F.col("event_type") == "purchase")
            )
        )
        .withColumn(
            "state",
            F.when(F.col("event_type") == "purchase", F.lit("CONV"))
            .otherwise(F.col("event_type")),
        )
    )
    trans_df = (
        jour.withColumn("src", F.lag("state").over(sw))
        .withColumn("src", F.coalesce("src", F.lit("START")))
        .select(F.col("src"), F.col("state").alias("dst"))
    )
    # journeys with no conversion also emit last-touch -> NULL
    last = (
        jour.groupBy("user_id", "sess_id")
        .agg(
            F.max_by("state", F.struct("ts_us", "event_id")).alias("src"),
            F.max((F.col("state") == "CONV").cast("int")).alias("conv"),
        )
        .filter(F.col("conv") == 0)
        .select("src", F.lit("NULL").alias("dst"))
    )
    counts = (
        trans_df.unionByName(last)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    trans = {(r.src, r.dst): int(r.n) for r in counts}
    eff = markov_removal_effects(trans)
    rows = [
        (c, round(v[0], 6), round(v[1], 6), round(v[2], 6))
        for c, v in sorted(eff.items())
    ]
    return spark.createDataFrame(
        rows,
        "channel string, removal_effect double, "
        "attribution_share double, base_cvr double",
    )


def _mi_block(xcol_sql: str, label_sql: str, feat_name: str) -> str:
    return f"""
    SELECT '{feat_name}' AS feature,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((n / tot) * LN((n * tot) / (nx * ny))), 6)
               AS mi_nats,
           ROUND(SUM((n - nx * ny / tot)
                     * (n - nx * ny / tot) / (nx * ny / tot)), 6)
               AS chi2
    FROM (
        SELECT x, y, CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(COUNT(*)) OVER (PARTITION BY x) AS nx,
               SUM(COUNT(*)) OVER (PARTITION BY y) AS ny,
               SUM(COUNT(*)) OVER () AS tot
        FROM (SELECT {xcol_sql} AS x, {label_sql} AS y FROM events)
        GROUP BY x, y
    )
    """


@register(
    "feature_mutual_info",
    extra=True,
    oracle=(
        _mi_block(
            "CAST(round(value * 1000) AS BIGINT) * 5"
            " // ((SELECT MAX(CAST(round(value * 1000) AS BIGINT))"
            "      FROM events) + 1)",
            "event_type",
            "value_quintile",
        )
        + " UNION ALL "
        + _mi_block("dayofweek(ts) + 1", "event_type", "day_of_week")
    ),
)
def feature_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE RELEVANCE audit — mutual information and chi-square
    between candidate features and the event-type label (the filter
    step of feature selection for a training pipeline: near-zero MI
    features carry no signal and should not burn model capacity).
    Computed for two features (value quintile, day of week) from ONE
    contingency-table shape: (x, y) counts plus windowed marginals
    over the CELL table (bounded by the feature x label domain, never
    by corpus size), then MI = Σ p·ln(p/(px·py)) and the chi-square
    statistic with exactly the same expression on both engines
    (integer counts in; the only floats are the final ln/divisions,
    6-d.p.-rounded — the PMI precedent).

    Shape: one fact shuffle per feature to (x, y) counts; marginals
    are windows over the tiny cell table; the chi2/MI fold is a
    single-row agg per feature."""
    ev = table(spark, sf_dir, "events")
    maxv = int(
        ev.agg(
            F.max(F.round(F.col("value") * 1000).cast("bigint"))
        ).first()[0]
    )
    feats = {
        "value_quintile": F.expr(
            f"(cast(round(value * 1000) as bigint) * 5) div {maxv + 1}"
        ),
        "day_of_week": F.dayofweek("ts").cast("bigint"),
    }
    outs = []
    for name, xcol in feats.items():
        cells = (
            ev.select(xcol.alias("x"), F.col("event_type").alias("y"))
            .groupBy("x", "y")
            .agg(F.count("*").cast("double").alias("n"))
        )
        wx = Window.partitionBy("x")
        wy = Window.partitionBy("y")
        wt = Window.partitionBy()
        c = (
            cells.withColumn("nx", F.sum("n").over(wx))
            .withColumn("ny", F.sum("n").over(wy))
            .withColumn("tot", F.sum("n").over(wt))
        )
        exp = F.col("nx") * F.col("ny") / F.col("tot")
        outs.append(
            c.agg(
                F.sum("n").cast("bigint").alias("n"),
                F.count("*").cast("bigint").alias("n_cells"),
                F.round(
                    F.sum(
                        (F.col("n") / F.col("tot"))
                        * F.log(
                            F.col("n") * F.col("tot")
                            / (F.col("nx") * F.col("ny"))
                        )
                    ),
                    6,
                ).alias("mi_nats"),
                F.round(
                    F.sum(
                        (F.col("n") - exp) * (F.col("n") - exp) / exp
                    ),
                    6,
                ).alias("chi2"),
            ).select(
                F.lit(name).alias("feature"), "n", "n_cells", "mi_nats", "chi2"
            )
        )
    return outs[0].unionByName(outs[1])


# ---------------------------------------------- decision tree


_DT_CANDS = (
    [("user_bucket", v) for v in range(7)]
    + [("dow", v) for v in range(1, 7)]
    + [("vq", v) for v in range(4)]
)


def _dt_best_split(cells: list) -> tuple | None:
    """Argmax-Gini split over the candidate grid, on exact integer
    cell counts; score = sum_branch (pos^2+neg^2)/n_branch (maximize
    == minimize weighted Gini), doubles only in the two divisions,
    ties broken (score desc, feature, value) — the same rule the SQL
    oracle evaluates."""
    best = None
    for feat, v in _DT_CANDS:
        pl = nl = pr = nr = 0
        for b, d, q, y, n in cells:
            x = {"user_bucket": b, "dow": d, "vq": q}[feat]
            if x <= v:
                pl, nl = pl + y * n, nl + (1 - y) * n
            else:
                pr, nr = pr + y * n, nr + (1 - y) * n
        tl, tr = pl + nl, pr + nr
        if tl == 0 or tr == 0:
            continue
        score = (pl * pl + nl * nl) / float(tl) + (
            pr * pr + nr * nr
        ) / float(tr)
        key = (-score, feat, v)
        if best is None or key < best[0]:
            best = (key, feat, v)
    return (best[1], best[2]) if best else None


_DT_ORACLE = """
    WITH cells AS (
        SELECT user_id % 8 AS b,
               dayofweek(ts) + 1 AS d,
               CAST(round(value * 1000) AS BIGINT) * 5
                   // ((SELECT MAX(CAST(round(value * 1000) AS BIGINT))
                        FROM events) + 1) AS q,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3, 4
    ),
    cand AS (SELECT * FROM (VALUES ('user_bucket', 0), ('user_bucket', 1), ('user_bucket', 2), ('user_bucket', 3), ('user_bucket', 4), ('user_bucket', 5), ('user_bucket', 6), ('dow', 1), ('dow', 2), ('dow', 3), ('dow', 4), ('dow', 5), ('dow', 6), ('vq', 0), ('vq', 1), ('vq', 2), ('vq', 3)) c(feat, v)),
    scored0 AS (
        SELECT feat, v,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN y * n ELSE 0 END) AS pl,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN (1 - y) * n ELSE 0 END) AS nl,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN 0 ELSE y * n END) AS pr,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN 0 ELSE (1 - y) * n END) AS nr
        FROM cells, cand GROUP BY 1, 2
    ),
    root AS (
        SELECT feat, v,
               (pl * pl + nl * nl) / CAST(pl + nl AS DOUBLE)
               + (pr * pr + nr * nr) / CAST(pr + nr AS DOUBLE) AS score
        FROM scored0 WHERE pl + nl > 0 AND pr + nr > 0
        ORDER BY score DESC, feat, v LIMIT 1
    ),
    cells1 AS (
        SELECT cells.*,
               CASE WHEN (CASE (SELECT feat FROM root)
                          WHEN 'user_bucket' THEN b <= (SELECT v FROM root)
                          WHEN 'dow' THEN d <= (SELECT v FROM root)
                          ELSE q <= (SELECT v FROM root) END)
                    THEN 1 ELSE 2 END AS node
        FROM cells
    ),
    scored1 AS (
        SELECT node, feat, v,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN y * n ELSE 0 END) AS pl,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN (1 - y) * n ELSE 0 END) AS nl,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN 0 ELSE y * n END) AS pr,
               SUM(CASE WHEN (CASE feat WHEN 'user_bucket' THEN b <= v
                              WHEN 'dow' THEN d <= v ELSE q <= v END)
                        THEN 0 ELSE (1 - y) * n END) AS nr
        FROM cells1, cand GROUP BY 1, 2, 3
    ),
    best1 AS (
        SELECT node, feat, v FROM (
            SELECT node, feat, v,
                   (pl * pl + nl * nl) / CAST(pl + nl AS DOUBLE)
                   + (pr * pr + nr * nr) / CAST(pr + nr AS DOUBLE)
                       AS score
            FROM scored1 WHERE pl + nl > 0 AND pr + nr > 0
        )
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY node ORDER BY score DESC, feat, v) = 1
    ),
    cells2 AS (
        SELECT c1.*,
               2 * c1.node + 1
               + CASE WHEN (CASE b1.feat
                            WHEN 'user_bucket' THEN c1.b <= b1.v
                            WHEN 'dow' THEN c1.d <= b1.v
                            ELSE c1.q <= b1.v END)
                      THEN 0 ELSE 1 END AS leaf
        FROM cells1 c1 JOIN best1 b1 ON b1.node = c1.node
    ),
    nodes AS (
        SELECT 0 AS node_id,
               (SELECT feat FROM root) AS split_feature,
               CAST((SELECT v FROM root) AS BIGINT) AS split_value,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(y * n) AS BIGINT) AS n_pos
        FROM cells
        UNION ALL
        SELECT c1.node, b1.feat, CAST(b1.v AS BIGINT),
               CAST(SUM(c1.n) AS BIGINT), CAST(SUM(c1.y * c1.n) AS BIGINT)
        FROM cells1 c1 JOIN best1 b1 ON b1.node = c1.node
        GROUP BY 1, 2, 3
        UNION ALL
        SELECT leaf, NULL, NULL, CAST(SUM(n) AS BIGINT),
               CAST(SUM(y * n) AS BIGINT)
        FROM cells2 GROUP BY 1
    )
    SELECT CAST(node_id AS INTEGER) AS node_id, split_feature,
           split_value, n, n_pos,
           ROUND(n_pos / CAST(n AS DOUBLE), 6) AS rate
    FROM nodes
    """


@register("decision_tree_gini", extra=True, oracle=_DT_ORACLE)
def decision_tree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-VERIFIED ML TRAINING — a depth-2 Gini decision tree
    predicting 'is this event a purchase?' from three small-domain
    features (user bucket, day of week, value quintile), where the
    ENTIRE training computation is deterministic integer/IEEE math,
    so DuckDB re-derives the SAME TREE (splits, counts, leaf rates)
    declaratively and the hash match verifies the trainer itself —
    split scoring, argmax selection, tie-breaks, recursion — not just
    its outputs. (logreg/BPE are pinned by python references; this
    one is pinned by the independent SQL engine.)

    Shape: the fact table collapses ONCE to feature-cell counts
    (domain-bounded: 8x7x5x2 = 560 cells max, invariant to corpus
    size — the classic 'histogram' trick every distributed tree
    learner from XGBoost to LightGBM uses); split search runs on the
    cells driver-side (bounded fold, same discipline as the
    bucket-offset patterns). Emits the 7-node tree (root, 2 internal,
    4 leaves) with per-node counts and purchase rates."""
    ev = table(spark, sf_dir, "events")
    maxv = int(
        ev.agg(
            F.max(F.round(F.col("value") * 1000).cast("bigint"))
        ).first()[0]
    )
    cells_df = (
        ev.select(
            (F.col("user_id") % 8).cast("bigint").alias("b"),
            F.dayofweek("ts").cast("bigint").alias("d"),
            F.expr(
                f"(cast(round(value * 1000) as bigint) * 5)"
                f" div {maxv + 1}"
            ).alias("q"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .groupBy("b", "d", "q", "y")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    cells = [
        (int(r.b), int(r.d), int(r.q), int(r.y), int(r.n))
        for r in cells_df.collect()
    ]

    def stats(cs):
        n = sum(c[4] for c in cs)
        pos = sum(c[4] for c in cs if c[3] == 1)
        return n, pos

    def goes_left(c, feat, v):
        return {"user_bucket": c[0], "dow": c[1], "vq": c[2]}[feat] <= v

    rows = []
    n0, p0 = stats(cells)
    root = _dt_best_split(cells)
    # the oracle's node-0 row always exists (scalar subquery over the
    # root CTE -> NULL split when no candidate splits the corpus)
    rows.append(
        (0, root[0] if root else None, root[1] if root else None, n0, p0)
    )
    branches = {
        1: [c for c in cells if root and goes_left(c, *root)],
        2: [c for c in cells if root and not goes_left(c, *root)],
    }
    for node in (1, 2):
        cs = branches[node]
        n, p = stats(cs)
        sp = _dt_best_split(cs)
        if sp is None:
            # no valid split (degenerate/pure branch): the oracle's
            # inner join on best1 emits neither the node row nor its
            # leaves — mirror that exactly instead of inventing a
            # pass-through leaf + empty sibling the SQL side drops
            continue
        rows.append((node, sp[0], sp[1], n, p))
        for off, keep in ((0, True), (1, False)):
            leaf = [c for c in cs if goes_left(c, *sp) == keep]
            ln, lp = stats(leaf)
            rows.append((2 * node + 1 + off, None, None, ln, lp))
    return spark.createDataFrame(
        rows,
        "node_id int, split_feature string, split_value bigint, "
        "n bigint, n_pos bigint",
    ).withColumn(
        "rate",
        F.round(F.col("n_pos") / F.col("n").cast("double"), 6),
    )


# ---------------------------------------------- AdaBoost on cells


_ADA_ROUNDS = 3
_ADA_SCALE = 1_000_000  # weights & margins quantized to integers


def _ada_left_sql(feat_src: str, pfx: str = "") -> str:
    return (
        f"(CASE {feat_src} WHEN 'user_bucket' THEN {pfx}b <= {feat_src.replace('feat', 'v')}"
        f" WHEN 'dow' THEN {pfx}d <= {feat_src.replace('feat', 'v')}"
        f" ELSE {pfx}q <= {feat_src.replace('feat', 'v')} END)"
    )


def _ada_oracle() -> str:
    cand_values = ", ".join(
        f"('{f}', {v}, {p})"
        for f, v in _DT_CANDS
        for p in (-1, 1)
    )
    sql = f"""
    WITH cells AS MATERIALIZED (
        SELECT user_id % 8 AS b,
               dayofweek(ts) + 1 AS d,
               CAST(round(value * 1000) AS BIGINT) * 5
                   // ((SELECT MAX(CAST(round(value * 1000) AS BIGINT))
                        FROM events) + 1) AS q,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS z,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2, 3, 4
    ),
    cand AS MATERIALIZED (SELECT * FROM (VALUES {cand_values}) c(feat, v, pol)),
    w1 AS MATERIALIZED (SELECT b, d, q, z, n, n * {_ADA_SCALE} AS w,
                  CAST(0 AS BIGINT) AS m
           FROM cells)"""
    left_c = (
        "(CASE feat WHEN 'user_bucket' THEN b <= v"
        " WHEN 'dow' THEN d <= v ELSE q <= v END)"
    )

    def left_b(t: int) -> str:
        return (
            f"(CASE (SELECT feat FROM b{t}) WHEN 'user_bucket'"
            f" THEN b <= (SELECT v FROM b{t})"
            f" WHEN 'dow' THEN d <= (SELECT v FROM b{t})"
            f" ELSE q <= (SELECT v FROM b{t}) END)"
        )

    for t in range(1, _ADA_ROUNDS + 1):
        sql += f""",
    s{t} AS MATERIALIZED (
        SELECT feat, v, pol,
               SUM(CASE WHEN pol * (CASE WHEN {left_c} THEN 1 ELSE -1 END)
                        <> z THEN w ELSE 0 END) AS werr,
               SUM(w) AS wtot
        FROM w{t}, cand GROUP BY 1, 2, 3
    ),
    b{t} AS MATERIALIZED (
        SELECT feat, v, pol,
               werr / CAST(wtot AS DOUBLE) AS eps,
               0.5 * LN((wtot - werr) / CAST(werr AS DOUBLE)) AS alpha
        FROM s{t}
        ORDER BY werr / CAST(wtot AS DOUBLE), feat, v, pol LIMIT 1
    ),
    w{t + 1} AS MATERIALIZED (
        SELECT b, d, q, z, n,
               CAST(FLOOR(w * EXP(-(SELECT alpha FROM b{t}) * z
                    * (SELECT pol FROM b{t})
                    * (CASE WHEN {left_b(t)} THEN 1 ELSE -1 END)) + 0.5)
                    AS BIGINT) AS w,
               m + CAST(FLOOR((SELECT alpha FROM b{t}) * {_ADA_SCALE} + 0.5)
                        AS BIGINT)
                   * (SELECT pol FROM b{t})
                   * (CASE WHEN {left_b(t)} THEN 1 ELSE -1 END) AS m
        FROM w{t}
    ),
    acc{t} AS MATERIALIZED (
        SELECT SUM(CASE WHEN (CASE WHEN m > 0 THEN 1 ELSE -1 END) = z
                        THEN n ELSE 0 END)
               / CAST(SUM(n) AS DOUBLE) AS a
        FROM w{t + 1}
    )"""
    rows = " UNION ALL ".join(
        f"""
    SELECT {t} AS round,
           (SELECT feat FROM b{t}) AS split_feature,
           CAST((SELECT v FROM b{t}) AS BIGINT) AS split_value,
           CAST((SELECT pol FROM b{t}) AS INTEGER) AS polarity,
           ROUND((SELECT eps FROM b{t}), 6) AS eps,
           ROUND((SELECT alpha FROM b{t}), 6) AS alpha,
           ROUND((SELECT a FROM acc{t}), 6) AS train_acc"""
        for t in range(1, _ADA_ROUNDS + 1)
    )
    return sql + rows


@register("adaboost_stumps", extra=True, oracle=_ada_oracle())
def adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-VERIFIED BOOSTING — AdaBoost with decision stumps over
    the same domain-bounded histogram cells as decision_tree_gini,
    with every source of cross-engine drift engineered out so DuckDB
    re-derives the identical 3-round ensemble (stumps, errors,
    alphas, per-round training accuracy):

    - weights live as INTEGERS (x1e6): weighted-error sums are exact
      integer arithmetic, immune to float-summation order (the thing
      that would otherwise differ between engines);
    - the only floats are eps (one exact-integer division), alpha
      (0.5·ln — both engines call the same system libm: the driver
      side computes in CPython, not the JVM), and the per-cell weight
      update, which re-quantizes through the SAME floor(x+0.5)
      half-away rule on both sides;
    - margins are integer-quantized alphas, so sign decisions and
      accuracies are exact.

    Shape: ONE fact aggregation to <=560 cells (the XGBoost/LightGBM
    histogram trick), then the boosting loop is bounded driver math —
    at any corpus size the distributed cost is one scan + one
    domain-sized hash-agg. Emits (round, stump, polarity, eps, alpha,
    cumulative train accuracy)."""
    import math

    ev = table(spark, sf_dir, "events")
    maxv = int(
        ev.agg(
            F.max(F.round(F.col("value") * 1000).cast("bigint"))
        ).first()[0]
    )
    cells_df = (
        ev.select(
            (F.col("user_id") % 8).cast("bigint").alias("b"),
            F.dayofweek("ts").cast("bigint").alias("d"),
            F.expr(
                f"(cast(round(value * 1000) as bigint) * 5)"
                f" div {maxv + 1}"
            ).alias("q"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(-1))
            .alias("z"),
        )
        .groupBy("b", "d", "q", "z")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    cells = [
        [int(r.b), int(r.d), int(r.q), int(r.z), int(r.n),
         int(r.n) * _ADA_SCALE, 0]
        for r in cells_df.collect()
    ]
    cands = [
        (f, v, p) for f, v in _DT_CANDS for p in (-1, 1)
    ]

    def h(c, feat, v, pol):
        x = {"user_bucket": c[0], "dow": c[1], "vq": c[2]}[feat]
        return pol * (1 if x <= v else -1)

    rows = []
    for t in range(1, _ADA_ROUNDS + 1):
        wtot = sum(c[5] for c in cells)
        best = None
        for feat, v, pol in cands:
            werr = sum(c[5] for c in cells if h(c, feat, v, pol) != c[3])
            eps = werr / float(wtot)
            key = (eps, feat, v, pol)
            if best is None or key < best[0]:
                best = (key, feat, v, pol, werr)
        _, feat, v, pol, werr = best
        if werr == 0 or werr == wtot:
            # a perfect (or perfectly inverted) best stump: alpha is
            # unbounded and the exp-reweighting degenerates — stop
            # with the rounds fitted so far instead of dividing by
            # zero (degenerate-corpus robustness sweep, r10; the
            # full corpora never hit this: eps is strictly interior)
            break
        eps = werr / float(wtot)
        alpha = 0.5 * math.log((wtot - werr) / float(werr))
        alpha_q = int(math.floor(alpha * _ADA_SCALE + 0.5))
        for c in cells:
            hv = h(c, feat, v, pol)
            c[5] = int(math.floor(c[5] * math.exp(-alpha * c[3] * hv) + 0.5))
            c[6] += alpha_q * hv
        n_tot = sum(c[4] for c in cells)
        n_ok = sum(
            c[4] for c in cells if (1 if c[6] > 0 else -1) == c[3]
        )
        rows.append((t, feat, v, pol, eps, alpha, n_ok / float(n_tot)))
    out = spark.createDataFrame(
        rows,
        "round int, split_feature string, split_value bigint, "
        "polarity int, eps double, alpha double, train_acc double",
    )
    return out.select(
        "round",
        "split_feature",
        "split_value",
        "polarity",
        F.round("eps", 6).alias("eps"),
        F.round("alpha", 6).alias("alpha"),
        F.round("train_acc", 6).alias("train_acc"),
    )


@register(
    "funnel_time_to_convert",
    extra=True,
    oracle="""
    WITH first_signup AS (
        SELECT user_id, MIN(epoch_us(ts)) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    first_purchase AS (
        SELECT f.user_id, f.s_us, MIN(epoch_us(e.ts)) AS p_us
        FROM first_signup f
        LEFT JOIN events e
          ON e.user_id = f.user_id
         AND e.event_type = 'purchase'
         AND epoch_us(e.ts) >= f.s_us
        GROUP BY f.user_id, f.s_us
    )
    SELECT s_us // 604800000000 AS cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(COUNT(p_us) AS BIGINT) AS n_converted,
           ROUND(COUNT(p_us) / CAST(COUNT(*) AS DOUBLE), 6) AS conv_rate,
           ROUND(SUM(p_us - s_us) / (COUNT(p_us) * 3600e6), 6)
               AS avg_hours_to_convert
    FROM first_purchase
    GROUP BY 1
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT funnel velocity: for each weekly signup cohort
    (first signup per user), the share of users who ever purchase ON
    OR AFTER that signup and the average hours from signup to first
    qualifying purchase — the 'how fast does the funnel move' metric
    that zx_funnel_conversion's step counts and zx_retention_cohorts'
    return rates both omit. All sums are exact epoch-µs integers; the
    two divisions are the only floats, evaluated in one fixed order.

    Shape: two user-keyed aggregations (first signup; earliest
    qualifying purchase via a conditional min on the SAME user join
    key) then a cohort-week rollup — the fact table shuffles on
    user_id twice and nothing else; at 100 TB both aggregations
    partial-combine map-side and the cohort table is calendar-sized."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    fs = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("s_us"))
    )
    fp = (
        fs.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts_us").alias("pts")
            ),
            "user_id",
            "left",
        )
        .groupBy("user_id", "s_us")
        .agg(
            F.min(
                F.when(F.col("pts") >= F.col("s_us"), F.col("pts"))
            ).alias("p_us")
        )
    )
    return fp.groupBy(
        F.expr("s_us div 604800000000").alias("cohort_week")
    ).agg(
        F.count("*").cast("bigint").alias("n_signups"),
        F.count("p_us").cast("bigint").alias("n_converted"),
        F.round(
            F.count("p_us") / F.count("*").cast("double"), 6
        ).alias("conv_rate"),
        F.round(
            F.sum(F.col("p_us") - F.col("s_us"))
            / (F.count("p_us") * F.lit(3600e6)),
            6,
        ).alias("avg_hours_to_convert"),
    )


# ---------------------------------------------------------------- r7:
# entity resolution + CUPED experimentation

# Fellegi-Sunter-style agreement weights (integer; production would
# estimate them as log m/u likelihood ratios from labeled pairs)
ER_W_BAL_NEAR = 12   # |acctbal delta| < $100
ER_W_BAL_FAR = -3
ER_W_KEY_NEAR = 8    # |custkey delta| < 100 (proxy for name edit distance
ER_W_KEY_FAR = -2    # on the synthetic 'Customer#%09d' names)
ER_W_KBUCKET = 5     # same $1000 balance bucket
ER_W_KBUCKET_NO = -1
ER_MIN_SCORE = 10    # report pairs at or above this evidence level


@register(
    "entity_resolution",
    extra=True,
    oracle=f"""
    WITH c AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ),
    a AS (SELECT * FROM c WHERE c_custkey % 2 = 0),
    b AS (SELECT * FROM c WHERE c_custkey % 2 = 1),
    pairs AS (
        SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
               (CASE WHEN abs(a.bal_cents - b.bal_cents) < 10000
                     THEN {ER_W_BAL_NEAR} ELSE {ER_W_BAL_FAR} END
               + CASE WHEN abs(a.c_custkey - b.c_custkey) < 100
                      THEN {ER_W_KEY_NEAR} ELSE {ER_W_KEY_FAR} END
               + CASE WHEN a.bal_cents // 100000 = b.bal_cents // 100000
                      THEN {ER_W_KBUCKET} ELSE {ER_W_KBUCKET_NO} END)
                   AS score
        FROM a JOIN b ON a.c_nationkey = b.c_nationkey
                     AND a.c_mktsegment = b.c_mktsegment
    )
    SELECT a_key, b_key, CAST(score AS BIGINT) AS score,
           CAST(score >= {ER_W_BAL_NEAR + ER_W_KEY_NEAR} AS INT)
               AS is_match
    FROM pairs WHERE score >= {ER_MIN_SCORE}
    """,
)
def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage, Fellegi-Sunter shape: split customers into two
    'sources' (even/odd keys), generate candidate pairs ONLY inside
    (nation, segment) blocks — the ER analogue of dedup blocking; an
    unblocked linkage is the textbook quadratic blow-up — then score
    each pair by integer agreement weights over field comparisons
    (balance proximity, key proximity as the stand-in for name edit
    distance on the synthetic names, balance bucket) and emit pairs
    above the evidence floor with the match decision. Production
    weights are estimated log m/u ratios (EM over labeled pairs); the
    integer table keeps the whole decision exact cross-engine.

    Scale: the block join is an equi-join on low-cardinality keys —
    salt hot blocks the same way dedup_near's prefix blocking caps
    candidates; scores shuffle as ints, full records never re-join."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    a = c.filter(F.col("c_custkey") % 2 == 0).alias("a")
    b = (
        c.filter(F.col("c_custkey") % 2 == 1)
        .select(
            F.col("c_custkey").alias("b_key"),
            F.col("c_nationkey").alias("b_nat"),
            F.col("c_mktsegment").alias("b_seg"),
            F.col("bal_cents").alias("b_bal"),
        )
    )
    score = (
        F.when(
            F.abs(F.col("bal_cents") - F.col("b_bal")) < 10000,
            F.lit(ER_W_BAL_NEAR),
        ).otherwise(F.lit(ER_W_BAL_FAR))
        + F.when(
            F.abs(F.col("c_custkey") - F.col("b_key")) < 100,
            F.lit(ER_W_KEY_NEAR),
        ).otherwise(F.lit(ER_W_KEY_FAR))
        + F.when(
            F.expr("bal_cents div 100000") == F.expr("b_bal div 100000"),
            F.lit(ER_W_KBUCKET),
        ).otherwise(F.lit(ER_W_KBUCKET_NO))
    )
    return (
        a.join(
            b,
            (F.col("c_nationkey") == F.col("b_nat"))
            & (F.col("c_mktsegment") == F.col("b_seg")),
        )
        .select(
            F.col("c_custkey").alias("a_key"),
            "b_key",
            score.cast("bigint").alias("score"),
        )
        .filter(F.col("score") >= ER_MIN_SCORE)
        .withColumn(
            "is_match",
            (F.col("score") >= ER_W_BAL_NEAR + ER_W_KEY_NEAR).cast("int"),
        )
    )


@register(
    "ab_cuped",
    extra=True,
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
        FROM events
    ),
    per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               CAST(SUM(CASE WHEN epoch_us(ts) < bounds.mid
                   THEN CAST(round(value * 1000) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) >= bounds.mid
                   THEN CAST(round(value * 1000) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
        FROM events CROSS JOIN bounds
        GROUP BY user_id
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user
    )
    SELECT p.arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(p.y) / (1000.0 * COUNT(*)), 6) AS mean_y,
           ROUND(
               (SUM(p.y) * 1.0 / COUNT(*)
                - ((g.n * g.sxy - g.sx * g.sy) * 1.0
                   / (g.n * g.sxx - g.sx * g.sx))
                  * (SUM(p.x) * 1.0 / COUNT(*) - g.sx * 1.0 / g.n))
               / 1000.0, 6) AS mean_y_cuped,
           ROUND((g.n * g.sxy - g.sx * g.sy) * 1.0
                 / (g.n * g.sxx - g.sx * g.sx), 6) AS theta
    FROM per_user p CROSS JOIN g
    GROUP BY p.arm, g.n, g.sx, g.sy, g.sxx, g.sxy
    """,
)
def ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the industry-
    standard experimentation trick: adjust each user's experiment-
    period metric y by their PRE-period covariate x via theta =
    cov(x,y)/var(x), shrinking the variance of the arm means without
    biasing the treatment effect. Arms = user_id parity; periods =
    event-time halves (midpoint in exact integer micros). Every
    moment (n, Σx, Σy, Σxx, Σxy) is an exact integer sum of
    milli-quantized values, so theta and the adjusted means are
    single deterministic float expressions over identical integers —
    cross-engine hash-exact. Shape: one user-keyed aggregation, one
    5-integer global fold broadcast back, one 2-row arm aggregation
    — at 100 TB exactly the two map-side-combinable aggs you want."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("mid")
    )
    mv = F.round(F.col("value") * 1000).cast("bigint")
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            "user_id",
            (F.col("user_id") % 2).cast("int").alias("arm"),
            F.when(F.unix_micros("ts") < F.col("mid"), mv)
            .otherwise(F.lit(0)).alias("xv"),
            F.when(F.unix_micros("ts") >= F.col("mid"), mv)
            .otherwise(F.lit(0)).alias("yv"),
        )
        .groupBy("user_id", "arm")
        .agg(
            F.sum("xv").cast("bigint").alias("x"),
            F.sum("yv").cast("bigint").alias("y"),
        )
    )
    g = F.broadcast(
        per_user.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return (
        per_user.crossJoin(g)
        .groupBy("arm", "n", "sx", "sy", "sxx", "sxy")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("y").alias("ys"),
            F.sum("x").alias("xs"),
        )
        .select(
            "arm",
            "n_users",
            F.round(F.col("ys") / (1000.0 * F.col("n_users")), 6).alias(
                "mean_y"
            ),
            F.round(
                (
                    F.col("ys") * 1.0 / F.col("n_users")
                    - theta
                    * (
                        F.col("xs") * 1.0 / F.col("n_users")
                        - F.col("sx") * 1.0 / F.col("n")
                    )
                )
                / 1000.0,
                6,
            ).alias("mean_y_cuped"),
            F.round(theta, 6).alias("theta"),
        )
    )


# ------------------------------------------------------- survival curve

KM_HORIZON_US = 600 * 1_000_000  # censored if still active in the last 10 min
# ln factors integer-scaled (micro-nats) so the cumulative-hazard sum is
# an exact BIGINT window sum in both engines; one exp at the end.
_KM_DEAD = -999_999_999_999  # sentinel when everyone at risk dies: S -> 0


@register(
    "survival_km",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ),
    durs AS (
        SELECT user_id,
               (MAX(ts_us) - MIN(ts_us)) // 1000000 AS dur,
               CASE WHEN MAX(ts_us) <= (
                        SELECT MAX(ts_us) - {KM_HORIZON_US} FROM ev)
                    THEN 1 ELSE 0 END AS is_event
        FROM ev GROUP BY user_id
    ),
    c_all AS (
        SELECT dur, CAST(COUNT(*) AS BIGINT) AS c FROM durs GROUP BY dur
    ),
    risk AS (
        SELECT dur,
               CAST((SELECT COUNT(*) FROM durs) AS BIGINT)
                   - CAST(COALESCE(SUM(c) OVER (
                         ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS n_risk
        FROM c_all
    ),
    deaths AS (
        SELECT dur AS t_s, CAST(COUNT(*) AS BIGINT) AS d
        FROM durs WHERE is_event = 1 GROUP BY dur
    ),
    pts AS (
        SELECT de.t_s, r.n_risk, de.d,
               CASE WHEN de.d >= r.n_risk THEN {_KM_DEAD}
                    ELSE CAST(ROUND(1000000.0::DOUBLE * LN(
                        CAST(r.n_risk - de.d AS DOUBLE) / r.n_risk))
                        AS BIGINT) END AS f_s
        FROM deaths de JOIN risk r ON de.t_s = r.dur
    )
    SELECT t_s, n_risk, d,
           ROUND(EXP(CAST(SUM(f_s) OVER (
               ORDER BY t_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0::DOUBLE), 6) AS surv
    FROM pts
    """,
)
def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — the
    product-analytics estimator behind every retention curve with
    censoring done right: a user's lifetime is last-event − first-
    event, quantized to whole seconds (second-resolution curves keep
    the distinct-lifetime table domain-bounded — µs resolution would
    make it user-cardinality), and users still active in the stream's
    final 10 minutes are CENSORED (they inform the at-risk counts but
    contribute no death), which a naive retention histogram gets
    wrong.

    Cross-engine exactness: per event-time factors ln((n−d)/n) are
    integer-scaled to micro-nats, the cumulative hazard is an exact
    BIGINT running sum, and exp/ROUND happen once per output row.
    S(t) hits exactly 0 via a sentinel when the last at-risk user
    dies (ln(0) has no integer encoding).

    100 TB shape: one user-keyed aggregate over the fact (the only
    fact shuffle), then everything downstream operates on DISTINCT
    LIFETIMES (bounded by the time horizon, not the user count):
    at-risk counts come from a cumulative window over the per-
    duration count table — no per-user correlated subquery, no
    fact self-join. The curve's row count is |distinct death times|,
    small enough that the single-partition ordered window is the
    domain-bounded case the plan gate allows."""
    ev = _ev(spark, sf_dir)
    durs0 = ev.groupBy("user_id").agg(
        F.floor(
            (F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("dur"),
        F.max("ts_us").alias("last_us"),
    )
    # Censor horizon as a bounded 1-row driver fold (the house pattern
    # for global scalars): referencing durs0 from a second lazy branch
    # re-plans the whole fact subtree — measured 4 parquet scans and 3
    # user-agg Exchanges with zero runtime reuse. The fold costs one
    # extra fact pass and collapses the main plan to a single chain.
    hrow = durs0.agg(F.max("last_us").alias("m")).first()
    h = (hrow.m or 0) - KM_HORIZON_US
    durs = durs0.select(
        "dur",
        F.when(F.col("last_us") <= F.lit(h), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_event"),
    )
    c_all = durs.groupBy("dur").agg(
        F.count("*").cast("bigint").alias("c"),
        F.sum("is_event").cast("bigint").alias("d"),
    )
    # at-risk = everyone whose lifetime is >= t: a suffix sum over the
    # domain-bounded distinct-duration table (no total/cumulative pair,
    # no second reference to the fact chain)
    w_ge = Window.orderBy("dur").rowsBetween(0, Window.unboundedFollowing)
    w_cum = Window.orderBy("t_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pts = (
        c_all.withColumn(
            "n_risk", F.sum("c").over(w_ge).cast("bigint")
        )
        .filter(F.col("d") > 0)
        .select(
            F.col("dur").alias("t_s"),
            "n_risk",
            "d",
            F.when(F.col("d") >= F.col("n_risk"), F.lit(_KM_DEAD))
            .otherwise(
                F.round(
                    F.lit(1000000.0)
                    * F.log(
                        (F.col("n_risk") - F.col("d")).cast("double")
                        / F.col("n_risk")
                    )
                )
                .cast("bigint")
            )
            .alias("f_s"),
        )
    )
    return pts.select(
        "t_s",
        "n_risk",
        "d",
        F.round(
            F.exp(
                F.sum("f_s").over(w_cum).cast("double") / F.lit(1000000.0)
            ),
            6,
        ).alias("surv"),
    )


# ---------------------------------------------------- implicit ALS

ALS_RANK = 4
ALS_ITERS = 3
ALS_ALPHA = 8.0    # implicit-feedback confidence: c = 1 + alpha*r
ALS_LAMBDA = 0.5
ALS_SCALE = 100_000  # user factors quantize to 1e-5 fixed-point
ALS_TOPK = 3


def _als_init_yq(n_items: int) -> list[list[int]]:
    """Deterministic item-factor init (the house integer-plane
    formula, ~[-0.5, 0.5]) directly in 1e-5 fixed-point integers."""
    return [
        [((i * 7 + f * 13) % 11 - 5) * (ALS_SCALE // 10) for f in range(ALS_RANK)]
        for i in range(n_items)
    ]


def elim_solve4(a, b):
    """Solve a batch of 4x4 SPD systems by NO-PIVOT Gaussian
    elimination written as a FIXED scalar op sequence — every op is
    elementwise (batch-order independent) and the sequence is short
    enough to replay expression-for-expression in a DuckDB oracle.
    Pivot-free is numerically safe here because every ALS system is
    Gram + ridge (symmetric positive definite, diagonal >= lambda).
    LAPACK's dgesv would be faster but its pivoted LU is an
    implementation detail no SQL twin can reproduce bit-for-bit.

    a: (..., 4, 4) float64; b: (..., 4) float64. Returns (..., 4)."""
    import numpy as np

    a = np.array(a, dtype=np.float64, copy=True)
    b = np.array(b, dtype=np.float64, copy=True)
    for k in range(3):
        for i in range(k + 1, 4):
            lik = a[..., i, k] / a[..., k, k]
            for j in range(4):
                a[..., i, j] = a[..., i, j] - lik * a[..., k, j]
            b[..., i] = b[..., i] - lik * b[..., k]
    x = np.empty_like(b)
    x[..., 3] = b[..., 3] / a[..., 3, 3]
    x[..., 2] = (b[..., 2] - a[..., 2, 3] * x[..., 3]) / a[..., 2, 2]
    x[..., 1] = (
        (b[..., 1] - a[..., 1, 2] * x[..., 2]) - a[..., 1, 3] * x[..., 3]
    ) / a[..., 1, 1]
    x[..., 0] = (
        (
            (b[..., 0] - a[..., 0, 1] * x[..., 1])
            - a[..., 0, 2] * x[..., 2]
        )
        - a[..., 0, 3] * x[..., 3]
    ) / a[..., 0, 0]
    return x


def _solve4_sql(amap: dict, bmap: dict) -> str:
    """Emit the DuckDB expression replaying :func:`elim_solve4` on
    the given 4x4 element expressions. Intermediates bind through
    single-element ``list_transform`` levels (SQL has no let), so the
    emitted text is linear in the number of elimination ops."""
    stages: list[dict[str, str]] = []
    all_fields: list[str] = []

    def add_stage(new: dict[str, str]) -> None:
        fields = {n: f"«P».{n}" for n in all_fields}
        fields.update(new)
        stages.append(fields)
        for n in new:
            if n not in all_fields:
                all_fields.append(n)

    first = {f"a{i}{j}": amap[(i, j)] for i in range(4) for j in range(4)}
    first.update({f"b{i}": bmap[i] for i in range(4)})
    stages.append(first)
    all_fields.extend(first.keys())

    for k in range(3):
        add_stage(
            {
                f"l{i}": f"«P».a{i}{k} / «P».a{k}{k}"
                for i in range(k + 1, 4)
            }
        )
        upd: dict[str, str] = {}
        for i in range(k + 1, 4):
            for j in range(4):
                upd[f"a{i}{j}"] = (
                    f"«P».a{i}{j} - «P».l{i} * «P».a{k}{j}"
                )
            upd[f"b{i}"] = f"«P».b{i} - «P».l{i} * «P».b{k}"
        add_stage(upd)
    add_stage({"x3": "«P».b3 / «P».a33"})
    add_stage({"x2": "(«P».b2 - «P».a23 * «P».x3) / «P».a22"})
    add_stage(
        {
            "x1": "((«P».b1 - «P».a12 * «P».x2)"
            " - «P».a13 * «P».x3) / «P».a11"
        }
    )
    add_stage(
        {
            "x0": "(((«P».b0 - «P».a01 * «P».x1)"
            " - «P».a02 * «P».x2) - «P».a03 * «P».x3) / «P».a00"
        }
    )

    expr = None
    for lvl in range(len(stages) - 1, -1, -1):
        var = f"_e{lvl}"
        fields = {
            k: v.replace("«P»", f"_e{lvl - 1}")
            for k, v in stages[lvl].items()
        }
        packed = ", ".join(f"{k} := ({v})" for k, v in fields.items())
        inner = (
            f"[{var}.x0, {var}.x1, {var}.x2, {var}.x3]"
            if expr is None
            else expr
        )
        expr = (
            f"list_transform([struct_pack({packed})],"
            f" {var} -> {inner})[1]"
        )
    return expr


def _als_oracle() -> str:
    """Assemble the recursive-CTE twin of :func:`als_implicit`. The
    trainer state (yq item factors + per-user xs) is carried in the
    recursion; the two 4x4 solves replay :func:`elim_solve4` via
    :func:`_solve4_sql`."""
    s2 = ALS_SCALE * ALS_SCALE
    lam = ALS_LAMBDA

    def user_a(k: int, l: int) -> str:  # noqa: E741
        base = (
            f"list_sum(list_transform(yq,"
            f" q -> q[{k + 1}] * q[{l + 1}]))"
        )
        obs = (
            f"list_sum(list_transform(u.rats, rt ->"
            f" 8 * rt.r * yq[rt.item + 1][{k + 1}]"
            f" * yq[rt.item + 1][{l + 1}]))"
        )
        e = f"CAST({base} + {obs} AS DOUBLE) / {s2}.0::DOUBLE"
        if k == l:
            e = f"({e}) + {lam}::DOUBLE"
        return e

    def user_b(k: int) -> str:
        bq = (
            f"list_sum(list_transform(u.rats, rt ->"
            f" (1 + 8 * rt.r) * yq[rt.item + 1][{k + 1}]))"
        )
        return f"CAST({bq} AS DOUBLE) / {ALS_SCALE}.0::DOUBLE"

    user_solve = _solve4_sql(
        {(k, l): user_a(k, l) for k in range(4) for l in range(4)},
        {k: user_b(k) for k in range(4)},
    )

    def r_of(it: str) -> str:
        return (
            f"COALESCE(list_sum(list_transform(list_filter(u.rats,"
            f" rt -> rt.item = {it}), rt -> rt.r)), 0)"
        )

    def item_a(k: int, l: int) -> str:  # noqa: E741
        g = f"CAST(g[{k + 1}][{l + 1}] AS DOUBLE) / {s2}.0::DOUBLE"
        if k == l:
            g = f"({g}) + {lam}::DOUBLE"
        s = (
            f"list_sum(list_transform(nxs, u -> {r_of('it')}"
            f" * u.xs[{k + 1}] * u.xs[{l + 1}]))"
        )
        return (
            f"({g}) + (8.0::DOUBLE * CAST({s} AS DOUBLE))"
            f" / {s2}.0::DOUBLE"
        )

    def item_b(k: int) -> str:
        bx = (
            f"list_sum(list_transform(nxs, u -> CASE WHEN"
            f" len(list_filter(u.rats, rt -> rt.item = it)) > 0"
            f" THEN u.xs[{k + 1}] ELSE 0 END))"
        )
        br = (
            f"list_sum(list_transform(nxs, u -> {r_of('it')}"
            f" * u.xs[{k + 1}]))"
        )
        return (
            f"CAST({bx} AS DOUBLE) / {ALS_SCALE}.0::DOUBLE"
            f" + (8.0::DOUBLE * CAST({br} AS DOUBLE))"
            f" / {ALS_SCALE}.0::DOUBLE"
        )

    item_solve = _solve4_sql(
        {(k, l): item_a(k, l) for k in range(4) for l in range(4)},
        {k: item_b(k) for k in range(4)},
    )

    floor_q = (
        f"x -> CAST(FLOOR(x * {ALS_SCALE}.0::DOUBLE) AS BIGINT)"
    )
    return f"""
WITH RECURSIVE types AS MATERIALIZED (
    SELECT event_type,
           CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1
                AS BIGINT) AS item
    FROM (SELECT DISTINCT event_type FROM events)
),
rr AS MATERIALIZED (
    SELECT c.user_id, t.item, CAST(c.r AS BIGINT) AS r
    FROM (SELECT user_id, event_type, COUNT(*) AS r
          FROM events GROUP BY 1, 2) c
    JOIN types t USING (event_type)
),
uco AS MATERIALIZED (
    SELECT list(struct_pack(user_id := user_id, rats := rats,
                            xs := CAST(NULL AS BIGINT[]))
                ORDER BY user_id) AS us,
           CAST(MAX(n_items) AS BIGINT) AS n_items
    FROM (
        SELECT user_id,
               list(struct_pack(item := item, r := r)
                    ORDER BY item) AS rats,
               (SELECT COUNT(*) FROM types) AS n_items
        FROM rr GROUP BY user_id
    )
),
it AS (
    SELECT 0 AS i,
           list_transform(range(0, n_items), i0 ->
               list_transform(range(0, 4), f ->
                   CAST((((i0 * 7 + f * 13) % 11) - 5)
                        * {ALS_SCALE // 10} AS BIGINT))) AS yq,
           us AS xs
    FROM uco
    UNION ALL
    SELECT i + 1,
           list_transform(range(0, len(yq)), it ->
               list_transform({item_solve}, {floor_q})),
           nxs
    FROM (
        SELECT i, yq, nxs,
               list_transform(range(0, 4), k ->
                   list_transform(range(0, 4), l ->
                       list_sum(list_transform(nxs, u ->
                           u.xs[k + 1] * u.xs[l + 1])))) AS g
        FROM (
            SELECT i, yq,
                   list_transform(xs, u -> struct_pack(
                       user_id := u.user_id,
                       rats := u.rats,
                       xs := list_transform({user_solve}, {floor_q})
                   )) AS nxs
            FROM it WHERE i < {ALS_ITERS}
        )
    )
),
fin AS MATERIALIZED (
    SELECT yq, xs FROM it WHERE i = {ALS_ITERS}
),
scored AS MATERIALIZED (
    SELECT u.user_id, t.item, t.event_type,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(0, 4), k ->
                   u.xs[k + 1] * yq[t.item + 1][k + 1])),
               (acc, v) -> acc + v) AS DOUBLE)
               / {s2}.0::DOUBLE AS score,
           len(list_filter(u.rats, rt -> rt.item = t.item)) > 0
               AS seen
    FROM (SELECT yq, unnest(xs) AS u FROM fin), types t
)
SELECT user_id, event_type, ROUND(score, 6) AS score, seen, rank
FROM (
    SELECT user_id, event_type, score, seen,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY score DESC, item
           ) AS BIGINT) AS rank
    FROM scored
)
WHERE rank <= {ALS_TOPK}
"""


@register("als_implicit", extra=True, oracle=_als_oracle())
def als_implicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed IMPLICIT-FEEDBACK ALS (Hu/Koren/Volinsky 2008) —
    the canonical Spark-scale recommender trainer, structured the way
    the alternation actually distributes when one side is small
    (items = event types) and one side is the data (users):

    - USER STEP (distributed): the item factors broadcast as literals
      and each user's rank-4 normal equations solve in one
      ``mapInPandas`` pass over the once-materialized per-user rating
      rows — BATCHED per Arrow chunk (dense confidence scatter +
      einsum Gram + batched elimination), thousands of users per
      numpy call instead of one python invocation per user.
      Per-entity linear solves are the case the built-in operators
      genuinely can't express. Solved factors quantize to 1e-5
      fixed-point BIGINTs.
    - ITEM STEP (aggregate + bounded driver fold): XtX and the
      per-item confidence-weighted moments are sums of PRODUCTS OF
      INTEGERS (the quantized factors), shuffle-reduced in
      decimal(38,0) — order-independent and exact at any corpus
      size — and the |items| x 20 moment rows fold to the driver for
      five 4x4 solves.

    ORACLE-PAIRED (r9 verdict #5) by two changes over the first cut:
    ITEM factors also quantize to 1e-5 integers after every item
    step, so the user step's Gram/moment sums are integer-valued
    float64 (every partial sum < 2^53 — exact under ANY einsum/BLAS
    order, the MNN kernel's trick); and both 4x4 solves run
    :func:`elim_solve4`, a written-down no-pivot elimination (valid:
    Gram + ridge is SPD) instead of LAPACK's pivoted dgesv, so the
    recursive-CTE twin can replay every float op in sequence. The
    CTE carries (yq, per-user xs) across the three alternations.

    Three alternations, then per-user scoring of every item (exact
    integer dot, one float division) with ALS_TOPK recommendations.

    100 TB shape: per-iteration cost is one user-keyed pandas pass +
    one integer agg; the fact shuffles once per iteration on user_id
    and factors never leave their executor except as the 20-column
    moment sums."""
    import numpy as np
    import pandas as pd

    ev = _ev(spark, sf_dir)
    r = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("r")
    )
    # bounded driver fold: the item vocabulary (event types)
    types = sorted(
        row.event_type
        for row in r.select("event_type").distinct().collect()
    )
    n_items = len(types)
    type_map = F.create_map(
        *[c for t, i in ((t, i) for i, t in enumerate(types)) for c in (F.lit(t), F.lit(i))]
    )
    # lazy checkpoint: every iteration's user solve AND the final
    # scoring join re-read the ratings — materialize the tiny
    # (user, item, r) table once instead of re-running the fact
    # aggregation 2*ITERS+1 times
    ri = r.select(
        "user_id", type_map[F.col("event_type")].alias("item"), "r"
    ).localCheckpoint(eager=False)
    # ratings never change across alternations: densify each user's
    # rating row ONCE (one shuffle total, not one per iteration) and
    # let every user step re-read the checkpointed per-user table
    ur = (
        ri.groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("item", "r"))).alias(
                "ratings"
            )
        )
        .localCheckpoint(eager=False)
    )
    yq = np.array(_als_init_yq(n_items), dtype=np.float64)

    x_schema = "user_id long, xs array<long>"
    pairs_ij = [
        (i, j) for i in range(ALS_RANK) for j in range(i, ALS_RANK)
    ]
    s2f = float(ALS_SCALE) ** 2

    X = None
    for _ in range(ALS_ITERS):
        yq_list = yq.tolist()  # broadcast as plain literals via closure

        def solve_users_batch(pdfs):
            # BATCHED user step: one dense scatter + one einsum + one
            # batched elimination per Arrow batch. The Gram/moment
            # inputs are integer-valued float64 with every partial
            # sum < 2^53, so einsum's summation order (BLAS tiling,
            # FMA, anything) cannot change a bit; the elimination is
            # elementwise, so results don't depend on how users land
            # in batches — the DuckDB twin replays the identical
            # expressions and pins exact equality.
            yqm = np.array(yq_list, dtype=np.float64)
            base_q = yqm.T @ yqm  # exact: integer-valued float64
            for pdf in pdfs:
                if not len(pdf):
                    continue
                n_u = len(pdf)
                w_conf = np.zeros((n_u, n_items))  # alpha * r (observed)
                c_lin = np.zeros((n_u, n_items))  # 1 + alpha*r (observed)
                for u, rats in enumerate(pdf["ratings"]):
                    for s in rats:
                        it, rv = int(s["item"]), float(s["r"])
                        w_conf[u, it] = ALS_ALPHA * rv
                        c_lin[u, it] = 1.0 + ALS_ALPHA * rv
                aq = base_q[None, :, :] + np.einsum(
                    "ui,ik,il->ukl", w_conf, yqm, yqm
                )
                a = aq / s2f
                a[:, range(ALS_RANK), range(ALS_RANK)] += ALS_LAMBDA
                bq = np.einsum("ui,ik->uk", c_lin, yqm)
                x = elim_solve4(a, bq / float(ALS_SCALE))
                xs = np.floor(x * ALS_SCALE).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "user_id": pdf["user_id"].astype("int64"),
                        "xs": list(xs),
                    }
                )

        # lazy checkpoint: the XtX agg, the per-item moment agg and
        # (last iteration) the scoring pass are three separate actions
        # over X — without the barrier each one re-runs the whole
        # user-solve pass (measured: 25.7 s for a 3-iteration
        # rank-4 fit; ~3x the work executed twice over)
        X = ur.mapInPandas(solve_users_batch, x_schema).localCheckpoint(
            eager=False
        )

        # item step: exact integer moments in decimal(38,0) (immune
        # to both shuffle order and bigint overflow); XtX over all
        # users + the per-item confidence-weighted moments collect
        # bounded (1 row / |items| rows) and descale on the driver.
        xtx_row = X.agg(
            *[
                F.sum(
                    (F.col("xs")[i] * F.col("xs")[j]).cast(
                        "decimal(38,0)"
                    )
                ).alias(f"g_{i}_{j}")
                for i, j in pairs_ij
            ]
        ).collect()[0]
        moments = (
            ri.join(X, "user_id")
            .groupBy("item")
            .agg(
                *[
                    F.sum(
                        (
                            F.col("r") * F.col("xs")[i] * F.col("xs")[j]
                        ).cast("decimal(38,0)")
                    ).alias(f"s_{i}_{j}")
                    for i, j in pairs_ij
                ],
                *[
                    F.sum(F.col("xs")[i].cast("decimal(38,0)")).alias(
                        f"bx_{i}"
                    )
                    for i in range(ALS_RANK)
                ],
                *[
                    F.sum(
                        (F.col("r") * F.col("xs")[i]).cast(
                            "decimal(38,0)"
                        )
                    ).alias(f"br_{i}")
                    for i in range(ALS_RANK)
                ],
            )
            .collect()
        )
        xtx = np.zeros((ALS_RANK, ALS_RANK))
        for i, j in pairs_ij:
            v = float(int(xtx_row[f"g_{i}_{j}"])) / s2f
            xtx[i, j] = xtx[j, i] = v
        new_yq = np.array(yq)
        for row in moments:
            it = int(row.item)
            a = xtx + ALS_LAMBDA * np.eye(ALS_RANK)
            bvec = np.zeros(ALS_RANK)
            for i, j in pairs_ij:
                v = ALS_ALPHA * float(int(row[f"s_{i}_{j}"])) / s2f
                a[i, j] += v
                if i != j:
                    a[j, i] += v
            for i in range(ALS_RANK):
                bvec[i] = (
                    float(int(row[f"bx_{i}"])) / ALS_SCALE
                    + ALS_ALPHA * float(int(row[f"br_{i}"])) / ALS_SCALE
                )
            new_yq[it] = np.floor(
                elim_solve4(a, bvec) * ALS_SCALE
            )
        yq = new_yq

    # score every (user, item): EXACT integer dot of the quantized
    # factor pair, one double division, top-k per user with seen flag
    scored = X.select(
        "user_id",
        F.posexplode(
            F.array(
                *[
                    sum(
                        F.col("xs")[i] * F.lit(int(yq[it][i]))
                        for i in range(ALS_RANK)
                    )
                    / F.lit(s2f)
                    for it in range(n_items)
                ]
            )
        ).alias("item", "score"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item")
    )
    inv_map = F.create_map(
        *[c for i, t in enumerate(types) for c in (F.lit(i), F.lit(t))]
    )
    return (
        scored.join(ri.select("user_id", "item", "r"), ["user_id", "item"], "left")
        .withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= ALS_TOPK)
        .select(
            "user_id",
            inv_map[F.col("item")].alias("event_type"),
            F.round(F.col("score"), 6).alias("score"),
            F.col("r").isNotNull().alias("seen"),
            "rank",
        )
    )


# ------------------------------------------------ permutation test

_PERM_R = 200  # permutation replicates
_PERM_SALT = 1_000_003  # replicate stride into the Lehmer stream


@register(
    "ab_permutation_test",
    extra=True,
    oracle=f"""
    WITH u AS (
        SELECT event_type, user_id,
               SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS s_u,
               COUNT(*) AS n_u
        FROM events
        GROUP BY 1, 2
    ),
    obs AS (
        SELECT event_type,
               SUM(CASE WHEN user_id % 2 = 1 THEN s_u ELSE 0 END) * 1.0
                 / SUM(CASE WHEN user_id % 2 = 1 THEN n_u ELSE 0 END)
               - SUM(CASE WHEN user_id % 2 = 0 THEN s_u ELSE 0 END) * 1.0
                 / SUM(CASE WHEN user_id % 2 = 0 THEN n_u ELSE 0 END)
                   AS t_obs
        FROM u GROUP BY 1
    ),
    perm AS (
        SELECT event_type, r,
               CASE WHEN ((user_id + r * {_PERM_SALT}) % {_KMV_P})
                         * {_KMV_A} % {_KMV_P} * {_KMV_A} % {_KMV_P}
                         * {_KMV_A} % {_KMV_P} * 2 < {_KMV_P}
                    THEN 1 ELSE 0 END AS arm,
               s_u, n_u
        FROM u, range(1, {_PERM_R + 1}) t(r)
    ),
    tr AS (
        SELECT event_type, r,
               SUM(CASE WHEN arm = 1 THEN s_u ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 1 THEN n_u ELSE 0 END), 0)
               - SUM(CASE WHEN arm = 0 THEN s_u ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN arm = 0 THEN n_u ELSE 0 END), 0)
                   AS t_r
        FROM perm GROUP BY 1, 2
    )
    SELECT obs.event_type,
           ROUND(obs.t_obs / 1000.0, 6) AS t_obs,
           CAST(COUNT(CASE WHEN tr.t_r IS NULL
                             OR ABS(tr.t_r) >= ABS(obs.t_obs)
                           THEN 1 END) AS BIGINT) AS n_extreme,
           ROUND((1.0 + COUNT(CASE WHEN tr.t_r IS NULL
                                     OR ABS(tr.t_r) >= ABS(obs.t_obs)
                                   THEN 1 END)) / {_PERM_R + 1}.0, 6)
               AS p_value
    FROM obs JOIN tr ON obs.event_type = tr.event_type
    GROUP BY obs.event_type, obs.t_obs
    """,
)
def ab_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTATION TEST (Fisher randomization inference) for the A/B
    readout — the assumption-free companion to zx_ab_test_stats's
    Welch z: re-randomize USERS (the randomization unit, so
    within-user correlation is respected) across arms {_PERM_R} times
    and count replicates whose |mean difference| reaches the observed
    one. Replicates are drawn from a deterministic Lehmer hash of
    (user_id, replicate), so the whole Monte-Carlo — statistics,
    extreme-count, p-value — is reproducible and hash-matches the
    oracle; a degenerate replicate (an empty arm) counts as extreme
    (conservative).

    Scale: the fact shuffles ONCE into the per-(type, user) table;
    the R-fold replicate expansion is a narrow explode of that
    user-level table whose (type, r, arm) aggregation is map-side
    combinable — the shuffle after expansion carries R x types x 2
    rows, never R x users. All sums are exact milli-unit bigints;
    each t_r is one double expression over them, identical on both
    engines.

    Reference scope: beyond-reference extension (experimentation
    analytics family)."""
    e = table(spark, sf_dir, "events")
    # Materialize the per-(type, user) table once: the observed and
    # replicate chains both consume it, and without the barrier each
    # would re-scan and re-shuffle the fact.
    u = (
        e.groupBy("event_type", "user_id")
        .agg(
            F.sum(
                F.round(F.col("value") * 1000).cast("bigint")
            ).alias("s_u"),
            F.count("*").alias("n_u"),
        )
        .localCheckpoint(eager=True)
    )

    def arm_means(df: DataFrame, arm: F.Column, *keys: str) -> DataFrame:
        s1 = F.sum(F.when(arm == 1, F.col("s_u")).otherwise(0))
        n1 = F.sum(F.when(arm == 1, F.col("n_u")).otherwise(0))
        s0 = F.sum(F.when(arm == 0, F.col("s_u")).otherwise(0))
        n0 = F.sum(F.when(arm == 0, F.col("n_u")).otherwise(0))
        t = s1 * 1.0 / F.nullif(n1, F.lit(0)) - s0 * 1.0 / F.nullif(
            n0, F.lit(0)
        )
        return df.groupBy(*keys).agg(t.alias("t"))

    obs = arm_means(u, F.col("user_id") % 2, "event_type").select(
        "event_type", F.col("t").alias("t_obs")
    )
    rep = u.select(
        "event_type",
        "s_u",
        "n_u",
        F.explode(F.sequence(F.lit(1), F.lit(_PERM_R))).alias("r"),
        F.col("user_id"),
    )
    h = (
        (F.col("user_id") + F.col("r") * _PERM_SALT) % _KMV_P
    ) * _KMV_A % _KMV_P * _KMV_A % _KMV_P * _KMV_A % _KMV_P
    perm_arm = F.when(h * 2 < _KMV_P, F.lit(1)).otherwise(F.lit(0))
    tr = arm_means(
        rep.withColumn("arm", perm_arm), F.col("arm"), "event_type", "r"
    )
    extreme = F.when(
        F.col("t").isNull() | (F.abs("t") >= F.abs("t_obs")), 1
    )
    return (
        obs.join(tr, "event_type")
        .groupBy("event_type", "t_obs")
        .agg(F.count(extreme).cast("bigint").alias("n_extreme"))
        .select(
            "event_type",
            F.round(F.col("t_obs") / 1000.0, 6).alias("t_obs"),
            "n_extreme",
            F.round(
                (1.0 + F.col("n_extreme")) / float(_PERM_R + 1), 6
            ).alias("p_value"),
        )
    )


# -------------------------------------------- difference-in-diff


@register(
    "did_prepost",
    extra=True,
    oracle="""
    WITH bounds AS (
        SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid
        FROM events
    ),
    cells AS (
        SELECT event_type,
               CAST(user_id % 2 AS INT) AS arm,
               CASE WHEN epoch_us(ts) >= (SELECT mid FROM bounds)
                    THEN 1 ELSE 0 END AS period,
               CAST(ROUND(value * 1000) AS BIGINT) AS v
        FROM events
    ),
    m AS (
        SELECT event_type,
               SUM(CASE WHEN arm = 0 AND period = 0 THEN v ELSE 0 END) * 1.0
                 / NULLIF(COUNT(CASE WHEN arm = 0 AND period = 0 THEN 1 END), 0)
                   AS pre_c,
               SUM(CASE WHEN arm = 1 AND period = 0 THEN v ELSE 0 END) * 1.0
                 / NULLIF(COUNT(CASE WHEN arm = 1 AND period = 0 THEN 1 END), 0)
                   AS pre_t,
               SUM(CASE WHEN arm = 0 AND period = 1 THEN v ELSE 0 END) * 1.0
                 / NULLIF(COUNT(CASE WHEN arm = 0 AND period = 1 THEN 1 END), 0)
                   AS post_c,
               SUM(CASE WHEN arm = 1 AND period = 1 THEN v ELSE 0 END) * 1.0
                 / NULLIF(COUNT(CASE WHEN arm = 1 AND period = 1 THEN 1 END), 0)
                   AS post_t
        FROM cells
        GROUP BY event_type
    )
    SELECT event_type,
           ROUND(pre_c / 1000.0, 6) AS pre_control,
           ROUND(pre_t / 1000.0, 6) AS pre_treat,
           ROUND(post_c / 1000.0, 6) AS post_control,
           ROUND(post_t / 1000.0, 6) AS post_treat,
           ROUND(((post_t - pre_t) - (post_c - pre_c)) / 1000.0, 6)
               AS did,
           ROUND((post_t - post_c) / 1000.0, 6) AS naive_diff
    FROM m
    """,
)
def did_prepost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES over a pre/post boundary — the
    causal-inference companion to zx_ab_test_stats (naive arm
    contrast) and zx_ab_cuped (covariate adjustment): the DiD
    estimator (post_t - pre_t) - (post_c - pre_c) removes any
    time-invariant arm-level confound the naive post difference
    keeps; both ride along so the output shows what parallel-trends
    adjustment changed. Boundary = midpoint of the observed
    unix-micros span (deterministic, data-derived).

    Scale: ONE partial+final aggregation of the fact into per-type
    rows — arm and period are per-row expressions, the four cell
    means are conditional aggregates, so no pivot join and no second
    fact pass; the timestamp-bounds agg is a 1-row broadcast. Exact
    milli-unit integer sums; every mean is one double expression
    evaluated identically on both engines."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    bounds = e.agg(
        ((F.min("us") + F.max("us")) / 2).cast("bigint").alias("mid")
    )
    cells = e.join(F.broadcast(bounds)).withColumn(
        "period", (F.col("us") >= F.col("mid")).cast("int")
    )

    def cell_mean(arm: int, period: int) -> F.Column:
        hit = (F.col("arm") == arm) & (F.col("period") == period)
        return F.sum(F.when(hit, F.col("v")).otherwise(0)) * 1.0 / F.nullif(
            F.count(F.when(hit, F.lit(1))), F.lit(0)
        )

    m = cells.groupBy("event_type").agg(
        cell_mean(0, 0).alias("pre_c"),
        cell_mean(1, 0).alias("pre_t"),
        cell_mean(0, 1).alias("post_c"),
        cell_mean(1, 1).alias("post_t"),
    )
    return m.select(
        "event_type",
        F.round(F.col("pre_c") / 1000.0, 6).alias("pre_control"),
        F.round(F.col("pre_t") / 1000.0, 6).alias("pre_treat"),
        F.round(F.col("post_c") / 1000.0, 6).alias("post_control"),
        F.round(F.col("post_t") / 1000.0, 6).alias("post_treat"),
        F.round(
            (
                (F.col("post_t") - F.col("pre_t"))
                - (F.col("post_c") - F.col("pre_c"))
            )
            / 1000.0,
            6,
        ).alias("did"),
        F.round(
            (F.col("post_t") - F.col("post_c")) / 1000.0, 6
        ).alias("naive_diff"),
    )


# ------------------------------------------------ target encoding (r8)

TE_SMOOTH_M = 20  # pseudo-count weight of the global prior


@register(
    "target_encode_loo",
    extra=True,
    oracle=f"""
    WITH g AS (
        SELECT CAST(SUM(n_chars) AS BIGINT) AS gs,
               CAST(COUNT(*) AS BIGINT) AS gc
        FROM documents
    ),
    s AS (
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS ss,
               CAST(COUNT(*) AS BIGINT) AS sc
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source,
           ROUND(CAST(s.ss - d.n_chars AS DOUBLE)
                 / NULLIF(s.sc - 1, 0), 6) AS te_loo,
           ROUND(CAST((s.ss - d.n_chars) * g.gc
                      + {TE_SMOOTH_M} * g.gs AS DOUBLE)
                 / CAST((s.sc - 1 + {TE_SMOOTH_M}) * g.gc AS DOUBLE),
                 6) AS te_smooth
    FROM documents d JOIN s USING (source) CROSS JOIN g
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature — the
    leakage-safe way to turn high-cardinality categories into model
    features (each row's encoding excludes its OWN target, so the
    feature never memorizes the label it will be asked to predict),
    plus the smoothed variant that shrinks rare categories toward the
    global prior with m pseudo-counts (the Micci-Barreca 2001 /
    CatBoost-style estimator). Category = source, target = n_chars.

    Exactness: both encodings are ratios of exact BIGINT sums — the
    smoothed one clears its denominators ((s-own)·G_cnt + m·G_sum
    over (c-1+m)·G_cnt) so no float prior ever enters the
    accumulation; a single-member category's LOO is NULL (NULLIF),
    identically in both engines.

    Scale: one groupBy(source) aggregation (map-side combinable) and
    one 1-row global agg, both folded back as broadcasts onto the
    fact scan — the per-row encode is arithmetic in codegen. The
    fact table never shuffles."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    g = F.broadcast(
        d.agg(
            F.sum("n_chars").cast("bigint").alias("gs"),
            F.count("*").cast("bigint").alias("gc"),
        )
    )
    s = F.broadcast(
        d.groupBy("source").agg(
            F.sum("n_chars").cast("bigint").alias("ss"),
            F.count("*").cast("bigint").alias("sc"),
        )
    )
    return (
        d.join(s, "source")
        .crossJoin(g)
        .select(
            "doc_id",
            "source",
            F.round(
                (F.col("ss") - F.col("n_chars")).cast("double")
                / F.nullif((F.col("sc") - 1).cast("double"), F.lit(0.0)),
                6,
            ).alias("te_loo"),
            F.round(
                (
                    (F.col("ss") - F.col("n_chars")) * F.col("gc")
                    + TE_SMOOTH_M * F.col("gs")
                ).cast("double")
                / (
                    (F.col("sc") - 1 + TE_SMOOTH_M) * F.col("gc")
                ).cast("double"),
                6,
            ).alias("te_smooth"),
        )
    )


# ------------------------------------------------ conformal intervals (r8)

CONF_ALPHA_PCT = 10  # 90% target coverage


@register(
    "conformal_interval",
    extra=True,
    oracle=f"""
    WITH train AS (
        SELECT event_type,
               CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS pred_milli
        FROM events WHERE event_id % 3 = 0
        GROUP BY event_type
    ),
    cal AS (
        SELECT e.event_type, e.event_id,
               ABS(CAST(ROUND(e.value * 1000) AS BIGINT)
                   - t.pred_milli) AS r
        FROM events e JOIN train t USING (event_type)
        WHERE e.event_id % 3 = 1
    ),
    ncal AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM cal GROUP BY event_type
    ),
    q AS (
        SELECT c.event_type, n.n_cal, c.r AS q_milli
        FROM cal c JOIN ncal n USING (event_type)
        QUALIFY row_number() OVER (
            PARTITION BY c.event_type ORDER BY c.r, c.event_id
        ) = LEAST(n.n_cal,
                  CAST(CEIL((n.n_cal + 1) * {100 - CONF_ALPHA_PCT} / 100.0)
                       AS BIGINT))
    )
    SELECT q.event_type, q.n_cal, t.pred_milli, q.q_milli,
           ROUND(SUM(CASE WHEN ABS(CAST(ROUND(e.value * 1000) AS BIGINT)
                                   - t.pred_milli) <= q.q_milli
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
               AS coverage
    FROM events e
    JOIN train t USING (event_type)
    JOIN q USING (event_type)
    WHERE e.event_id % 3 = 2
    GROUP BY 1, 2, 3, 4
    """,
)
def conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al.; Lei et al.
    2018) — the distribution-free way to attach finite-sample-valid
    uncertainty to ANY point predictor, and the calibration primitive
    production ML systems bolt on after training: fit on a train
    fold, take the ceil((n+1)(1-alpha))-th smallest absolute residual
    on a CALIBRATION fold as the interval half-width q, and the
    interval pred +- q covers a fresh point with probability >=
    1-alpha, no distributional assumptions. Folds split by
    event_id % 3 (train/calibrate/test); predictor = per-type train
    mean; the emitted coverage on the held-out test fold is the
    empirical check of the 90% guarantee.

    Exactness: values quantize to milli-units, the predictor is one
    integer floor-division, residuals and q are integers, and the
    order statistic is a row_number with a deterministic (r,
    event_id) tie-break — the quantile is EXACT, not an approximate
    percentile. Coverage is a ratio of exact counts.

    Scale: two groupBy(event_type) aggs and one per-type rank window
    over the calibration fold (only (type, residual, id) rows
    shuffle); the domain-bounded model/quantile tables broadcast back
    onto the test scan. At 100 TB the calibration fold is a fixed-
    size sample by construction — conformal needs only thousands of
    calibration points per group for tight quantiles."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    )
    train = e.filter(F.col("event_id") % 3 == 0)
    model = F.broadcast(
        train.groupBy("event_type").agg(
            F.expr("sum(v_milli) div count(*)").alias("pred_milli")
        )
    )
    cal = (
        e.filter(F.col("event_id") % 3 == 1)
        .join(model, "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("v_milli") - F.col("pred_milli")).alias("r"),
        )
    )
    ncal = cal.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cal")
    )
    wq = Window.partitionBy("event_type").orderBy("r", "event_id")
    q = (
        cal.join(F.broadcast(ncal), "event_type")
        .withColumn("rn", F.row_number().over(wq))
        .filter(
            F.col("rn")
            == F.least(
                F.col("n_cal"),
                # ((n+1)*90)/100.0 EXACTLY as the oracle writes it —
                # (n+1)*0.9 is a different float and its ceil differs
                # at integral boundaries (10*0.9 = 9.000000000000002)
                F.ceil(
                    ((F.col("n_cal") + 1) * (100 - CONF_ALPHA_PCT))
                    / F.lit(100.0)
                ).cast("bigint"),
            )
        )
        .select("event_type", "n_cal", F.col("r").alias("q_milli"))
    )
    test = e.filter(F.col("event_id") % 3 == 2)
    return (
        test.join(model, "event_type")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n_cal", "pred_milli", "q_milli")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.abs(F.col("v_milli") - F.col("pred_milli"))
                        <= F.col("q_milli"),
                        1,
                    ).otherwise(0)
                )
                * 1.0
                / F.count("*"),
                6,
            ).alias("coverage")
        )
    )


# ------------------------------------------------ compaction planner (r8)

COMPACT_TARGET = 65_536  # target bin payload in bytes (test-scale; a
# lakehouse OPTIMIZE targets 128-1024 MiB — the plan is scale-free)


@register(
    "compaction_plan",
    extra=True,
    oracle=f"""
    WITH files AS (
        SELECT source, doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        FROM documents
    ),
    packed AS (
        SELECT source, doc_id, bytes,
               CAST((SUM(bytes) OVER (
                   PARTITION BY source
                   ORDER BY bytes DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - 1) // {COMPACT_TARGET} AS BIGINT) AS bin_id
        FROM files
    )
    SELECT source, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM packed
    GROUP BY 1, 2
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION planning — the table-maintenance pass
    every lakehouse runs (Delta OPTIMIZE / Iceberg rewrite_data_files):
    assign each partition's files to target-size output bins so a
    rewrite job turns thousands of small files into few near-target
    ones. Planner = sorted-greedy sequential packing: order files
    large-to-small (the first-fit-decreasing ordering), take a running
    byte sum per partition, and cut a new bin every TARGET bytes —
    bin_id = (cumsum - 1) div TARGET. This is the shuffle-free
    formulation: the classic FFD bin-search loop is inherently
    sequential, but the running-sum cut gives the same <= 2x-of-
    optimal class of guarantee for the compaction use case (bins
    may overflow by at most one file, never undershoot by design)
    while being ONE window over (partition, size) metadata.

    Files here are the documents themselves (octet_length(text) per
    doc, partition = source) since the testdata ships as one parquet
    per table; against a real catalog the same plan runs over the
    manifest's (partition, file, size) rows — metadata-sized input at
    any corpus size, never the data. Emits per (source, bin): file
    count, payload bytes, first doc — the rewrite task list."""
    d = table(spark, sf_dir, "documents")
    files = d.select(
        "source",
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias(
            "bytes"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("bytes").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer div, not float-div-then-cast: at real manifest scales a
    # float64 quotient can land on the wrong side of a bin boundary
    packed = files.withColumn("__cum", F.sum("bytes").over(w)).withColumn(
        "bin_id",
        F.expr(f"(__cum - 1) div {COMPACT_TARGET}").cast("bigint"),
    ).drop("__cum")
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bin_bytes"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


# ------------------------------------------- approximate query processing

AQP_MOD = 64  # deterministic Bernoulli rate = 1/64


@register(
    "aqp_sample_estimate",
    extra=True,
    oracle=f"""
    WITH li AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                    AS BIGINT) AS cents,
               CAST(CAST(('0x' || substring(
                   md5('aqp:' || CAST(l_orderkey AS STRING) || ':'
                       || CAST(l_linenumber AS STRING)),
                   1, 15)) AS UBIGINT) % {AQP_MOD} AS BIGINT) AS bucket
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END)
                * {AQP_MOD} AS BIGINT) AS n_est,
           CAST(SUM(cents) AS BIGINT) AS sum_cents_exact,
           CAST(SUM(CASE WHEN bucket = 0 THEN cents ELSE 0 END)
                * {AQP_MOD} AS BIGINT) AS sum_cents_est,
           CAST(ABS(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END)
                    * {AQP_MOD} - COUNT(*)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS rel_err_n,
           CAST(ABS(SUM(CASE WHEN bucket = 0 THEN cents ELSE 0 END)
                    * {AQP_MOD} - SUM(cents)) AS DOUBLE)
               / CAST(SUM(cents) AS DOUBLE) AS rel_err_sum
    FROM li GROUP BY l_returnflag
    """,
)
def aqp_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE QUERY PROCESSING audit: per-group COUNT/SUM
    estimated from a deterministic 1/64 Bernoulli sample
    (md5-keyed on the row identity — the BlinkDB/uniform-sample
    estimator, Horvitz-Thompson scaled by the inverse rate), emitted
    SIDE BY SIDE with the exact answers and the measured relative
    errors. This is the go/no-go table before trusting sampled
    dashboards at 100 TB: on a cluster the sample predicate pushes to
    the scan (or the sample is materialized once) and the estimate
    reads 1/64 of the data; the exact pass exists here to
    measure the error the estimator actually commits.

    Cross-engine exact: the sample is a deterministic md5 bucket
    (no RNG), money is DECIMAL(12,2)->integer cents, estimates are
    integer multiplications, and the error ratios are single IEEE
    divisions of exact integers.

    Reference scope: beyond-reference extension (analytics family).
    """
    li = table(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("aqp:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % AQP_MOD
    )
    rows = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        bucket.alias("bucket"),
    )
    in_smp = (F.col("bucket") == 0).cast("bigint")
    agg = rows.groupBy("l_returnflag").agg(
        F.count("*").alias("n_exact"),
        (F.sum(in_smp) * AQP_MOD).cast("bigint").alias("n_est"),
        F.sum("cents").cast("bigint").alias("sum_cents_exact"),
        (F.sum(in_smp * F.col("cents")) * AQP_MOD)
        .cast("bigint")
        .alias("sum_cents_est"),
    )
    return agg.select(
        "l_returnflag",
        "n_exact",
        "n_est",
        "sum_cents_exact",
        "sum_cents_est",
        (
            F.abs(F.col("n_est") - F.col("n_exact")).cast("double")
            / F.col("n_exact").cast("double")
        ).alias("rel_err_n"),
        (
            F.abs(F.col("sum_cents_est") - F.col("sum_cents_exact")).cast(
                "double"
            )
            / F.col("sum_cents_exact").cast("double")
        ).alias("rel_err_sum"),
    )


# ---------------------------------------------- merge-on-read deletes

DV_MOD = 37  # deterministic delete draw: md5('del:'||doc_id) % 37 == 0


@register(
    "store_delete_vectors",
    extra=True,
    oracle=f"""
    WITH pos AS (
        SELECT doc_id, source,
               CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                   AS pos
        FROM documents
    ),
    dv AS (
        SELECT source AS file_id, pos
        FROM pos
        WHERE CAST(('0x' || substring(
                  md5('del:' || CAST(doc_id AS STRING)), 1, 15))
                  AS UBIGINT) % {DV_MOD} = 0
    ),
    applied AS (
        SELECT p.source, p.bytes,
               CASE WHEN d.pos IS NULL THEN 0 ELSE 1 END AS deleted
        FROM pos p
        LEFT JOIN dv d ON d.file_id = p.source AND d.pos = p.pos
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(deleted) AS BIGINT) AS n_deleted,
           CAST(COUNT(*) - SUM(deleted) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN deleted = 0 THEN bytes ELSE 0 END)
                AS BIGINT) AS live_bytes
    FROM applied GROUP BY source
    """,
)
def store_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ positional delete vectors — the Iceberg v2 /
    Delta deletion-vector read path: a delete file holds (file, pos)
    pairs, and the scan applies them as an ANTI-join on row position
    instead of rewriting data files. Here the 'files' are the source
    partitions and positions are the stable (source, doc_id-order)
    row numbers; the delete set is a deterministic md5 draw (~1/37 of
    rows), so both engines derive the identical delete file. Emits
    the per-file audit a compactor reads: total rows, deleted rows,
    live rows, live bytes.

    Scale: the position window rides the source partition axis; the
    delete join is (file_id, pos) equi-shaped — delete files are tiny
    relative to data files, so on a cluster the delete side
    broadcasts and the scan stays one pass. When a file's deleted
    fraction crosses the compaction threshold, zx_compaction_plan is
    the rewrite planner downstream.

    Reference scope: beyond-reference extension (lakehouse family).
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = d.select(
        "doc_id",
        "source",
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias(
            "bytes"
        ),
    ).withColumn("pos", F.row_number().over(w).cast("bigint"))
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("del:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % DV_MOD
    )
    dv = pos.filter(draw == 0).select(
        F.col("source").alias("file_id"), F.col("pos").alias("dpos")
    )
    applied = pos.join(
        F.broadcast(dv),
        (F.col("source") == F.col("file_id")) & (F.col("pos") == F.col("dpos")),
        "left",
    ).select(
        "source",
        "bytes",
        F.when(F.col("dpos").isNull(), 0).otherwise(1).alias("deleted"),
    )
    return applied.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("deleted").cast("bigint").alias("n_deleted"),
        (F.count("*") - F.sum("deleted")).cast("bigint").alias("n_live"),
        F.sum(F.when(F.col("deleted") == 0, F.col("bytes")).otherwise(0))
        .cast("bigint")
        .alias("live_bytes"),
    )


# ------------------------------------------------- bandit replay (UCB)

UCB_SCALE = 1000  # reward fixed-point quantum


@register(
    "bandit_ucb_replay",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT event_type AS arm,
               epoch_us(ts) // 86400000000 AS day,
               CAST(FLOOR(value * {UCB_SCALE}) AS BIGINT) AS r
        FROM events
    ),
    daily AS (
        SELECT arm, day, CAST(COUNT(*) AS BIGINT) AS n, SUM(r) AS s
        FROM ev GROUP BY 1, 2
    ),
    grid AS (
        SELECT a.arm, d.day, COALESCE(x.n, 0) AS n, COALESCE(x.s, 0) AS s
        FROM (SELECT DISTINCT arm FROM ev) a
        CROSS JOIN (SELECT DISTINCT day FROM ev) d
        LEFT JOIN daily x ON x.arm = a.arm AND x.day = d.day
    ),
    cum AS (
        SELECT arm, day, n, s,
               SUM(n) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS n_prior,
               SUM(s) OVER (PARTITION BY arm ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS s_prior
        FROM grid
    ),
    tot AS (
        SELECT *, SUM(n_prior) OVER (PARTITION BY day) AS t_prior
        FROM cum
    ),
    scoredd AS (
        SELECT arm, day, n, s, n_prior, s_prior, t_prior,
               CASE WHEN n_prior IS NULL OR n_prior = 0
                    THEN 'infinity'::DOUBLE
                    ELSE (CAST(s_prior AS DOUBLE)
                          / CAST(n_prior AS DOUBLE)) / {UCB_SCALE}.0
                         + sqrt((2.0 * CAST(length(to_base(CAST(t_prior AS BIGINT), 2))
                                            - 1 AS DOUBLE))
                                / CAST(n_prior AS DOUBLE))
               END AS ucb
        FROM tot
    ),
    chosen AS (
        SELECT day, arm AS chosen_arm, n_prior, ucb, n AS n_today,
               CASE WHEN n > 0
                    THEN (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         / {UCB_SCALE}.0
                    ELSE CAST(0.0 AS DOUBLE) END AS realized_reward
        FROM scoredd
        QUALIFY row_number() OVER (
            PARTITION BY day ORDER BY ucb DESC, arm) = 1
    )
    SELECT day, chosen_arm,
           CAST(COALESCE(n_prior, 0) AS BIGINT) AS n_prior,
           CASE WHEN isinf(ucb) THEN NULL ELSE ucb END AS ucb,
           CAST(n_today AS BIGINT) AS n_today,
           realized_reward
    FROM chosen
    """,
)
def bandit_ucb_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFLINE BANDIT REPLAY, day-batched UCB1: treat event types as
    arms and per-event value as reward; each day the policy picks the
    arm maximizing mean + sqrt(2*floor(log2 t)/n_a) over the PRIOR
    days' statistics, and the day's actual mean reward of that arm is
    the replay payoff (the Li et al. 2011 offline evaluation shape,
    batched by day the way production re-trains). Arms with no prior
    pulls score +inf — forced exploration, ties broken by arm name.

    Cross-engine exact by integerization: rewards quantize per event
    (floor of a raw double), all cumulative statistics are INT64
    window sums, and the exploration bonus uses floor(log2 t)
    computed from the BINARY DIGIT COUNT of t (conv/to_base) — an
    integer — so log never touches libm; mean and bonus are then
    fixed chains of IEEE ops on exact integers. Emits the decision
    log (day, chosen arm, prior pulls, ucb, realized reward).

    Scale: one (arm, day) aggregate over the fact, then windows over
    an arms-x-days grid — bounded by the arm alphabet and calendar,
    independent of event count.

    Reference scope: beyond-reference extension (decisioning /
    experimentation family, next to zx_ab_test_stats and
    zx_ab_permutation_test)."""
    e = table(spark, sf_dir, "events")
    ev = e.select(
        F.col("event_type").alias("arm"),
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.floor(F.col("value") * UCB_SCALE).cast("bigint").alias("r"),
    )
    daily = ev.groupBy("arm", "day").agg(
        F.count("*").alias("n"), F.sum("r").alias("s")
    )
    arms = ev.select("arm").distinct()
    days = ev.select("day").distinct()
    grid = (
        arms.crossJoin(days)
        .join(daily, ["arm", "day"], "left")
        .select(
            "arm",
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("s", F.lit(0)).alias("s"),
        )
    )
    wprior = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "arm",
        "day",
        "n",
        "s",
        F.sum("n").over(wprior).alias("n_prior"),
        F.sum("s").over(wprior).alias("s_prior"),
    )
    tot = cum.withColumn(
        "t_prior", F.sum("n_prior").over(Window.partitionBy("day"))
    )
    log2t = (F.length(F.conv(F.col("t_prior"), 10, 2)) - 1).cast("double")
    ucb = F.when(
        F.col("n_prior").isNull() | (F.col("n_prior") == 0),
        F.lit(float("inf")),
    ).otherwise(
        (F.col("s_prior").cast("double") / F.col("n_prior").cast("double"))
        / float(UCB_SCALE)
        + F.sqrt(2.0 * log2t / F.col("n_prior").cast("double"))
    )
    scored = tot.withColumn("ucb", ucb)
    w = Window.partitionBy("day").orderBy(F.col("ucb").desc(), "arm")
    chosen = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "day",
            F.col("arm").alias("chosen_arm"),
            F.coalesce("n_prior", F.lit(0)).cast("bigint").alias("n_prior"),
            F.when(F.col("ucb") == float("inf"), F.lit(None)).otherwise(
                F.col("ucb")
            ).alias("ucb"),
            F.col("n").cast("bigint").alias("n_today"),
            F.when(
                F.col("n") > 0,
                (F.col("s").cast("double") / F.col("n").cast("double"))
                / float(UCB_SCALE),
            )
            .otherwise(F.lit(0.0))
            .alias("realized_reward"),
        )
    )
    return chosen


# ------------------------------------------------ heavy-change top-k

HC_TOPK = 20
HC_SPLIT_DAYS = 15  # first 15 days vs the rest


@register(
    "topk_heavy_change",
    extra=True,
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    lo AS (SELECT MIN(day) AS d0 FROM ev),
    halves AS (
        SELECT user_id, event_type,
               CASE WHEN day < lo.d0 + {HC_SPLIT_DAYS}
                    THEN 0 ELSE 1 END AS half
        FROM ev, lo
    ),
    counts AS (
        SELECT user_id, event_type,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_before,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_after
        FROM halves GROUP BY 1, 2
    )
    SELECT user_id, event_type, n_before, n_after,
           n_after - n_before AS delta
    FROM counts
    QUALIFY row_number() OVER (
        ORDER BY abs(n_after - n_before) DESC, user_id, event_type
    ) <= {HC_TOPK}
    """,
)
def topk_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAVY-CHANGE DETECTION (the Cormode/Muthukrishnan monitoring
    primitive): the (user, event_type) keys whose activity shifted
    most between the first 15 days and the rest of the window — the
    'what changed since last period' query every on-call dashboard
    runs. Exact here (one conditional aggregate, all integers); at
    100 TB the same query runs on two CountMin sketches
    (zx_heavy_hitters_cms' state) with the exact pass as its audit.

    Scale: one pass, one (user, type) hash aggregate with partial
    map-side combine, and a TOP-{HC_TOPK} TakeOrdered — the full
    delta table never sorts globally."""
    e = table(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    )
    d0 = ev.agg(F.min("day")).first()[0]
    half = (F.col("day") >= d0 + HC_SPLIT_DAYS).cast("int")
    counts = ev.withColumn("half", half).groupBy(
        "user_id", "event_type"
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_before"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_after"),
    )
    scored = counts.withColumn(
        "delta", F.col("n_after") - F.col("n_before")
    )
    # TakeOrdered, not a global window: per-partition top-K heaps +
    # a K-row driver merge — the 100 TB-safe global top-k shape
    return scored.orderBy(
        F.abs(F.col("delta")).desc(), "user_id", "event_type"
    ).limit(HC_TOPK)


# --------------------------------------------------- dataset card


@register(
    "llm_dataset_card",
    extra=True,
    oracle=r"""
    WITH d AS (
        SELECT doc_id, lang, source, text,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_toks,
               md5(text) AS h
        FROM documents WHERE len(trim(text)) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dups,
           CAST(MIN(n_toks) AS BIGINT) AS min_tokens,
           CAST(MAX(n_toks) AS BIGINT) AS max_tokens,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM d
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD in one pass — the corpus-level summary a training
    run records before touching the data (the 'Datasheets for
    Datasets' habit): doc/token/byte totals, language and source
    cardinalities, exact-duplicate count, token-length extremes. One
    aggregate over the documents table; every statistic is an integer
    so the card is cross-engine exact. The per-signal deep dives
    (quality, dup graph, domain mix) are this card's drill-downs —
    zx_text_quality, dedup_exact, zx_llm_domain_mix."""
    d = table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    rows = d.select(
        "lang",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
        F.md5("text").alias("h"),
        F.octet_length(F.encode("text", "utf-8")).alias("bytes"),
    )
    return rows.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        (F.count("*") - F.countDistinct("h"))
        .cast("bigint")
        .alias("n_exact_dups"),
        F.min("n_toks").cast("bigint").alias("min_tokens"),
        F.max("n_toks").cast("bigint").alias("max_tokens"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
    )


# ------------------------------------------------- Shapley attribution


SHAPLEY_ORACLE = """
WITH seq AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
           CASE WHEN epoch_us(ts)
                     - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id)
                     > 1800000000
                  OR LAG(epoch_us(ts)) OVER (
                         PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) IS NULL
                THEN 1 ELSE 0 END AS new_sess
    FROM events
), sess AS (
    SELECT *, SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM seq
), fp AS (
    SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
                  OVER (PARTITION BY user_id, sess_id) AS first_purch
    FROM sess
), journeys AS (
    SELECT user_id, sess_id,
           MAX(CASE WHEN first_purch IS NOT NULL THEN 1 ELSE 0 END)
               AS conv,
           MAX(CASE WHEN event_type = 'click'
                     AND (first_purch IS NULL OR ts_us < first_purch)
                    THEN 1 ELSE 0 END)
         + 2 * MAX(CASE WHEN event_type = 'view'
                     AND (first_purch IS NULL OR ts_us < first_purch)
                    THEN 1 ELSE 0 END)
         + 4 * MAX(CASE WHEN event_type = 'signup'
                     AND (first_purch IS NULL OR ts_us < first_purch)
                    THEN 1 ELSE 0 END) AS mask
    FROM fp GROUP BY user_id, sess_id
), mask_conv AS (
    SELECT mask, COUNT(*) AS n_conv FROM journeys
    WHERE conv = 1 GROUP BY mask
), coalitions AS (
    SELECT CAST(s AS BIGINT) AS s FROM range(8) t(s)
), v AS (
    SELECT c.s, COALESCE(SUM(m.n_conv), 0) AS v
    FROM coalitions c
    LEFT JOIN mask_conv m ON (m.mask & xor(CAST(7 AS BIGINT), c.s)) = 0
    GROUP BY c.s
), channels(channel, bit) AS (
    VALUES ('click', 1), ('view', 2), ('signup', 4)
), terms AS (
    SELECT ch.channel,
           CASE WHEN c.s IN (1, 2, 4) THEN 1 ELSE 2 END
               * (vi.v - vs.v) AS term
    FROM channels ch
    JOIN coalitions c ON (c.s & ch.bit) = 0
    JOIN v vs ON vs.s = c.s
    JOIN v vi ON vi.s = (c.s | ch.bit)
)
SELECT channel, CAST(SUM(term) AS BIGINT) AS shapley_x6,
       ROUND(CAST(SUM(term) AS DOUBLE) / 6.0, 6) AS shapley_conversions
FROM terms GROUP BY channel
"""


@register("attribution_shapley", extra=True, oracle=SHAPLEY_ORACLE)
def attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE multi-touch attribution — the third leg of the
    attribution triad (heuristic last-touch, Markov removal effects,
    game-theoretic Shapley; cf. Zhao et al. 2018). Journey = 30-min
    session; a session's coalition is the SET of channels (click /
    view / signup) touched strictly before its first purchase; the
    characteristic function v(S) = converted sessions whose coalition
    is contained in S. With a 3-channel alphabet the coalition
    lattice has 8 nodes, so the Shapley sum is EXACT and closed-form:
    phi_i = sum over S not containing i of |S|!(n-1-|S|)!/n! *
    (v(S+i) - v(S)), emitted scaled by n! = 6 so every value is an
    integer (cross-engine exact by construction; the rounded
    /6 share is derived from the integer, not accumulated).

    Scale: ONE user-key shuffle for sessionization (the same axis
    every per-user operator here shuffles on), a (user, sess) hash
    aggregate down to 8 mask rows, then the entire lattice algebra
    runs on 8x8 broadcast-nested-loop joins of single-digit-row
    frames — corpus size never touches the Shapley combinatorics.
    Efficiency check built in: sum(shapley_x6) = 6 * (v(N) - v(0))."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = ev.withColumn("prev_ts", F.lag("ts_us").over(w)).withColumn(
        "new_sess",
        (
            F.col("prev_ts").isNull()
            | (F.col("ts_us") - F.col("prev_ts") > SESSION_GAP_US)
        ).cast("int"),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    fp = sess.withColumn(
        "first_purch",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).over(Window.partitionBy("user_id", "sess_id")),
    )
    pre = F.col("first_purch").isNull() | (
        F.col("ts_us") < F.col("first_purch")
    )

    def _touch(t: str) -> F.Column:
        return F.max(
            ((F.col("event_type") == t) & pre).cast("int")
        )

    journeys = fp.groupBy("user_id", "sess_id").agg(
        F.max(F.col("first_purch").isNotNull().cast("int")).alias("conv"),
        (
            _touch("click") + _touch("view") * 2 + _touch("signup") * 4
        ).alias("mask"),
    )
    mask_conv = (
        journeys.filter(F.col("conv") == 1)
        .groupBy("mask")
        .agg(F.count("*").alias("n_conv"))
    )
    coalitions = spark.range(8).select(F.col("id").alias("s"))
    v = (
        coalitions.join(
            mask_conv,
            (
                F.col("mask").bitwiseAND(
                    F.lit(7).cast("bigint").bitwiseXOR(F.col("s"))
                )
                == 0
            ),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).alias("v"))
    )
    channels = spark.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4)], "channel string, bit long"
    )
    weight = F.when(F.col("s").isin(1, 2, 4), 1).otherwise(2)
    terms = (
        channels.join(
            coalitions, F.col("s").bitwiseAND(F.col("bit")) == 0
        )
        .join(v.withColumnRenamed("v", "v_s"), "s")
        .join(
            v.selectExpr("s AS s_i", "v AS v_i"),
            F.col("s_i") == F.col("s").bitwiseOR(F.col("bit")),
        )
        .select(
            "channel",
            (weight * (F.col("v_i") - F.col("v_s"))).alias("term"),
        )
    )
    return terms.groupBy("channel").agg(
        F.sum("term").cast("bigint").alias("shapley_x6"),
        F.round(F.sum("term").cast("double") / 6.0, 6).alias(
            "shapley_conversions"
        ),
    )


# --------------------------------------------- Bradley–Terry fitting


BT_ITERS = 30


def bt_mm_fit(
    mat: list[list[float]], wins: list[float], iters: int = BT_ITERS
) -> list[float]:
    """Bradley–Terry strengths by Hunter's MM algorithm, written as
    the EXACT op sequence the DuckDB recursive-CTE twin replays:
    theta_i <- W_i / fold_j[(n_ij + n_ji) / (theta_i + theta_j)],
    then normalize by the left-fold sum. Every fold runs j = 1..k in
    list order with an explicit 0.0 term at j = i (adding 0.0 is an
    exact IEEE no-op, kept so the two transcripts are identical)."""
    k = len(wins)
    th = [1.0] * k
    for _ in range(iters):
        new = []
        for i in range(k):
            terms = [
                0.0 if j == i else (mat[i][j] + mat[j][i]) / (th[i] + th[j])
                for j in range(k)
            ]
            acc = terms[0]
            for t in terms[1:]:
                acc = acc + t
            new.append(wins[i] / acc)
        s = new[0]
        for x in new[1:]:
            s = s + x
        th = [x / s for x in new]
    return th


BT_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           event_type, COUNT(*) AS c
    FROM events GROUP BY 1, 2, 3
), comp AS (
    SELECT a.event_type AS wi, b.event_type AS li, COUNT(*) AS n
    FROM daily a JOIN daily b
      ON a.user_id = b.user_id AND a.d = b.d
     AND a.event_type <> b.event_type AND a.c > b.c
    GROUP BY 1, 2
), items AS (
    -- items = types seen in >=1 comparison (matches the engine side;
    -- a never-compared type has no MM update and would 0/0 the fold)
    SELECT event_type,
           ROW_NUMBER() OVER (ORDER BY event_type) AS idx
    FROM (SELECT wi AS event_type FROM comp
          UNION SELECT li FROM comp)
), grid AS (
    SELECT wi.idx AS i, li.idx AS j, COALESCE(MAX(c.n), 0) AS n
    FROM items wi CROSS JOIN items li
    LEFT JOIN comp c
      ON c.wi = wi.event_type AND c.li = li.event_type
    WHERE wi.idx <> li.idx
    GROUP BY 1, 2
), matrows AS (
    SELECT i, list(CAST(n AS DOUBLE) ORDER BY j) AS r,
           SUM(n) AS wins
    FROM (
        SELECT i, j, n FROM grid
        UNION ALL
        SELECT idx AS i, idx AS j, 0 AS n FROM items
    ) GROUP BY i
), mat AS (
    SELECT list(r ORDER BY i) AS M,
           list(CAST(wins AS DOUBLE) ORDER BY i) AS W,
           CAST(len(list(r)) AS BIGINT) AS k
    FROM matrows
), it AS (
    SELECT 0 AS t, M, W, k,
           list_transform(range(1, k + 1),
                          x -> CAST(1.0 AS DOUBLE)) AS th
    FROM mat
    UNION ALL
    SELECT t + 1, M, W, k,
           (SELECT list_transform(u.v, x -> x / list_reduce(
                       u.v, (a, b) -> a + b))
            FROM (SELECT list_transform(range(1, it.k + 1), i ->
                      it.W[i] / list_reduce(
                          list_transform(range(1, it.k + 1), j ->
                              CASE WHEN j = i THEN CAST(0.0 AS DOUBLE)
                                   ELSE (it.M[i][j] + it.M[j][i])
                                        / (it.th[i] + it.th[j]) END),
                          (a, b) -> a + b)) AS v) u)
    FROM it WHERE t < {BT_ITERS}
), fin AS (
    SELECT th FROM it WHERE t = {BT_ITERS}
), peritem AS (
    SELECT i AS idx, SUM(n) AS wins FROM grid GROUP BY i
), losses AS (
    SELECT j AS idx, SUM(n) AS losses FROM grid GROUP BY j
)
SELECT it2.event_type AS item,
       ROUND(f.th[it2.idx], 6) AS bt_strength,
       CAST(p.wins AS BIGINT) AS wins,
       CAST(p.wins + l.losses AS BIGINT) AS comparisons
FROM fin f, items it2
JOIN peritem p ON p.idx = it2.idx
JOIN losses l ON l.idx = it2.idx
"""


@register("bt_preference_fit", extra=True, oracle=BT_ORACLE)
def bt_preference_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRADLEY–TERRY preference fitting by Hunter's (2004) MM
    algorithm — the model behind pairwise-preference data work
    (reward-model datasets, model-vs-model ELO tables, ranker evals).
    Comparisons derive deterministically from the event stream: for
    each (user, day) context, event type i "beats" j when i logged
    strictly more events; the fit turns the win matrix into latent
    strengths theta with P(i beats j) = theta_i / (theta_i+theta_j).

    The canonical distributed-count / driver-solve split (the
    attribution_markov posture): the fact folds ONCE into (user, day,
    type) counts, comparisons join on the bounded daily summary, and
    the k x k win matrix (k = |alphabet|, here 5) collects to the
    driver where 30 MM iterations run in milliseconds — corpus size
    never enters the iteration. Oracle-paired: the MM fixpoint is
    pure rational arithmetic in a written-down fold order, so one
    recursive CTE carrying (M, W, theta) replays it bit-for-bit.

    Sanity property pinned by test: strengths are a probability
    vector (normalized each round) and the strength order matches
    the win-rate order on a constructed corpus."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("d"),
            "event_type",
        )
        .groupBy("user_id", "d", "event_type")
        .agg(F.count("*").alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    comp = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.c") > F.col("b.c")),
        )
        .groupBy(
            F.col("a.event_type").alias("wi"),
            F.col("b.event_type").alias("li"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    items = sorted({r.wi for r in comp} | {r.li for r in comp})
    pos = {t: i for i, t in enumerate(items)}
    k = len(items)
    mat = [[0.0] * k for _ in range(k)]
    for r in comp:
        mat[pos[r.wi]][pos[r.li]] = float(r.n)
    wins = [float(sum(row)) for row in mat]
    losses = [float(sum(mat[i][j] for i in range(k))) for j in range(k)]
    if k == 0:
        # no comparisons at all (single event type, or every (user,
        # day) count tied): the oracle's comp CTE is empty and it
        # returns zero rows — mirror that instead of 0/0-ing the fold
        return spark.createDataFrame(
            [],
            "item string, bt_strength double, wins bigint,"
            " comparisons bigint",
        )
    th = bt_mm_fit(mat, wins)
    rows = [
        (
            items[i],
            round(th[i], 6),
            int(wins[i]),
            int(wins[i] + losses[i]),
        )
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows,
        "item string, bt_strength double, wins bigint, comparisons bigint",
    )


# ------------------------------------------------- bot regularity


BOT_CV2_MAX = 0.2  # cv^2 below this => metronomic => automaton
BOT_MIN_EVENTS = 20


BOT_ORACLE = f"""
WITH seq AS (
    SELECT user_id,
           (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap
    FROM events
), stats AS (
    SELECT user_id,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS s1,
           CAST(SUM(gap * gap) AS BIGINT) AS s2
    FROM seq WHERE gap IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(gap) >= {BOT_MIN_EVENTS - 1} AND SUM(gap) > 0
)
SELECT user_id, n_gaps,
       ROUND(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
             / CAST(s1 * s1 AS DOUBLE), 6) AS cv2,
       CAST(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
            / CAST(s1 * s1 AS DOUBLE) < {BOT_CV2_MAX} AS INT)
           AS is_bot_like
FROM stats
"""


@register("bot_regularity", extra=True, oracle=BOT_ORACLE)
def bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT / AUTOMATION detection by inter-arrival REGULARITY — the
    curation filter upstream of every engagement metric: human
    activity is bursty (squared coefficient of variation of gaps
    >= 1 for a Poisson process), cron-driven automation is metronomic
    (cv^2 near 0). Flag users whose gap cv^2 falls below 0.2.

    The statistic dodges the entropy formulation's libm dependence:
    cv^2 = (n*sum(g^2) - sum(g)^2) / sum(g)^2 accumulates EXACT
    INTEGERS (gaps floor-quantized to whole seconds — second-level
    regularity is the signal; us jitter is noise) and performs ONE
    IEEE division at the end. int64 headroom: second-quantized gaps
    cap n*s2 around 1e14 on this corpus, four orders under the
    mantissa-exact zone; at 100 TB shard the window by (user, week)
    before headroom matters.

    Scale: one user-key window (the family's shared shuffle axis) +
    one aggregate. The flag threshold is a named constant a fraud
    pipeline would sweep."""
    e = table(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    ).select(
        "user_id",
        F.expr(
            "(ts_us - lag(ts_us) OVER (PARTITION BY user_id "
            "ORDER BY ts_us, event_id)) div 1000000"
        ).alias("gap"),
    )
    stats = (
        seq.filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("s1"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("s2"),
        )
        .filter(
            (F.col("n_gaps") >= BOT_MIN_EVENTS - 1) & (F.col("s1") > 0)
        )
    )
    cv2 = (
        (F.col("n_gaps") * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (F.col("s1") * F.col("s1")).cast("double")
    )
    return stats.select(
        "user_id",
        "n_gaps",
        F.round(cv2, 6).alias("cv2"),
        (cv2 < BOT_CV2_MAX).cast("int").alias("is_bot_like"),
    )


# ---------------------------------------------- V-optimal histogram


VOPT_K = 8


def vopt_dp(vals: list[int], k: int = VOPT_K):
    """V-optimal histogram DP (Jagadish et al. 1998) in the EXACT op
    order the recursive-CTE twin replays: seg_sse from integer prefix
    sums with ONE double division; dp[b][j] = min over i of
    dp[b-1][i-1] + sse(i,j), ascending i, strict < so ties keep the
    SMALLEST split. Returns (buckets, total_sse): buckets as
    (b, day_start, day_end, n_days, sum_count, sse)."""
    n = len(vals)
    if n == 0:
        return [], 0.0
    # fewer points than buckets: degrade to k = n singleton buckets
    # (the walk-back below reads choices[b-1][j] == 0 otherwise and
    # emits day_start = -1 nonsense); mirrored in the oracle's
    # LEAST({VOPT_K}, n) recursion bound
    k = min(k, n)
    p1 = [0] * (n + 1)
    p2 = [0] * (n + 1)
    for i, v in enumerate(vals, 1):
        p1[i] = p1[i - 1] + v
        p2[i] = p2[i - 1] + v * v

    def sse(i: int, j: int) -> float:
        s1 = float(p1[j] - p1[i - 1])
        s2 = float(p2[j] - p2[i - 1])
        return s2 - s1 * s1 / float(j - i + 1)

    inf = float("inf")
    dp_prev = [sse(1, j) for j in range(1, n + 1)]
    choices = [[0] * (n + 1)]  # b=1: no split
    for b in range(2, k + 1):
        dp_cur, ch = [], [0] * (n + 1)
        for j in range(1, n + 1):
            if j < b:
                dp_cur.append(inf)
                continue
            best, arg = inf, 0
            for i in range(b, j + 1):
                c = dp_prev[i - 2] + sse(i, j)
                if c < best:
                    best, arg = c, i
            dp_cur.append(best)
            ch[j] = arg
        choices.append(ch)
        dp_prev = dp_cur
    total = dp_prev[n - 1]
    # walk back: bucket k covers [choice..n], etc.
    out = []
    j = n
    for b in range(k, 0, -1):
        i = choices[b - 1][j] if b > 1 else 1
        out.append(
            (
                b,
                i - 1,  # 0-based day index
                j - 1,
                j - i + 1,
                p1[j] - p1[i - 1],
                sse(i, j),
            )
        )
        j = i - 1
    return sorted(out), total


VOPT_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
           - (SELECT MIN(CAST(epoch_us(ts) // 86400000000 AS BIGINT))
              FROM events) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1
), base AS (
    SELECT list(c ORDER BY d) AS vals,
           CAST(len(list(c)) AS BIGINT) AS n
    FROM daily
), pre AS (
    SELECT n,
           list_transform(range(0, n + 1), j ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, n + 1),
                       i -> CASE WHEN i <= j THEN vals[i]
                            ELSE CAST(0 AS BIGINT) END)),
                   (a, b) -> a + b)) AS p1,
           list_transform(range(0, n + 1), j ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, n + 1),
                       i -> CASE WHEN i <= j THEN vals[i] * vals[i]
                            ELSE CAST(0 AS BIGINT) END)),
                   (a, b) -> a + b)) AS p2
    FROM base
), it AS (
    SELECT 1 AS b, n, p1, p2,
           list_transform(range(1, n + 1), j ->
               CAST(p2[j + 1] AS DOUBLE)
               - CAST(p1[j + 1] AS DOUBLE) * CAST(p1[j + 1] AS DOUBLE)
                 / CAST(j AS DOUBLE)) AS dp,
           list_transform(range(1, n + 1),
                          j -> CAST(0 AS BIGINT)) AS choices
    FROM pre
    UNION ALL
    SELECT b + 1, n, p1, p2,
           list_transform(range(1, n + 1), j ->
               CASE WHEN j < b + 1 THEN CAST('Infinity' AS DOUBLE)
               ELSE list_min(list_transform(range(b + 1, j + 1), i ->
                   dp[i - 1]
                   + (CAST(p2[j + 1] - p2[i] AS DOUBLE)
                      - CAST(p1[j + 1] - p1[i] AS DOUBLE)
                        * CAST(p1[j + 1] - p1[i] AS DOUBLE)
                        / CAST(j - i + 1 AS DOUBLE))))
               END) AS dp,
           choices || list_transform(range(1, n + 1), j ->
               CASE WHEN j < b + 1 THEN CAST(0 AS BIGINT)
               ELSE CAST(b + list_position(
                   list_transform(range(b + 1, j + 1), i ->
                       dp[i - 1]
                       + (CAST(p2[j + 1] - p2[i] AS DOUBLE)
                          - CAST(p1[j + 1] - p1[i] AS DOUBLE)
                            * CAST(p1[j + 1] - p1[i] AS DOUBLE)
                            / CAST(j - i + 1 AS DOUBLE))),
                   list_min(list_transform(range(b + 1, j + 1), i ->
                       dp[i - 1]
                       + (CAST(p2[j + 1] - p2[i] AS DOUBLE)
                          - CAST(p1[j + 1] - p1[i] AS DOUBLE)
                            * CAST(p1[j + 1] - p1[i] AS DOUBLE)
                            / CAST(j - i + 1 AS DOUBLE))))) AS BIGINT)
               END)
    FROM it WHERE b < LEAST({VOPT_K}, n)
), fin AS (
    SELECT n, p1, p2, choices FROM it WHERE b = LEAST({VOPT_K}, n)
), back AS (
    SELECT CAST(LEAST({VOPT_K}, f.n) AS BIGINT) AS b, f.n AS j, f.n,
           f.p1, f.p2, f.choices
    FROM fin f
    UNION ALL
    SELECT b - 1,
           choices[(b - 1) * n + j] - 1,
           n, p1, p2, choices
    FROM back WHERE b > 1
)
SELECT CAST(bk.b AS BIGINT) AS bucket,
       CAST(i0 - 1 AS BIGINT) AS day_start,
       CAST(bk.j - 1 AS BIGINT) AS day_end,
       CAST(bk.j - i0 + 1 AS BIGINT) AS n_days,
       CAST(p1[bk.j + 1] - p1[i0] AS BIGINT) AS sum_count,
       ROUND(CAST(p2[bk.j + 1] - p2[i0] AS DOUBLE)
             - CAST(p1[bk.j + 1] - p1[i0] AS DOUBLE)
               * CAST(p1[bk.j + 1] - p1[i0] AS DOUBLE)
               / CAST(bk.j - i0 + 1 AS DOUBLE), 6) AS sse
FROM (
    SELECT b, j, n, p1, p2,
           CASE WHEN b > 1 THEN choices[(b - 1) * n + j] ELSE 1 END AS i0
    FROM back
) bk
"""


@register("vopt_histogram", extra=True, oracle=VOPT_ORACLE)
def vopt_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-OPTIMAL HISTOGRAM construction (Jagadish et al., VLDB 1998)
    — the statistics structure a cost-based optimizer keeps per
    column: partition the daily-count series into K=8 buckets
    minimizing total within-bucket variance (SSE), via the classic
    O(n^2 k) dynamic program. Equi-width histograms mislead the
    planner on skewed data; V-optimal is the canonical fix, and this
    operator IS the engine-stats story next to zx_profile_histogram's
    equi-width read.

    The canonical distributed-fold / driver-solve split: the fact
    folds once into calendar-bounded daily counts (the only corpus-
    sized work), the DP runs on the ~60-point summary. Oracle-paired
    through the recursive-CTE-replay technique: integer prefix sums,
    one double division per segment SSE, ascending-i strict-< argmin
    (ties keep the smallest split), the DP matrix and choice lists
    carried IN the recursion state, and a second walk-back recursion
    recovers the bucket boundaries."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("c"))
        .orderBy("d")
        .collect()
    )
    vals = [int(r.c) for r in daily]
    buckets, _total = vopt_dp(vals, VOPT_K)
    rows = [
        (b, ds, de, nd, sc, round(s, 6))
        for b, ds, de, nd, sc, s in buckets
    ]
    return spark.createDataFrame(
        rows,
        "bucket bigint, day_start bigint, day_end bigint, "
        "n_days bigint, sum_count bigint, sse double",
    )


# ------------------------------------------------- decayed top-k


DECAY_SHIFT = 40  # weight(age_days) = 2^(40 - age); 0 past 40 days
DECAYED_TOPK = 10


DECAYED_ORACLE = f"""
WITH anchor AS (
    SELECT MAX(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS d_max
    FROM events
), w AS (
    SELECT user_id, event_type,
           {DECAY_SHIFT} - (a.d_max
               - CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS pw
    FROM events, anchor a
), scored AS (
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pw >= 0
                         THEN CAST(1 AS BIGINT) << pw
                         ELSE 0 END) AS BIGINT) AS decayed_x2p40
    FROM w GROUP BY 1, 2
)
SELECT user_id, event_type, n_events, decayed_x2p40,
       ROUND(CAST(decayed_x2p40 AS DOUBLE) / 1099511627776.0, 6)
           AS decayed_count
FROM scored
ORDER BY decayed_x2p40 DESC, user_id, event_type
LIMIT {DECAYED_TOPK}
"""


@register("decayed_topk", extra=True, oracle=DECAYED_ORACLE)
def decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAYED top-k activity — the freshness-weighted leaderboard
    every "trending now" surface runs (exponentially decayed counters,
    the streaming-sketch standard per Cormode et al.): each event
    contributes 2^-age_days, so yesterday's flood outranks last
    month's.

    The float formulation (sum of exp(-lambda*age)) is BOTH a libm
    dependence and an order trap. With a half-life of exactly one day
    the weights are DYADIC: 2^(40-age) in integer 2^-40 units — a
    bigint SHIFT, summed exactly in any order, zero past the 40-day
    horizon (a 2^-40 tail is below any ranking's resolution anyway).
    The readable double column derives from the integer by one
    division.

    Scale: one (user, type) hash aggregate with map-side combine +
    TakeOrdered(k) — no global sort; the decay anchor (max day) is a
    1-row aggregate broadcast back. The same shift trick is how the
    streaming variant would fold state: counters age by a right-shift
    per elapsed day, which is why decayed counters mergeable-sketch
    so well."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        "event_type",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
        .cast("bigint")
        .alias("d"),
    )
    anchor = days.agg(F.max("d").alias("d_max"))
    w = days.join(F.broadcast(anchor)).select(
        "user_id",
        "event_type",
        (F.lit(DECAY_SHIFT) - (F.col("d_max") - F.col("d"))).alias("pw"),
    )
    scored = w.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(
            F.when(
                F.col("pw") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pw AS INT))"),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("decayed_x2p40"),
    )
    return (
        scored.select(
            "user_id",
            "event_type",
            "n_events",
            "decayed_x2p40",
            F.round(
                F.col("decayed_x2p40").cast("double") / float(1 << 40), 6
            ).alias("decayed_count"),
        )
        .orderBy(
            F.col("decayed_x2p40").desc(), "user_id", "event_type"
        )
        .limit(DECAYED_TOPK)
    )
