"""Time-series similarity — SURVEY.md §2.F X8 (pattern per 'Time
Series Similarity Search for Streaming Data in Distributed Systems',
EDBT 2019 — PAPERS.md).

Pipeline: per-user daily averages -> per-user z-normalization (window
aggregates) -> pairwise z-normalized Euclidean distance via a join on
the day axis. Everything is expressible with built-in aggregates, so
unlike the survey's initial rows-only plan this op is fully
oracle-checked.

Scale: the day-aligned join shuffles on the day key; the anchor side
is a deterministic user sample (at 100 TB: the query set). Distances
accumulate per pair — partial aggregation applies. A pandas-UDF DTW
kernel can slot into the same pair frame when warping is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

ANCHOR_MOD = 5  # user_id % 5 == 0 -> anchor (query) series
MIN_OVERLAP = 10  # days both series must share


DTW_CANDIDATES = 10  # cheap-distance survivors per anchor that get warped


_DTW_ORACLE = f"""
    WITH RECURSIVE daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               SUM(value) / COUNT(*) AS v
        FROM events GROUP BY 1, 2
    ),
    z AS (
        SELECT user_id, day,
               (v - AVG(v) OVER (PARTITION BY user_id))
               / stddev_samp(v) OVER (PARTITION BY user_id) AS zv
        FROM daily
    ),
    cheap AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               COUNT(*) AS n_common_days,
               ROUND(sqrt(SUM((a.zv - b.zv) * (a.zv - b.zv)) / COUNT(*)),
                     6) AS znorm_dist
        FROM z a JOIN z b ON a.day = b.day AND a.user_id < b.user_id
        WHERE a.user_id % {ANCHOR_MOD} = 0
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MIN_OVERLAP}
    ),
    cand AS (
        SELECT user_a, user_b, znorm_dist
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_a
                  ORDER BY znorm_dist, user_b) AS rn FROM cheap)
        WHERE rn <= {DTW_CANDIDATES}
    ),
    series AS (
        SELECT user_id, list(v ORDER BY day) AS s
        FROM daily GROUP BY user_id
    ),
    p AS (
        SELECT c.user_a, c.user_b, c.znorm_dist,
               sa.s AS av, sb.s AS bv, len(sa.s) AS n, len(sb.s) AS m
        FROM cand c
        JOIN series sa ON c.user_a = sa.user_id
        JOIN series sb ON c.user_b = sb.user_id
    ),
    -- DTW DP replayed over ANTI-DIAGONALS: every cell of diagonal k
    -- depends only on diagonals k-1 (up/left) and k-2 (diag), so one
    -- recursion step advances every pair one diagonal. Diagonals are
    -- fixed-length-n lists indexed by i+1 (cell (i, k-i)), inf
    -- outside the valid range — identical d + min(up,left,diag)
    -- float64 recurrence, identical op order as the numpy kernel.
    dp AS (
        SELECT user_a, user_b, znorm_dist, av, bv, n, m, 0 AS k,
               list_transform(range(1, n + 1), ii ->
                   CASE WHEN ii = 1 THEN abs(av[1] - bv[1])
                        ELSE 'infinity'::DOUBLE END) AS cur,
               list_transform(range(1, n + 1),
                              ii -> 'infinity'::DOUBLE) AS prv
        FROM p
        UNION ALL
        SELECT user_a, user_b, znorm_dist, av, bv, n, m, k + 1,
               list_transform(range(1, n + 1), ii ->
                   CASE WHEN ii - 1 BETWEEN greatest(0, k + 1 - m + 1)
                                        AND least(n - 1, k + 1)
                        THEN abs(av[ii] - bv[k + 1 - (ii - 1) + 1])
                             + least(
                                 coalesce(cur[ii - 1],
                                          'infinity'::DOUBLE),
                                 coalesce(cur[ii], 'infinity'::DOUBLE),
                                 coalesce(prv[ii - 1],
                                          'infinity'::DOUBLE))
                        ELSE 'infinity'::DOUBLE END),
               cur
        FROM dp WHERE k < n + m - 2
    )
    SELECT user_a, user_b, znorm_dist, ROUND(cur[n], 6) AS dtw_dist
    FROM dp WHERE k = n + m - 2
    """


@register("ts_similarity_dtw", extra=True, oracle=_DTW_ORACLE)
def ts_similarity_dtw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (warping variant) — DTW between per-user daily series, with
    the production two-phase shape: the cheap declarative z-norm
    distance (ts_similarity) prunes to the top-K candidates per
    anchor, and ONLY survivors pay the O(n·m) Python warping kernel
    (the LB-prune-then-warp pattern of the time-series literature).
    The Python stage therefore runs anchors·K pairs, not anchors·N —
    at 100 TB the kernel cost is governed by K, never corpus size.

    Oracle-paired (was rows-only): the DP is pure abs/+/min float64 —
    no transcendentals, no order-dependent reductions — so a DuckDB
    recursive CTE sweeping ANTI-DIAGONALS (cells of diagonal k depend
    only on k-1 and k-2; all cells of one diagonal are independent)
    replays the numpy kernel bit-for-bit."""
    from eventstream_notify_spark.functions.udfs import dtw_distance

    # The daily aggregation appears in BOTH the cheap prune and the
    # kernel's series. Measured: letting Catalyst recompute it (two
    # fused codegen scans) beats materializing it once via
    # localCheckpoint by ~20% here — the eager job + RDD-scan boundary
    # costs more than the duplicated in-memory agg. At 100 TB the
    # trade flips (scan dominance), and this is the line to persist.
    daily = _daily(spark, sf_dir)
    cheap = _znorm_pairs(daily)
    w = Window.partitionBy("user_a").orderBy(
        F.col("znorm_dist"), F.col("user_b")
    )
    cand = (
        cheap.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= DTW_CANDIDATES)
        .select("user_a", "user_b", "znorm_dist")
    )

    series = (
        daily.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("day", "v"))).alias("pts"))
        .select(
            "user_id", F.transform("pts", lambda p: p["v"]).alias("series")
        )
    )
    sa = series.alias("sa")
    sb = series.alias("sb")
    pairs = (
        cand.join(sa, F.col("user_a") == F.col("sa.user_id"))
        .join(sb, F.col("user_b") == F.col("sb.user_id"))
        .select(
            "user_a",
            "user_b",
            "znorm_dist",
            F.col("sa.series").alias("series_a"),
            F.col("sb.series").alias("series_b"),
        )
    )
    return pairs.select(
        "user_a",
        "user_b",
        "znorm_dist",
        F.round(dtw_distance("series_a", "series_b"), 6).alias("dtw_dist"),
    )


@register(
    "ts_similarity",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               SUM(value) / COUNT(*) AS v
        FROM events
        GROUP BY 1, 2
    ),
    z AS (
        SELECT user_id, day,
               (v - AVG(v) OVER (PARTITION BY user_id))
               / stddev_samp(v) OVER (PARTITION BY user_id) AS zv
        FROM daily
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_common_days,
           ROUND(sqrt(SUM((a.zv - b.zv) * (a.zv - b.zv)) / COUNT(*)), 6)
               AS znorm_dist
    FROM z a
    JOIN z b ON a.day = b.day AND a.user_id < b.user_id
    WHERE a.user_id % {ANCHOR_MOD} = 0
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MIN_OVERLAP}
    """,
)
def ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — z-normalized Euclidean distance between per-user daily
    event-value series (anchored sample vs all users)."""
    return _znorm_pairs(_daily(spark, sf_dir))


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily mean value — the shared input of the cheap
    z-norm distance and the DTW kernel's series."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg((F.sum("value") / F.count("*")).alias("v"))


def _znorm_pairs(daily: DataFrame) -> DataFrame:
    uw = Window.partitionBy("user_id")
    z = daily.select(
        "user_id",
        "day",
        ((F.col("v") - F.avg("v").over(uw)) / F.stddev_samp("v").over(uw)).alias("zv"),
    )
    a = z.alias("a")
    b = z.alias("b")
    diff = F.col("a.zv") - F.col("b.zv")
    return (
        a.filter(F.col("a.user_id") % ANCHOR_MOD == 0)
        .join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(
            F.count("*").alias("n_common_days"),
            F.round(F.sqrt(F.sum(diff * diff) / F.count("*")), 6).alias("znorm_dist"),
        )
        .filter(F.col("n_common_days") >= MIN_OVERLAP)
    )


# shared by the batch operator below AND its streaming twin
# (streaming/pipeline.py zx_stream_ewma) — both must hash-match it
EWMA_ORACLE = """
    WITH v AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS v_int
        FROM events
    ),
    wl AS (
        SELECT user_id, event_id, ts_us,
               list(v_int) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
        FROM v
    )
    SELECT user_id, event_id, ts_us,
           (CAST(list_sum(list_transform(range(1, len(vals) + 1),
                i -> vals[i] * CAST(POW(2, len(vals) - i) AS BIGINT)))
                 AS DOUBLE)
            / CAST(CAST(POW(2, len(vals)) AS BIGINT) - 1 AS DOUBLE))
           / 1e6 AS ewma
    FROM wl
    """


@register("ts_ewma", extra=True, oracle=EWMA_ORACLE)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event
    values (alpha = 1/2, 20-row lookback) — the standard smoothing
    pass before thresholding a noisy metric stream.

    EWMA is the textbook float-parity trap (a recursive float fold
    whose rounding depends on evaluation order), so the kernel is
    EXACT INTEGER arithmetic end to end: values quantize to
    micro-units, the weights are powers of two (alpha = 1/2 makes
    (1-alpha)^k = 2^-k exact), and the weighted sum is a bigint fold
    over the 20-element window list — max |num| < 2^53, so the two
    final IEEE divisions are bit-identical across engines. Scale:
    one window over (user, time) — the same partition every other
    per-user op shuffles on; 20-element frames keep state O(1)."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("v_int"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-19, 0)
    )
    df = v.withColumn("vals", F.collect_list("v_int").over(w))
    num = F.expr(
        "aggregate(zip_with(vals, sequence(1, size(vals)),"
        " (v, i) -> v * cast(pow(2, size(vals) - i) as bigint)),"
        " 0L, (a, x) -> a + x)"
    )
    den = F.expr("cast(pow(2, size(vals)) as bigint) - 1")
    return df.select(
        "user_id",
        "event_id",
        "ts_us",
        ((num.cast("double") / den.cast("double")) / F.lit(1e6)).alias(
            "ewma"
        ),
    )

AR1_SCALE = 1000  # fixed-point quantum for the regression moments
AR1_MIN_DAYS = 10  # minimum (prev, cur) pairs to fit a user


@register(
    "ts_ar1_forecast",
    extra=True,
    oracle=f"""
    WITH daily AS (
        -- quantize each EVENT value first (floor of a raw double is
        -- deterministic), then integer-divide the exact sums: a floor
        -- over a summed double would be partition-order sensitive
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               SUM(CAST(FLOOR(value * {AR1_SCALE}) AS BIGINT))
                   // COUNT(*) AS q
        FROM events GROUP BY 1, 2
    ),
    lagd AS (
        SELECT user_id, day, q,
               LAG(q) OVER (PARTITION BY user_id ORDER BY day) AS pq
        FROM daily
    ),
    mom AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(pq) AS sx, SUM(q) AS sy,
               SUM(pq * pq) AS sxx, SUM(pq * q) AS sxy,
               (list(q ORDER BY day))[-1] AS last_q
        FROM lagd WHERE pq IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(*) >= {AR1_MIN_DAYS}
           AND n * sxx - sx * sx != 0
    ),
    fit AS (
        SELECT user_id, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS phi,
               CAST(last_q AS DOUBLE) AS lq,
               CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
               CAST(n AS DOUBLE) AS nd
        FROM mom
    ),
    fc AS (
        SELECT user_id, n, phi,
               (syd - phi * sxd) / nd AS c,
               c + phi * lq AS f1,
               c + phi * (c + phi * lq) AS f2,
               c + phi * (c + phi * (c + phi * lq)) AS f3
        FROM fit
    )
    SELECT user_id, n AS n_pairs, phi,
           c / {AR1_SCALE}.0 AS intercept,
           f1 / {AR1_SCALE}.0 AS forecast_1,
           f2 / {AR1_SCALE}.0 AS forecast_2,
           f3 / {AR1_SCALE}.0 AS forecast_3
    FROM fc
    """,
)
def ts_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) FIT + 3-STEP FORECAST per user over the daily series —
    the lag-1 autoregression x_t = c + phi*x_{{t-1}} that anchors
    every capacity-planning / anomaly-baseline pipeline, as one
    distributed pass: each EVENT value quantizes to exact fixed-point
    (floor of a raw double — tie-free and order-free; flooring a
    summed double would be partition-order sensitive) and the daily
    mean is an integer division of exact sums, the OLS moments (n,
    sum x, sum y, sum x2, sum xy over lag pairs) are pure INT64 sums
    — order-free under any
    partitioning, the integer-moment discipline of vec_pca_power /
    embedding_outliers — and phi / intercept / the three nested
    forecast steps are a fixed chain of IEEE ops on those exact
    integers, so the oracle replays them bit-for-bit with no rounding
    anywhere. Scale: one (user, day) aggregate + one user-window lag
    + one per-user aggregate — all on the user shuffle axis; the
    moment frame is 7 numbers per user regardless of history length.

    Reference scope: beyond-reference extension (time-series family;
    companion to zx_ts_holt_winters' smoothing recurrence).
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.expr(
            f"sum(cast(floor(value * {AR1_SCALE}) as bigint)) div count(*)"
        ).alias("q")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    lagd = daily.withColumn("pq", F.lag("q").over(w))
    mom = (
        lagd.filter(F.col("pq").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("pq").alias("sx"),
            F.sum("q").alias("sy"),
            F.sum(F.col("pq") * F.col("pq")).alias("sxx"),
            F.sum(F.col("pq") * F.col("q")).alias("sxy"),
            F.max_by("q", "day").alias("last_q"),
        )
        .filter(
            (F.col("n") >= AR1_MIN_DAYS)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        )
    )
    phi = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    fit = mom.select(
        "user_id",
        F.col("n").alias("n_pairs"),
        phi.alias("phi"),
        F.col("last_q").cast("double").alias("lq"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("n").cast("double").alias("nd"),
    )
    c = (F.col("syd") - F.col("phi") * F.col("sxd")) / F.col("nd")
    fc = fit.withColumn("c", c)
    f1 = F.col("c") + F.col("phi") * F.col("lq")
    f2 = F.col("c") + F.col("phi") * f1
    f3 = F.col("c") + F.col("phi") * f2
    s = float(AR1_SCALE)
    return fc.select(
        "user_id",
        "n_pairs",
        "phi",
        (F.col("c") / s).alias("intercept"),
        (f1 / s).alias("forecast_1"),
        (f2 / s).alias("forecast_2"),
        (f3 / s).alias("forecast_3"),
    )


@register(
    "downsample_m4",
    extra=True,
    oracle="""
    WITH v AS (
        SELECT event_type, epoch_us(ts) AS ts_us, event_id, value,
               epoch_us(ts) // 3600000000 AS bucket
        FROM events
    ),
    rn AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts_us, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts_us DESC, event_id DESC)
                   AS rn_d
        FROM v
    )
    SELECT event_type, bucket * 3600000000 AS bucket_start_us,
           COUNT(*) AS n,
           MIN(ts_us) AS ts_min_us, MAX(ts_us) AS ts_max_us,
           ROUND(MIN(value), 6) AS v_min,
           ROUND(MAX(value), 6) AS v_max,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 6) AS v_first,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 6) AS v_last
    FROM rn
    GROUP BY 1, 2
    """,
)
def downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visualization-oriented downsampling (Jugel et al., VLDB'14):
    per (series, time bucket) keep exactly the four value extremes a
    pixel column can show — first, last, min, max — plus the bucket's
    time span. The standard way to feed a year of raw points to a
    dashboard without lying about spikes.

    Scale: ONE partial-aggregatable groupBy per bucket — min/max
    combine map-side; first/last ride a per-bucket row_number whose
    window shares the (event_type, bucket) shuffle of the final agg,
    so the whole op is a single exchange. Bucket count (not row
    count) bounds the output: 100 TB in, pixels out."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        "event_id",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.expr("unix_micros(ts) div 3600000000").alias("bucket"),
    )
    wb = Window.partitionBy("event_type", "bucket")
    rn = v.select(
        "*",
        F.row_number()
        .over(wb.orderBy("ts_us", "event_id"))
        .alias("rn_a"),
        F.row_number()
        .over(wb.orderBy(F.col("ts_us").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    first_v = F.max(F.when(F.col("rn_a") == 1, F.col("value")))
    last_v = F.max(F.when(F.col("rn_d") == 1, F.col("value")))
    return rn.groupBy(
        "event_type", (F.col("bucket") * 3600000000).alias("bucket_start_us")
    ).agg(
        F.count("*").alias("n"),
        F.min("ts_us").alias("ts_min_us"),
        F.max("ts_us").alias("ts_max_us"),
        F.round(F.min("value"), 6).alias("v_min"),
        F.round(F.max("value"), 6).alias("v_max"),
        F.round(first_v, 6).alias("v_first"),
        F.round(last_v, 6).alias("v_last"),
    )


@register(
    "ts_decompose",
    extra=True,
    oracle="""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
               SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS s,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    q AS (  -- micro-unit quantized hourly mean: cross-engine exact
        SELECT event_type, hour,
               CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) AS hv_q
        FROM hourly
    ),
    tr AS (
        SELECT event_type, hour, hv_q,
               SUM(hv_q) OVER w AS tsum, COUNT(*) OVER w AS tcnt
        FROM q
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (
        SELECT event_type, hour, hv_q,
               CAST(hv_q AS DOUBLE) / 1e6
                   - CAST(tsum AS DOUBLE) / 24 / 1e6 AS det
        FROM tr WHERE tcnt = 24
    ),
    season AS (
        SELECT event_type, hour % 24 AS hod,
               SUM(CAST(FLOOR(det * 1e6) AS BIGINT)) AS ds,
               COUNT(*) AS dn
        FROM det
        GROUP BY 1, 2
    )
    SELECT d.event_type, d.hour,
           ROUND(CAST(d.hv_q AS DOUBLE) / 1e6, 6) AS hourly_mean,
           ROUND(CAST(d.hv_q AS DOUBLE) / 1e6 - d.det, 6) AS trend,
           ROUND(CAST(s.ds AS DOUBLE) / s.dn / 1e6, 6) AS seasonal,
           ROUND(d.det - CAST(s.ds AS DOUBLE) / s.dn / 1e6, 6)
               AS residual
    FROM det d
    JOIN season s
      ON d.event_type = s.event_type AND d.hour % 24 = s.hod
    """,
)
def ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (STL-lite): hourly series per
    event type -> trend (centered 24-point moving average) ->
    detrended -> additive seasonal profile (mean detrended value per
    hour-of-day) -> residual. The pre-processing step before any
    seasonality-aware anomaly rule.

    Float-parity design (the ts_ewma trick, applied twice): every
    cross-engine aggregation happens in EXACT bigint micro-units —
    hourly sums, the quantized hourly mean, the detrended seasonal
    sums — so no order-dependent double summation ever crosses the
    oracle boundary; the only double ops are single IEEE divisions
    and subtractions of bit-identical inputs.

    Scale: groupBy hours (output ~ series x hours, not rows), one
    window per series partition, and a broadcast-sized seasonal
    profile (24 rows per series) joined back. All shuffles key on
    event_type - the series axis a real deployment partitions by."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hour"),
    ).agg(
        F.sum(F.floor(F.col("value") * 1e6).cast("bigint")).alias("s"),
        F.count("*").alias("n"),
    )
    q = hourly.select(
        "event_type",
        "hour",
        F.floor(F.col("s").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("hv_q"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-11, 12)
    )
    tr = q.select(
        "event_type",
        "hour",
        "hv_q",
        F.sum("hv_q").over(w).alias("tsum"),
        F.count("*").over(w).alias("tcnt"),
    )
    det = tr.filter(F.col("tcnt") == 24).select(
        "event_type",
        "hour",
        "hv_q",
        (
            F.col("hv_q").cast("double") / F.lit(1e6)
            - F.col("tsum").cast("double") / F.lit(24) / F.lit(1e6)
        ).alias("det"),
    )
    season = det.groupBy(
        "event_type", (F.col("hour") % 24).alias("hod")
    ).agg(
        F.sum(F.floor(F.col("det") * 1e6).cast("bigint")).alias("ds"),
        F.count("*").alias("dn"),
    )
    seasonal = F.col("s.ds").cast("double") / F.col("s.dn") / F.lit(1e6)
    return (
        det.alias("d")
        .join(
            F.broadcast(season.alias("s")),
            (F.col("d.event_type") == F.col("s.event_type"))
            & ((F.col("d.hour") % 24) == F.col("s.hod")),
        )
        .select(
            F.col("d.event_type").alias("event_type"),
            F.col("d.hour").alias("hour"),
            F.round(
                F.col("d.hv_q").cast("double") / F.lit(1e6), 6
            ).alias("hourly_mean"),
            F.round(
                F.col("d.hv_q").cast("double") / F.lit(1e6)
                - F.col("d.det"),
                6,
            ).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(F.col("d.det") - seasonal, 6).alias("residual"),
        )
    )


# OLS anchor: x is minutes since 2024-01-01T00:00Z — recentering near
# the data keeps the normal-equation cross terms ~1e16, inside the
# 2^53 double mantissa, so the slope division is numerically clean as
# well as bit-deterministic.
OLS_EPOCH_US = 1_704_067_200 * 1_000_000


@register(
    "ols_trend",
    extra=True,
    oracle=f"""
    WITH pts AS (
        SELECT user_id,
               CAST((epoch_us(ts) - {OLS_EPOCH_US}) // 60000000 AS BIGINT)
                   AS x,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1440.0 / 1e6, 6) AS slope_per_day,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1e6, 6) AS intercept
    FROM s
    WHERE n >= 2
      AND n * sxx - sx * sx <> 0
    """,
)
def ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordinary-least-squares trend of ``value`` over time —
    the closed-form normal equations as ONE aggregation pass.

    Spark ships ``regr_slope``/``regr_intercept``, but their float
    accumulation order is partition-dependent — useless for a
    cross-engine hash gate and irreproducible run-to-run at scale.
    Instead the five sufficient statistics (n, Σx, Σy, Σx², Σxy) are
    accumulated as EXACT bigints over quantized inputs (x = minutes
    since the 2024-01-01 anchor, y = micro-units), then the slope is
    derived in double arithmetic whose operand ORDER is written
    identically on both engines: same exact integers in → same IEEE
    ops → same doubles out. The quantization gives int64 headroom to
    ~1e5 rows/key (Σxy ≤ 43200·5e8·n); beyond that, re-center x per
    partition window.

    Scale: one scan, one partial-agg shuffle keyed on user_id — the
    sufficient-statistic trick means NO second centered pass (the
    textbook two-pass formulation would rescan the fact per mean).
    Reference parity: trends over auto_kafka_redis.py's value field
    (event payload value, auto_kafka_redis.py:60)."""
    pts = table(spark, sf_dir, "events").select(
        "user_id",
        ((F.unix_micros("ts") - F.lit(OLS_EPOCH_US)) / F.lit(60_000_000))
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("y"),
    )
    s = pts.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return (
        s.filter(
            (F.col("n") >= 2)
            & (
                F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
                != 0
            )
        )
        .select(
            "user_id",
            "n",
            F.round(slope * F.lit(1440.0) / F.lit(1e6), 6).alias(
                "slope_per_day"
            ),
            F.round(
                (syd - slope * sxd) / nd / F.lit(1e6), 6
            ).alias("intercept"),
        )
    )


# ------------------------------------------------------------- ACF


@register(
    "ts_acf",
    extra=True,
    oracle="""
    WITH hc AS (
      SELECT epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(1, 24)) AS lag),
    p AS (
      SELECT l.lag, a.c AS x, b.c AS y
      FROM lags l JOIN hc a ON true JOIN hc b ON b.hour = a.hour + l.lag
    )
    SELECT lag, COUNT(*) AS n,
      ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*y) AS DOUBLE)
             - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
       / sqrt((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
               - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
            * (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y*y) AS DOUBLE)
               - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))), 6)
        AS acf
    FROM p GROUP BY lag
    HAVING (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x*x) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) > 0
       AND (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y*y) AS DOUBLE)
            - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)) > 0
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the hourly event-rate series at lags
    1..24 — the seasonality detector feeding zx_ts_decompose's period
    choice.

    Pairwise-complete ACF: each lag correlates the series against its
    shifted self over the overlapping hours (equi-join on hour+lag,
    never a window over the whole series). Counts are integers, so the
    zx_corr_matrix float discipline applies verbatim: exact bigint
    moments, one deterministic double expression, degenerate lags
    filtered identically on both engines.

    Scale: the fact collapses to per-hour counts at the first
    exchange (~9k rows/year); the 24x lag expansion and self-join act
    on that tiny series, not the fact.
    """
    e = table(spark, sf_dir, "events")
    hc = e.groupBy(
        F.expr("unix_micros(ts) div 3600000000").alias("hour")
    ).agg(F.count("*").alias("c"))
    a = (
        hc.withColumn("lag", F.explode(F.sequence(F.lit(1), F.lit(24))))
        .select("lag", F.col("hour").alias("h"), F.col("c").alias("x"))
    )
    b = hc.select(F.col("hour").alias("hb"), F.col("c").alias("y"))
    p = a.join(b, F.col("hb") == F.col("h") + F.col("lag")).select(
        "lag", "x", "y"
    )
    agg = p.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return (
        agg.filter((var_x > 0) & (var_y > 0))
        .select(
            "lag",
            "n",
            F.round((nd * sxy - sx * sy) / F.sqrt(var_x * var_y), 6).alias(
                "acf"
            ),
        )
    )


# ----------------------------------------------------------- CUSUM


@register(
    "change_point_cusum",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(round(value * 1000) AS BIGINT)) AS x
      FROM events GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM daily),
    c AS (
      SELECT day,
             CAST(SUM(t.n * d.x - t.s) OVER (ORDER BY day) AS BIGINT)
                 AS cusum
      FROM daily d CROSS JOIN tot t
    )
    SELECT day, cusum FROM c
    ORDER BY abs(cusum) DESC, day LIMIT 1
    """,
)
def change_point_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over the daily value series: the
    day where the cumulative deviation from the global mean peaks (the
    classic single-change-point estimator).

    Fully INTEGER arithmetic — the usual CUSUM accumulates x_i - mean
    (a float), but scaling by n turns it into n*x_i - S, an exact
    bigint: the argmax is identical and nothing floats, so parity is
    bit-exact with no rounding discipline needed at all.

    Scale: the fact reduces to ~365 daily rows at the first exchange;
    the running sum and argmax act on that. The running-sum window is
    over the tiny daily table (single partition of hundreds of rows —
    bounded by days, not data; the bucket-prefix pattern applies if
    the grain were ever finer).
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("x"))
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("x").alias("s")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("cusum", F.sum(F.col("n") * F.col("x") - F.col("s")).over(w))
    )
    return (
        c.select("day", "cusum")
        .orderBy(F.abs(F.col("cusum")).desc(), "day")
        .limit(1)
    )


# ------------------------------------------------------ KS drift


@register(
    "ks_drift_test",
    extra=True,
    oracle="""
    WITH a AS (SELECT CAST(round(value*1000) AS BIGINT) v FROM events
               WHERE user_id % 2 = 0),
    b AS (SELECT CAST(round(value*1000) AS BIGINT) v FROM events
          WHERE user_id % 2 = 1),
    na AS (SELECT COUNT(*) n FROM a), nb AS (SELECT COUNT(*) n FROM b),
    pts AS (
      SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM (
        SELECT v, 1 AS ia, 0 AS ib FROM a
        UNION ALL SELECT v, 0, 1 FROM b
      ) GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
             CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
      FROM pts
    )
    SELECT c.v AS at_v,
           CAST(abs((SELECT n FROM nb) * c.cum_a
                    - (SELECT n FROM na) * c.cum_b) AS BIGINT) AS d_num,
           CAST((SELECT n FROM na) AS BIGINT) AS n_a,
           CAST((SELECT n FROM nb) AS BIGINT) AS n_b
    FROM cum c
    ORDER BY abs((SELECT n FROM nb) * c.cum_a
                 - (SELECT n FROM na) * c.cum_b) DESC, c.v
    LIMIT 1
    """,
)
def ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the A/B
    variants' value distributions (the distribution-level companion to
    zx_ab_test_stats' mean test; in production: training-vs-serving
    feature drift).

    The KS statistic D = max |F_a − F_b| is computed WITHOUT floats:
    scaling by n_a*n_b gives |n_b·cumA(v) − n_a·cumB(v)| — exact
    bigints with the same argmax (the CUSUM trick again). Output is
    the supremum point, the integer numerator, and both sample sizes
    (D = d_num / (n_a*n_b)).

    Scale: the fact reduces to per-distinct-value counts at the first
    exchange (bounded by value cardinality); cumulative sums run over
    that bounded table, and the two 1-row counts broadcast.
    """
    e = table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
        (F.col("user_id") % 2 == 0).cast("int").alias("ia"),
    )
    pts = e.groupBy("v").agg(
        F.sum("ia").alias("ca"),
        F.sum(1 - F.col("ia")).alias("cb"),
    )
    tot = pts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        pts.withColumn("cum_a", F.sum("ca").over(w))
        .withColumn("cum_b", F.sum("cb").over(w))
        .crossJoin(F.broadcast(tot))
    )
    d = F.abs(
        F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b")
    )
    return (
        cum.select(
            F.col("v").alias("at_v"),
            d.alias("d_num"),
            "n_a",
            "n_b",
        )
        .orderBy(F.col("d_num").desc(), "at_v")
        .limit(1)
    )


# -------------------------------------------------- rolling median


# shared by the batch operator AND its streaming stateful twin
# (streaming/pipeline.py zx_stream_rolling_median) — both hash-match it
ROLLING_MEDIAN_ORACLE = """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CAST(round(value*1000) AS BIGINT) AS v
      FROM events
    )
    SELECT user_id, event_id, ts_us,
           CAST(median(v) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN 20 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS med_mv
    FROM e
    """


@register("rolling_median", extra=True, oracle=ROLLING_MEDIAN_ORACLE)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 21-event median of each user's quantized values — the
    robust denoiser (median filters shrug off the outliers that wreck
    zx_ts_ewma-style means; see also zx_anomaly_mad).

    Medians are holistic — no decomposable partial — but the frame is
    a BOUNDED 21 rows, so collect_list over the frame + sort_array +
    middle element is exact and O(frame log frame) per row, riding
    the ONE user_id shuffle. Even-sized warm-up frames interpolate
    (avg of the two middles) exactly like DuckDB's window median.
    Unbounded-frame medians would need the KLL sketch path instead.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-20, 0)
    )
    med = F.expr(
        "CASE WHEN size(arr) % 2 = 1"
        " THEN CAST(element_at(arr, CAST((size(arr) + 1) div 2 AS INT)) AS DOUBLE)"
        " ELSE (element_at(arr, CAST(size(arr) div 2 AS INT))"
        "       + element_at(arr, CAST(size(arr) div 2 + 1 AS INT))) / 2.0 END"
    )
    return (
        e.withColumn("arr", F.sort_array(F.collect_list("v").over(w)))
        .select("user_id", "event_id", "ts_us", med.alias("med_mv"))
    )


# ------------------------------------------------------ MAD outliers


@register(
    "anomaly_mad_daily",
    extra=True,
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
                 AS total_mv
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             CAST(median(2 * total_mv) AS BIGINT) AS med2
      FROM daily GROUP BY 1
    ),
    dev AS (
      SELECT d.event_type, d.day, d.total_mv, m.med2,
             abs(2 * d.total_mv - m.med2) AS dev2
      FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    mad AS (
      SELECT event_type, CAST(median(2 * dev2) AS BIGINT) AS mad4
      FROM dev GROUP BY 1
    )
    SELECT d.event_type, CAST(d.day AS BIGINT) AS day,
           d.total_mv,
           CAST(CASE WHEN 2 * d.dev2 > 3 * m.mad4 THEN 1 ELSE 0 END
               AS INTEGER) AS is_outlier
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    """,
)
def anomaly_mad_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on daily per-type totals via Median
    Absolute Deviation — the TIME-SERIES sibling of zx_anomaly_mad's
    per-user variant (relational.py): a day is anomalous for a type
    when |x − median| > 3·MAD over that type's daily history.

    Exactness discipline: both medians run over INTEGERS doubled once
    per interpolation level (2·total for the center, 2·dev2 = 4·|dev|
    for the spread), so the even-count half-way interpolation stays an
    exact integer — zero float drift, bit-identical flags cross-engine.

    Scale: the fact collapses to (type, day) rows at the first
    exchange; per-type medians are percentile aggregates over
    calendar-bounded day grids (partitioned by type — no global
    window); the two tiny median tables broadcast back.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias(
            "total_mv"
        )
    )
    med = daily.groupBy("event_type").agg(
        F.expr("CAST(percentile(2 * total_mv, 0.5) AS BIGINT)").alias("med2")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(2 * F.col("total_mv") - F.col("med2"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(percentile(2 * dev2, 0.5) AS BIGINT)").alias("mad4")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        "total_mv",
        (2 * F.col("dev2") > 3 * F.col("mad4"))
        .cast("int")
        .alias("is_outlier"),
    )


# ------------------------------------------------- Holt-Winters


HW_ALPHA, HW_BETA, HW_GAMMA = 0.3, 0.1, 0.2
HW_SEASON = 7  # weekly seasonality on daily counts
HW_HORIZON = 7


def holt_winters_reference(ys: list) -> list:
    """Pure-python additive Holt-Winters (the exact recurrence the
    Spark kernel must reproduce): classical init (first-season mean
    level, season-mean-difference trend, first-season deviations),
    then the standard three-equation update; returns the HW_HORIZON
    out-of-sample forecasts."""
    m = HW_SEASON
    if len(ys) < 2 * m:
        return []
    l0 = sum(ys[:m]) / m
    b0 = (sum(ys[m : 2 * m]) / m - l0) / m
    seas = [ys[i] - l0 for i in range(m)]
    lev, tr = l0, b0
    for t in range(len(ys)):
        s_prev = seas[t % m]
        lev_new = HW_ALPHA * (ys[t] - s_prev) + (1 - HW_ALPHA) * (lev + tr)
        tr = HW_BETA * (lev_new - lev) + (1 - HW_BETA) * tr
        seas[t % m] = HW_GAMMA * (ys[t] - lev_new) + (1 - HW_GAMMA) * s_prev
        lev = lev_new
    n = len(ys)
    return [
        lev + (h + 1) * tr + seas[(n + h) % m] for h in range(HW_HORIZON)
    ]


@register(
    "ts_holt_winters",
    extra=True,
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
        FROM daily GROUP BY 1
    ),
    grid AS (
        SELECT event_type, UNNEST(range(mn, mx + 1)) AS day FROM bounds
    ),
    series AS (
        SELECT g.event_type,
               list(CAST(COALESCE(d.n, 0) AS DOUBLE) ORDER BY g.day)
                   AS ys
        FROM grid g
        LEFT JOIN daily d
          ON d.event_type = g.event_type AND d.day = g.day
        GROUP BY 1
    ),
    init AS (
        SELECT event_type, ys, len(ys) AS n,
               list_sum(ys[1:{HW_SEASON}]) / {HW_SEASON} AS l0
        FROM series WHERE len(ys) >= 2 * {HW_SEASON}
    ),
    rec AS (
        SELECT 0 AS t, event_type, n, ys,
               l0 AS lev,
               (list_sum(ys[{HW_SEASON} + 1:2 * {HW_SEASON}])
                / {HW_SEASON} - l0) / {HW_SEASON} AS tr,
               list_transform(range(1, {HW_SEASON} + 1),
                              i -> ys[i] - l0) AS seas
        FROM init
        UNION ALL
        SELECT u.t + 1, u.event_type, u.n, u.ys,
               u.lev_new,
               CAST({HW_BETA} AS DOUBLE) * (u.lev_new - u.lev)
               + (1 - CAST({HW_BETA} AS DOUBLE)) * u.tr,
               list_transform(range(1, {HW_SEASON} + 1), i ->
                   CASE WHEN i = (u.t % {HW_SEASON}) + 1
                        THEN CAST({HW_GAMMA} AS DOUBLE)
                             * (u.ys[u.t + 1] - u.lev_new)
                             + (1 - CAST({HW_GAMMA} AS DOUBLE))
                             * u.seas[(u.t % {HW_SEASON}) + 1]
                        ELSE u.seas[i] END)
        FROM (
            SELECT r.*,
                   CAST({HW_ALPHA} AS DOUBLE)
                   * (r.ys[r.t + 1] - r.seas[(r.t % {HW_SEASON}) + 1])
                   + (1 - CAST({HW_ALPHA} AS DOUBLE)) * (r.lev + r.tr)
                       AS lev_new
            FROM rec r WHERE r.t < r.n
        ) u
    )
    SELECT event_type, CAST(hh + 1 AS INT) AS h,
           lev + (hh + 1) * tr
               + seas[((n + hh) % {HW_SEASON}) + 1] AS forecast
    FROM (
        SELECT *, UNNEST(range(0, {HW_HORIZON})) AS hh
        FROM rec WHERE t = n
    )
    """,
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECASTING — additive Holt-Winters (level + trend + weekly
    seasonality) over each event type's daily count series, emitting
    a 7-day-ahead forecast per type: the capacity-planning /
    anomaly-baseline primitive (zx_ts_decompose explains the past,
    this extrapolates it; zx_anomaly_mad flags deviations from it).

    Shape: the fact table collapses to (type, day, count) in one
    hash-agg — series length is the DAY RANGE, invariant to corpus
    row count — and the inherently sequential triple recurrence runs
    as an applyInPandas kernel per type (the distributed-cut /
    sequential-core split every trainer here uses; thousands of
    series would run in parallel, one task each). Rows-only: the
    recurrence is not one SQL query; the kernel is pinned EXACTLY
    (same float ops, same order) by holt_winters_reference in tests."""
    import pandas as pd

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("n"))

    def hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        # gap-fill missing days with 0 so seasonality indexes stay
        # aligned to the calendar
        days = pdf["day"].tolist()
        cnt = dict(zip(days, pdf["n"]))
        full = list(range(int(min(days)), int(max(days)) + 1))
        ys = [float(cnt.get(d, 0)) for d in full]
        fc = holt_winters_reference(ys)
        et = pdf["event_type"].iloc[0]
        return pd.DataFrame(
            {
                "event_type": [et] * len(fc),
                "h": list(range(1, len(fc) + 1)),
                # UNROUNDED: the oracle CTE replays the identical IEEE
                # op sequence, so the doubles match bit-for-bit;
                # rounding would reintroduce the python-round vs
                # SQL-ROUND midpoint mismatch (the MMR lesson)
                "forecast": [float(v) for v in fc],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        hw, "event_type string, h int, forecast double"
    )


@register(
    "ts_changepoint_cusum",
    extra=True,
    oracle="""
    WITH m AS (
        SELECT event_type,
               (epoch_us(ts) // 60000000) * 60 AS minute_s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS mins,
               CAST(SUM(n) AS BIGINT) AS total
        FROM m GROUP BY event_type
    ),
    pre AS (
        SELECT m.event_type, m.minute_s,
               CAST(SUM(m.n) OVER (
                   PARTITION BY m.event_type ORDER BY m.minute_s
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pref,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY m.event_type ORDER BY m.minute_s)
                   AS BIGINT) AS idx,
               t.mins, t.total
        FROM m JOIN tot t USING (event_type)
    ),
    c AS (
        SELECT event_type, minute_s,
               mins * pref - idx * total AS cusum_scaled
        FROM pre
    )
    SELECT event_type, minute_s AS changepoint_minute,
           CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
           CAST(CASE WHEN cusum_scaled >= 0 THEN 1 ELSE -1 END AS INT)
               AS direction
    FROM c
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type
        ORDER BY abs(cusum_scaled) DESC, minute_s) = 1
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) per event type: the
    minute where the cumulative deviation of per-minute counts from
    the series mean is most extreme — the classic single-changepoint
    estimator for a level shift in a rate. Exactness trick: the raw
    CUSUM S_m = prefix_m - m*(T/M) is rational; scaling by M gives
    the INTEGER statistic M*prefix_m - m*T with the same argmax, so
    both engines agree to the bit (ties break on earliest minute;
    sign = shift direction). Shape: one minute-grid aggregation, a
    per-type prefix window (PARTITIONED by event_type; at a 100 TB
    minute grid the bucket-prefix pattern from functions/ranking
    replaces the window), one argmax."""
    ev = table(spark, sf_dir, "events")
    m = (
        ev.select(
            "event_type",
            (F.expr("unix_micros(ts) div 60000000") * 60).alias("minute_s"),
        )
        .groupBy("event_type", "minute_s")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = m.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("mins"),
        F.sum("n").cast("bigint").alias("total"),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("minute_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("event_type").orderBy("minute_s")
    pre = (
        m.join(tot, "event_type")
        .withColumn("pref", F.sum("n").over(wp).cast("bigint"))
        .withColumn("idx", F.row_number().over(wr).cast("bigint"))
        .withColumn(
            "cusum_scaled",
            F.col("mins") * F.col("pref") - F.col("idx") * F.col("total"),
        )
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("minute_s")
    )
    return (
        pre.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("minute_s").alias("changepoint_minute"),
            F.col("cusum_scaled").cast("bigint").alias("cusum_scaled"),
            F.when(F.col("cusum_scaled") >= 0, 1)
            .otherwise(-1)
            .cast("int")
            .alias("direction"),
        )
    )


CUSUM_K = 60_000   # drift allowance (milli-units; series mean ~50k)
CUSUM_H = 200_000  # alert threshold on the reflected statistic

CUSUM_ALERT_ORACLE = f"""
    WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CAST(round(value * 1000) AS BIGINT) - {CUSUM_K} AS d
        FROM events
    ),
    p AS (
        SELECT user_id, event_id, ts_us,
               CAST(SUM(d) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
        FROM x
    ),
    s AS (
        SELECT user_id, event_id, ts_us,
               pre - LEAST(0, MIN(pre) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING)) AS sv
        FROM p
    )
    SELECT user_id, event_id, ts_us, CAST(sv AS BIGINT) AS s_scaled
    FROM (
        SELECT user_id, event_id, ts_us, sv,
               LAG(sv, 1, 0) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id) AS sp
        FROM s
    ) WHERE sp < {CUSUM_H} AND sv >= {CUSUM_H}
"""


@register("cusum_alert", extra=True, oracle=CUSUM_ALERT_ORACLE)
def cusum_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online CUSUM alerting (Page's reflected statistic), batch twin:
    per user, S_i = max(0, S_{i-1} + x_i - k) in exact milli-integer
    units, alert ONCE per excursion at the row where S first crosses
    h. The order-dependent max(0, ...) recurrence has a closed
    prefix form — S_i = P_i - min(0, min_{j<=i} P_j) — so it runs as
    two per-user windows (prefix sum, running min) + a lag for the
    crossing test, all integers, no recursion. This is the batch
    oracle the STREAMING kernel (stream_cusum_alert) must reproduce
    bit-for-bit across micro-batch boundaries.

    Scale: both windows key on user_id (bounded per-user series); at
    a 100 TB grid the bucket-prefix pattern replaces them."""
    ev = table(spark, sf_dir, "events")
    x = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.round(F.col("value") * 1000).cast("bigint") - CUSUM_K).alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    p = x.withColumn("pre", F.sum("d").over(w).cast("bigint"))
    s = p.withColumn(
        "sv", F.col("pre") - F.least(F.lit(0), F.min("pre").over(w))
    )
    return (
        s.withColumn("sp", F.lag("sv", 1, 0).over(wl))
        .filter((F.col("sp") < CUSUM_H) & (F.col("sv") >= CUSUM_H))
        .select(
            "user_id",
            "event_id",
            "ts_us",
            F.col("sv").cast("bigint").alias("s_scaled"),
        )
    )


# ------------------------------------------------- Theil–Sen trend


THEILSEN_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), pairs AS (
    SELECT a.event_type,
           CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.d < b.d
), sl AS (
    SELECT event_type, quantile_cont(slope, 0.5) AS sen,
           COUNT(*) AS n_pairs
    FROM pairs GROUP BY 1
), res AS (
    SELECT d.event_type, s.sen, s.n_pairs,
           CAST(d.c AS DOUBLE) - s.sen * CAST(d.d AS DOUBLE) AS resid
    FROM daily d JOIN sl s USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(ANY_VALUE(n_pairs) AS BIGINT) AS n_pairs,
       ROUND(ANY_VALUE(sen), 6) AS sen_slope_per_day,
       ROUND(quantile_cont(resid, 0.5), 6) AS sen_intercept
FROM res GROUP BY event_type
"""


@register("theilsen_trend", extra=True, oracle=THEILSEN_ORACLE)
def theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN robust trend per event type — the median of all
    pairwise slopes of the daily-count series (plus the matching
    median-residual intercept). The robust sibling of zx_ols_trend:
    OLS moves arbitrarily under one corrupted day (a logging outage,
    a bot flood); Theil–Sen tolerates ~29% corrupted points, which is
    why monitoring pipelines prefer it for volume trends.

    Exactness: every slope is ONE IEEE division of two integer
    deltas (daily counts and day indexes are exact bigints), and the
    median is positional — interpolation only ever averages two
    identically-computed doubles, the same SQL-standard percentile
    both engines implement (zx_agg_percentiles precedent). No float
    accumulates anywhere.

    Scale: the pair join is per-GROUP over the DAILY series, not the
    fact — days grow with calendar time, not data volume, so C(n,2)
    pairs stay bounded (~2k slopes per group-year) while the fact
    folds once into daily counts via one (type, day) hash aggregate.
    The canonical robust-statistics split: heavy data -> tiny exact
    summary -> quadratic-in-summary robust kernel."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.floor(F.unix_micros("ts") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / (F.col("b.d") - F.col("a.d")).cast("double")
        ).alias("slope"),
    )
    sl = pairs.groupBy("event_type").agg(
        F.expr("percentile(slope, 0.5)").alias("sen"),
        F.count("*").alias("n_pairs"),
    )
    res = daily.join(F.broadcast(sl), "event_type").select(
        "event_type",
        "sen",
        "n_pairs",
        (
            F.col("c").cast("double") - F.col("sen") * F.col("d").cast("double")
        ).alias("resid"),
    )
    return res.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.any_value("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.any_value("sen"), 6).alias("sen_slope_per_day"),
        F.round(F.expr("percentile(resid, 0.5)"), 6).alias("sen_intercept"),
    )
