"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Per-query timing = full execution to a count/collect-free sink
(``df.write.format("noop")``) so we measure engine time, not driver
materialization of big results.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from eventstream_notify_spark.session import get_spark  # noqa: E402

# Headline set: the flagship pipeline + one representative per family.
HEADLINE = [
    "pipeline_e2e",
    "sink_keyed_upsert",
    "rate_limit_user",
    "agg_hash",
    "join_shuffle",
    "dedup_near",
    "sim_search_cosine",
    "ts_similarity",
]


def latency_mode(duration_s: float = 20.0, rate: int = 20) -> None:
    """--latency: produce -> sink latency at the reference's configured
    producer rate (20 ev/s, auto_kafka_redis.py:51 produce_interval_s
    0.05), through the REAL streaming pipeline (watermark dedup ->
    stateful rate limit -> foreachBatch sink). Each event's latency is
    sink-wall-clock minus its rate-source event time; prints p50/p99.
    Documents the sub-second parity claim in BASELINE.md (the
    reference's observed consumer lag is its only latency surface)."""
    import tempfile

    from eventstream_notify_spark.sources.events import rate_events_stream
    from eventstream_notify_spark.streaming.pipeline import start_pipeline

    spark = get_spark("bench-latency")
    spark.sparkContext.setLogLevel("ERROR")
    # latency-path sizing: state-store instance count == shuffle
    # partitions, and each instance pays per-batch open/commit. 32 is
    # the right THROUGHPUT shape; for a 20 ev/s latency probe it's 31
    # idle RocksDB commits per trigger. The partition count is pinned
    # per-checkpoint at first start, so this scopes to this run only.
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    latencies: list[float] = []

    t_start = time.time()

    def probe_sink(batch_df, epoch_id: int) -> None:
        now = time.time()
        for r in batch_df.select("ts").collect():
            latencies.append((now - t_start, now - r.ts.timestamp()))

    with tempfile.TemporaryDirectory() as ckpt:
        q = start_pipeline(
            rate_events_stream(spark, events_per_second=rate),
            checkpoint_dir=ckpt,
            sink=probe_sink,
            # rate-source users cycle 1..5 instantly; a 60 s window
            # would admit only ~5*5 events. Small window => steady flow.
            rate_window_s=1,
            rate_limit=rate,
        )
        try:
            time.sleep(duration_s)
        finally:
            q.stop()
    def pcts(vals: list[float]) -> dict[str, float | None]:
        vals = sorted(vals)
        n = len(vals)
        p = lambda q: round(vals[min(n - 1, int(q * n))], 3) if n else None  # noqa: E731
        return {"p50": p(0.5), "p99": p(0.99), "max": p(1.0), "events": n}

    # steady state excludes the first half: JVM/codegen/RocksDB warmup
    # dominates early triggers and isn't what a long-running pipeline
    # pays (the reference's own batching adds batch_size/rate = 1.6 s
    # buffering latency at its configured 20 ev/s / batch=32)
    all_l = [lat for _, lat in latencies]
    steady = [lat for t, lat in latencies if t >= duration_s / 2]
    out = {
        "metric": "e2e_latency",
        "value": pcts(steady)["p50"],
        "unit": "sec",
        "steady": pcts(steady),
        "all": pcts(all_l),
        "rate_ev_s": rate,
        "duration_s": duration_s,
    }
    print(json.dumps(out))


def scaling_mode() -> None:
    """--scaling: run every registered query once at sf0.01 and sf0.1
    and report the time ratio. 10x data should cost <=~10x time for a
    linear operator; anything >15x is flagged super-linear — the cheap
    local proxy for 'would this plan survive a 100x scale-up'. Noise
    guard: ratios are only flagged when the sf0.1 time is above 0.5 s
    (sub-half-second queries are dominated by fixed per-query overhead
    and jitter, not scaling behavior)."""
    small = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    big = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark)
    cleanup = make_cleanup(spark)
    t_small = run_suite(spark, small, 1, cleanup)
    t_big = run_suite(spark, big, 1, cleanup)
    ratios: dict[str, float] = {}
    flagged: dict[str, float] = {}
    for name, tb in t_big.items():
        ts = t_small.get(name, -1.0)
        if ts <= 0 or tb <= 0:
            continue
        r = round(tb / max(ts, 0.01), 1)
        ratios[name] = r
        if r > 15.0 and tb > 0.5:
            flagged[name] = r
    out = {
        "metric": "scaling_ratio_sf001_to_sf01",
        "value": round(
            sorted(ratios.values())[len(ratios) // 2], 2
        ) if ratios else None,
        "unit": "x",
        "ratios": ratios,
        "super_linear": flagged,
        "small": t_small,
        "big": t_big,
    }
    print(json.dumps(out, separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": "scaling_summary",
                "median_ratio": out["value"],
                "super_linear": flagged,
                "n": len(ratios),
            },
            separators=(",", ":"),
        )
    )


def main() -> None:
    if "--latency" in sys.argv:
        latency_mode()
        return
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    # --n K: median-of-K per query. Default 1 (driver budget); medians
    # tame the ±60% single-shot jitter on sub-second queries.
    reps = 1
    if "--n" in sys.argv:
        reps = max(1, int(sys.argv[sys.argv.index("--n") + 1]))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark)
    cleanup = make_cleanup(spark)
    timings = run_suite(spark, sf_dir, reps, cleanup)
    total = round(sum(v for v in timings.values() if v >= 0), 2)
    headline = {n: timings[n] for n in HEADLINE if n in timings}
    # Two lines, deliberately: the full per-query map first (humans,
    # SURVEY tables), then a SHORT summary line LAST. The driver
    # captures a bounded tail of stdout and parses the last JSON line;
    # the ~190-query map outgrew that capture in rounds 2-5
    # ("parsed": null), so the final line carries only the suite
    # value, sf, and the 8-query headline map — small enough to
    # survive any tail clip.
    full = {
        "queries": timings,
        "sf": sf,
        "unit": "sec",
        "value": total,
        "metric": "suite_wall_clock_full",
    }
    print(json.dumps(full, separators=(",", ":")))
    summary = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "headline": headline,
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": sum(1 for v in timings.values() if v < 0),
    }
    print(json.dumps(summary, separators=(",", ":")))


def warmup(spark) -> None:
    """Warm the JVM (task scheduling, codegen, shuffle machinery) so
    per-query numbers measure the queries, not session startup;
    touches no benchmark data."""
    from pyspark.sql import functions as F

    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 100).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # warm whole-stage-codegen/JIT for the expression shapes the suite
    # leans on (regexp tokenizer, array HOFs, hashes, windows) — the
    # first compile of each shape costs ~1-2 s of janino+JIT that
    # would otherwise land on whichever query uses it first. Tiny
    # synthetic rows; touches no benchmark data.
    from pyspark.sql.window import Window as _W

    warm = spark.range(64).select(
        F.col("id"),
        F.concat(F.lit("alpha beta gamma "), F.col("id").cast("string")).alias("s"),
        F.sequence(F.lit(1), F.lit(8)).alias("arr"),
    )
    toks = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("s")), F.lit("[a-z0-9]+"), 0)
        )
    )
    (
        warm.select(
            "id",
            toks.alias("toks"),
            F.md5(F.col("s")).alias("h1"),
            F.xxhash64(F.col("s")).alias("h2"),
            F.aggregate(
                F.transform(F.col("arr"), lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("fold"),
            F.zip_with(
                F.col("arr"), F.col("arr"), lambda a, b: a * b
            ).alias("zw"),
            F.size(F.array_intersect(F.col("arr"), F.col("arr"))).alias("ai"),
        )
        .select("id", "h1", "h2", "fold", "ai", F.explode("toks").alias("t"))
        .withColumn(
            "rn", F.row_number().over(_W.partitionBy("t").orderBy("id"))
        )
        .groupBy("t")
        .agg(F.countDistinct("h1").alias("c"), F.max("rn").alias("m"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # warm the STREAMING machinery too (micro-batch engine, state
    # store provider, python state workers) with a one-batch run over
    # 200 synthetic rows — again touching no benchmark data
    try:
        import tempfile

        from pyspark.sql import functions as SF

        from eventstream_notify_spark.streaming.pipeline import run_bounded
        from eventstream_notify_spark.streaming.state import (
            rate_limit_stream,
        )

        tmp = tempfile.mkdtemp(prefix="bench_stream_warmup_")
        (
            spark.range(200)
            .select(
                SF.col("id").alias("event_id"),
                SF.timestamp_micros(
                    SF.lit(1_704_067_200_000_000) + SF.col("id") * 50_000
                ).alias("ts"),
                (SF.col("id") % 5).alias("user_id"),
                SF.lit("warmup").alias("event_type"),
                SF.col("id").cast("double").alias("value"),
                SF.lit('{"k": 1}').alias("props"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )
        warm_src = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"
            ).parquet(tmp)
        ).withWatermark("ts", "60 seconds")
        run_bounded(
            rate_limit_stream(warm_src, limit=5, watermark=None)
        ).count()
    except Exception:  # noqa: BLE001 — warmup must never fail the bench
        pass


def make_cleanup(spark):
    def cleanup() -> None:
        """Drop the previous query's session residue so query N+1 is
        measured on a clean session, not on N predecessors' garbage:
        localCheckpoint blocks pin executor memory until the context
        cleaner catches up, and every bounded streaming run leaves a
        memory-sink temp view holding its rows. Measured: without
        this, the heavies run 30-60% slower at the END of a
        120-query session than in a short one."""
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.name.startswith("q_") and t.isTemporary:
                    spark.catalog.dropTempView(t.name)
        except Exception:  # noqa: BLE001 — hygiene must never fail the bench
            pass

    return cleanup


def run_suite(spark, sf_dir: str, reps: int, cleanup) -> dict[str, float]:
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # warm the plan (analysis) outside the timer? No — cold, honest.
        # Headline queries are the round-over-round trend markers, so
        # they always get median-of-3 (±60% single-shot jitter would
        # otherwise read as regressions); the long extras tail stays
        # at the budgeted rep count.
        q_reps = max(reps, 3) if name in HEADLINE else reps
        runs: list[float] = []
        for _ in range(q_reps):
            cleanup()
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            except Exception:  # noqa: BLE001
                runs.append(-1.0)
                break
        good = sorted(r for r in runs if r >= 0)
        timings[name] = (
            round(good[len(good) // 2], 2) if good else -1.0
        )
    return timings


if __name__ == "__main__":
    main()
