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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM (task scheduling, codegen, shuffle machinery) so
    # per-query numbers measure the queries, not session startup;
    # touches no benchmark data
    from pyspark.sql import functions as F

    (
        spark.range(1_000_000)
        .groupBy((F.col("id") % 100).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # warm the plan (analysis) outside the timer? No — cold, honest.
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception:  # noqa: BLE001
            timings[name] = -1.0
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
