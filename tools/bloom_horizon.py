"""Scalable-bloom horizon proof (VERDICT r12 #4).

The r11 bounded-dedup tier used a FIXED 16384-bit bloom per shard: it
held its ~9e-4 false-drop target only to ~1.5k distinct contents per
shard (~1e5 total across the 64 shards) and then saturated toward
dropping nearly ALL novel content. The r12 scalable-bloom rewrite
(`streaming/dedup.py`, Almeida et al. 2007) exists precisely to
survive past that horizon — so this harness pushes **3.2x past it**
(320k distinct contents, ~5k per shard, forcing 4+ geometric
segments per shard) through the REAL streaming kernel
(`stream_bounded_exact_flags` under availableNow replay, RocksDB
state store) and measures, not asserts-by-construction:

- segment growth: per-shard segment counts from the bit-for-bit
  python twin (which must agree with the streaming output on EVERY
  row — the twin IS the instrumentation);
- measured false-drop rate over the true novel arrivals, against the
  designed bound BLOOM_P0/(1-BLOOM_SEG_R) = 1e-3 at any cardinality;
- zero false admits: every true re-arrival flagged is_dup (the bloom
  never forgets — the one-sided guarantee exact dedup exists for);
- state rows stay <= BLOOM_SHARDS (64) at 320k distinct — the
  constant-state contract;
- wall stays ~linear: 80k-distinct vs 320k-distinct replay walls.

Output: BLOOM_HORIZON.json (committed).

Usage: python tools/bloom_horizon.py [--n 320000]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from eventstream_notify_spark.session import get_spark  # noqa: E402
from eventstream_notify_spark.streaming.dedup import (  # noqa: E402
    BLOOM_K,
    BLOOM_BITS,
    BLOOM_P0,
    BLOOM_SEG_R,
    BLOOM_SHARDS,
    ESCROW_CAP,
    stream_bounded_exact_flags,
)

N_FILES = 8  # micro-batches under maxFilesPerTrigger=1
DUP_EVERY = 20  # every 20th distinct content gets a later re-arrival
OLD_HORIZON = 100_000  # ~1.5k/shard x 64: where the r11 fixed filter broke
FP_BOUND = BLOOM_P0 / (1.0 - BLOOM_SEG_R)  # designed total false-drop bound


def gen_corpus(n_distinct: int):
    """Deterministic corpus: distinct contents 0..n-1 spread over
    N_FILES contiguous chunks (in arrival order), plus a re-arrival of
    every DUP_EVERY-th content in a strictly LATER file (so dups cross
    micro-batch boundaries and exercise both the escrow and the
    bloom-only resolution paths). Returns list[list[(doc_id, text)]]
    per file."""
    files: list[list[tuple[int, str]]] = [[] for _ in range(N_FILES)]
    for i in range(n_distinct):
        files[i * N_FILES // n_distinct].append((i, f"horizon-doc-{i:08d}"))
    seq = n_distinct
    for i in range(0, n_distinct, DUP_EVERY):
        first_f = i * N_FILES // n_distinct
        if first_f >= N_FILES - 1:
            continue
        dup_f = first_f + 1 + (i // DUP_EVERY) % (N_FILES - 1 - first_f)
        files[dup_f].append((seq, f"horizon-doc-{i:08d}"))
        seq += 1
    return files


def write_files(files, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    base = time.time() - 3600
    for f_idx, rows in enumerate(files):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        fp = os.path.join(path, f"part-{f_idx:03d}.parquet")
        pq.write_table(tbl, fp)
        # FileStreamSource orders by modification time: pin mtimes so
        # the 1-file-per-trigger replay is deterministic (the repo's
        # established _write_doc_file pattern)
        os.utime(fp, (base + f_idx, base + f_idx))


def _seg_capacity(j: int) -> int:
    p = BLOOM_P0 * BLOOM_SEG_R**j
    m = BLOOM_BITS << j
    return int(m / BLOOM_K * -math.log(1.0 - p ** (1.0 / BLOOM_K)))


def _mask(h: str, j: int) -> int:
    m = BLOOM_BITS << j
    out = 0
    for i in range(BLOOM_K):
        out |= 1 << (int(h[4 + 8 * i : 12 + 8 * i], 16) % m)
    return out


def twin_replay(files):
    """Batch-aware pure-python twin of the kernel (same sha256 hex
    slices, shard key, per-segment modulus/capacity schedule, same
    per-(shard,batch) FIFO escrow eviction) PLUS an exact seen-set on
    the side, so every bloom 'seen' verdict is classified as a TRUE
    repeat vs a FALSE drop of a novel content — the measurement the
    streaming kernel itself cannot make."""
    state: dict[int, tuple[list[int], int, dict]] = {}
    true_seen: set[str] = set()
    out: dict[int, tuple] = {}
    false_drops = 0
    novel_arrivals = 0
    repeat_arrivals = 0
    for batch in files:
        per_shard = defaultdict(list)
        for doc_id, text in batch:
            h = hashlib.sha256(text.encode()).hexdigest()
            per_shard[int(h[:4], 16) % BLOOM_SHARDS].append((doc_id, h))
        for shard, rows in per_shard.items():
            blooms, seg_n, esc = state.get(shard, ([0], 0, {}))
            for doc_id, h in sorted(rows):
                novel = h not in true_seen
                novel_arrivals += novel
                repeat_arrivals += not novel
                true_seen.add(h)
                if h in esc:
                    out[doc_id] = (esc[h], True, True)
                    continue
                if any(
                    bl & _mask(h, j) == _mask(h, j)
                    for j, bl in enumerate(blooms)
                ):
                    out[doc_id] = (None, True, False)
                    false_drops += novel
                else:
                    # a novel-by-bloom verdict for a true repeat would
                    # be a false ADMIT — impossible by construction
                    # (the bloom never forgets); counted in main()
                    j = len(blooms) - 1
                    if seg_n >= _seg_capacity(j):
                        blooms.append(0)
                        j += 1
                        seg_n = 0
                    blooms[j] |= _mask(h, j)
                    seg_n += 1
                    esc[h] = doc_id
                    out[doc_id] = (doc_id, False, True)
            if len(esc) > ESCROW_CAP:
                for stale in list(esc)[: len(esc) - ESCROW_CAP]:
                    del esc[stale]
            state[shard] = (blooms, seg_n, esc)
    seg_counts = sorted(len(st[0]) for st in state.values())
    return out, false_drops, novel_arrivals, repeat_arrivals, seg_counts


def run_stream(spark, files, tag: str) -> tuple[dict[int, tuple], dict]:
    tmp = tempfile.mkdtemp(prefix=f"bloom_horizon_{tag}_")
    try:
        src = os.path.join(tmp, "docs")
        write_files(files, src)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        docs = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sdf = stream_bounded_exact_flags(docs)
        out = os.path.join(tmp, "out")
        t0 = time.time()
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # bounded wait (hang-guard discipline): an 8-file availableNow
        # replay has no business running 15 minutes
        if not q.awaitTermination(900):
            q.stop()
            raise TimeoutError(f"bloom_horizon({tag}) exceeded 900s")
        wall = time.time() - t0
        state_rows = state_bytes = 0
        for p in q.recentProgress or []:
            for op in p.get("stateOperators", []):
                state_rows = max(state_rows, op.get("numRowsTotal", 0))
                state_bytes = max(state_bytes, op.get("memoryUsedBytes", 0))
        import pandas as pd

        pdf = spark.read.schema(sdf.schema).parquet(out).toPandas()
        flags = {
            int(r.doc_id): (
                None if pd.isna(r.canonical_id) else int(r.canonical_id),
                bool(r.is_dup),
                bool(r.exact),
            )
            for r in pdf.itertuples()
        }
        n_rows = sum(len(f) for f in files)
        return flags, {
            "wall_s": round(wall, 2),
            "rows": n_rows,
            "docs_per_s": round(n_rows / max(wall, 0.01), 1),
            "max_state_rows": int(state_rows),
            "max_state_bytes": int(state_bytes),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    n = 320_000
    argv = sys.argv[1:]
    if "--n" in argv:
        n = int(argv[argv.index("--n") + 1])
    spark = get_spark("bloom-horizon")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + streaming-path warmup (cold-start costs ~7 s that would
    # otherwise land entirely on the quarter-scale denominator and
    # fake a sub-linear full/quarter wall ratio)
    run_stream(spark, gen_corpus(2_000), "warmup")

    # linearity reference point at quarter scale (fresh kernel state:
    # separate checkpoint + corpus)
    small_files = gen_corpus(n // 4)
    _, small_m = run_stream(spark, small_files, "quarter")
    print(f"quarter scale ({n // 4} distinct): {small_m}", flush=True)

    files = gen_corpus(n)
    flags, metrics = run_stream(spark, files, "full")
    print(f"full scale ({n} distinct): {metrics}", flush=True)

    twin, false_drops, novel, repeats, seg_counts = twin_replay(files)
    mismatches = sum(
        1 for k, v in twin.items() if flags.get(k) != v
    ) + sum(1 for k in flags if k not in twin)
    # false admits: true re-arrivals the kernel admitted as novel
    first_id: dict[str, int] = {}
    false_admits = 0
    for batch in files:
        for doc_id, text in batch:
            if text in first_id:
                if flags[doc_id][1] is False:  # is_dup must be True
                    false_admits += 1
            else:
                first_id[text] = doc_id
    fd_rate = false_drops / max(novel, 1)
    wall_ratio = round(
        metrics["wall_s"] / max(small_m["wall_s"], 0.01), 2
    )
    result = {
        "metric": "bounded_dedup_bloom_horizon",
        "n_distinct": n,
        "n_dup_arrivals": repeats,
        "old_fixed_filter_horizon_distinct": OLD_HORIZON,
        "horizon_multiple": round(n / OLD_HORIZON, 2),
        "provider": "rocksdb",
        "shards": BLOOM_SHARDS,
        "max_state_rows": metrics["max_state_rows"],
        "state_rows_bounded": metrics["max_state_rows"] <= BLOOM_SHARDS,
        "max_state_bytes": metrics["max_state_bytes"],
        "segments_per_shard": {
            "min": seg_counts[0],
            "median": seg_counts[len(seg_counts) // 2],
            "max": seg_counts[-1],
        },
        "segments_grew_past_fixed_filter": seg_counts[-1] >= 3,
        "false_drops": false_drops,
        "novel_arrivals": novel,
        "false_drop_rate": round(fd_rate, 7),
        "false_drop_bound": FP_BOUND,
        "false_drop_within_bound": fd_rate <= FP_BOUND,
        "false_admits": false_admits,
        "twin_mismatches": mismatches,
        "twin_match": mismatches == 0,
        "walls": {
            "quarter": small_m,
            "full": metrics,
            "ratio": wall_ratio,
            "scale": 4.0,
            # ~linear: 4x the rows in <= 1.5 * 4x the wall (segment
            # membership adds a log-growth term by design)
            "linear_ok": wall_ratio <= 6.0,
        },
    }
    result["pass"] = (
        result["state_rows_bounded"]
        and result["segments_grew_past_fixed_filter"]
        and result["false_drop_within_bound"]
        and result["false_admits"] == 0
        and result["twin_match"]
        and result["walls"]["linear_ok"]
    )
    with open(os.path.join(_REPO, "BLOOM_HORIZON.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(
        json.dumps(
            {
                k: result[k]
                for k in (
                    "metric",
                    "n_distinct",
                    "max_state_rows",
                    "false_drop_rate",
                    "false_admits",
                    "twin_match",
                    "pass",
                )
            }
        )
    )
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
