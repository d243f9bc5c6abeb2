"""Streaming corpus dedup (streaming/dedup.py): exactness of the
stateful kernels against their batch siblings, the bucket-cap
coverage property, and the bounded-state posture of the REGISTERED
minhash query (cap + idle-TTL eviction)."""

import os
import time

from pyspark.sql import functions as F

from eventstream_notify_spark.registry import lookup
from eventstream_notify_spark.sources.documents import file_documents_stream
from eventstream_notify_spark.streaming.dedup import (
    minhash_snapshot_degrees,
    stream_minhash_pairs,
)
from eventstream_notify_spark.streaming.pipeline import run_bounded

SF = "/root/testdata/sf0.001"


def test_stream_dedup_exact_matches_batch_window(spark):
    """Arrival-time exact dedup == the batch first-wins decision on
    the ordered replay."""
    got = {
        r.doc_id: (r.canonical_id, r.is_dup)
        for r in lookup("stream_dedup_exact").fn(spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("text")
    want = {
        r.doc_id: (r.canonical_id, r.is_dup)
        for r in d.select(
            "doc_id",
            F.min("doc_id").over(w).alias("canonical_id"),
            (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
        ).collect()
    }
    assert got == want


def test_stream_dedup_minhash_matches_batch_degrees(spark):
    """Batch parity, both postures: the UNCAPPED/no-timeout harness is
    the contract pin (its band-collision pair set equals the batch
    operator's exactly), and the REGISTERED capped query also agrees
    at this SF because no bucket exceeds the cap here."""
    batch = {
        r.doc_a: r.n_candidates
        for r in lookup("dedup_minhash").fn(spark, SF).collect()
    }
    uncapped = {
        r.doc_a: r.n_candidates
        for r in minhash_snapshot_degrees(
            run_bounded(
                stream_minhash_pairs(
                    file_documents_stream(spark, SF),
                    bucket_cap=None,
                    ttl_ms=None,
                )
            )
        ).collect()
    }
    assert uncapped == batch
    registered = {
        r.doc_a: r.n_candidates
        for r in lookup("stream_dedup_minhash").fn(spark, SF).collect()
    }
    assert registered == batch


def test_stream_minhash_bucket_cap_keeps_coverage(spark):
    """With a binding cap (64 << the hottest bucket), every document
    that has any candidate uncapped still has at least one candidate:
    probes are never capped, only index membership."""
    def pairs_of(snaps):
        return snaps.select(
            "doc_id", F.explode("partners").alias("m")
        ).select(
            F.least("doc_id", "m").alias("doc_a"),
            F.greatest("doc_id", "m").alias("doc_b"),
        )

    uncapped = pairs_of(
        run_bounded(
            stream_minhash_pairs(
                file_documents_stream(spark, SF),
                bucket_cap=None,
                ttl_ms=None,
            )
        )
    )
    capped = pairs_of(
        run_bounded(
            stream_minhash_pairs(
                file_documents_stream(spark, SF),
                bucket_cap=64,
                ttl_ms=None,
            )
        )
    )

    def participants(df):
        return {
            r.d
            for r in df.select(
                F.explode(F.array("doc_a", "doc_b")).alias("d")
            ).collect()
        }

    pu, pc = participants(uncapped), participants(capped)
    assert pc == pu
    # and the cap genuinely binds (fewer pair events than uncapped)
    assert capped.count() < uncapped.count()


def _write_doc_file(spark, path: str, rows, mtime: float) -> None:
    before = set(os.listdir(path)) if os.path.exists(path) else set()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)
    # FileStreamSource orders by modification time: pin each NEW
    # file's mtime so the 1-file-per-trigger replay is deterministic
    # (earlier files keep their earlier pins)
    for name in set(os.listdir(path)) - before:
        if name.endswith(".parquet"):
            fp = os.path.join(path, name)
            os.utime(fp, (mtime, mtime))


def _doc_stream(spark, path: str):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def test_stream_minhash_state_is_bounded(spark, tmp_path):
    """The registered posture's state bound, proven from the output:
    every partner snapshot IS the bucket's index at that arrival, so
    max(|partners|) <= cap across a multi-batch run means the posting
    list never exceeded the cap."""
    src = str(tmp_path / "docs")
    now = time.time()
    # one hot bucket: 24 identical docs across 2 micro-batches
    _write_doc_file(
        spark, src, [(i, "alpha beta gamma") for i in range(12)], now - 20
    )
    _write_doc_file(
        spark,
        src,
        [(i, "alpha beta gamma") for i in range(100, 112)],
        now - 10,
    )
    cap = 4
    snaps = run_bounded(
        stream_minhash_pairs(
            _doc_stream(spark, src), bucket_cap=cap, ttl_ms=None
        )
    )
    stats = snaps.agg(
        F.max(F.size("partners")).alias("mx"),
        F.countDistinct("doc_id").alias("probing"),
    ).first()
    assert stats.mx <= cap
    # probes are never capped: every doc after the first still probes
    assert stats.probing == 23


def test_stream_minhash_ttl_evicts_idle_buckets(spark, tmp_path):
    """Idle-bucket eviction on a CONTINUOUS query (the production
    posture — availableNow replay cannot carry processing-time timers,
    see the registered query's docstring): with a tiny TTL, a bucket
    untouched for a whole trigger is dropped, so a third-batch
    re-appearance of the same content pairs only within its own batch;
    with a large TTL the index survives and pairs cross batches."""
    import tempfile
    import uuid

    now = time.time()
    batches = [
        [(i, "alpha beta gamma") for i in range(4)],
        [(i, "delta epsilon zeta") for i in range(100, 104)],
        [(i, "alpha beta gamma") for i in range(200, 204)],
    ]

    def cross_batch_pairs(ttl_ms, tag):
        src = str(tmp_path / tag)
        for k, rows in enumerate(batches):
            _write_doc_file(spark, src, rows, now - 30 + 10 * k)
        name = f"ttl_{tag}_{uuid.uuid4().hex[:8]}"
        q = (
            stream_minhash_pairs(
                _doc_stream(spark, src), bucket_cap=256, ttl_ms=ttl_ms
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            # wait until all 12 docs flowed through (3 x 4-doc files)
            deadline = time.time() + 120
            seen = 0
            while time.time() < deadline and seen < 12:
                time.sleep(1)
                seen = sum(
                    p["numInputRows"] for p in (q.recentProgress or [])
                )
            assert seen >= 12, f"stream stalled at {seen} input rows"
            # one more trigger so the last batch commits to the sink
            time.sleep(2)
        finally:
            q.stop()
        return (
            spark.table(name)
            .select("doc_id", F.explode("partners").alias("m"))
            .filter((F.col("doc_id") >= 200) & (F.col("m") < 100))
            .count()
        )

    # TTL = 1 ms: the alpha bucket is idle during trigger 2 (> TTL), so
    # trigger 3's alpha docs find an EMPTY index — no cross-batch pair
    assert cross_batch_pairs(1, "evict") == 0
    # TTL = 10 min: index survives, batch-3 docs pair with batch-1's
    assert cross_batch_pairs(600_000, "keep") > 0


def test_absence_kernel_batch_split_invariant():
    """Feeding the absence kernel the same events in one batch vs
    three (time-ordered) batches must emit identical gap alerts —
    the single bigint of state carries the frontier across batches,
    including a gap that SPANS a batch boundary."""
    import pandas as pd

    from eventstream_notify_spark.streaming.state import (
        ABSENCE_GAP_US,
        absence_fn,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutTimestamp(self, ts):
            pass

    day = 86_400 * 1_000_000
    ts = [0, day, day * 2, day * 5, day * 6, day * 9, day * 10]
    pdf = pd.DataFrame(
        [(i, t) for i, t in enumerate(ts)], columns=["event_id", "ts_us"]
    )

    def run(chunks):
        st = FakeState()
        out = []
        for c in chunks:
            out.extend(df for df in absence_fn((7,), iter([c]), st))
        return pd.concat(out, ignore_index=True)

    whole = run([pdf])
    # split right inside the day2 -> day5 gap
    split = run([pdf.iloc[:3], pdf.iloc[3:5], pdf.iloc[5:]])
    pd.testing.assert_frame_equal(whole, split)
    assert list(whole["gap_us"]) == [3 * day, 3 * day]
    assert list(whole["gap_start_us"]) == [2 * day, 6 * day]
    assert ABSENCE_GAP_US == 2 * day


def test_absence_kernel_ttl_gap_unalertable():
    """A gap LONGER than the 30-day state TTL must emit no alert even
    in a single-batch replay: in a multi-microbatch run the watermark
    would evict the state before the closing event arrives, so the
    kernel's explicit TTL bound is what keeps single- and multi-batch
    replays agreeing (ADVICE r9). Shorter gaps still alert."""
    import pandas as pd

    from eventstream_notify_spark.streaming.state import (
        ABSENCE_GAP_US,
        ABSENCE_TTL_US,
        absence_fn,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutTimestamp(self, ts):
            pass

    day = 86_400 * 1_000_000
    assert ABSENCE_TTL_US == 30 * day
    # event at day 0, next at day 35 (> TTL), then day 38 (3-day gap)
    pdf = pd.DataFrame(
        [(0, 0), (1, 35 * day), (2, 38 * day)],
        columns=["event_id", "ts_us"],
    )
    st = FakeState()
    out = list(absence_fn((7,), iter([pdf]), st))
    got = pd.concat(out, ignore_index=True)
    # the 35-day gap is suppressed; the 3-day gap alerts
    assert list(got["gap_us"]) == [3 * day]
    assert list(got["gap_start_us"]) == [35 * day]
    assert ABSENCE_GAP_US == 2 * day


# ------------------------------- bounded-state exact dedup tier


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def _python_twin(rows, escrow_cap):
    """Pure-python replay of the scalable-bloom+escrow kernel: same
    sha256 hex slices, same shard key, same per-segment modulus and
    capacity schedule, same FIFO eviction — the rows-only check's
    exact twin."""
    import hashlib
    import math
    from collections import defaultdict

    from eventstream_notify_spark.streaming.dedup import (
        BLOOM_K,
        BLOOM_BITS,
        BLOOM_P0,
        BLOOM_SEG_R,
        BLOOM_SHARDS,
    )

    def cap(j):
        p = BLOOM_P0 * BLOOM_SEG_R**j
        m = BLOOM_BITS << j
        return int(m / BLOOM_K * -math.log(1.0 - p ** (1.0 / BLOOM_K)))

    def mask_of(h, j):
        m = BLOOM_BITS << j
        out = 0
        for i in range(BLOOM_K):
            out |= 1 << (int(h[4 + 8 * i : 12 + 8 * i], 16) % m)
        return out

    shards = defaultdict(list)
    for doc_id, text in rows:
        h = hashlib.sha256(text.encode()).hexdigest()
        shards[int(h[:4], 16) % BLOOM_SHARDS].append((doc_id, h))
    out = {}
    for docs in shards.values():
        blooms, seg_n, esc = [0], 0, {}
        for doc_id, h in sorted(docs):
            if h in esc:
                out[doc_id] = (esc[h], True, True)
                continue
            if any(
                bl & mask_of(h, j) == mask_of(h, j)
                for j, bl in enumerate(blooms)
            ):
                out[doc_id] = (None, True, False)
            else:
                j = len(blooms) - 1
                if seg_n >= cap(j):
                    blooms.append(0)
                    j += 1
                    seg_n = 0
                blooms[j] |= mask_of(h, j)
                seg_n += 1
                esc[h] = doc_id
                out[doc_id] = (doc_id, False, True)
        if len(esc) > escrow_cap:
            for stale in list(esc)[: len(esc) - escrow_cap]:
                del esc[stale]
    return out


def test_bounded_exact_matches_python_twin_and_unbounded(spark):
    """At sf0.001 (~8 distinct contents per shard, far under the
    escrow cap) the bounded tier must agree with BOTH the pure-python
    twin (bit-for-bit kernel replay) and the unbounded exact sibling
    (every decision still exact)."""
    from eventstream_notify_spark.streaming.dedup import ESCROW_CAP

    got = {
        r.doc_id: (r.canonical_id, r.is_dup, r.exact)
        for r in lookup("stream_dedup_exact_bounded").fn(spark, SF).collect()
    }
    rows = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    assert got == _python_twin(rows, ESCROW_CAP)
    exact_sib = {
        r.doc_id: (r.canonical_id, r.is_dup)
        for r in lookup("stream_dedup_exact").fn(spark, SF).collect()
    }
    assert {d: v[:2] for d, v in got.items()} == exact_sib
    assert all(v[2] for v in got.values())  # escrow never overflowed


def test_bounded_exact_accuracy_trade_under_eviction(spark, tmp_path):
    """Force escrow eviction (cap=4, 8-micro-batch replay) on a
    duplicate-heavy synthetic corpus (the testdata documents contain
    no exact dups): the one-sided accuracy contract must hold
    CONTENT-LEVEL — every distinct content admits at most one
    representative (zero false admits: the bloom never forgets),
    contents with zero admitted representative (false drops via bloom
    FP) stay under 1%, and some dup genuinely resolved bloom-only
    (eviction was exercised)."""
    from collections import defaultdict

    from pyspark.sql import functions as SF

    from eventstream_notify_spark.streaming.dedup import (
        stream_bounded_exact_flags,
    )
    from eventstream_notify_spark.streaming.pipeline import run_bounded

    # 2000 arrivals of 400 distinct contents (5 each), ids ascending —
    # dups land batches after their canonical once split 8 ways
    d = spark.range(2000).select(
        SF.col("id").alias("doc_id"),
        SF.concat(
            SF.lit("synthetic content "), (SF.col("id") % 400).cast("string")
        ).alias("text"),
    )
    src = str(tmp_path / "docs")
    d.repartition(8).write.parquet(src)
    schema = ", ".join(f"{n} {t}" for n, t in d.dtypes)
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = {
        r.doc_id: (r.is_dup, r.exact)
        for r in run_bounded(
            stream_bounded_exact_flags(docs, escrow_cap=4)
        ).collect()
    }
    by_content = defaultdict(list)
    for r in d.select("doc_id", "text").collect():
        by_content[r.text].append(r.doc_id)
    admitted_per_content = {
        t: sum(1 for i in ids if not got[i][0])
        for t, ids in by_content.items()
    }
    assert max(admitted_per_content.values()) <= 1  # zero false admits
    false_drops = sum(1 for n in admitted_per_content.values() if n == 0)
    assert false_drops / len(by_content) <= 0.01, false_drops
    # eviction genuinely happened: some dup resolved bloom-only
    assert any(v[0] and not v[1] for v in got.values())


def test_bounded_exact_kernel_escrow_capped():
    """Kernel-level: state never holds more than escrow_cap digests,
    and the bloom bytes stay at their fixed size, across batches."""
    import pandas as pd

    from eventstream_notify_spark.streaming.dedup import (
        BLOOM_BITS,
        make_bounded_exact_fn,
    )

    fn = make_bounded_exact_fn(escrow_cap=3)
    st = _FakeState()
    import hashlib

    def batch(ids):
        return pd.DataFrame(
            {
                "doc_id": ids,
                "h": [
                    hashlib.sha256(f"text-{i}".encode()).hexdigest()
                    for i in ids
                ],
            }
        )

    list(fn((0,), iter([batch([1, 2, 3, 4, 5])]), st))
    blooms, seg_n, esc_h, esc_id = st.get
    assert len(blooms) == 1 and len(blooms[0]) == BLOOM_BITS // 8
    assert seg_n == 5
    assert len(esc_h) == 3 and list(esc_id) == [3, 4, 5]  # FIFO evict
    list(fn((0,), iter([batch([6, 7])]), st))
    blooms, seg_n, esc_h, esc_id = st.get
    assert len(esc_h) == 3 and list(esc_id) == [5, 6, 7]


def test_bounded_exact_scalable_bloom_growth_and_fp_bound():
    """The ADVICE r11 saturation flag, closed: past segment-0 capacity
    (~663 admits) the shard's bloom GROWS a new, larger, tighter
    segment instead of saturating. Pinned here, kernel-level, 3x past
    segment-0 capacity: (a) segments actually multiply and each stays
    its declared byte size; (b) zero false admits — every admitted
    content re-probes as a dup forever; (c) the false-drop rate on
    novel contents stays an order of magnitude under the 1e-3
    construction bound x safety (the fixed r11 filter at this fill
    would already be drifting toward dropping everything novel)."""
    import hashlib

    import pandas as pd

    from eventstream_notify_spark.streaming.dedup import (
        BLOOM_BITS,
        _seg_capacity,
        make_bounded_exact_fn,
    )

    fn = make_bounded_exact_fn(escrow_cap=8)  # tiny escrow: bloom does
    # the remembering, which is exactly what's under test
    st = _FakeState()

    def run(ids, texts):
        out = list(
            fn(
                (0,),
                iter(
                    [
                        pd.DataFrame(
                            {
                                "doc_id": ids,
                                "h": [
                                    hashlib.sha256(t.encode()).hexdigest()
                                    for t in texts
                                ],
                            }
                        )
                    ]
                ),
                st,
            )
        )
        return pd.concat(out, ignore_index=True)

    n = 3 * _seg_capacity(0)  # ~2k distinct: 3x the r11 fixed capacity
    first = run(list(range(n)), [f"novel content {i}" for i in range(n)])
    blooms, seg_n, esc_h, esc_id = st.get
    assert len(blooms) >= 2, "scalable bloom never grew a segment"
    for j, b in enumerate(blooms):
        assert len(b) == (BLOOM_BITS << j) // 8
    # (c) false-drop rate across the whole fill stays well under 1%
    # (expected <= ~1e-3 by construction at ANY fill)
    drops = int(first["is_dup"].sum())
    assert drops / n <= 0.01, f"{drops}/{n} novel contents dropped"
    # (b) zero false admits: every previously-admitted content is
    # flagged dup on re-arrival, even with the 8-entry escrow long
    # evicted — the bloom front never forgets
    again = run(
        list(range(n, 2 * n)), [f"novel content {i}" for i in range(n)]
    )
    assert bool(again["is_dup"].all()), "a seen content was re-admitted"
