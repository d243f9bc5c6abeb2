"""Streaming corpus deduplication — the dedup family's PRODUCTION
arrival shape: documents stream in continuously and each one is
checked against the index accumulated so far, carried in operator
state. The batch siblings (``dedup_exact``, ``zx_dedup_minhash``,
``zx_dedup_incremental``) answer "dedup this corpus"; these answer
"dedup the corpus as it arrives", which is what a crawl-ingest
pipeline actually runs.

Both kernels are ``applyInPandasWithState`` over a blocking key, so
state is sharded exactly like the batch shuffles are:

- exact: key = sha2(text); state = 1 bigint (first-seen doc_id).
  State size = |distinct contents| x 8 bytes, the same cardinality the
  batch groupBy shuffles.
- minhash: key = (band_no, bucket) from the SAME 16-hash/4-band
  signature math as the batch ``zx_dedup_minhash`` (signatures are
  computed scan-local via array higher-order functions — no streaming
  pre-aggregation needed); state = the bucket's posting list. A new
  doc emits one candidate-pair event per indexed bucket member, then
  joins the index — so the pair stream is exactly the batch band-
  collision pair set on the same data (verified by test equality at
  sf0.001/sf0.01 against the batch operator's per-doc degrees).

Ordered-replay contract (shared with the CEP fast path): first-seen =
lowest doc_id because the bounded file replay delivers doc_id order.

State posture: the REGISTERED minhash query is bounded on BOTH axes —
``STREAM_BUCKET_CAP`` caps every posting list (probe-but-don't-index
beyond the cap, so coverage holds) and a processing-time TTL
(``STREAM_STATE_TTL_MS``, mirroring the reference's 60 s dedup EXPIRE,
auto_kafka_redis.py:332-346) evicts idle buckets. The UNCAPPED,
no-timeout kernel remains available as the batch-parity test harness
(``stream_minhash_pairs(..., bucket_cap=None, ttl_ms=None)``) — it is
deliberately NOT the registered default, because an uncapped stateful
index does not survive an unbounded stream. Exact dedup keeps
NoTimeout by contract: its oracle is all-history first-wins.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from eventstream_notify_spark.registry import register
from eventstream_notify_spark.sources.documents import file_documents_stream
from eventstream_notify_spark.streaming.pipeline import (
    run_bounded,
    run_bounded_files,
)

# Per-bucket index budget (the NN_BUCKET_CAP precedent, arrival-order
# deterministic): members beyond the cap still PROBE the bucket (their
# pairs against indexed members are emitted) but are not added to the
# index, bounding both state size and per-arrival pair fan-out for a
# pathological bucket. None = unbounded (test parity with the batch
# operator, whose class compression has no doc-level cap).
STREAM_BUCKET_CAP = 256

# Idle-bucket eviction horizon (processing-time ms). A bucket that
# sees no arrival for this long drops its posting list — the streaming
# analogue of the reference's 60 s dedup-key EXPIRE. None = NoTimeout
# (the batch-parity harness only).
STREAM_STATE_TTL_MS = 60_000

DEDUP_EXACT_OUTPUT = "doc_id long, canonical_id long, is_dup boolean"
DEDUP_EXACT_STATE = "min_id long"

MINHASH_N_HASHES = 16  # must match operators/text.py dedup_minhash
MINHASH_BAND_ROWS = 4
MINHASH_OUTPUT = "band_no int, doc_id long, partners array<long>"
MINHASH_STATE = "members array<long>"


def dedup_exact_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per content-hash: first arrival is canonical, every later
    arrival is a duplicate pointing at it. O(1) state per distinct
    content."""
    chunks = [c for c in pdfs if len(c)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
    cur = int(state.get[0]) if state.exists else None
    canon, dup = [], []
    for did in pdf["doc_id"]:
        did = int(did)
        if cur is None:
            cur = did
        canon.append(min(cur, did))
        dup.append(did != canon[-1])
        cur = min(cur, did)
    out = pdf[["doc_id"]].copy()
    out["canonical_id"] = canon
    out["is_dup"] = dup
    state.update((cur,))
    yield out


def stream_exact_flags(docs: DataFrame) -> DataFrame:
    """The stateful exact-dedup frame over a document stream (builder
    shared by the registered query and the decade-audit harness)."""
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("h"), "doc_id"
    )
    return keyed.groupBy("h").applyInPandasWithState(
        dedup_exact_fn,
        DEDUP_EXACT_OUTPUT,
        DEDUP_EXACT_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_dedup_exact",
    extra=True,
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY text) AS canonical_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_dup
    FROM documents
    """,
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact dedup: the batch ``dedup_exact`` decision made
    at arrival time. Each document is admitted or flagged the moment
    it arrives, against everything seen before — the decision the
    batch job can only make after the fact. On the ordered bounded
    replay first-seen = min doc_id, so the result hash-matches the
    batch window oracle exactly."""
    return run_bounded(
        stream_exact_flags(file_documents_stream(spark, sf_dir))
    )


# ---------------------------------------- bounded-state exact dedup
#
# `stream_dedup_exact`'s state is LINEAR in distinct contents (its
# oracle is all-history first-wins, so that's the floor for exact
# semantics: 10.0x state per 10x docs in SCALING_DECADE). At 100 TB
# the state store would BE the corpus digest set. This tier bounds
# state by construction — no timers, so it replays under availableNow:
#
#   bloom-front: per shard, a SCALABLE bloom filter (Almeida et al.,
#     "Scalable Bloom Filters", 2007) remembers every content ever
#     admitted (no deletions -> a seen content can NEVER be
#     re-admitted: zero false admits, the property exact dedup exists
#     for). The filter is a list of segments: segment j has
#     BLOOM_BITS<<j bits and a capacity chosen so its false-positive
#     rate at retirement is BLOOM_P0 * BLOOM_SEG_R**j; when the
#     newest segment reaches capacity, a fresh (larger, tighter)
#     segment opens. Membership = fully-set in ANY segment; inserts
#     go to the newest only.
#   exact-escrow: per shard, the most recent ESCROW_CAP content
#     digests with their first-seen doc_id. A dup that hits escrow
#     resolves exactly (canonical_id + exact=true); older dups resolve
#     via the bloom alone (is_dup=true, canonical_id null,
#     exact=false).
#
# The accuracy trade is one-sided, measurable, and — this is what the
# scalable construction buys over r11's fixed filter — does NOT decay
# with corpus size: a NOVEL content can be falsely dropped only by a
# bloom false positive, and the total FP probability is bounded by
# sum_j BLOOM_P0 * BLOOM_SEG_R**j <= BLOOM_P0 / (1 - BLOOM_SEG_R)
# = 1e-3 at ANY distinct cardinality (the r11 fixed 16384-bit filter
# held ~9e-4 only to ~1.5k distinct/shard ~ 1e5 total and then
# saturated toward dropping ALL novel content — the ADVICE r11 flag).
# State stays BLOOM_SHARDS rows forever; state BYTES grow at the
# information-theoretic-ish ~25-36 bits per distinct content admitted
# (each doubling segment holds ~1.66x more), i.e. ~4 B/distinct vs
# the exact tier's ~72 B/distinct (64-hex digest + id) — a ~20x state
# compression with a hard FP bound instead of an accuracy horizon.
# All hashing derives from the sha256 hex digest (shard and bit
# positions are hex slices, per-segment modulus), so a pure-python
# twin replays the kernel bit-for-bit.
#
# CHECKPOINT-FORMAT BREAK (r12, ADVICE r12): the state schema changed
# from the r11 fixed-filter shape (`bloom binary, esc_h, esc_id`) to
# `blooms array<binary>, seg_n long, esc_h, esc_id`. A streaming
# checkpoint written by the pre-r12 kernel will fail on resume with a
# state-schema mismatch. Audits and tests always start from fresh
# checkpoints; a long-lived deployment upgrading in place must drain
# + restart with a new checkpoint dir (the admitted-set is then
# rebuilt from replay, or accepted as reset — the bloom is a
# dedup-quality optimization, not a correctness store). In-place
# migration (wrap the legacy 16384-bit filter as segment 0) is
# possible but deliberately not implemented: silent auto-migration of
# a probabilistic structure is harder to audit than an explicit
# restart.

BLOOM_SHARDS = 64  # state keys: numRowsTotal <= 64 regardless of corpus
BLOOM_BITS = 16_384  # segment-0 bits, 2 KiB (segment j: BLOOM_BITS<<j)
BLOOM_K = 4  # probe positions per content per segment
BLOOM_P0 = 5e-4  # segment-0 FP target at retirement
BLOOM_SEG_R = 0.5  # per-segment FP tightening ratio (total <= P0/(1-R))
ESCROW_CAP = 512  # exact (digest, first_id) pairs kept per shard

BOUNDED_EXACT_OUTPUT = (
    "doc_id long, canonical_id long, is_dup boolean, exact boolean"
)
BOUNDED_EXACT_STATE = (
    "blooms array<binary>, seg_n long, "
    "esc_h array<string>, esc_id array<long>"
)


def _seg_bits(j: int) -> int:
    """Bits in scalable-bloom segment j (geometric growth)."""
    return BLOOM_BITS << j


def _seg_capacity(j: int) -> int:
    """Inserts segment j accepts before a new segment opens — chosen
    so its standalone FP at retirement is BLOOM_P0 * BLOOM_SEG_R**j:
    n = m/k * -ln(1 - p**(1/k)) from p = (1 - e^(-k n / m))**k."""
    import math

    p = BLOOM_P0 * BLOOM_SEG_R**j
    return int(_seg_bits(j) / BLOOM_K * -math.log(1.0 - p ** (1.0 / BLOOM_K)))


def _bloom_positions(hex_digest: str, m_bits: int = BLOOM_BITS) -> list[int]:
    """BLOOM_K bit positions from non-overlapping hex slices of the
    sha256 digest (slices start at offset 4; the shard key uses
    [0:4]), taken mod the segment's bit count. Pure string math —
    identical in the python twin."""
    return [
        int(hex_digest[4 + 8 * i : 12 + 8 * i], 16) % m_bits
        for i in range(BLOOM_K)
    ]


def make_bounded_exact_fn(escrow_cap: int = ESCROW_CAP):
    """Kernel factory (cap parameterized so tests can force escrow
    eviction on a small corpus)."""

    def bounded_exact_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        if state.exists:
            blooms_b, seg_n, esc_h, esc_id = state.get
            blooms = [int.from_bytes(b, "big") for b in blooms_b]
            seg_n = int(seg_n)
            esc = dict(zip(list(esc_h), [int(i) for i in esc_id]))
        else:
            blooms = [0]
            seg_n = 0
            esc = {}
        out_id, out_canon, out_dup, out_exact = [], [], [], []
        for did, h in zip(pdf["doc_id"], pdf["h"]):
            did = int(did)
            if h in esc:
                out_canon.append(esc[h])
                out_dup.append(True)
                out_exact.append(True)
            else:
                seen = False
                for j, bl in enumerate(blooms):
                    mask = 0
                    for p in _bloom_positions(h, _seg_bits(j)):
                        mask |= 1 << p
                    if bl & mask == mask:
                        seen = True
                        break
                if seen:
                    # seen before (or a <=1e-3-bounded false
                    # positive): drop, canonical unknown — the escrow
                    # entry has aged out
                    out_canon.append(None)
                    out_dup.append(True)
                    out_exact.append(False)
                else:
                    j = len(blooms) - 1
                    if seg_n >= _seg_capacity(j):
                        # newest segment at capacity: open the next
                        # (larger, tighter) one — total FP stays
                        # <= BLOOM_P0 / (1 - BLOOM_SEG_R) forever
                        blooms.append(0)
                        j += 1
                        seg_n = 0
                    mask = 0
                    for p in _bloom_positions(h, _seg_bits(j)):
                        mask |= 1 << p
                    blooms[j] |= mask
                    seg_n += 1
                    esc[h] = did
                    out_canon.append(did)
                    out_dup.append(False)
                    out_exact.append(True)
            out_id.append(did)
        if len(esc) > escrow_cap:  # FIFO: dict preserves insert order
            for stale in list(esc)[: len(esc) - escrow_cap]:
                del esc[stale]
        state.update(
            (
                [
                    b.to_bytes(_seg_bits(j) // 8, "big")
                    for j, b in enumerate(blooms)
                ],
                seg_n,
                list(esc.keys()),
                list(esc.values()),
            )
        )
        yield pd.DataFrame(
            {
                "doc_id": out_id,
                "canonical_id": pd.array(out_canon, dtype="Int64"),
                "is_dup": out_dup,
                "exact": out_exact,
            }
        )

    return bounded_exact_fn


def stream_bounded_exact_flags(
    docs: DataFrame, escrow_cap: int = ESCROW_CAP
) -> DataFrame:
    """Bounded-state exact-dedup frame: shard key = first 4 hex chars
    of the sha256 digest mod BLOOM_SHARDS, so state rows are capped at
    BLOOM_SHARDS no matter how many distinct contents arrive."""
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("h"), "doc_id"
    ).withColumn(
        "shard",
        (F.conv(F.substring("h", 1, 4), 16, 10).cast("long")
         % BLOOM_SHARDS).cast("int"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_bounded_exact_fn(escrow_cap),
        BOUNDED_EXACT_OUTPUT,
        BOUNDED_EXACT_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


@register("stream_dedup_exact_bounded", extra=True)  # rows-only: bloom
# membership is not SQL-expressible; a pure-python twin replays the
# kernel bit-for-bit in tests (the xxhash/zlib rows-only precedent)
def stream_dedup_exact_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact dedup, BOUNDED-STATE tier: the 100 TB posture
    of ``zx_stream_dedup_exact``. Admission semantics are preserved
    exactly — the bloom front never forgets, so a seen content is
    never re-admitted (zero false admits) — while state stays
    <= BLOOM_SHARDS rows forever (a scalable bloom per shard +
    ESCROW_CAP digests) instead of linear in distinct contents. The
    trade: dups older than the escrow horizon resolve with
    canonical_id null (exact=false), and a novel content is falsely
    dropped with probability bounded by BLOOM_P0/(1-BLOOM_SEG_R)
    = 1e-3 at ANY corpus size — the scalable segments (r12) remove
    the fixed filter's ~1e5-distinct accuracy horizon; state bytes
    grow ~4 B per distinct content (~20x under the exact tier's
    digest set). Pinned <=1% by test, segment growth + FP bound by
    kernel test."""
    return run_bounded(
        stream_bounded_exact_flags(file_documents_stream(spark, sf_dir))
    )


_PARTNER_CHUNK = 2_000_000  # total list elements per yielded frame:
# bounds the Arrow batch a mega-bucket can hand back in one transfer


def make_minhash_indexer(bucket_cap: int | None, ttl_ms: int | None = None):
    """Kernel factory: per (band_no, bucket), emit each arriving doc's
    PARTNER SNAPSHOT — the bucket members indexed at its arrival —
    then index the doc (subject to the cap). Pair rows materialize
    later, JVM-side, as a parallel batch explode.

    Two redesigns, both measured on the saturated-vocabulary corpus
    (identical token sets put a 2,319-doc bucket at sf0.1):
    - the first cut walked python lists per arriving doc and exploded
      pairs IN the kernel: ~11.2M pair rows built in the interpreter
      and pushed row-form through Arrow and the sink — 78 s
      standalone, and (with the memory sink) the JVM OOM that killed
      61 downstream bench queries;
    - the vectorized-pairs cut (numpy repeat/tile/triu) fixed the
      interpreter cost but still shipped 11.2M 2-column rows through
      the single-task stateful stage and its sink — 28 s.
    Emitting one (doc, partners array<long>) row per arrival keeps
    the kernel to memcpys, halves the serialized volume (each pair
    appears once as a list element, not as two row columns), lets
    parquet list-encode it, and defers the 11.2M-row expansion to the
    batch side where it parallelizes across the full core count.
    Semantics (incl. the cap's probe-but-don't-index rule and
    arrival-order indexing) are unchanged: arrivals sorted by doc_id,
    the first (cap - |members|) arrivals are indexed, every arrival's
    snapshot is the pre-existing members plus arrivals indexed before
    it."""
    import numpy as np

    def index_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle-bucket eviction: the posting list expires like the
            # reference's dedup:{id} keys (60 s EXPIRE) — later
            # arrivals rebuild the index from scratch
            state.remove()
            return
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        band_no = int(key[0])
        members = (
            np.asarray(state.get[0], dtype=np.int64)
            if state.exists
            else np.empty(0, dtype=np.int64)
        )
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        # a re-delivered id neither re-probes nor re-indexes: its pairs
        # were emitted at first delivery, and indexing it twice would
        # both grow state and put the doc in its own partner snapshot
        if members.size:
            ids = ids[~np.isin(ids, members)]
        ids = np.unique(ids)  # already sorted; collapses in-batch dups
        q = (
            ids.size
            if bucket_cap is None
            else max(0, bucket_cap - members.size)
        )
        state.update((np.concatenate([members, ids[:q]]).tolist(),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        docs: list[int] = []
        parts: list[np.ndarray] = []
        elems = 0
        for i in range(ids.size):
            ni = min(i, q)
            if members.size + ni == 0:
                continue
            snap = (
                np.concatenate([members, ids[:ni]]) if ni else members
            )
            docs.append(int(ids[i]))
            parts.append(snap)
            elems += snap.size
            if elems >= _PARTNER_CHUNK:
                yield pd.DataFrame(
                    {
                        "band_no": np.full(
                            len(docs), band_no, dtype=np.int32
                        ),
                        "doc_id": docs,
                        "partners": parts,
                    }
                )
                docs, parts, elems = [], [], 0
        if docs:
            yield pd.DataFrame(
                {
                    "band_no": np.full(len(docs), band_no, dtype=np.int32),
                    "doc_id": docs,
                    "partners": parts,
                }
            )

    return index_fn


def _doc_band_rows(docs: DataFrame) -> DataFrame:
    """Scan-local signature + banding — the SAME math as the batch
    ``zx_dedup_minhash`` (16 seeded xxhash64 minima over the distinct
    token set, 4-row bands hashed with the band index), but computed
    per row with array higher-order functions instead of an
    explode/groupBy: a streaming pre-aggregation would be a second
    stateful operator, and the fold over a document's own token array
    needs no shuffle at all. Each minhash fold is referenced exactly
    once (its band's hash), so the no-CSE interpreted-HOF trap does
    not bite."""
    from eventstream_notify_spark.operators.text import tokens_col

    toks = F.array_distinct(tokens_col())

    # seed must bind via a closure factory: a `lambda t, s=seed:`
    # default-arg binding has ARITY 2, which F.transform interprets as
    # the (element, index) lambda form — the "seed" silently becomes
    # the array index and all 16 hash functions collapse into one.
    def _minhash(seed: int) -> F.Column:
        return F.array_min(
            F.transform(toks, lambda t: F.xxhash64(t, F.lit(seed)))
        )

    mins = [_minhash(seed) for seed in range(MINHASH_N_HASHES)]
    bands = [
        F.xxhash64(
            F.lit(b),
            *mins[b * MINHASH_BAND_ROWS : (b + 1) * MINHASH_BAND_ROWS],
        ).alias(f"band{b}")
        for b in range(MINHASH_N_HASHES // MINHASH_BAND_ROWS)
    ]
    return docs.select("doc_id", *bands).select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.col(f"band{b}")
                    for b in range(
                        MINHASH_N_HASHES // MINHASH_BAND_ROWS
                    )
                ]
            )
        ).alias("band_no", "bucket"),
    )


def stream_minhash_pairs(
    docs: DataFrame,
    bucket_cap: int | None = STREAM_BUCKET_CAP,
    ttl_ms: int | None = STREAM_STATE_TTL_MS,
) -> DataFrame:
    """Streaming banded-minhash candidate snapshots: one row per
    (arriving doc, band) carrying the partner array — explode it
    batch-side for the per-(pair, band) collision events, each
    emitted when the LATER document arrives.

    Defaults are the BOUNDED posture (cap + idle TTL); pass
    ``bucket_cap=None, ttl_ms=None`` only for batch-parity testing."""
    rows = _doc_band_rows(docs)
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return rows.groupBy("band_no", "bucket").applyInPandasWithState(
        make_minhash_indexer(bucket_cap, ttl_ms=ttl_ms),
        MINHASH_OUTPUT,
        MINHASH_STATE,
        "append",
        timeout,
    )


def minhash_snapshot_degrees(snaps: DataFrame) -> DataFrame:
    """Batch-side finish of the snapshot stream: explode partner
    arrays into pairs, dedup across bands, count per-doc degree.

    The file sink's compact list-encoded parquet reads back as a
    couple of splits, so repartition first or the 11.2M-row explode
    (sf0.1) runs on one core. The ``doc_id != m`` guard is
    belt-and-braces against a snapshot ever containing the arriving
    doc itself (the kernel skips re-delivered ids, but a self-pair
    would silently inflate n_candidates)."""
    pairs = (
        snaps.repartition(32, "doc_id")
        .select("doc_id", F.explode("partners").alias("m"))
        .filter(F.col("doc_id") != F.col("m"))
        .select(
            F.least("doc_id", "m").alias("doc_a"),
            F.greatest("doc_id", "m").alias("doc_b"),
        )
    )
    return (
        pairs.distinct()
        .groupBy("doc_a")
        .agg(F.count("*").alias("n_candidates"))
    )


@register("stream_dedup_minhash", extra=True)  # rows-only: LSH + JVM hashes
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING minhash near-dup candidates — ``zx_dedup_minhash``'s
    incremental arrival shape: every arriving document probes its 4
    band buckets against the accumulated index and emits its candidate
    pairs immediately. Returns per-doc candidate degree keyed by the
    pair's smaller id, the batch operator's exact output contract.

    Registered posture = BOUNDED STATE: ``STREAM_BUCKET_CAP`` (256)
    caps every posting list — members beyond the cap still probe, so
    every doc with any uncapped candidate keeps at least one (coverage
    property pinned by test) — and idle buckets evict after
    ``STREAM_STATE_TTL_MS``. This is the posture that survives an
    unbounded stream; the uncapped/no-timeout variant exists purely as
    the batch-parity test harness (equality with the batch operator
    pinned at sf0.001 and sf0.01 in tests). Below the cap the two are
    identical — at sf0.01 the hottest bucket holds ~230 docs, so the
    registered output equals batch there too. Rows-only like the
    batch sibling (xxhash64 has no DuckDB twin)."""
    # file sink, NOT the memory sink: the snapshot stream is
    # data-sized (11.2M partner elements at sf0.1) and the memory sink
    # would gather it all on the driver heap — the measured bench-OOM
    # failure mode. Pair expansion happens batch-side where it
    # parallelizes across the full core count.
    #
    # ttl_ms=None HERE ONLY: an availableNow replay cannot terminate
    # with pending processing-time timers — measured: the query loops
    # timeout-processing micro-batches forever (state version 23+ on a
    # 4-row corpus) and never exits. The TTL is the CONTINUOUS-trigger
    # default (production posture, exercised by the eviction test);
    # this bounded harness runs seconds, far under any sane TTL, so
    # opting out changes nothing it would ever observe.
    snaps = run_bounded_files(
        stream_minhash_pairs(
            file_documents_stream(spark, sf_dir), ttl_ms=None
        )
    )
    return minhash_snapshot_degrees(snaps)
