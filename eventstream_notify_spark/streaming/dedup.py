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
State is never timed out — it IS the index; production would hook a
TTL or compaction policy where the ``STREAM_BUCKET_CAP`` budget sits.
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

DEDUP_EXACT_OUTPUT = "doc_id long, canonical_id long, is_dup boolean"
DEDUP_EXACT_STATE = "min_id long"

MINHASH_N_HASHES = 16  # must match operators/text.py dedup_minhash
MINHASH_BAND_ROWS = 4
MINHASH_OUTPUT = "doc_a long, doc_b long, band_no int"
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
    docs = file_documents_stream(spark, sf_dir)
    keyed = docs.select(
        F.sha2(F.col("text"), 256).alias("h"), "doc_id"
    )
    res = keyed.groupBy("h").applyInPandasWithState(
        dedup_exact_fn,
        DEDUP_EXACT_OUTPUT,
        DEDUP_EXACT_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return run_bounded(res)


_PAIR_CHUNK = 2_000_000  # rows per yielded frame: bounds the Arrow
# batch a mega-bucket can hand back to the JVM in one transfer


def make_minhash_indexer(bucket_cap: int | None):
    """Kernel factory: per (band_no, bucket), emit candidate pairs of
    each arriving doc against the bucket's indexed members, then index
    the doc (subject to the cap).

    VECTORIZED: the first cut walked python lists per arriving doc,
    and on a saturated-vocabulary corpus (identical token sets put
    ~the whole corpus in a handful of buckets) one kernel invocation
    appended ~12.5M pair ints through the interpreter — 78 s at sf0.1
    standalone and a JVM heap OOM mid-bench that killed the 61
    queries after it. The pair set decomposes into three dense blocks
    — (arrivals x existing members) + triangular(indexed arrivals) +
    (overflow arrivals x indexed arrivals) — each a numpy
    repeat/tile/triu_indices construction, yielded in bounded chunks
    so a mega-bucket can never hand the JVM one giant Arrow batch.
    Semantics (incl. the cap's probe-but-don't-index rule and
    arrival-order indexing) are unchanged: arrivals are sorted by
    doc_id, the first (cap - |members|) of them are indexed, every
    arrival pairs with all pre-existing members plus the arrivals
    indexed before it."""
    import numpy as np

    def index_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
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
        q = (
            ids.size
            if bucket_cap is None
            else max(0, bucket_cap - members.size)
        )
        blocks = []
        if members.size and ids.size:
            a = np.repeat(ids, members.size)
            b = np.tile(members, ids.size)
            blocks.append((np.minimum(a, b), np.maximum(a, b)))
        if q > 1:
            iu, ju = np.triu_indices(min(q, ids.size), 1)
            blocks.append((ids[iu], ids[ju]))  # ids sorted ascending
        if q < ids.size and q > 0:
            a = np.repeat(ids[q:], q)
            b = np.tile(ids[:q], ids.size - q)
            blocks.append((np.minimum(a, b), np.maximum(a, b)))
        state.update((np.concatenate([members, ids[:q]]).tolist(),))
        if not blocks:
            return
        pa = np.concatenate([x for x, _ in blocks])
        pb = np.concatenate([y for _, y in blocks])
        for lo in range(0, pa.size, _PAIR_CHUNK):
            hi = lo + _PAIR_CHUNK
            yield pd.DataFrame(
                {
                    "doc_a": pa[lo:hi],
                    "doc_b": pb[lo:hi],
                    "band_no": np.full(
                        min(hi, pa.size) - lo, band_no, dtype=np.int32
                    ),
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
    docs: DataFrame, bucket_cap: int | None = STREAM_BUCKET_CAP
) -> DataFrame:
    """Streaming banded-minhash candidate pairs: one event per (pair,
    band) collision, emitted when the LATER document arrives."""
    rows = _doc_band_rows(docs)
    return rows.groupBy("band_no", "bucket").applyInPandasWithState(
        make_minhash_indexer(bucket_cap),
        MINHASH_OUTPUT,
        MINHASH_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


@register("stream_dedup_minhash", extra=True)  # rows-only: LSH + JVM hashes
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING minhash near-dup candidates — ``zx_dedup_minhash``'s
    incremental arrival shape: every arriving document probes its 4
    band buckets against the accumulated index and emits its candidate
    pairs immediately. Returns per-doc candidate degree keyed by the
    pair's smaller id, the batch operator's exact output contract —
    the distinct pair set is the same band-collision set, so the two
    operators agree row-for-row (pinned by test at sf0.001 and
    sf0.01). Runs UNCAPPED for parity: the batch sibling has no
    doc-level cap either (its mega-class compression notes the cap as
    the 100 TB policy hook, text.py); the capped kernel is the
    ``STREAM_BUCKET_CAP`` knob, whose everyone-keeps-a-candidate
    coverage property is tested separately. Rows-only like the batch
    sibling (xxhash64 has no DuckDB twin)."""
    # file sink, NOT the memory sink: the pair stream is data-sized
    # (11.2M events at sf0.1) and the memory sink would gather it all
    # on the driver heap — the measured bench-OOM failure mode
    pairs = run_bounded_files(
        stream_minhash_pairs(
            file_documents_stream(spark, sf_dir), bucket_cap=None
        )
    )
    return (
        pairs.select("doc_a", "doc_b")
        .distinct()
        .groupBy("doc_a")
        .agg(F.count("*").alias("n_candidates"))
    )
