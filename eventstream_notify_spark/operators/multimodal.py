"""Multimodal (binary) column plumbing — the north star's image/audio/
video requirement, with the codec layer stubbed (no media libs in this
container) and every Spark-side piece real: binary columns with typed
metadata, Arrow-batched ``mapInPandas`` decode, deterministic
fake-decode so the pipeline is testable end-to-end and oracle-checked.

Scale: media bytes ride along as an opaque ``binary`` column; decode /
feature-extract runs as mapInPandas over Arrow batches (one Python
roundtrip per batch, not per row). Partition sizing is byte-aware —
``spark.sql.files.maxPartitionBytes`` governs how many blobs land in
one task.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_media(payload: bytes, fmt: str) -> dict:
    """REAL codec entry point — intentionally unimplemented here.

    In production this dispatches to PIL/ffmpeg/soundfile per ``fmt``.
    The container has no media libraries, so the engine ships the
    deterministic :func:`fake_decode` below for plumbing tests.
    """
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use fake_decode (deterministic) for pipeline tests"
    )


def fake_decode_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel: 'decode' each blob into (width, height,
    n_frames) derived deterministically from the byte length — the
    exact batch shape a real decoder would use."""
    for pdf in batches:
        n = pdf["payload"].str.len().astype("int64")
        out = pdf[["doc_id"]].copy()
        out["n_bytes"] = n
        out["width"] = (32 + n % 64).astype("int32")
        out["height"] = (32 + (n // 64) % 64).astype("int32")
        out["n_frames"] = (1 + n % 3).astype("int32")
        yield out


def with_media_column(df: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Here the 'media' is the UTF-8 text bytes (deterministic stand-in);
    in production this column comes straight off the lakehouse scan.
    """
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("fmt"),
            F.length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


@register(
    "mm_decode_stub",
    extra=True,
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(32 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           CAST(32 + (octet_length(encode(text)) // 64) % 64 AS INTEGER)
               AS height,
           CAST(1 + octet_length(encode(text)) % 3 AS INTEGER) AS n_frames
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline, end to end: binary payload column →
    Arrow-batched mapInPandas 'decode' → typed metadata frame. The
    codec itself is the deterministic stub (see decode_media); the
    schema, batching, and partitioning are the real article."""
    d = table(spark, sf_dir, "documents")
    media = with_media_column(d)
    return media.select("doc_id", "payload").mapInPandas(
        fake_decode_batches, DECODED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_key", T.LongType()),
    ]
)


def frame_sample_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel with a VARIABLE number of output rows per
    input row — the frame-sampling shape (one video blob in, k sampled
    frames out). Stride-2 sampling over the stub's frame count; the
    frame key is a deterministic function of (bytes, idx) standing in
    for the decoded frame handle."""
    import pandas as pd

    for pdf in batches:
        n = pdf["payload"].str.len().astype("int64")
        frames = (1 + n % 3).astype("int64")
        rows = {"doc_id": [], "frame_idx": [], "frame_key": []}
        for doc_id, nb, nf in zip(pdf["doc_id"], n, frames):
            for idx in range(0, int(nf), 2):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_key"].append((nb * 31 + idx) % 2_147_483_647)
        out = pd.DataFrame(rows)
        out["frame_idx"] = out["frame_idx"].astype("int32")
        yield out


@register(
    "mm_frame_sample",
    extra=True,
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, 1 + octet_length(encode(text)) % 3, 2))
                AS INTEGER) AS frame_idx,
           (octet_length(encode(text)) * 31
            + unnest(range(0, 1 + octet_length(encode(text)) % 3, 2)))
               % 2147483647 AS frame_key
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over media blobs: mapInPandas emitting 0..k rows
    per input blob (the row-expanding generator shape a real
    video-frame sampler needs — NOT expressible as a scalar UDF).
    Deterministic stub frames keep it oracle-checkable."""
    d = table(spark, sf_dir, "documents")
    media = with_media_column(d)
    return media.select("doc_id", "payload").mapInPandas(
        frame_sample_batches, FRAME_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("distinct_bytes", T.IntegerType()),
    ]
)


def feature_extract_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel doing REAL byte-level numeric work on the
    binary column (numpy over the raw buffer — exactly what a
    lightweight media featurizer does before the expensive decode):
    mean/std/cardinality of the byte distribution per blob."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            recs.append(
                (
                    doc_id,
                    int(b.size),
                    round(float(b.mean()), 6) if b.size else None,
                    round(float(b.std()), 6) if b.size else None,
                    int(np.unique(b).size),
                )
            )
        yield pd.DataFrame(
            recs,
            columns=[
                "doc_id", "n_bytes", "byte_mean", "byte_std",
                "distinct_bytes",
            ],
        )


@register("mm_feature_extract", extra=True)  # rows-only: byte-level numpy kernel
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the binary column — numpy statistics on
    the raw bytes via Arrow batches. Rows-only (no SQL engine computes
    byte-buffer statistics); exactness vs a pure-Python reference is
    pinned in tests."""
    d = table(spark, sf_dir, "documents")
    media = with_media_column(d)
    return media.select("doc_id", "payload").mapInPandas(
        feature_extract_batches, FEATURE_SCHEMA
    )

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)

PHASH_STRIDE = 7  # keep every 7th byte before hashing


def phash_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel: perceptual-hash stand-in — md5 over a
    strided byte downsample of the blob (every PHASH_STRIDE-th byte).
    A real pHash decodes + DCTs the image; the downsample-then-hash
    SHAPE (bytes in, tiny digest out, per-blob independence) is
    identical, and this one is deterministic and cross-engine
    checkable."""
    import hashlib

    for pdf in batches:
        out = pdf[["doc_id"]].copy()
        out["phash"] = [
            hashlib.md5(bytes(p)[::PHASH_STRIDE]).hexdigest()
            for p in pdf["payload"]
        ]
        yield out


@register(
    "mm_dedup_phash",
    extra=True,
    oracle=f"""
    WITH ph AS (
        SELECT doc_id,
               md5(array_to_string(list_transform(
                   range(1, len(text) + 1, {PHASH_STRIDE}),
                   i -> text[i]), '')) AS phash
        FROM documents
    )
    SELECT phash, MIN(doc_id) AS canonical_id,
           COUNT(*) AS copies
    FROM ph GROUP BY 1
    """,
)
def mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-asset dedup by content fingerprint: downsample each
    binary blob, hash it, group identical fingerprints, keep the
    min-id canonical — exact dedup_exact semantics lifted onto the
    multimodal column via the Arrow decode path (the dedup a crawl
    pipeline runs on images before any ML model sees them).

    The oracle recomputes the same strided digest in SQL over the
    text the stub blobs wrap (the corpus is ASCII, so byte stride ==
    char stride — asserted in tests).

    Scale: per-blob kernel is embarrassingly parallel over Arrow
    batches; the shuffle moves 16-byte digests, never blobs — the
    dedup_exact scale story, unchanged by payload size."""
    d = table(spark, sf_dir, "documents")
    media = with_media_column(d)
    ph = media.select("doc_id", "payload").mapInPandas(
        phash_batches, PHASH_SCHEMA
    )
    return ph.groupBy("phash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("copies"),
    )


SHARD_TARGET_BYTES = 16_384  # prod: 256MB-1GB tar shards; scaled to corpus


@register(
    "mm_shard_pack",
    extra=True,
    oracle=f"""
    WITH assets AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             CAST(('0x' || substring(
                 md5('shard:' || CAST(doc_id AS STRING)), 1, 15))
                 AS UBIGINT) AS k
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_bytes,
             CAST(SUM(n_bytes) OVER (ORDER BY k, doc_id) AS BIGINT)
                 - n_bytes AS start_off
      FROM assets
    )
    SELECT start_off // {SHARD_TARGET_BYTES} AS shard_id,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes
    FROM c GROUP BY 1
    """,
)
def mm_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard assignment: media assets packed into
    size-balanced shards in a deterministic pseudo-random order (hash
    key shuffles correlated neighbors apart), shard = byte offset of
    the asset's start div the target shard size. The export step every
    multimodal training pipeline runs before writing tar shards.

    The global byte-offset running sum uses the SAME bucket-prefix
    pattern as zx_llm_epoch_shuffle (256 hash-key buckets, per-bucket
    cumsum in parallel, tiny bucket-total table prefix-summed and
    broadcast back) — never one task scanning all assets. Blobs
    themselves never shuffle; only (doc_id, n_bytes, key) triples do.
    """
    d = table(spark, sf_dir, "documents")
    assets = d.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias(
            "n_bytes"
        ),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("k"),
    ).withColumn("bucket", F.shiftright("k", 52))
    btot = assets.groupBy("bucket").agg(F.sum("n_bytes").alias("b"))
    w_off = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "bucket", F.coalesce(F.sum("b").over(w_off), F.lit(0)).alias("boff")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        assets.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_off",
            F.col("boff") + F.sum("n_bytes").over(w_local) - F.col("n_bytes"),
        )
        .groupBy(
            F.expr(f"start_off div {SHARD_TARGET_BYTES}").alias("shard_id")
        )
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("shard_bytes"),
        )
    )
