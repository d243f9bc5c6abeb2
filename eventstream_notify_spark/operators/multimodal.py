"""Multimodal (binary) column plumbing — the north star's image/audio/
video requirement. Every Spark-side piece is real — binary columns
with typed metadata, Arrow-batched ``mapInPandas`` decode — and the
codec layer decodes PPM and BMP for REAL in pure numpy (decode_media);
formats that need external libraries (jpeg/mp4) are rejected
explicitly, with the deterministic fake-decode kept beside the real
path for length-only plumbing tests.

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


def encode_ppm(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as a binary P6 PPM."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "P6 PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Decode a binary P6 PPM (header + raw RGB) with pure numpy —
    a REAL pixel decode, no media libraries needed. Handles the
    whitespace/comment grammar of the netpbm header."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    n = w * h * 3
    a = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return a.reshape(h, w, 3)


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BI_RGB BMP (bottom-up rows, BGR byte order, 4-byte row padding)."""
    import struct

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    row = w * 3
    pad = (-row) % 4
    data = b"".join(
        a[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + dib + data


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BI_RGB BMP with pure numpy."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return rows[::-1] if flip else rows


def decode_media(payload: bytes, fmt: str):
    """Codec dispatch for the binary column. PPM (P6) and BMP (24-bit
    BI_RGB) decode for REAL in pure numpy — header parse + pixel
    array out, the shape any decoder has. Formats needing external
    codec libraries (jpeg/png/mp4/...) are rejected explicitly; in
    production this dispatch grows PIL/ffmpeg/soundfile branches."""
    if fmt in ("image/ppm", "image/x-portable-pixmap"):
        return decode_ppm(payload)
    if fmt in ("image/bmp", "image/x-ms-bmp"):
        return decode_bmp(payload)
    raise ValueError(
        f"no codec for {fmt!r} in this environment (pure-numpy codecs: "
        "image/ppm, image/bmp); production wires PIL/ffmpeg here"
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


MM_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def ppm_bmp_roundtrip_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel running the REAL codec path per blob:
    synthesize a deterministic image per doc (dims + pixels are pure
    functions of doc_id), serialize it to actual PPM (even ids) or BMP
    (odd ids) bytes, then decode THOSE BYTES with decode_media and
    emit stats computed from the decoded pixel array. Any header-parse
    or pixel-order bug breaks the oracle match."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id in pdf["doc_id"]:
            did = int(doc_id)
            w = 4 + did % 5
            h = 3 + did % 4
            px = (
                ((did * 7 + np.arange(3 * w * h)) % 256)
                .astype(np.uint8)
                .reshape(h, w, 3)
            )
            if did % 2 == 0:
                payload, fmt = encode_ppm(px), "image/ppm"
            else:
                payload, fmt = encode_bmp(px), "image/bmp"
            dec = decode_media(payload, fmt)
            recs.append(
                (
                    did,
                    int(dec.shape[1]),
                    int(dec.shape[0]),
                    int(w * h),
                    int(dec.astype(np.int64).sum()),
                )
            )
        yield pd.DataFrame(
            recs, columns=["doc_id", "width", "height", "n_px", "px_sum"]
        )


@register(
    "mm_decode",
    extra=True,
    oracle="""
    WITH dims AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_px,
           CAST(list_sum(list_transform(range(0, 3 * w * h),
                i -> (doc_id * 7 + i) % 256)) AS BIGINT) AS px_sum
    FROM dims
    """,
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode in the distributed Arrow path (the promoted
    successor of mm_decode_stub): every document becomes an actual
    PPM or BMP byte payload, decoded by the pure-numpy codecs in
    decode_media, with output stats computed from the DECODED pixel
    array. The DuckDB oracle recomputes dims and the pixel sum from
    the generating formula — equality proves the full encode →
    header-parse → pixel-array round trip, both codecs, byte-exactly.

    Scale: per-blob kernel over Arrow batches, embarrassingly
    parallel; only doc_id enters the Python worker (blobs are created
    and consumed inside one task, the decode-at-scan shape)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        ppm_bmp_roundtrip_batches, MM_DECODE_SCHEMA
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
    mean/std/cardinality of the byte distribution per blob.

    mean/std derive from EXACT integer moments (sum, sum of squares —
    byte totals stay far under 2^53) with a defined final op order
    (m = s/n; v = ssq/n - m*m), not np.mean/np.std's pairwise float
    reductions — which makes the statistics bit-replayable in SQL."""
    import math

    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            if b.size:
                n = int(b.size)
                s = int(b.sum(dtype=np.int64))
                ssq = int((b.astype(np.int64) ** 2).sum())
                nd = float(n)
                # emitted UNROUNDED: both sides compute the identical
                # IEEE ops from the same exact integers, so the
                # doubles are bit-equal — rounding would only add a
                # half-even-vs-half-away hazard (n=384 byte blobs DO
                # land means on exact 1e-6 midpoints)
                mean = s / nd
                v = max(ssq / nd - mean * mean, 0.0)
                std = math.sqrt(v)
            else:
                mean = std = None
            recs.append(
                (
                    doc_id,
                    int(b.size),
                    mean,
                    std,
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


@register(
    "mm_feature_extract",
    extra=True,
    oracle="""
    WITH ch AS (
        SELECT doc_id, unicode(c) AS b
        FROM (SELECT doc_id, UNNEST(split(text, '')) AS c
              FROM documents WHERE len(text) > 0)
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n, SUM(b) AS s, SUM(b * b) AS ssq,
               COUNT(DISTINCT b) AS dv
        FROM ch GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS byte_mean,
           sqrt(greatest(
               CAST(a.ssq AS DOUBLE) / CAST(a.n AS DOUBLE)
               - (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
                 * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)),
               CAST(0.0 AS DOUBLE))) AS byte_std,
           CAST(COALESCE(a.dv, 0) AS INTEGER) AS distinct_bytes
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over the binary column — numpy statistics on
    the raw bytes via Arrow batches. Oracle-paired (was rows-only):
    the kernel computes mean/std from exact integer byte moments with
    a defined final op order, so SQL replays them bit-for-bit over the
    UTF-8 codepoints (the payload IS the text bytes, and the corpus is
    ASCII — the same identity mm_dedup_phash's oracle rests on);
    exactness vs a pure-Python reference is additionally pinned in
    tests."""
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
    from eventstream_notify_spark.functions.ranking import (
        bucket_prefix_expr,
    )

    btot = assets.groupBy("bucket").agg(F.sum("n_bytes").alias("b"))
    # per-bucket byte offsets: the ≤256-row bucket-total table folds
    # on the driver into a literal-map lookup (constant-bounded,
    # window-free)
    boff = F.coalesce(
        bucket_prefix_expr(btot, "bucket", "b", "sum"), F.lit(0)
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        assets.withColumn(
            "start_off",
            boff + F.sum("n_bytes").over(w_local) - F.col("n_bytes"),
        )
        .groupBy(
            F.expr(f"start_off div {SHARD_TARGET_BYTES}").alias("shard_id")
        )
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("shard_bytes"),
        )
    )


# ------------------------------------------------------------- audio


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a 16-bit mono PCM RIFF/WAVE file."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a 16-bit mono PCM RIFF/WAVE payload with pure numpy —
    a real chunk walk (fmt then data, tolerating extra chunks), not a
    fixed 44-byte offset. Returns (sample_rate, int16 array)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sr = struct.unpack_from(
                "<HHI", payload, body
            )
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported, fmt={audio_fmt}")
        elif cid == b"data":
            if sr is None:
                raise ValueError("data chunk before fmt chunk")
            if bits != 16 or channels != 1:
                raise ValueError(
                    f"only 16-bit mono supported (bits={bits}, ch={channels})"
                )
            a = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=body)
            return sr, a
        pos = body + size + (size % 2)  # chunks are 2-byte aligned
    raise ValueError("no data chunk found")


MM_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_samples", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def wav_roundtrip_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel: synthesize a deterministic int16 waveform
    per doc, serialize it to REAL RIFF/WAVE bytes, decode those bytes
    with decode_wav, and emit stats from the DECODED samples."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id in pdf["doc_id"]:
            did = int(doc_id)
            n = 64 + did % 64
            samples = (
                ((did * 31 + np.arange(n) * 7) % 65536) - 32768
            ).astype(np.int16)
            sr, dec = decode_wav(encode_wav(samples, 8000))
            recs.append(
                (
                    did,
                    int(sr),
                    int(dec.size),
                    int(dec.astype(np.int64).sum()),
                    int(np.abs(dec.astype(np.int64)).max()),
                )
            )
        yield pd.DataFrame(
            recs,
            columns=[
                "doc_id", "sample_rate", "n_samples", "sum_samples", "peak",
            ],
        )


@register(
    "mm_audio_decode",
    extra=True,
    oracle="""
    WITH dims AS (
      SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    ),
    s AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
                 i -> ((doc_id * 31 + i * 7) % 65536) - 32768) AS xs
      FROM dims
    )
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_sum(xs) AS BIGINT) AS sum_samples,
           CAST(list_max(list_transform(xs, x -> abs(x))) AS INTEGER)
               AS peak
    FROM s
    """,
)
def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality, decoded for REAL: every document becomes an
    actual 16-bit mono PCM RIFF/WAVE payload, decoded by the
    pure-numpy chunk-walking parser in decode_wav, with stats computed
    from the DECODED int16 samples. The DuckDB oracle recomputes the
    waveform from the generating formula — equality proves the full
    encode → chunk-walk → sample-array round trip byte-exactly
    (mm_decode is the image twin).

    Scale: per-blob kernel over Arrow batches; only doc_id enters the
    Python worker (payloads live and die inside one task)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        wav_roundtrip_batches, MM_AUDIO_SCHEMA
    )


MM_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("max_frame_energy", T.LongType()),
    ]
)

_AF_FRAME = 32  # feature frame length in samples (full frames only)


def wav_feature_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel: synthesize → encode → DECODE (the same
    byte-real round trip as mm_audio_decode), then compute the
    classic integer-exact audio descriptors from the decoded int16
    samples: zero-crossing count (sign-change scan — the cheap
    voiced/unvoiced + noisiness cue), total energy (Σx², the loudness
    integral), and the framewise energy envelope's maximum over
    32-sample frames (the attack/transient detector's input). All
    integer arithmetic in int64 — no floats anywhere, so the oracle
    can reproduce every value exactly."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id in pdf["doc_id"]:
            did = int(doc_id)
            n = 64 + did % 64
            samples = (
                ((did * 31 + np.arange(n) * 7) % 65536) - 32768
            ).astype(np.int16)
            _, dec = decode_wav(encode_wav(samples, 8000))
            x = dec.astype(np.int64)
            neg = x < 0
            zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
            energy = int((x * x).sum())
            nf = n // _AF_FRAME
            fe = (
                (x[: nf * _AF_FRAME] ** 2)
                .reshape(nf, _AF_FRAME)
                .sum(axis=1)
            )
            recs.append(
                (did, n, zc, energy, nf, int(fe.max()) if nf else 0)
            )
        yield pd.DataFrame(
            recs,
            columns=[
                "doc_id",
                "n_samples",
                "zero_crossings",
                "energy",
                "n_frames",
                "max_frame_energy",
            ],
        )


@register(
    "mm_audio_features",
    extra=True,
    oracle=f"""
    WITH s AS (
      SELECT doc_id, 64 + doc_id % 64 AS n,
             list_transform(range(0, 64 + doc_id % 64),
                 i -> ((doc_id * 31 + i * 7) % 65536) - 32768) AS xs
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(range(1, n),
               i -> CASE WHEN (xs[i] < 0) <> (xs[i + 1] < 0)
                    THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
           CAST(list_sum(list_transform(xs,
               x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS energy,
           CAST(n // {_AF_FRAME} AS BIGINT) AS n_frames,
           CAST(COALESCE(list_max(list_transform(
               range(0, n // {_AF_FRAME}),
               f -> list_sum(list_transform(range(1, {_AF_FRAME} + 1),
                   i -> CAST(xs[f * {_AF_FRAME} + i] AS BIGINT)
                        * xs[f * {_AF_FRAME} + i])))), 0) AS BIGINT)
               AS max_frame_energy
    FROM s
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION over decoded waveforms (the next
    pipeline stage after mm_audio_decode's parsing): zero-crossing
    rate, total energy, and the 32-sample framewise energy envelope's
    max — the descriptors an audio-curation pipeline uses to drop
    silence/clipped/noise clips before training. Features are
    integer-exact (int64 sums of int16 samples), so the DuckDB oracle
    recomputes them from the generating formula and the hash match
    proves the whole synthesize → RIFF-encode → chunk-walk-decode →
    featurize path sample-exactly.

    Scale: same shape as every mm_ kernel — Arrow-batched per-blob
    work, only doc_id crosses into Python, blobs never shuffle;
    framewise energies are a reshape+sum, O(n) per clip."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        wav_feature_batches, MM_AUDIO_FEAT_SCHEMA
    )


MM_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("first_cut_frame", T.IntegerType()),
        T.StructField("total_motion", T.LongType()),
    ]
)

_SC_PIX = 64  # 8x8 grayscale frames
_SC_THRESHOLD = 1000  # L1 frame-difference cut threshold


def scene_cut_batches(batches: Iterator) -> Iterator:
    """mapInPandas kernel: synthesize each doc's deterministic 'video'
    (16..31 frames of 8x8 grayscale; scene id jumps every 4..6 frames,
    in-scene pixels drift by 1/frame), compute consecutive-frame L1
    differences in int64, and threshold them into scene cuts — the
    shot-boundary-detection pass of a video curation pipeline, on
    decoded frames."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        recs = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            nf = 16 + d % 16
            scene_len = 4 + d % 3
            f = np.arange(nf)
            i = np.arange(_SC_PIX)
            scene = f // scene_len
            px = (
                d * 13
                + scene[:, None] * 997
                + i[None, :] * 7
                + f[:, None]
            ) % 256
            diffs = np.abs(px[1:].astype(np.int64) - px[:-1].astype(np.int64)).sum(
                axis=1
            )
            cuts = diffs > _SC_THRESHOLD
            first = int(np.argmax(cuts)) + 1 if cuts.any() else -1
            recs.append(
                (
                    d,
                    nf,
                    int(cuts.sum()),
                    first,
                    int(diffs.sum()),
                )
            )
        yield pd.DataFrame(
            recs,
            columns=[
                "doc_id",
                "n_frames",
                "n_cuts",
                "first_cut_frame",
                "total_motion",
            ],
        )


@register(
    "mm_video_scene_cut",
    extra=True,
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               16 + doc_id % 16 AS nf,
               4 + doc_id % 3 AS slen
        FROM documents
    ),
    d AS (
        SELECT doc_id, nf,
               list_transform(range(1, nf), f ->
                   list_sum(list_transform(range(0, {_SC_PIX}), i ->
                       abs(CAST((doc_id * 13 + (f // slen) * 997
                                 + i * 7 + f) % 256 AS BIGINT)
                           - CAST((doc_id * 13 + ((f - 1) // slen) * 997
                                   + i * 7 + f - 1) % 256 AS BIGINT))
                   ))) AS diffs
        FROM p
    )
    SELECT doc_id,
           CAST(nf AS INTEGER) AS n_frames,
           CAST(len(list_filter(diffs, x -> x > {_SC_THRESHOLD}))
               AS BIGINT) AS n_cuts,
           CAST(COALESCE(list_position(
               list_transform(diffs, x -> x > {_SC_THRESHOLD}), true
           ), -1) AS INTEGER) AS first_cut_frame,
           CAST(list_sum(diffs) AS BIGINT) AS total_motion
    FROM d
    """,
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO temporal analysis — scene-cut (shot boundary) detection:
    consecutive-frame L1 pixel differences over each doc's synthetic
    16–31-frame clip, thresholded into cuts; emits frame count, cut
    count, first cut index, and the total-motion integral (the
    features a video curation pipeline keys sampling and dedup on —
    mm_frame_sample picks frames, this tells you WHERE scenes change
    so you sample one per shot). All arithmetic is int64-exact, so
    the DuckDB oracle replays the full decode+diff from the
    generating formula (the audio/image siblings' discipline extended
    to the temporal axis).

    Shape: per-clip kernel over Arrow batches; only doc_id enters
    Python; frame tensors live and die inside one task — at 100 TB
    the plan is embarrassingly parallel with zero shuffle."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(
        scene_cut_batches, MM_SCENE_SCHEMA
    )
