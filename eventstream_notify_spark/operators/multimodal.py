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

from pyspark.sql import DataFrame, SparkSession
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
