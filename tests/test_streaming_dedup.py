"""Streaming corpus dedup (streaming/dedup.py): exactness of the
stateful kernels against their batch siblings, plus the bucket-cap
coverage property."""

from pyspark.sql import functions as F

from eventstream_notify_spark.registry import lookup
from eventstream_notify_spark.sources.documents import file_documents_stream
from eventstream_notify_spark.streaming.dedup import stream_minhash_pairs
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
    """The streaming band-collision pair set equals the batch
    operator's — per-doc candidate degrees agree row-for-row."""
    batch = {
        r.doc_a: r.n_candidates
        for r in lookup("dedup_minhash").fn(spark, SF).collect()
    }
    stream = {
        r.doc_a: r.n_candidates
        for r in lookup("stream_dedup_minhash").fn(spark, SF).collect()
    }
    assert stream == batch


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
                file_documents_stream(spark, SF), bucket_cap=None
            )
        )
    )
    capped = pairs_of(
        run_bounded(
            stream_minhash_pairs(
                file_documents_stream(spark, SF), bucket_cap=64
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
