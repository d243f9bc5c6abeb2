"""Unit tests for the X-series extension operators on tiny literal
frames — properties the sf-scale oracle can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstream_notify_spark.functions.vector import cosine, dot, l2_norm
from eventstream_notify_spark.operators.alerts import apply_rules, rules_df
from eventstream_notify_spark.operators.multimodal import (
    decode_media,
    fake_decode_batches,
    with_media_column,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>, c array<float>"
    )
    row = df.select(
        F.round(cosine("a", "b"), 6).alias("same"),
        F.round(cosine("a", "c"), 6).alias("orth"),
        dot("a", "c").alias("d"),
        l2_norm("a").alias("n"),
    ).first()
    assert row.same == 1.0 and row.orth == 0.0 and row.d == 0.0 and row.n == 1.0


def test_minhash_identical_docs_collide(spark, monkeypatch):
    from eventstream_notify_spark.operators import text as tx

    d = docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact copy
            (3, "zeta eta theta iota kappa"),
        ],
    )
    monkeypatch.setattr(tx, "table", lambda spark, sf_dir, name: d)
    out = tx.dedup_minhash(spark, "ignored").collect()
    got = {(r.doc_a, r.n_candidates) for r in out}
    # identical docs collide in every band -> exactly one candidate edge 1->2
    assert got == {(1, 1)}


def test_simhash_copy_equal_disjoint_differs(spark, monkeypatch):
    from eventstream_notify_spark.operators import text as tx

    d = docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "completely different words here entirely"),
        ],
    )
    monkeypatch.setattr(tx, "table", lambda spark, sf_dir, name: d)
    hashes = {r.doc_id: r.simhash for r in tx.dedup_simhash(spark, "x").collect()}
    assert hashes[1] == hashes[2]
    assert hashes[1] != hashes[3]


def test_alert_rules_unit(spark):
    import datetime as dt

    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 1, "error", 200.0, '{"k": 5}'),
            (2, dt.datetime(2024, 1, 1), 1, "view", 100.0, '{"k": 5}'),
            (3, dt.datetime(2024, 1, 1), 1, "purchase", 5.0, '{"k": 5}'),
            (4, dt.datetime(2024, 1, 1), 1, "click", 10.0, '{"k": 95}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    fired = {(r.rule_id, r.event_id) for r in apply_rules(events, rules_df(spark)).collect()}
    # event 1: error>150 (r1) and value>190 (r2); event 3: purchase<10 (r3);
    # event 4: k>90 (r4); event 2: nothing
    assert fired == {(1, 1), (2, 1), (3, 3), (4, 4)}


def test_decode_media_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image/png")


def test_fake_decode_plumbing(spark):
    d = docs(spark, [(1, "abcd" * 16)])  # 64 bytes
    out = with_media_column(d.withColumn("text", F.col("text"))).mapInPandas(
        fake_decode_batches,
        "doc_id long, n_bytes long, width int, height int, n_frames int",
    ).first()
    assert out.n_bytes == 64
    assert out.width == 32 + 64 % 64
    assert out.height == 32 + (64 // 64) % 64
    assert out.n_frames == 1 + 64 % 3


def test_media_metadata_struct(spark):
    d = docs(spark, [(1, "hello")])
    row = with_media_column(d).first()
    assert bytes(row.payload) == b"hello"
    assert row.media_meta.fmt == "fake/raw"
    assert row.media_meta.n_bytes == 5


def test_mm_feature_extract_matches_python_reference(spark, sf_dir):
    """The Arrow byte-featurizer must agree exactly with a pure-Python
    reference over the same blobs (rows-only op: this test IS its
    correctness gate)."""
    import numpy as np

    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.multimodal import (
        mm_feature_extract,
    )

    got = {
        r.doc_id: (r.n_bytes, r.byte_mean, r.byte_std, r.distinct_bytes)
        for r in mm_feature_extract(spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs[:100]:
        b = np.frombuffer(r.text.encode("utf-8"), dtype=np.uint8)
        want = (
            int(b.size),
            round(float(b.mean()), 6),
            round(float(b.std()), 6),
            int(np.unique(b).size),
        )
        assert got[r.doc_id] == want, (r.doc_id, got[r.doc_id], want)


def test_mm_frame_sample_row_expansion(spark, sf_dir):
    """mapInPandas emits a VARIABLE number of rows per blob: every doc
    has >=1 sampled frame (frame 0), and 3-frame blobs contribute two
    (stride 2)."""
    from eventstream_notify_spark.operators.multimodal import mm_frame_sample

    rows = mm_frame_sample(spark, sf_dir).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(0 in v for v in per_doc.values())
    assert all(set(v) <= {0, 2} for v in per_doc.values())


def test_batch_and_stream_sessionization_agree(spark, sf_dir):
    """The batch gap-sessionizer and the streaming session_window
    (30 min gap both) must carve identical sessions: same count, and
    identical (user, start, n_events) triples."""
    from eventstream_notify_spark.registry import queries

    batch = queries()["zx_sessionize_events"](spark, sf_dir)
    stream = queries()["stream_session"](spark, sf_dir)
    b = {
        (r.user_id, r.start_us, r.n_events)
        for r in batch.collect()
    }
    s = {
        (r.user_id, r.session_start_us, r.n_events)
        for r in stream.collect()
    }
    assert b == s
