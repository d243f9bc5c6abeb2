"""Unit + plan tests for the curation operators (chunking, epoch
shuffle, PII redaction)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from eventstream_notify_spark.plans.explain import plan_str
from eventstream_notify_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    """Every doc's token count n implies ceil(max(0,n-64)/48)+1 chunks;
    the last chunk ends exactly at token n (full coverage, no orphan
    tail), and consecutive chunks overlap by exactly 16 tokens."""
    rows = queries()["zx_llm_chunk_overlap"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        # every chunk except the last is full-size
        assert all(c.n_tokens == 64 for c in chunks[:-1])
        last = chunks[-1]
        n = last.chunk_id * 48 + last.n_tokens  # reconstructed token count
        assert len(chunks) == max(0, -(-(max(0, n - 64)) // 48)) + 1
        assert 0 < last.n_tokens <= 64


def test_chunk_overlap_md5_matches_python(spark, sf_dir):
    """Spot-check the chunk text hash against a pure-Python rebuild."""
    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .select("doc_id", "text")
        .first()
    )
    tokens = doc.text.strip().split()
    want = hashlib.md5(" ".join(tokens[0:64]).encode()).hexdigest()
    got = (
        queries()["zx_llm_chunk_overlap"](spark, sf_dir)
        .filter((F.col("doc_id") == doc.doc_id) & (F.col("chunk_id") == 0))
        .first()
        .chunk_md5
    )
    assert got == want


def test_chunk_overlap_is_scan_local(spark):
    """Chunking must be narrow: split/sequence/explode/slice with ZERO
    Exchange — at 100 TB this is the difference between scan-speed and
    a corpus-wide shuffle."""
    df = queries()["zx_llm_chunk_overlap"](spark, SF)
    assert "Exchange" not in plan_str(df, "simple")


def test_epoch_shuffle_is_permutation(spark, sf_dir):
    """Each epoch's pos must be exactly 1..N (bucket offsets + local
    ranks interleave seamlessly), and epochs must order docs
    differently (the permutations are independent)."""
    df = queries()["zx_llm_epoch_shuffle"](spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    per_epoch = (
        df.groupBy("epoch")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("distinct_pos"),
        )
        .collect()
    )
    assert len(per_epoch) == 3
    for r in per_epoch:
        assert (r.n, r.lo, r.hi, r.distinct_pos) == (n_docs, 1, n_docs, n_docs)
    # different epochs must not agree on the first document
    firsts = {r.doc_id for r in df.filter(F.col("pos") == 1).collect()}
    assert len(firsts) > 1


def test_epoch_shuffle_no_single_partition_window(spark):
    """The global rank must come from (epoch, bucket) windows — 768
    fine partitions — never a window partitioned by epoch alone (3
    partitions = whole corpus through 3 tasks)."""
    df = queries()["zx_llm_epoch_shuffle"](spark, SF)
    plan = plan_str(df, "simple")
    import re

    for m in re.finditer(r"row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "bucket" in spec, f"window not bucket-partitioned: {spec}"


def test_pii_redact_counts_and_masks(spark, sf_dir):
    """Every doc gains exactly one email, one phone, one id-run from the
    deterministic contact line; digits inside already-redacted spans
    must not be double-counted."""
    rows = queries()["zx_text_pii_redact"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_email == 1
        assert r.n_phone == 1
        assert r.n_idnum == 1  # the 8-digit lpad id; phone digits consumed
        assert r.n_redactions == 3


def test_pii_redact_matches_python_reference(spark, sf_dir):
    """Rebuild one doc's redaction in pure Python and compare hashes."""
    import re

    doc = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .select("doc_id", "text")
        .first()
    )
    t0 = (
        f"{doc.text} contact user{doc.doc_id}@example.com"
        f" ph 415-555-{doc.doc_id % 10000:04d} id {doc.doc_id:08d}"
    )
    t1 = re.sub(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>", t0)
    t2 = re.sub(r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>", t1)
    t3 = re.sub(r"[0-9]{6,}", "<NUM>", t2)
    want = hashlib.md5(t3.encode()).hexdigest()
    got = (
        queries()["zx_text_pii_redact"](spark, sf_dir)
        .filter(F.col("doc_id") == doc.doc_id)
        .first()
        .redacted_md5
    )
    assert got == want


def test_curation_ops_edge_case_parity_vs_duckdb(spark, tmp_path):
    """Degenerate documents (empty text, single token, leading/
    trailing whitespace, unicode) must hash-match the DuckDB oracle —
    a future testdata regen could contain any of these."""
    import duckdb
    import pandas as pd

    from eventstream_notify_spark.registry import lookup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "",
                "one",
                "  padded  ",
                "naïve café ünïcode tökens",
                "a b c " * 30,
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [0, 3, 10, 25, 180],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.sql(
        "create view documents as select * from "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )

    def fingerprint(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(repr(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        )

    for name in (
        "llm_chunk_overlap",
        "text_pii_redact",
        "llm_epoch_shuffle",
        "llm_bpe_pair_counts",
    ):
        reg = lookup(name)
        sdf = reg.fn(spark, str(tmp_path)).toPandas()
        ddf = con.sql(reg.oracle).df()
        assert fingerprint(sdf) == fingerprint(ddf), name


def test_compress_ratio_matches_python_reference(spark, sf_dir):
    """Rows-only op: the Arrow kernel must agree exactly with direct
    python zlib over the same docs (same level, same rounding)."""
    import zlib

    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.curation import (
        text_compress_ratio,
    )

    got = {
        r.doc_id: (r.compress_ratio, r.keep)
        for r in text_compress_ratio(spark, sf_dir).collect()
    }
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for r in docs[:50]:
        raw = r.text.encode("utf-8")
        ratio = round(len(zlib.compress(raw, 6)) / max(1, len(raw)), 6)
        keep = int(0.25 <= ratio <= 0.9)
        assert got[r.doc_id] == (ratio, keep)


def test_substring_span_invariants(spark):
    """Span accounting must be internally consistent and agree with
    the shingle-level sibling on WHICH docs leak: covered <= total,
    every span covers >= 5 tokens, and a doc has covered tokens iff
    llm_dedup_substring found duplicated shingles for it (same
    first-occurrence rule, independent span algebra)."""
    from eventstream_notify_spark.operators.curation import (
        llm_dedup_substring,
    )
    from eventstream_notify_spark.operators.text import (
        llm_dedup_substring_spans,
    )

    sf = "/root/testdata/sf0.001"
    spans = {r.doc_id: r for r in llm_dedup_substring_spans(spark, sf).collect()}
    assert spans
    for r in spans.values():
        assert 0 <= r.covered_tokens <= r.n_tokens, r
        assert r.covered_tokens >= 5 * min(r.n_spans, 1), r
        assert (r.n_spans == 0) == (r.covered_tokens == 0), r
    leaky = {
        r.doc_id
        for r in llm_dedup_substring(spark, sf).collect()
        if r.n_dup_shingles > 0
    }
    assert leaky == {d for d, r in spans.items() if r.covered_tokens > 0}


def test_paragraph_dedup_conservation(spark):
    """kept + dropped == paras per doc, and corpus-wide kept count ==
    number of DISTINCT paragraph hashes (each hash keeps exactly one
    instance)."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.curation import (
        PARA_WORDS,
        llm_paragraph_dedup,
    )

    sf = "/root/testdata/sf0.001"
    out = llm_paragraph_dedup(spark, sf)
    assert out.filter(
        F.col("n_kept") + F.col("n_dropped") != F.col("n_paras")
    ).count() == 0
    total_kept = out.agg(F.sum("n_kept")).first()[0]
    d = table(spark, sf, "documents")
    distinct_hashes = (
        d.select(
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(
                        F.size(F.split(F.trim("text"), r"\s+")) / PARA_WORDS
                    ).cast("int") - 1,
                )
            ).alias("pid"),
            F.split(F.trim("text"), r"\s+").alias("ts"),
        )
        .select(
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice("ts", F.col("pid") * PARA_WORDS + 1, PARA_WORDS),
                )
            ).alias("h")
        )
        .distinct()
        .count()
    )
    assert total_kept == distinct_hashes


def test_temperature_mix_directionality(spark):
    """alpha < 1 must compress the distribution: every below-average
    language is upsampled (factor > 1), every above-average one is
    downsampled, and the temperature shares still sum to 1."""
    from eventstream_notify_spark.operators.curation import (
        llm_mix_temperature,
    )

    rows = llm_mix_temperature(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 2
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-4
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.actual_share < mean_share:
            assert r.upsample_factor > 1.0, r
        elif r.actual_share > mean_share:
            assert r.upsample_factor < 1.0, r


def test_cross_source_overlap_symmetry(spark):
    """Shared-shingle counts are symmetric (containment is not);
    containment stays in (0, 1]."""
    from eventstream_notify_spark.operators.curation import (
        llm_cross_source_overlap,
    )

    rows = llm_cross_source_overlap(spark, "/root/testdata/sf0.001").collect()
    assert rows
    shared = {(r.source_a, r.source_b): r.n_shared for r in rows}
    for (a, b), n in shared.items():
        assert shared.get((b, a)) == n, (a, b)
    assert all(0 < r.containment_a <= 1 for r in rows)
