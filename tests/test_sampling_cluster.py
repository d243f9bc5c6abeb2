"""Deterministic sampling + near-dup clustering properties (the
training-pipeline operators added in round 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import queries


def test_sampling_is_deterministic_and_stratified(spark, sf_dir):
    q = queries()["zx_sample_stratified"]
    a = {r.doc_id for r in q(spark, sf_dir).collect()}
    b = {r.doc_id for r in q(spark, sf_dir).collect()}
    assert a == b and len(a) > 0  # same rows on every run
    # dominant stratum is actually downsampled
    total = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    )
    kept = (
        q(spark, sf_dir).groupBy("lang").count().collect()
    )
    tot = {r.lang: r["count"] for r in total}
    kpt = {r.lang: r["count"] for r in kept}
    if "en" in tot and tot["en"] >= 20:
        assert kpt.get("en", 0) / tot["en"] < 0.35  # ~20% target


def test_reservoir_exact_k_per_group(spark, sf_dir):
    out = queries()["zx_sample_reservoir_group"](spark, sf_dir)
    sizes = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    totals = {
        r.lang: r["count"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    }
    for lang, n in sizes.items():
        assert n == min(50, totals[lang]), (lang, n, totals[lang])


def test_split_partitions_and_covers(spark, sf_dir):
    out = {r.split: r.n_docs for r in
           queries()["zx_train_test_split"](spark, sf_dir).collect()}
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(out.values()) == n_docs  # total partition, no overlap/loss
    assert out["train"] > out["valid"] and out["train"] > out["test"]


def test_cluster_is_fixpoint_and_consistent(spark, sf_dir):
    """Cluster labels must be a propagation fixpoint (both endpoints of
    every near-dup edge share a cluster) and canonical = min member."""
    labels = queries()["zx_dedup_cluster"](spark, sf_dir)
    pairs = queries()["dedup_near"](spark, sf_dir).select("doc_a", "doc_b")
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    violated = (
        pairs.join(la, "doc_a").join(lb, "doc_b")
        .filter(F.col("ca") != F.col("cb"))
        .count()
    )
    assert violated == 0
    # canonical rows are exactly the distinct cluster ids, and each is
    # its own cluster's minimum
    canon = labels.filter("is_canonical = 1")
    assert canon.count() == labels.select("cluster_id").distinct().count()
    bad_min = (
        labels.groupBy("cluster_id").agg(F.min("doc_id").alias("mn"))
        .filter(F.col("mn") != F.col("cluster_id"))
        .count()
    )
    assert bad_min == 0


def test_group_split_no_user_spans_splits(spark, sf_dir):
    """The leakage guard itself: assigning splits by user hash means
    (user, split) pairs == distinct users, and the three splits
    together cover every event exactly once."""
    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.sampling import (
        _bucket,
        split_group_aware,
    )

    ev = table(spark, sf_dir, "events")
    b = _bucket("user_id")
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    assigned = ev.select("user_id", split.alias("split"))
    assert (
        assigned.select("user_id", "split").distinct().count()
        == assigned.select("user_id").distinct().count()
    )
    agg = {r.split: r.n_events for r in split_group_aware(spark, sf_dir).collect()}
    assert sum(agg.values()) == ev.count()


def test_negative_sampling_shape_and_separation(spark, sf_dir):
    """Exactly k negatives per query, none sharing the query's source,
    none equal to the query, ranks dense 1..k."""
    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.sampling import (
        _NEG_K,
        negative_sampling,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    res = negative_sampling(spark, sf_dir)
    per_q = res.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx"),
        F.min("rank").alias("mn"),
    )
    bad = per_q.filter(
        (F.col("n") != _NEG_K) | (F.col("mx") != _NEG_K) | (F.col("mn") != 1)
    ).count()
    assert bad == 0
    qsrc = d.select(F.col("doc_id").alias("query_id"), F.col("source").alias("qs"))
    nsrc = d.select(F.col("doc_id").alias("neg_id"), F.col("source").alias("ns"))
    leaks = (
        res.join(qsrc, "query_id").join(nsrc, "neg_id")
        .filter((F.col("qs") == F.col("ns")) | (F.col("neg_id") == F.col("query_id")))
        .count()
    )
    assert leaks == 0
