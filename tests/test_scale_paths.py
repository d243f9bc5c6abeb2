"""Scale-path demonstrations: sketch accuracy, salted-join equivalence,
and bucketed co-located joins (shuffle elimination) — the mechanisms
the 100 TB design notes promise, verified on real plans/data."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.plans.explain import plan_str
from eventstream_notify_spark.registry import queries


def test_sketches_close_to_exact(spark, sf_dir):
    approx = {
        r.event_type: r
        for r in queries()["zx_agg_sketches"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, ex in exact.items():
        ap = approx[et]
        assert abs(ap.approx_users - ex.users) <= max(2, 0.05 * ex.users)
        assert abs(ap.q50 - ex.p50) <= 0.05 * max(ex.p50, 1)


def test_salted_join_equals_unsalted(spark, sf_dir):
    salted = {
        (r.event_type, r.cnt, r.total_value)
        for r in queries()["zx_join_salted"](spark, sf_dir).collect()
    }
    e = table(spark, sf_dir, "events")
    plain = {
        (r.event_type, r.cnt, r.total_value)
        for r in e.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert salted == plain


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both join sides on the key lets the sort-merge
    join run with ZERO Exchange — the co-located join that, at 100 TB,
    turns the nightly fact-to-fact join from a full-cluster shuffle
    into partition-local merges."""
    suffix = uuid.uuid4().hex[:8]
    orders_t, lineitem_t = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    try:
        (
            table(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / orders_t))
            .saveAsTable(orders_t)
        )
        (
            table(spark, sf_dir, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / lineitem_t))
            .saveAsTable(lineitem_t)
        )
        o = spark.table(orders_t)
        li = spark.table(lineitem_t)
        # disable auto-broadcast so the join is genuinely SMJ-shaped
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
                "o_orderpriority"
            ).count()
            plan = plan_str(joined, "simple")
            assert "SortMergeJoin" in plan
            # the join itself is exchange-free; the only exchange allowed
            # is the one feeding the final 5-group aggregation
            join_part = plan.split("SortMergeJoin", 1)[1]
            assert "Exchange" not in join_part, plan
            assert joined.count() == 5
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {orders_t}")
        spark.sql(f"DROP TABLE IF EXISTS {lineitem_t}")


def test_ivf_multiprobe_recall_floor(spark):
    """IVF recall@5 vs exact cosine, floor at measured-minus-margin
    (VERDICT r11 #5; multiprobe P=8 measures 1.00 at sf0.01 —
    single-cell probing measured 0.375/0.40, worse than coin-flip
    top-k; the bench --recall gate pins the sf0.1 floors)."""
    from collections import defaultdict

    sf = "/root/testdata/sf0.01"
    qs = queries()
    exact = defaultdict(set)
    for r in qs["sim_search_cosine"](spark, sf).collect():
        exact[r.query_id].add(r.vec_id)
    for qname in ("zx_sim_search_ivf", "zx_sim_search_ivf_kmeans"):
        approx = defaultdict(set)
        for r in qs[qname](spark, sf).collect():
            approx[r.query_id].add(r.vec_id)
        assert exact.keys() == approx.keys()
        rec = sum(
            len(exact[q] & approx[q]) / 5.0 for q in exact
        ) / len(exact)
        # measured 1.00 at sf0.01 for both tiers (r12)
        assert rec >= 0.95, f"{qname} recall@5 {rec:.3f} < 0.95"


def test_bq_recall_floor(spark):
    """Binary-quantization recall@5 vs exact cosine: >= 0.8, matching
    the rest of the ANN family. The asymmetric refine tier (raw query
    scored against per-dim bit representatives over a 4x Hamming
    pre-cut) measured 0.935 at sf0.1; the r8 symmetric-Hamming-only
    shortlist measured 0.76 (and a fixed 50-deep shortlist 0.445)."""
    from collections import defaultdict

    sf = "/root/testdata/sf0.01"
    qs = queries()
    exact = defaultdict(set)
    for r in qs["sim_search_cosine"](spark, sf).collect():
        exact[r.query_id].add(r.vec_id)
    approx = defaultdict(set)
    for r in qs["zx_sim_search_bq"](spark, sf).collect():
        approx[r.query_id].add(r.vec_id)
    assert exact.keys() == approx.keys()
    rec = sum(len(exact[q] & approx[q]) / 5.0 for q in exact) / len(exact)
    # measured 0.94 at sf0.01 (r12)
    assert rec >= 0.89, f"zx_sim_search_bq recall@5 {rec:.3f} < 0.89"


def test_ivfpq_recall_floor_and_shape(spark):
    """IVFPQ (coarse cells cut candidates, residual PQ cuts bytes,
    exact re-rank restores precision) must clear a 0.85 recall@5
    floor at sf0.01 (measured 0.90 there, 0.815 at sf0.1 — the bench
    --recall gate pins 0.765 at the bench SF), with exact final scores
    (the re-rank emits true cosine, so every returned score must
    equal the exact operator's score for that same pair)."""
    from collections import defaultdict

    sf = "/root/testdata/sf0.01"
    qs = queries()
    exact_rows = qs["sim_search_cosine"](spark, sf).collect()
    exact = defaultdict(set)
    escore = {}
    for r in exact_rows:
        exact[r.query_id].add(r.vec_id)
        escore[(r.query_id, r.vec_id)] = r.score
    approx = defaultdict(set)
    for r in qs["zx_sim_search_ivfpq"](spark, sf).collect():
        approx[r.query_id].add(r.vec_id)
        if (r.query_id, r.vec_id) in escore:
            assert abs(r.score - escore[(r.query_id, r.vec_id)]) < 1e-9
    assert exact.keys() == approx.keys()
    rec = sum(len(exact[q] & approx[q]) / 5.0 for q in exact) / len(exact)
    assert rec >= 0.85, f"ivfpq recall@5 {rec:.3f} < 0.85"


def test_kmeans_ivf_shape_and_scores(spark, sf_dir):
    out = queries()["zx_sim_search_ivf_kmeans"](spark, sf_dir).collect()
    per_query = {}
    for r in out:
        per_query.setdefault(r.query_id, []).append(r.score)
        assert -1.0 <= r.score <= 1.0
    assert all(len(v) == 5 for v in per_query.values())
    assert len(per_query) == 10  # vec_id % 50 == 0 over 500 vectors


def test_kmeans_lineage_truncated(spark, sf_dir):
    """Lloyd iterations localCheckpoint the K-row centroid frame, so
    the final plan's depth is CONSTANT in the iteration count — the
    only cross join visible is the final assignment's, not one per
    iteration (lineage growth is the classic iterative-algorithm
    scale-killer: analysis time and stack depth grow per round)."""
    import re

    df = queries()["zx_sim_search_ivf_kmeans"](spark, sf_dir)
    plan = plan_str(df)
    # the centroid input is a checkpointed RDD scan, not 5 nested rounds
    assert "Scan ExistingRDD" in plan
    # exactly one assignment cross join per use of `final` (corpus +
    # broadcast query side) — without truncation, 5 iterations would
    # stack 5 cross joins under EACH use
    nlj = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nlj) <= 2, plan


def test_hypertable_rollup_leaves_no_cache(spark, sf_dir):
    """Session-reuse hygiene: a query builder must not leave entries in
    the session CacheManager (bench/oracle loops run all 73 queries on
    ONE session — leaked persists compound). rollup_hypertable
    materializes its cascade grains via localCheckpoint, which the
    ContextCleaner reclaims, instead of persist, which nobody can
    unpersist on a returned-lazy-frame contract."""
    spark.catalog.clearCache()  # other tests may cache legitimately
    cm = spark._jsparkSession.sharedState().cacheManager()
    out = queries()["zx_rollup_hypertable"](spark, sf_dir)
    assert out.count() > 0
    assert cm.isEmpty(), "rollup_hypertable leaked cached plans"


def test_lsh_embedding_nn_recall(spark, sf_dir):
    """The (label, band-bucket) blocked near-dup must track the exact
    label-blocked sibling. With Hamming-1 multiprobe (own bucket ∪
    both neighbor buckets per 2-bit band), a true NN is missed only
    when ALL 8 hyperplane sign bits differ — measured residual on this
    data: 0/500 at sf0.001, 3/500 at sf0.01 — so the recall floor here
    is far above plain banding's ~3/4. Full coverage (every vector
    keeps a neighbor) must hold exactly: multiprobe only ADDS
    candidate pairs."""
    exact = {
        r.vec_id: (r.nn_vec_id, r.score)
        for r in queries()["zx_dedup_near_embedding"](spark, sf_dir).collect()
    }
    lsh = {
        r.vec_id: (r.nn_vec_id, r.score)
        for r in queries()["zx_dedup_near_embedding_lsh"](
            spark, sf_dir
        ).collect()
    }
    assert set(lsh) == set(exact)  # full coverage: nobody loses all candidates
    both = set(exact)
    same_nn = sum(1 for v in both if exact[v][0] == lsh[v][0])
    close = sum(1 for v in both if lsh[v][1] >= exact[v][1] - 0.05)
    assert same_nn / len(both) >= 0.99, same_nn
    assert close / len(both) >= 0.99, close


def test_nn_bucket_cap_pair_budget(spark):
    """The per-bucket candidate budget (NN_BUCKET_CAP) must trade
    recall for a bounded pair count WITHOUT breaking coverage: the
    probe side is never capped, so every vector keeps a neighbor at
    ANY cap. Measured curve at sf0.01 (labels ~50-59 members, so
    per-(band,key) buckets ~8-16): cap=16 is near-lossless (same-NN
    0.990 vs 0.994 uncapped), cap=4 heavily bites (0.43) — i.e. the
    knob is real, and the default 256 never bites until a bucket is
    genuinely skewed."""
    from eventstream_notify_spark.operators.vectors import _embedding_nn

    sf = "/root/testdata/sf0.01"
    exact = {
        r.vec_id: r.nn_vec_id
        for r in _embedding_nn(spark, sf, banded=False).collect()
    }
    for cap, floor in ((16, 0.97), (4, 0.35)):
        lsh = {
            r.vec_id: r.nn_vec_id
            for r in _embedding_nn(
                spark, sf, banded=True, bucket_cap=cap
            ).collect()
        }
        # coverage invariant: capping candidates never silences a vector
        assert set(lsh) == set(exact), f"cap={cap} lost coverage"
        same = sum(1 for v in lsh if exact[v] == lsh[v]) / len(exact)
        assert same >= floor, f"cap={cap}: same-NN {same:.3f} < {floor}"
