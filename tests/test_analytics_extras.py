"""Tests for percentiles, correlation matrix, and bucketed skyline."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_notify_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_percentiles_are_monotone(spark, sf_dir):
    for r in queries()["zx_agg_percentiles"](spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p95 <= r.p99
        assert r.n > 0


def test_corr_matrix_bounds_and_symmetry_convention(spark, sf_dir):
    rows = queries()["zx_corr_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0
        assert r.type_a < r.type_b  # upper triangle only, no dupes
    assert len({(r.type_a, r.type_b) for r in rows}) == len(rows)


def test_skyline_bucketed_is_exact(spark, sf_dir):
    """The bucketed distributed sweep must return EXACTLY the dominance
    set — verified against a brute-force O(n^2) check in Python."""
    out = {
        r.o_orderkey
        for r in queries()["zx_skyline_pareto_bucketed"](spark, sf_dir).collect()
    }
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").cast("timestamp_ntz").alias("d"),
        )
        .collect()
    )
    pts = [(r.o_orderkey, r.o_totalprice, r.d) for r in rows]

    def dominated(me):
        return any(
            o[1] >= me[1] and o[2] >= me[2] and (o[1] > me[1] or o[2] > me[2])
            for o in pts
        )

    brute = {k for k, p, d in pts if not dominated((k, p, d))}
    assert out == brute


def test_skyline_bucketed_no_global_window_over_fact(spark):
    """Every max window over the per-price group table must be
    partitioned by bucket; the only unpartitioned window allowed is
    the 64-row bucket-prefix table."""
    from eventstream_notify_spark.plans.explain import plan_str

    plan = plan_str(queries()["zx_skyline_pareto_bucketed"](spark, SF), "simple")
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    unpartitioned = [s for s in specs if "bucket" not in s.split("ASC")[0]]
    # the bucket-prefix window orders BY bucket (desc) without
    # partitioning — that one runs on a 64-row table and is fine
    for s in unpartitioned:
        assert "bucket" in s, f"window neither partitioned nor over buckets: {s}"
