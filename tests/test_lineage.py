"""Column-lineage extractor: known plans must map outputs to exactly
the source columns that feed them."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.plans.lineage import column_lineage

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ev(spark):
    return table(spark, SF, "events")


def test_aggregate_lineage(spark, ev):
    a = ev.groupBy("user_id").agg(
        F.sum("value").alias("total"),
        F.count("*").alias("n"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias(
            "span"
        ),
    )
    lin = column_lineage(a)
    assert lin["user_id"] == ["user_id"]
    assert lin["total"] == ["value"]
    assert lin["n"] == []  # count(*) reads no column
    assert lin["span"] == ["ts"]


def test_window_and_join_lineage(spark, ev):
    w = Window.partitionBy("user_id").orderBy("ts")
    df = (
        ev.withColumn("rk", F.row_number().over(w))
        .join(
            table(spark, SF, "customer"),
            ev.user_id == F.col("c_custkey"),
        )
        .select("event_id", "rk", F.upper("c_name").alias("who"))
    )
    lin = column_lineage(df)
    assert lin["event_id"] == ["event_id"]
    assert lin["rk"] == ["ts", "user_id"]
    assert lin["who"] == ["c_name"]


def test_generate_union_literal_lineage(spark, ev):
    ex = ev.select(
        "event_id", F.explode(F.split("props", ",")).alias("kv")
    )
    assert column_lineage(ex)["kv"] == ["props"]
    u = ev.select(F.col("value").alias("x")).union(
        ev.select(F.col("user_id").cast("double").alias("x"))
    )
    assert column_lineage(u)["x"] == ["user_id", "value"]
    assert column_lineage(ev.select(F.lit(1).alias("one")))["one"] == []


def test_lineage_through_registered_query(spark):
    """A real registered operator: pipeline_e2e's admitted-count
    column must trace back to the stream's identity/type columns, and
    chained derivations (alias-of-alias across CTE-like projects)
    must flatten to leaf columns only."""
    from eventstream_notify_spark.registry import lookup

    df = lookup("cep_pattern_match").fn(spark, SF)
    lin = column_lineage(df)
    assert lin["user_id"] == ["user_id"]
    # seq is built from (ts, event_id, event_type-initial) structs
    assert lin["seq_len"] == ["event_id", "event_type", "ts"]
    assert lin["n_error_burst"] == ["event_id", "event_type", "ts"]


# Queries whose every output column is count-derived: count(*) reads
# rows, not columns, so [] lineage is correct — NOT a silent-literal
# defect. Anything else with all-[] lineage fails the sweep.
_COUNT_ONLY = {
    "agg_total_count",          # single count(*)
    "zx_graph_degree_distribution",  # degree histogram: counts of counts
    "zx_graph_triangle_count",  # triangle/edge/node counts
    "zx_llm_vocab_coverage",    # token/type/coverage counts
    "zx_ts_acf",                # lag grid + counts (acf of demeaned counts)
}


def test_lineage_resolves_for_every_registered_query(spark):
    """Registry-wide lineage gate: every registered query's output
    columns must be extractable (no plan node the walker doesn't
    understand) and at least one column must trace to a real source
    column — catching silent literal-only outputs and dead plans.
    Python-function nodes (mapInPandas & co.) resolve coarsely: every
    output depends on every input handed to the function."""
    from eventstream_notify_spark.registry import queries

    qs = queries()
    problems = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF)
            lin = column_lineage(df)
        except Exception as e:  # noqa: BLE001 — collect, report once
            problems.append(f"{name}: lineage extraction failed: {e!r}")
            continue
        missing = set(df.columns) - set(lin)
        if missing:
            problems.append(f"{name}: unmapped output columns {sorted(missing)}")
        elif name not in _COUNT_ONLY and not any(
            lin[c] for c in df.columns
        ):
            problems.append(f"{name}: ALL columns literal-only — dead output?")
    assert not problems, "\n".join(problems)
