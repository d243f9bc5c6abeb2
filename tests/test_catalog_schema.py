"""Schema-drift guard: pin the post-catalog dtype of every column the
engine's operators depend on.

The driver regenerates the testdata between rounds and the physical
parquet layout has already changed once (events.ts NANOS-as-bigint ->
TIMESTAMP_NTZ micros), which silently broke 15 queries. This test
makes the NEXT layout change fail loudly at test time with a diff,
instead of surfacing as wrong answers or analysis errors deep inside
operators.

Columns where the engine is deliberately layout-tolerant are pinned
to their POST-normalization type (events.ts must always come out an
instant ``timestamp``). Columns the operators consume as-is are
pinned to the currently-generated type; if this test fails after a
regen, audit the operators touching that column before relaxing it.
"""

from __future__ import annotations

import pytest

from eventstream_notify_spark.catalog import TABLES, table

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        # consumed via literal comparisons + date_format: both behave
        # identically for ntz and instant under the UTC session tz
        "o_orderdate": {"timestamp_ntz", "timestamp"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp_ntz", "timestamp"},
    },
    "events": {
        "event_id": "bigint",
        # normalize_events_ts output — must ALWAYS be an instant
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def test_unknown_events_ts_layout_fails_loudly(spark, tmp_path):
    """A hostile regen (ts as double-seconds — a layout no branch
    handles) must raise at the catalog seam, not flow through as
    silently mis-scaled event time (the round-4 failure mode)."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.catalog import normalize_events_ts

    bad = spark.range(10).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 1.5).alias("ts"),  # double seconds
        F.col("id").alias("user_id"),
    )
    with pytest.raises(ValueError, match="events.ts physical layout"):
        normalize_events_ts(bad)


def test_unknown_orderdate_layout_fails_loudly(spark, tmp_path):
    """Same loud-failure contract for the non-events temporal columns:
    write an orders fixture whose o_orderdate is a STRING and assert
    the catalog read refuses it with a pointed message."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.catalog import table

    d = tmp_path / "hostile"
    d.mkdir()
    spark.range(5).select(
        F.col("id").alias("o_orderkey"),
        F.lit("1995-01-01").alias("o_orderdate"),
    ).write.parquet(str(d / "orders.parquet"))
    with pytest.raises(ValueError, match="o_orderdate physical layout"):
        table(spark, str(d), "orders")


def test_nanos_bigint_orderdate_normalizes(spark, tmp_path):
    """The layout events.ts actually shipped with once (TIMESTAMP
    NANOS read as int64) must come out a microsecond instant for any
    registered temporal column."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.catalog import table

    d = tmp_path / "nanos"
    d.mkdir()
    base_us = 788_918_400_000_000  # 1995-01-01T00:00:00Z
    spark.range(3).select(
        F.col("id").alias("o_orderkey"),
        (F.lit(base_us * 1000) + F.col("id") * 86_400_000_000_000).alias(
            "o_orderdate"
        ),
    ).write.parquet(str(d / "orders.parquet"))
    got = table(spark, str(d), "orders")
    assert dict(got.dtypes)["o_orderdate"] == "timestamp"
    days = sorted(
        r[0]
        for r in got.select(
            F.date_format("o_orderdate", "yyyy-MM-dd")
        ).collect()
    )
    assert days == ["1995-01-01", "1995-01-02", "1995-01-03"]


@pytest.mark.parametrize("name", TABLES)
def test_table_dtypes_pinned(spark, sf_dir, name):
    got = dict(table(spark, sf_dir, name).dtypes)
    want = EXPECTED[name]
    assert set(got) == set(want), (
        f"{name}: column set drifted. got={sorted(got)} want={sorted(want)}"
    )
    for col, exp in want.items():
        allowed = exp if isinstance(exp, set) else {exp}
        assert got[col] in allowed, (
            f"{name}.{col}: dtype {got[col]!r} not in {sorted(allowed)} — "
            "testdata layout drifted; audit operators consuming this column"
        )
