"""Storage-layout / source-evolution operators — the lakehouse
ingestion realities at 100 TB: schemas drift across ingestion epochs,
and tables are laid out as hive-partitioned directory trees so scans
can prune whole partitions before touching a row.

Both operators materialize their layout ONCE per sf_dir into a
session-cached temp dir (the incremental_rollup pattern: lazy
populate, atexit cleanup) — the layout is the fixture under test, the
query over it is the registered operator. Nothing under /root/testdata
is ever written.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

# layout fixture dirs, keyed by (kind, sf_dir); removed at exit
_LAYOUT_CACHE: dict[tuple[str, str], str] = {}


@atexit.register
def _cleanup_layouts() -> None:
    for d in _LAYOUT_CACHE.values():
        shutil.rmtree(d, ignore_errors=True)
    _LAYOUT_CACHE.clear()


def _epoch_dirs(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet 'ingestion epochs' of orders with DIFFERENT
    schemas: epoch 1 (even orderkeys) predates the o_orderpriority
    column; epoch 2 (odd orderkeys) carries it."""
    key = ("schema_epochs", sf_dir)
    base = _LAYOUT_CACHE.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="schema_epochs_")
        o = table(spark, sf_dir, "orders")
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ).write.mode("overwrite").parquet(f"{base}/epoch=1")
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        ).write.mode("overwrite").parquet(f"{base}/epoch=2")
        _LAYOUT_CACHE[key] = base
    return base


@register(
    "schema_evolution",
    extra=True,
    oracle="""
    WITH unified AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
                   AS o_orderpriority
        FROM orders
    )
    SELECT COALESCE(o_orderpriority, 'PRE-SCHEMA') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM unified
    GROUP BY 1
    """,
)
def schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift ingestion: two parquet epochs of the same table
    where the newer epoch ADDED a column (o_orderpriority), read as
    one DataFrame via ``mergeSchema`` — Spark unions the footers'
    schemas and null-fills the missing column for old files, which is
    exactly how a 100 TB lakehouse absorbs upstream schema evolution
    without rewriting history. The query then treats null-filled rows
    as their own 'PRE-SCHEMA' class and aggregates across the seam.

    The oracle reconstructs the same unified view declaratively from
    the source table (even keys = old epoch, column nulled), so the
    hash match proves merge-read semantics, not just row counts.
    Scale: mergeSchema is a FOOTER-ONLY planning cost (per file, on
    the driver/executors, no data scan); the aggregation is one
    hash-agg over a 6-value group domain."""
    base = _epoch_dirs(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/epoch=1", f"{base}/epoch=2"
    )
    return (
        df.select(
            F.coalesce("o_orderpriority", F.lit("PRE-SCHEMA")).alias(
                "priority"
            ),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("priority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Hive-partitioned copy of events: dir tree keyed by event_type
    (stands in for the date/type partitioning of a production event
    lake)."""
    key = ("events_by_type", sf_dir)
    d = _LAYOUT_CACHE.get(key)
    if d is None:
        d = tempfile.mkdtemp(prefix="events_by_type_")
        (
            table(spark, sf_dir, "events")
            .select(
                "event_id",
                "user_id",
                F.unix_micros("ts").alias("ts_us"),
                F.round(F.col("value") * 1000).cast("bigint").alias(
                    "value_mv"
                ),
                "event_type",
            )
            # one task per partition value -> exactly one file per
            # event_type=… dir (footer_stats_skipping relies on this)
            .repartition("event_type")
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(d)
        )
        _LAYOUT_CACHE[key] = d
    return d


def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned read behind zx_partition_prune, exposed for the
    plan test (which asserts PartitionFilters carry the predicate and
    non-matching partitions never enter the scan)."""
    d = _partitioned_events(spark, sf_dir)
    return spark.read.parquet(d).filter(
        F.col("event_type").isin("error", "purchase")
    )


@register(
    "partition_prune",
    extra=True,
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_mv,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('error', 'purchase')
    GROUP BY 1
    """,
)
def partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over a hive-partitioned event lake: the
    events table laid out as event_type=<v>/ directories, queried
    with a partition-column predicate — Spark resolves the predicate
    against DIRECTORY NAMES at planning time (PartitionFilters), so
    3 of 5 partitions are never listed into the scan, the dominant
    cost lever on a date-partitioned 100 TB event lake (the plan test
    pins this: the partition predicate must appear as a
    PartitionFilter, not a post-scan Filter). The partition column
    itself is VIRTUAL — encoded in the path, stored in zero data
    pages, and rehydrated by the reader.

    The oracle runs the same aggregate on the source table; the hash
    match proves the partitioned round-trip (write partitionBy, read,
    prune) loses and duplicates nothing."""
    return (
        partition_pruned_scan(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("value_mv").cast("bigint").alias("sum_mv"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


_N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Register bucketed external-table twins of orders/lineitem
    (bucketed + sorted by the join key, Hive-style layout in a cached
    temp dir). Table names carry the sf tag so different sf_dirs
    coexist in one session catalog."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    to, tl = f"esn_orders_b_{tag}", f"esn_lineitem_b_{tag}"
    key = ("bucketed_join", sf_dir)
    if key not in _LAYOUT_CACHE:
        base = tempfile.mkdtemp(prefix="bucketed_")
        (
            table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.mode("overwrite")
            .bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{base}/orders")
            .saveAsTable(to)
        )
        (
            table(spark, sf_dir, "lineitem")
            .select(
                "l_orderkey",
                F.round(F.col("l_extendedprice") * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .write.mode("overwrite")
            .bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{base}/lineitem")
            .saveAsTable(tl)
        )
        _LAYOUT_CACHE[key] = base
    return to, tl


def bucketed_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw bucketed join (pre-aggregation), exposed for the plan
    test: with both sides bucketed+sorted on the key into the same
    bucket count, the SortMergeJoin consumes bucket files directly —
    NO Exchange on either side."""
    to, tl = _bucketed_tables(spark, sf_dir)
    # MERGE hint: at bench SF the dims fit a broadcast, which would
    # bypass the bucketed-scan path entirely; at 100 TB neither side
    # broadcasts, so the hint makes the small-SF plan the at-scale
    # plan (and lets the test pin the exchange-less property).
    o = spark.table(to).hint("merge")
    li = spark.table(tl)
    return o.join(li, o.o_orderkey == li.l_orderkey)


@register(
    "join_bucketed",
    extra=True,
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-FREE big-table join via bucketing (the
    storage-partitioned-join lever): orders and lineitem land ONCE as
    bucketed+sorted tables on the join key (8 buckets here; thousands
    at 100 TB), and every subsequent join on that key consumes bucket
    files pairwise — the plan has ZERO Exchange (and with sortBy, no
    Sort) before the SortMergeJoin, verified by the plan test. This
    is how a production lakehouse amortizes its biggest recurring
    join: pay one layout write, then every daily join runs
    exchange-less and scales linearly with zero shuffle-spill risk.
    The oracle is the plain join on the source tables — bucketing
    must change bytes moved, never answers."""
    j = bucketed_join_frame(spark, sf_dir)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


def _footer_batches(batches):
    """mapInPandas kernel: read REAL parquet footers (pyarrow, no data
    pages) and emit per-file column statistics."""
    import pyarrow.parquet as pq
    import pandas as pd

    for pdf in batches:
        rows = []
        for path in pdf["path"]:
            local = path[7:] if path.startswith("file:") else path
            etype = next(
                seg.split("=", 1)[1]
                for seg in local.split("/")
                if seg.startswith("event_type=")
            )
            md = pq.ParquetFile(local).metadata
            mins: dict = {}
            maxs: dict = {}
            n = 0
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                n += g.num_rows
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in ("ts_us", "value_mv") and col.statistics:
                        st = col.statistics
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
            rows.append(
                (
                    etype,
                    n,
                    int(mins["ts_us"]),
                    int(maxs["ts_us"]),
                    int(mins["value_mv"]),
                    int(maxs["value_mv"]),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "n_rows",
                "min_ts_us",
                "max_ts_us",
                "min_value_mv",
                "max_value_mv",
            ],
        )


@register(
    "footer_stats_skipping",
    extra=True,
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(epoch_us(ts)) AS min_ts_us,
           MAX(epoch_us(ts)) AS max_ts_us,
           MIN(CAST(round(value * 1000) AS BIGINT)) AS min_value_mv,
           MAX(CAST(round(value * 1000) AS BIGINT)) AS max_value_mv
    FROM events
    GROUP BY 1
    """,
)
def footer_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-PLANE statistics harvesting — the foundation of every
    data-skipping decision: read the partitioned event lake's REAL
    parquet footers (pyarrow metadata decode, zero data pages) and
    emit per-file row counts and (ts_us, value_mv) min/max — the
    file-pruning index a lakehouse table format (Delta/Iceberg
    add-file stats) maintains. The oracle recomputes the same stats
    FROM THE DATA; the hash match proves the footers' statistics are
    exact over the whole write path (partitioned layout → parquet
    writer stats → footer decode), i.e. that pruning on these stats
    can never drop a matching row.

    Shape: file listing is the driver-side file index (bounded by
    file count — the thing that is ALWAYS driver-sized in a lakehouse
    planner); footer decodes distribute via mapInPandas over paths,
    ~KBs per file regardless of data volume. At 100 TB this exact
    plan reads a few MB of footers to plan a PB of skipping."""
    d = _partitioned_events(spark, sf_dir)
    paths = sorted(spark.read.parquet(d).inputFiles())
    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    out_schema = (
        "event_type string, n_rows bigint, min_ts_us bigint, "
        "max_ts_us bigint, min_value_mv bigint, max_value_mv bigint"
    )
    return pdf.repartition(len(paths)).mapInPandas(
        _footer_batches, out_schema
    )
