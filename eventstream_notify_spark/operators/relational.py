"""Relational substrate — SURVEY.md §2.D (D1–D20).

The reference has zero relational code (SURVEY §2.D preamble); this is
the idiomatic-Spark query surface the north star mandates, exercised
on the driver's TPC-H-ish tables. Everything here is built-in Spark —
Catalyst supplies pushdown, pruning, join selection, partial
aggregation and codegen; the only "engineering" is scale discipline:

- dimension joins are explicitly broadcast (D2) — no shuffle of facts;
- large joins (D3) rely on sort-merge + AQE (skew splitting);
- non-equi range joins (D6) broadcast the *small* anchor side, which
  is the only strategy that survives 100 TB facts;
- top-k (D12) is TakeOrdered — never a global sort;
- money aggregates accumulate in DECIMAL, so results are bit-exact
  and order-independent (the DuckDB oracle matches exactly, and the
  answer doesn't drift with partitioning at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register


def _money(col: str | Column) -> Column:
    """2-decimal money value as DECIMAL(12,2) — exact accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def _rate(col: str) -> Column:
    """Small rate in [0,1] (discount/tax) as DECIMAL(3,2)."""
    return F.col(col).cast("decimal(3,2)")


# ---------------------------------------------------------------- D1


@register(
    "project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
      AND l_discount BETWEEN 0.05 AND 0.08
      AND l_quantity < 24
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — projection + selective predicates (TPC-H Q6 shape).
    Predicates and the 5-column projection push down to the parquet
    scan (verify: .explain shows PushedFilters + pruned ReadSchema)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-07-01")
        & F.col("l_discount").between(0.05, 0.08)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (_money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _rate("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------- D2


@register(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS num_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — fact ⋈ broadcast dims (customer⋈nation⋈region). The dims
    ship to every executor; the customer table never shuffles for the
    join (only the final 25-group agg moves)."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("num_customers"),
            F.sum(_money("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------- D3


@register(
    "join_shuffle",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS num_lineitems,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — large equi-join orders⋈lineitem → sort-merge join, both
    sides shuffled on the key; AQE handles skew. Revenue accumulates
    in decimal (order-independent ⇒ plan-change-proof)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = _money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - _rate("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("num_lineitems"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------- D4


@register(
    "join_semi_anti",
    oracle="""
    SELECT c_mktsegment, 'with_orders' AS label, COUNT(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'no_orders' AS label, COUNT(*) AS cnt
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — left-semi / left-anti joins (EXISTS / NOT EXISTS):
    customers with vs without orders, per market segment."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    semi = (
        c.join(o, cond, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .withColumn("label", F.lit("with_orders"))
    )
    anti = (
        c.join(o, cond, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .withColumn("label", F.lit("no_orders"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "label", "cnt")


# ---------------------------------------------------------------- D5


@register(
    "join_outer",
    oracle="""
    SELECT n.n_name,
           COUNT(DISTINCT c.c_custkey) AS num_customers,
           COUNT(o.o_orderkey) AS num_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — left outer join preserving order-less customers
    (COUNT(o_orderkey) skips the nulls they produce)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("num_customers"),
            F.count("o_orderkey").alias("num_orders"),
        )
    )


# ---------------------------------------------------------------- D6


@register(
    "join_range",
    oracle="""
    WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
    anchors AS (SELECT * FROM e WHERE event_id % 97 = 0)
    SELECT a.event_id AS anchor_id, COUNT(*) AS events_within_10min
    FROM anchors a JOIN e b
      ON b.ts_us >= a.ts_us AND b.ts_us < a.ts_us + 600000000
    GROUP BY a.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 — non-equi (range) join: events within 10 minutes after each
    anchor event. The anchor side is small and explicitly broadcast —
    a broadcast-nested-loop join is the only range-join shape that
    scales (never shuffle-NL both sides). Comparison on unix-micros
    bigints keeps the oracle exact."""
    e = table(spark, sf_dir, "events").select(
        "event_id", F.expr("unix_micros(ts)").alias("ts_us")
    )
    anchors = F.broadcast(
        e.filter(F.col("event_id") % 97 == 0)
        .select(F.col("event_id").alias("anchor_id"), F.col("ts_us").alias("a_us"))
    )
    return (
        e.join(
            anchors,
            (F.col("ts_us") >= F.col("a_us"))
            & (F.col("ts_us") < F.col("a_us") + 600_000_000),
        )
        .groupBy("anchor_id")
        .agg(F.count("*").alias("events_within_10min"))
    )


# ---------------------------------------------------------------- D7


@register(
    "agg_hash",
    oracle="""
    SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
             AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
             AS DOUBLE) AS sum_charge,
        ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              / COUNT(*), 6) AS avg_price,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE)
              / COUNT(*), 6) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 — grouped hash aggregation, TPC-H Q1 shape. Partial (map-side)
    + final aggregation is Spark's default; decimal accumulation makes
    every sum exact and therefore partitioning-independent."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-09-02")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = _money("l_extendedprice") * (one - _rate("l_discount"))
    charge = disc_price * (one + _rate("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.round(F.sum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
        F.round(
            F.sum(_money("l_extendedprice")).cast("double") / F.count("*"), 6
        ).alias("avg_price"),
        F.round(F.sum(_rate("l_discount")).cast("double") / F.count("*"), 6).alias(
            "avg_disc"
        ),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------- D8


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 — grouped COUNT(DISTINCT). Spark expands distinct aggregates
    into a two-phase plan; at 100 TB prefer approx_count_distinct when
    exactness isn't contractual."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count("*").alias("cnt"),
        )
    )


# ---------------------------------------------------------------- D9


@register(
    "agg_rollup_cube",
    oracle="""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS num_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 — hierarchical totals: region → nation ROLLUP (grand total,
    per-region, per-nation rows; NULL marks the rolled-up level)."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("num_customers"),
            F.sum(_money("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------- D10


@register(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 — ranking within partition: top-3 orders per customer by
    price. Deterministic tie-break on o_orderkey. One shuffle on the
    partition key; no global sort."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------- D11


@register(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11 — analytic window functions: lag + running sum with an
    explicit ROWS frame, per customer in order-date order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(_money("o_totalprice")).over(wsum).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------- D12


@register(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12 — global top-k. Spark plans TakeOrderedAndProject: each
    partition keeps its local top-100, driver merges — no global sort,
    no full shuffle, scales to any table size."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(100)
    )


# ---------------------------------------------------------------- D13


@register(
    "set_ops",
    oracle="""
    SELECT 'both' AS label, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'building_only' AS label, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'all_building' AS label, c_custkey
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D13 — INTERSECT / EXCEPT / UNION ALL over compatible selects,
    labeled so one result covers all three."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders_ck = o.select(F.col("o_custkey").alias("c_custkey"))
    both = building.intersect(orders_ck).withColumn("label", F.lit("both"))
    only = building.exceptAll(orders_ck).distinct().withColumn(
        "label", F.lit("building_only")
    )
    allb = building.withColumn("label", F.lit("all_building"))
    return both.unionByName(only).unionByName(allb).select("label", "c_custkey")


# ---------------------------------------------------------------- D14


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 10) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           (p_type LIKE '%BRASS%') AS is_brass,
           len(string_split(p_type, ' ')) AS type_words,
           regexp_extract(p_name, '[a-z]+') AS first_word,
           replace(p_brand, '#', '-') AS brand_dashed
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14 — string scalar functions: case, substring, concat, LIKE,
    split, regexp, replace. All JVM-side built-ins inside one
    whole-stage-codegen span."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.size(F.split("p_type", " ")).alias("type_words"),
        F.regexp_extract("p_name", "[a-z]+", 0).alias("first_word"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
    )


# ---------------------------------------------------------------- D15


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS order_dow,
           strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since_1995,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15 — datetime scalars: extract, truncate, diff, interval add.
    Dates are emitted as formatted strings (oracle type parity).
    Spark dayofweek is Sunday=1..7 while DuckDB's is Sunday=0..6 —
    the oracle adds 1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate")).alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .alias("days_since_1995"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd")
        .alias("due_date"),
    )


# ---------------------------------------------------------------- D16


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / l_quantity AS unit_price,
           abs(l_discount - 0.05) AS disc_dev,
           power(2.0, l_linenumber) AS pow2,
           sqrt(l_quantity) AS qty_sqrt,
           ((l_orderkey - 3) % 7 + 7) % 7 AS pmod7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16 — math scalars incl. the reference's id-wraparound pmod
    semantics (auto_kafka_redis.py:216-217): pmod is non-negative,
    unlike SQL % — the oracle spells it ((a%b)+b)%b."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw IEEE quotient — bit-identical across engines, unlike
        # round(x, n) whose decimal-tie behavior differs
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey") - 3, F.lit(7)).alias("pmod7"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
    )


# ---------------------------------------------------------------- D17


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
           (json_extract_string(props, '$.missing') IS NULL) AS missing_absent
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17 — JSON scalar extraction from the ``events.props`` blob
    (the engine twin of the reference's implicit-JSON event payloads,
    auto_kafka_redis.py:301)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_absent"),
    )


# ---------------------------------------------------------------- D18


@register(
    "scalar_array_map",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           round(list_sum(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 6) AS l1_norm
    FROM embeddings
    """,
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18 — array higher-order functions over the embedding column:
    size, element_at, transform+aggregate folds. All JVM-side — no UDF
    in the hot path (SURVEY §4.2#6)."""
    e = table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_component"
        ),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: xd(x) * xd(x)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("sq_norm"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: F.abs(xd(x))),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        ).alias("l1_norm"),
    )


# ---------------------------------------------------------------- D19


@register(
    "subquery_scalar_in",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND c_custkey IN (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      )
    """,
)
def subquery_scalar_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19 — scalar subquery + IN-subquery through the SQL surface.
    Catalyst rewrites IN to a left-semi join; the scalar subquery
    becomes a broadcast of one value."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_custkey IN (
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          )
        """
    )


@register(
    "agg_pivot",
    extra=True,
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per user x event_type as columns. The value
    list is EXPLICIT — with it, pivot is one pass (partial+final agg);
    without it Spark must first collect the distinct values to the
    driver (an extra job you never want at 100 TB)."""
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves null where a (user, type) pair never occurred;
    # the FILTER-based oracle counts those as 0
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


# -------------------------------------------------- scale-path extras


@register(
    "join_salted",
    extra=True,
    oracle="""
    SELECT e.event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN (
        SELECT DISTINCT user_id FROM events
    ) u ON e.user_id = u.user_id
    GROUP BY e.event_type
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient join via EXPLICIT key salting: the fact side gets
    a random-free deterministic salt (event_id % N), the dim side is
    exploded N ways, and the join key becomes (user_id, salt) — a hot
    user's rows now spread over N reducer partitions instead of one.
    AQE's skew-join split handles this adaptively in most cases; the
    salted form is the insurance for extreme keys and for non-AQE
    deployments. Result is identical to the unsalted join (the oracle
    states the unsalted spec)."""
    n_salts = 8
    e = table(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % n_salts).cast("int")
    )
    dim = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .crossJoin(
            spark.range(n_salts).select(F.col("id").cast("int").alias("salt"))
        )
    )
    return (
        e.join(dim, ["user_id", "salt"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_money("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "agg_grouping_sets",
    extra=True,
    oracle="""
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind D9's
    rollup/cube: three grouping shapes in ONE pass over the scan
    (Catalyst expands to a single Expand + hash aggregate, not three
    scans). Decimal accumulation keeps every grouping's sum exact."""
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type,
               CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS day,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
        """
    )


@register(
    "window_distribution",
    extra=True,
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist()    OVER w AS DOUBLE) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) — the quantile-bucketing shape feeding stratified
    curriculum sampling. Full tiebreak (price, key) makes every
    engine's assignment identical."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "unpivot_melt",
    extra=True,
    oracle="""
    WITH w AS (
        SELECT lang,
               CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) AS sum_chars,
               CAST(MAX(n_chars) AS DOUBLE) AS max_chars
        FROM documents GROUP BY lang
    )
    SELECT lang, 'n_docs' AS metric, n_docs AS value FROM w
    UNION ALL
    SELECT lang, 'sum_chars' AS metric, sum_chars AS value FROM w
    UNION ALL
    SELECT lang, 'max_chars' AS metric, max_chars AS value FROM w
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long reshaping (``DataFrame.unpivot`` — pivot's inverse,
    pandas 'melt'): per-language metrics fan out to (lang, metric,
    value) rows. Narrow, shuffle-free after the agg: unpivot is a
    per-row generator, exactly what feeding a metrics/long-format
    training table needs."""
    d = table(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("sum_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    return wide.unpivot(
        ids=["lang"],
        values=["n_docs", "sum_chars", "max_chars"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register("agg_sketches", extra=True)  # rows-only: sketch internals are engine-specific
def agg_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB aggregation posture: sketches instead of exact
    distincts/percentiles — approx_count_distinct (HLL++) and
    approx_percentile (KLL-style quantile summary) are mergeable, so
    they keep partial+final aggregation shape with O(1)-size state
    where COUNT(DISTINCT) needs an extra shuffle of the full key set.
    Rows-only (sketch estimates are engine-specific by design);
    accuracy vs exact is pinned in tests. Quantiles are emitted as
    scalar q50/q95/q99 columns — one GK sketch per group internally
    (Catalyst dedups identical percentile_approx children), scalar
    output so any row canonicalizer can sort/hash the frame (an
    array<double> column is pandas-unsortable)."""
    e = table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.element_at(q, 1).alias("q50"),
        F.element_at(q, 2).alias("q95"),
        F.element_at(q, 3).alias("q99"),
        F.count("*").alias("cnt"),
    )


# ---------------------------------------------------------------- D20


@register(
    "udf_surface",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\S+')) AS n_tokens,
           len(text) AS n_chars_actual
    FROM documents
    """,
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D20 — the Python UDF surface: an Arrow-batched pandas UDF
    (token count). This is the *slow path* by design — the X-series
    uses it only where built-ins can't express the op; here it proves
    the registration/Arrow plumbing with an oracle-checkable result."""
    from eventstream_notify_spark.functions.udfs import n_tokens

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


# ------------------------------------------------ data profiling (r3)


@register(
    "profile_table",
    extra=True,
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           MIN(l_quantity) AS min_val, MAX(l_quantity) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_extendedprice) AS BIGINT),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           MIN(l_extendedprice), MAX(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(l_discount) AS BIGINT),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           MIN(l_discount), MAX(l_discount)
    FROM lineitem
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling — per-column row/null/distinct/min/max summary
    (the first query any pipeline runs against a new table). ONE pass
    over the fact: all three columns' stats compute in a single
    aggregate projection and unpivot into the per-column row shape —
    not one scan per column (min/max/count are exact selections, so
    cross-engine parity is free; no sums of doubles)."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(f"{c}__rows").alias("n_rows"),
                    F.col(f"{c}__nonnull").alias("n_nonnull"),
                    F.col(f"{c}__distinct").alias("n_distinct"),
                    F.col(f"{c}__min").alias("min_val"),
                    F.col(f"{c}__max").alias("max_val"),
                )
                for c in cols
            ]
        )
    )
    return wide.select(stack.alias("s")).select("s.*")


@register(
    "profile_histogram",
    extra=True,
    oracle="""
    WITH ext AS (
        SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        FROM lineitem
    )
    SELECT LEAST(9, CAST(FLOOR((l_extendedprice - (SELECT lo FROM ext))
               / ((SELECT hi FROM ext) - (SELECT lo FROM ext)) * 10)
               AS INT)) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 buckets) over l_extendedprice — the
    profiling primitive behind optimizer statistics and data-quality
    dashboards. Two passes: a scalar min/max, then a scan-local
    bucket expression + count. Bucket math is pure double arithmetic
    from exact min/max selections — identical across engines (the
    only division is by the range, applied identically); the top edge
    folds into bucket 9 via LEAST."""
    li = table(spark, sf_dir, "lineitem")
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return (
        li.crossJoin(F.broadcast(ext))
        .select(
            F.least(
                F.lit(9),
                F.floor(
                    # NULL ratio on a single-value domain (hi = lo):
                    # both engines' LEAST skips NULLs, so every row
                    # folds into bucket 9 — DuckDB reaches the same
                    # place via NULL-on-zero-divide; Spark's ANSI
                    # divide would error instead (r10 degenerate-
                    # corpus sweep), hence the explicit guard
                    F.when(
                        F.col("hi") > F.col("lo"),
                        (F.col("l_extendedprice") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * 10,
                    )
                ).cast("int"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "anomaly_mad",
    extra=True,
    oracle="""
    WITH med AS (
        SELECT user_id, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY user_id
    ),
    dev AS (
        SELECT e.user_id, e.event_id, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.user_id = e.user_id
    ),
    mad AS (
        SELECT user_id, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY user_id
    )
    SELECT d.user_id, d.event_id, d.value,
           d.med AS median_value, m.mad
    FROM dev d JOIN mad m ON m.user_id = d.user_id
    WHERE d.adev > 3 * m.mad AND m.mad > 0
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly detection — median absolute deviation:
    flag events whose |value − median| exceeds 3×MAD (the outlier
    rule that, unlike z-scores, survives the outliers it hunts).
    Two median passes over the same user_id shuffle. Medians are
    order-insensitive (interpolation over the SORTED values), so
    exact cross-engine parity holds where double sums would break;
    Spark's percentile() and DuckDB's quantile_cont share the
    (n−1)·p linear-interpolation definition."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy(F.col("user_id").alias("mu")).agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), dev.user_id == F.col("mu"))
        .filter((F.col("adev") > 3 * F.col("mad")) & (F.col("mad") > 0))
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("med").alias("median_value"),
            "mad",
        )
    )


@register(
    "data_quality_audit",
    extra=True,
    oracle="""
    WITH base AS (
        SELECT o.*, c.c_custkey AS ck
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS uniq_viol,
               CAST(COUNT(CASE WHEN ck IS NULL THEN 1 END) AS BIGINT)
                   AS fk_viol,
               CAST(COUNT(CASE WHEN o_orderstatus IS NULL
                          OR o_orderstatus NOT IN ('O', 'F', 'P')
                          THEN 1 END) AS BIGINT) AS dom_viol,
               CAST(COUNT(CASE WHEN o_totalprice IS NULL
                          OR o_totalprice <= 0
                          THEN 1 END) AS BIGINT) AS price_viol,
               CAST(COUNT(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01'
                          THEN 1 END) AS BIGINT) AS fresh_viol
        FROM base
    )
    SELECT 'orderkey_unique' AS rule, n AS n_checked,
           uniq_viol AS n_violations,
           CAST(uniq_viol = 0 AS BIGINT) AS passed FROM agg
    UNION ALL SELECT 'custkey_fk_customer', n, fk_viol,
           CAST(fk_viol = 0 AS BIGINT) FROM agg
    UNION ALL SELECT 'status_in_domain', n, dom_viol,
           CAST(dom_viol = 0 AS BIGINT) FROM agg
    UNION ALL SELECT 'totalprice_positive', n, price_viol,
           CAST(price_viol = 0 AS BIGINT) FROM agg
    UNION ALL SELECT 'orderdate_fresh_lt_2000', n, fresh_viol,
           CAST(fresh_viol = 0 AS BIGINT) FROM agg
    """,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint validation — the CI gate a production
    table runs before anything downstream reads it: uniqueness,
    referential integrity, domain membership, sign, and freshness
    rules, each reported as (rule, n_checked, n_violations, passed).
    The freshness rule is deliberately strict (orders must predate
    2000-01-01) so the report shows a live failing rule.

    ONE pass computes every rule: orders left-joins the broadcast
    distinct customer-key side (the FK probe), and all violation
    counters ride a single aggregate projection — at 100 TB this is
    one scan + one broadcast hash join + a 1-row agg, then a driver
    -free unpivot into rule rows. No per-rule scans (Deequ's own
    'computed in one pass' design point)."""
    o = table(spark, sf_dir, "orders")
    ck = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("ck"))
        .distinct()
    )
    j = o.join(F.broadcast(ck), o.o_custkey == ck.ck, "left")
    agg = j.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("uniq_viol"),
        F.count(F.when(F.col("ck").isNull(), 1)).alias("fk_viol"),
        F.count(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin("O", "F", "P"),
                1,
            )
        ).alias("dom_viol"),
        F.count(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
                1,
            )
        ).alias("price_viol"),
        F.count(F.when(F.col("o_orderdate") >= "2000-01-01", 1)).alias(
            "fresh_viol"
        ),
    )
    rules = [
        ("orderkey_unique", "uniq_viol"),
        ("custkey_fk_customer", "fk_viol"),
        ("status_in_domain", "dom_viol"),
        ("totalprice_positive", "price_viol"),
        ("orderdate_fresh_lt_2000", "fresh_viol"),
    ]
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(rule).alias("rule"),
                    F.col("n").cast("bigint").alias("n_checked"),
                    F.col(col).cast("bigint").alias("n_violations"),
                    (F.col(col) == 0).cast("bigint").alias("passed"),
                )
                for rule, col in rules
            ]
        )
    )
    return agg.select(stack.alias("s")).select("s.*")


@register(
    "skyline_pareto",
    extra=True,
    oracle="""
    WITH p AS (
        SELECT p_partkey,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(p_size AS BIGINT) AS sz
        FROM part
    ),
    sweep AS (
        SELECT p_partkey, cents, sz,
               MAX(sz) OVER (ORDER BY cents
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS mx_cheaper,
               MAX(sz) OVER (ORDER BY cents
                             RANGE BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS mx_upto
        FROM p
    )
    SELECT p_partkey, cents, sz
    FROM sweep
    WHERE NOT (COALESCE(mx_cheaper, -1) >= sz OR mx_upto > sz)
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query — parts no other part
    dominates on (price low, size high): the classic multi-criteria
    OLAP operator (Börzsönyi et al., ICDE 2001). The 2-D case needs
    NO pairwise dominance join: after ordering by price, a point is
    dominated iff a strictly cheaper point has size >= its own, or a
    no-more-expensive point has size strictly greater — two running
    maxima over one RANGE window (O(n log n) total, vs the naive
    NOT-EXISTS O(n^2) self-join).

    Prices quantize to integer cents (one identical IEEE multiply
    -and-floor in both engines) so the RANGE frame's value offsets
    are integers — cross-engine frame semantics stay exact. The
    single global sort is the scale cost; at 100 TB use the
    distributive form: skyline(parts) = skyline(union of per
    -partition skylines), so each partition sweeps locally (the
    frontier is tiny) and only frontiers merge on one node — same
    window code both phases. d >= 3 criteria would switch to the
    block-nested-loop + presort pruning of the literature."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
        F.col("p_size").cast("bigint").alias("sz"),
    )
    w_cheaper = Window.orderBy("cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_upto = Window.orderBy("cents").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = p.select(
        "p_partkey",
        "cents",
        "sz",
        F.max("sz").over(w_cheaper).alias("mx_cheaper"),
        F.max("sz").over(w_upto).alias("mx_upto"),
    )
    return sweep.filter(
        ~(
            (F.coalesce(F.col("mx_cheaper"), F.lit(-1)) >= F.col("sz"))
            | (F.col("mx_upto") > F.col("sz"))
        )
    ).select("p_partkey", "cents", "sz")

@register(
    "join_lateral_topk",
    extra=True,
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
    FROM nation n
    JOIN LATERAL (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 3
    ) t ON TRUE
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-k join — "for each nation, its 3
    richest customers" phrased the way an application developer
    writes it (a correlated ORDER BY ... LIMIT subquery), exercising
    Catalyst's lateral-join decorrelation: the per-row subquery is
    rewritten into ONE windowed rank over the inner table, not N
    correlated executions.

    Scale: post-decorrelation the plan is a single (c_nationkey)
    window + broadcast join with nation — per-group top-k with
    map-side rank pruning, no nested-loop re-execution. The same
    query under a naive engine is O(outer x inner)."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation n
        JOIN LATERAL (
            SELECT c_custkey, c_name, c_acctbal
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) t
        """
    )


@register(
    "json_key_stats",
    extra=True,
    oracle="""
    WITH kv AS (
      SELECT unnest(json_keys(props)) AS key, props FROM events
    ),
    typed AS (
      SELECT key,
             CASE WHEN TRY_CAST(json_extract_string(props, '$.' || key)
                       AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END AS is_num
      FROM kv
    )
    SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(is_num) AS BIGINT) AS n_numeric,
           CAST(COUNT(*) - SUM(is_num) AS BIGINT) AS n_other
    FROM typed GROUP BY key
    """,
)
def json_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema discovery: enumerate every key appearing
    in the ``props`` JSON column with presence and inferred-type
    counts — what a catalog crawler runs before promoting JSON paths
    to typed columns (cf. scalar_variant, which consumes a KNOWN
    path; this finds the paths).

    Type inference is defined engine-neutrally as double-castability
    of the extracted string (Spark's non-ANSI cast and DuckDB's
    TRY_CAST agree: NULL on non-numeric). Scale: json_object_keys +
    explode is scan-local; the aggregate is by key (bounded by schema
    vocabulary, not rows).
    """
    e = table(spark, sf_dir, "events")
    kv = e.select(
        F.explode(F.json_object_keys("props")).alias("key"), "props"
    )
    typed = kv.select(
        "key",
        F.expr("get_json_object(props, concat('$.', key))")
        .cast("double")
        .isNotNull()
        .cast("int")
        .alias("is_num"),
    )
    return typed.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum("is_num").alias("n_numeric"),
        (F.count("*") - F.sum("is_num")).alias("n_other"),
    )


@register(
    "key_skew_audit",
    extra=True,
    oracle="""
    WITH kc AS (SELECT user_id, COUNT(*) AS c FROM events
                GROUP BY user_id),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS i FROM kc
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_c,
             CAST(SUM(i * c) AS BIGINT) AS s_ic
      FROM ranked
    )
    SELECT n_keys, n_rows, max_c,
           ROUND(CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE)
                 / CAST(n_rows AS DOUBLE), 6) AS hot_key_ratio,
           ROUND((2.0 * CAST(s_ic AS DOUBLE))
                 / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
                 - (CAST(n_keys AS DOUBLE) + 1.0)
                   / CAST(n_keys AS DOUBLE), 6) AS gini
    FROM agg
    """,
)
def key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic for the user_id key: key and
    row counts, the hottest key's load relative to uniform
    (hot_key_ratio = max_c / (n_rows/n_keys) — the number AQE's skew
    threshold compares against), and the Gini coefficient of the load
    distribution. This is the measurement that decides between a
    plain shuffle, AQE skew-split, and zx_join_salted.

    Gini via the rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over
    ascending-sorted counts: every aggregate is an exact bigint
    (rank-weighted sums — the corr_matrix discipline), floats appear
    only in the final expression. The rank runs distributed via
    ``global_row_number`` (functions/ranking.py: count-range buckets +
    driver-folded prefix offsets) so key cardinality never funnels
    through one task.
    """
    from eventstream_notify_spark.functions.ranking import (
        global_row_number,
    )

    e = table(spark, sf_dir, "events")
    kc = e.groupBy("user_id").agg(F.count("*").alias("c"))
    ranked, _n = global_row_number(kc, "c", ["user_id"], out="i")
    ranked = ranked.select("c", "i")
    agg = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
        F.sum(F.col("i") * F.col("c")).alias("s_ic"),
    )
    nk = F.col("n_keys").cast("double")
    nr = F.col("n_rows").cast("double")
    return agg.select(
        "n_keys",
        "n_rows",
        "max_c",
        F.round(F.col("max_c").cast("double") * nk / nr, 6).alias(
            "hot_key_ratio"
        ),
        F.round(
            (2.0 * F.col("s_ic").cast("double")) / (nk * nr)
            - (nk + 1.0) / nk,
            6,
        ).alias("gini"),
    )


_BLOOM_WORDS = 1024  # 64 Ki bits; sized for ~1e3-1e4 keys at k=3
_BLOOM_K = 3


def _bloom_positions(key: str, j: int) -> F.Column:
    """Bit position of hash j for a key column — xxhash64 salted by j
    (engine-internal determinism is all that's needed: the bloom is a
    PRE-FILTER, never part of the result). The key is cast to bigint
    first: xxhash64 is physical-type sensitive, so an int build side
    vs a bigint probe side would hash the SAME key to DIFFERENT bits
    and silently drop matching rows — type-stable hashing is a
    correctness requirement, not a nicety."""
    return F.pmod(
        F.xxhash64(F.col(key).cast("bigint"), F.lit(j)),
        F.lit(_BLOOM_WORDS * 64),
    )


@register(
    "join_bloom_prune",
    extra=True,
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 15
    GROUP BY 1
    """,
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER join pruning, built explicitly (see
    bloom_pruned_fact for the mechanism and the full scale notes)."""
    pruned, dim = bloom_pruned_fact(spark, sf_dir)
    return (
        pruned.join(dim, pruned.l_partkey == dim.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


def bloom_pruned_fact(spark: SparkSession, sf_dir: str):
    """The bloom build + fact pre-filter behind join_bloom_prune,
    exposed for tests (returns (pruned_fact, dim)).

    Runtime BLOOM-FILTER join pruning, built explicitly (the
    operator Spark's `runtime.bloomFilter` optimization injects when
    it can): the dim side (parts of size 15, ~2% of parts) folds into
    a 64 Kibit bloom bitmap — an aggregation to ≤1024 bitmask words,
    driver-folded into a LITERAL array column (the same bounded
    driver-fold discipline as the bucket-prefix pattern) — and the
    fact scan tests k=3 bits with pure shift/mask arithmetic BEFORE
    any exchange, so ~98% of lineitem rows never enter the join
    shuffle. False positives are then removed by the real equi-join,
    which is why the result (and the oracle) is the PLAIN join: the
    bloom changes bytes shuffled, never answers.

    At 100 TB: bitmap size is a constant knob (scale _BLOOM_WORDS
    with expected key count — 1e8 keys want ~2^30 bits, still only
    128 MiB broadcast, vs shuffling the full fact); the build side
    aggregates map-side into at most _BLOOM_WORDS rows regardless of
    dim size. The plan shows the membership test inside the scan
    stage's Filter — zero extra joins for the pre-filter."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    dim = part.filter(F.col("p_size") == 15).select("p_partkey", "p_brand")
    # build: OR together (1 << bit) per word; <=1024 rows leave the agg
    bits = dim.select(
        F.explode(
            F.array(
                *[_bloom_positions("p_partkey", j) for j in range(_BLOOM_K)]
            )
        ).alias("pos")
    )
    words_rows = (
        bits.groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(1L, int(pos % 64))")).alias("mask"))
        .collect()
    )
    masks = [0] * _BLOOM_WORDS
    for r in words_rows:
        masks[r.word] = r.mask
    bloom = F.array(*[F.lit(m).cast("long") for m in masks])
    fact = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    ).withColumn("bloom", bloom)
    test = None
    for j in range(_BLOOM_K):
        # cast matches _bloom_positions' build-side cast: xxhash64 is
        # physical-type sensitive, so probe and build MUST hash the
        # same physical type or matching keys silently fail the test
        h = f"xxhash64(cast(l_partkey as bigint), {j})"
        cond = (
            F.expr(
                f"(element_at(bloom, int(pmod({h}, "
                f"{_BLOOM_WORDS * 64}) div 64) + 1) >> "
                f"int(pmod({h}, {_BLOOM_WORDS * 64}) % 64))"
                " & 1L = 1L"
            )
        )
        test = cond if test is None else (test & cond)
    pruned = fact.filter(test).drop("bloom")
    return pruned, dim
