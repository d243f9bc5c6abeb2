"""Classic TPC-H query shapes on the driver's star schema — the
canonical proof that the relational substrate composes: multi-way
broadcast+shuffle joins, selective predicates, grouped decimal
aggregation, top-k. Names follow the TPC-H numbering; semantics are
adapted to the testdata's columns (no mktsegment on orders etc. —
stated per query). All decimal-exact, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_notify_spark.catalog import table
from eventstream_notify_spark.registry import register

def _rev() -> F.Column:
    # Built lazily — module-level Column construction would require an
    # active SparkContext at import time, breaking registry.queries()
    # when called before SparkSession.builder.getOrCreate().
    one = F.lit(1).cast("decimal(3,2)")
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        one - F.col("l_discount").cast("decimal(3,2)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) "
    "* (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


@register(
    "tpch_q3_shipping_priority",
    extra=True,
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: segment-filtered customers ⋈ orders ⋈
    lineitem, revenue per undelivered order, top-10. The customer
    filter broadcasts; only orders⋈lineitem shuffles; top-k is
    TakeOrdered with a deterministic tiebreak."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier",
    extra=True,
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: six-way join (three broadcast dims,
    one fact-fact shuffle), region-filtered, revenue per nation where
    supplier and customer share a nation."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    extra=True,
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: lost revenue per customer from
    returned lineitems in a quarter-ish window, top-20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "subquery_exists_agg",
    extra=True,
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def subquery_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS with a cross-table predicate
    (lineitem shipped >60 days after its order date), aggregated.
    Catalyst decorrelates to a left-semi join."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= '1997-01-01'
          AND o.o_orderdate <  '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "window_range_frame",
    extra=True,
    oracle="""
    SELECT o_orderkey, o_custkey,
           epoch_us(o_orderdate) AS order_us,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
               RANGE BETWEEN 7776000000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_90d_total
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per customer, trailing-90-day order total —
    a value-based frame over event time (vs D11's ROWS frame). The
    frame bound is in epoch micros; decimal sum keeps it exact."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").withColumn(
        "order_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_us")
        .rangeBetween(-90 * 86_400_000_000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "order_us",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_90d_total"),
    )


@register(
    "lateral_explode",
    extra=True,
    oracle="""
    SELECT p.p_partkey, t.word, t.pos
    FROM part p,
         LATERAL (
             SELECT UNNEST(string_split(p.p_type, ' ')) AS word,
                    UNNEST(range(len(string_split(p.p_type, ' ')))) AS pos
         ) t
    """,
)
def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/table-generating surface: posexplode of a computed
    array — one input row fans out to one row per element with its
    ordinal (the LATERAL VIEW of the SQL surface)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split("p_type", " ")).alias("pos", "word"),
    ).select("p_partkey", "word", F.col("pos").cast("bigint").alias("pos"))

# ------------------------------------------------------------------
# Round-3 widening: the remaining classic TPC-H shapes expressible on
# this schema (no partsupp, no commit/receipt dates, no comments —
# adaptations stated per query). Each exercises a distinct Catalyst
# capability: EXISTS→semi-join (Q4), full scan-local pushdown (Q6),
# conditional aggregation over a join (Q12), outer-join distribution
# (Q13), two-sum ratio (Q14), NOT-IN anti-join (Q16), correlated
# scalar subquery (Q17), disjunctive predicate pushdown (Q19),
# scalar-subquery threshold + NOT-EXISTS (Q22).


@register(
    "tpch_q4_priority_check",
    extra=True,
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: 'late' = shipped >60 days
    after order date, as the schema has no commit/receipt dates):
    orders in 1997Q3 with at least one late line, counted per
    priority. The EXISTS is a LEFT SEMI join — each order contributes
    once no matter how many lines are late, and only (orderkey,
    dates) shuffle.

    The lineitem side carries a shuffle_merge HINT (r9 verdict #6):
    left-semi always builds on the RIGHT, and the 2-column fact
    projection slips under the 64 MB broadcast threshold at the 10x
    decade — a broadcast build that grows linearly with the fact
    table until it tips, the one join shape where 'let the planner
    pick' chooses a driver-bound plan. Hinted SMJ measured 3.05 s ->
    1.01 s warm at 10x and cut the decade ratio 4.49x -> ~1.8x."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li.hint("shuffle_merge"),
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q6_forecast_revenue",
    extra=True,
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast-revenue change: a pure scan-side aggregate — every
    predicate reaches the parquet reader (shipdate range, discount
    band, quantity cap all show in PushedFilters), no join, no wide
    shuffle; the sum accumulates in DECIMAL for partition-order
    independence. The canonical pushdown benchmark."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(3,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q12_delay_classes",
    extra=True,
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'LATE'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30
                THEN 'SLOW' ELSE 'FAST' END AS delay_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-delay classes (adapted: no shipmode column, so the
    group key is the order→ship delay bucket): join + conditional
    aggregation — the CASE sums fold into one pass over the joined
    rows, counting urgent vs non-urgent lines per delay class."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "delay_class",
            F.when(delay > 90, "LATE").when(delay > 30, "SLOW").otherwise("FAST"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_order_distribution",
    extra=True,
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (adapted: the excluded
    class is urgent orders, as orders carry no comment column): LEFT
    OUTER join so order-less customers survive with count 0, then a
    second aggregation over the first — the classic two-level
    distribution-of-counts shape."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    extra=True,
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           AS promo_revenue,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue,
           100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo revenue: broadcast part into the month's lineitems,
    two decimal-exact sums in one pass, ratio taken as a raw IEEE
    division of the exact sums (bit-identical across engines — never
    round a quotient)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@register(
    "tpch_q16_supplier_cnt",
    extra=True,
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count by part attributes (adapted: lineitem is the
    part↔supplier link, as the schema has no partsupp; the excluded
    suppliers are those with negative balances, standing in for the
    complaints filter): negated predicates + IN-list on the broadcast
    dimension, NOT IN as a LEFT ANTI join on the (non-null) excluded
    key set, distinct-count per group."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    extra=True,
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue (adapted: brand filter only —
    no container column): the correlated scalar subquery (per-part
    average quantity) decorrelates into an aggregate over the brand's
    lineitems joined back on partkey. The per-part average runs over
    lineitems SEMI-JOINED to the brand's parts first — at scale you
    never aggregate the whole fact table to serve a 1/50 brand slice.
    Quantities are integer-valued doubles, so their plain sums are
    exact in both engines and the 0.2·avg threshold is bit-identical;
    the revenue sum accumulates in DECIMAL."""
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem")
    brand_li = li.join(p, li.l_partkey == p.p_partkey, "left_semi")
    per_part = brand_li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        brand_li.join(
            F.broadcast(per_part),
            brand_li.l_partkey == per_part.avg_partkey,
        )
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    extra=True,
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under an OR-of-ANDs predicate: the
    disjunction mixes columns from both sides, but Catalyst still
    derives the single-side implications (brand IN the three values,
    size ≤ 15, quantity ≤ 30) and pushes them below the join — the
    join input shrinks even though the full predicate can only apply
    post-join. Part broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")

    def branch(brand: str, smax: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & q.between(qlo, qhi)
        )

    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            branch("Brand#12", 5, 1, 11)
            | branch("Brand#23", 10, 10, 20)
            | branch("Brand#34", 15, 20, 30)
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_sales_opportunity",
    extra=True,
    oracle="""
    WITH thresh AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS cutoff
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT cutoff FROM thresh)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n.n_name
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: the group key is the
    nation name — customer names carry no country code — and the
    anti-join excludes customers with RECENT orders, since every
    customer has some order at these scale factors): rich lapsed
    customers per nation. The scalar threshold (average positive
    balance) accumulates in DECIMAL so the cutoff is bit-identical
    across engines before the double comparison; the NOT EXISTS is a
    LEFT ANTI join; nation broadcasts."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    cutoff_row = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count("*")
            ).alias("cutoff")
        )
    )
    # scalar subquery: a 1-row frame cross-joined (broadcast) into the
    # filter — the Spark twin of `> (SELECT cutoff FROM thresh)`
    return (
        c.crossJoin(F.broadcast(cutoff_row))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    extra=True,
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: the revenue 'view' aggregates one quarter of
    lineitem per supplier; the scalar MAX over that view joins back as
    an equality filter (ties all surface — no LIMIT). The view is
    computed ONCE behind a lazy localCheckpoint and reused by both the
    max and the equality side; decimal accumulation makes the
    equality comparison safe (exact sums — comparing float sums for
    equality would be the classic cross-engine trap)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q21_waiting_orders",
    extra=True,
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (adapted: 'late' =
    shipped >60 days after order date; finished orders only): the
    supplier was late on a multi-supplier order where NO OTHER
    supplier was late — the classic EXISTS + NOT-EXISTS double
    correlated self-reference.

    Spark shape (r12 rework, VERDICT r11 #2 — the previous cut's two
    fact-fact self-joins over a checkpointed late set measured 2.69x
    at the decade): the NOT EXISTS decorrelates into ONE aggregation
    of the late set by orderkey — "no other late supplier" is exactly
    COUNT(DISTINCT l_suppkey) = 1, with the group's row count
    carrying each late row's contribution to numwait and MAX(suppkey)
    recovering the (unique) supplier. That kills the anti join, the
    late set's second consumer, and with it the localCheckpoint (one
    fewer eager-AQE hang surface). The surviving EXISTS stays a LEFT
    SEMI against other-supplier lineitems ON THE SAME KEY the
    aggregation just partitioned by, so the solo side enters the semi
    without re-shuffling; the lineitem side keeps the shuffle_merge
    hint for the same reason as Q4 (r9 verdict #6): semi builds
    right, and a fact projection that fits under the broadcast
    threshold becomes a linearly-growing broadcast build — the
    driver-bound plan at scale."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nsup"),
            F.max("l_suppkey").alias("l_suppkey"),
            F.count("*").alias("cnt"),
        )
        .filter(F.col("nsup") == 1)
        .drop("nsup")
    )
    l2 = li.select("l_orderkey", "l_suppkey").hint("shuffle_merge").alias("l2")
    survived = solo.alias("l1").join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    s = table(spark, sf_dir, "supplier")
    return (
        survived.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("cnt").cast("long").alias("numwait"))
    )


@register(
    "tpch_q2_cheapest_supplier",
    extra=True,
    oracle="""
    WITH offer AS (
        SELECT l_partkey, l_suppkey,
               MIN(ROUND(l_extendedprice / l_quantity, 6)) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_brand, o.l_suppkey AS s_suppkey,
           s.s_name, o.unit_cost
    FROM offer o
    JOIN part p ON p.p_partkey = o.l_partkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    WHERE p.p_size = 15
      AND o.unit_cost = (
          SELECT MIN(o2.unit_cost) FROM offer o2
          WHERE o2.l_partkey = o.l_partkey
      )
    """,
)
def tpch_q2_cheapest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: the part↔supplier 'catalog'
    is derived from observed lineitem unit prices, as the schema has
    no partsupp): for size-15 parts, the supplier(s) offering the
    part's minimum unit cost. The correlated MIN decorrelates into a
    per-part MIN WINDOW over the offer table — ties surface as
    multiple rows, exactly like the reference query. Unit costs are
    rounded at 6 d.p. BEFORE the min/equality so the compared values
    are identical across engines (raw IEEE division is bit-identical;
    the round guards the min-vs-row equality).

    Growth term named and fixed (see below) (VERDICT r10 #6, the audit's worst
    TPC-H cell at 2.83x/decade): `offer` is a lineitem-wide distinct
    (l_partkey, l_suppkey) — it grows linearly with the fact table,
    and the old decorrelation (checkpoint offer, aggregate best per
    part, self-JOIN back on partkey+cost) materialized it once and
    re-shuffled it twice more. The window form runs ONE partkey
    exchange after the grouped agg and nothing else fact-derived
    moves: measured at the key-rebased 10x set 6.59 -> 1.82 s, decade
    ratio 2.83 -> 1.31x."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
        ).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = offer.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = table(spark, sf_dir, "supplier")
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "unit_cost",
        )
    )


# With these six, every TPC-H query shape Q1–Q22 is present: Q1 =
# agg_hash (full 8-aggregate form), Q2/Q9/Q11/Q16/Q20 adapted to a
# partsupp-less schema (the part↔supplier link and costs derive from
# lineitem; stated per query), Q4/Q12/Q21 adapted to shipdate-only
# lateness, Q13/Q22 adapted for missing comment/phone columns.


@register(
    "tpch_q7_nation_volume",
    extra=True,
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(strftime(CAST(l.l_shipdate AS DATE), '%Y') AS BIGINT)
               AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, by direction and year:
    the two-aliased-nation join (supplier's nation vs customer's
    nation) with a symmetric pair predicate — the query that forces
    the optimizer to join the SAME dimension twice under different
    roles. Both nation sides broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1k"))
        .join(n2, F.col("c_nationkey") == F.col("n2k"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    extra=True,
    oracle=f"""
    WITH base AS (
        SELECT CAST(strftime(CAST(o.o_orderdate AS DATE), '%Y') AS BIGINT)
                   AS o_year,
               {_REV_SQL} AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM base
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_5's share of ECONOMY-part
    revenue among AMERICA-region customers, per year — the
    eight-table join with a conditional-sum ratio. The share is one
    exactly-rounded IEEE division of two decimal-exact sums."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1k"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_region = F.broadcast(
        c.join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_region, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("n1k"))
        .select(
            F.date_format("o_orderdate", "yyyy").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    extra=True,
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(strftime(CAST(l.l_shipdate AS DATE), '%Y') AS BIGINT)
               AS o_year,
           CAST(SUM({_REV_SQL}
                 - CAST(p.p_retailprice AS DECIMAL(12,2))
                   * CAST(l.l_quantity AS DECIMAL(4,0))
                   * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (adapted: supply cost is modeled as 10%
    of the part's retail price per unit, as the schema has no
    partsupp.ps_supplycost): profit per supplier nation per year over
    'widget' parts — revenue minus modeled cost, all in DECIMAL so
    the grouped sums are exact."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,0)")
        * F.lit(0.10).cast("decimal(3,2)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("l_shipdate", "yyyy").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    extra=True,
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_2'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM val
    WHERE value > (SELECT SUM(value) * 0.001 FROM val)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted: 'stock value' is the traded
    lineitem value through NATION_2's suppliers, as the schema has no
    partsupp): per-part value filtered by a fraction-of-global-total
    scalar — the HAVING-against-scalar-subquery shape. The value
    frame materializes once (lazy checkpoint) and feeds both the
    total and the filter; sums are decimal-exact before the double
    threshold comparison."""
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    )
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("value")
        )
        .localCheckpoint(eager=False)
    )
    thresh = val.agg((F.sum("value") * F.lit(0.001)).alias("cut"))
    return val.crossJoin(F.broadcast(thresh)).filter(
        F.col("value") > F.col("cut")
    ).select("l_partkey", "value")


@register(
    "tpch_q18_large_orders",
    extra=True,
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           o.o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose lines total >250
    units — the IN (GROUP BY … HAVING) shape. The qualifying keys
    aggregate once and SEMI-join back into the fact (quantities are
    integer-valued doubles, so the HAVING sum is exact)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big).withColumnRenamed("l_orderkey", "bk"),
                li.l_orderkey == F.col("bk"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@register(
    "tpch_q20_excess_shippers",
    extra=True,
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'SMALL'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM shipped
        WHERE qty > (SELECT 1.1 * AVG(qty) FROM shipped)
    )
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 excess shippers (adapted: 'excess stock' is shipping >1.1×
    the per-supplier average quantity of SMALL parts, as the schema
    has no partsupp.ps_availqty): aggregate → scalar threshold →
    IN-subquery semi-join up to the supplier dimension. Quantities
    are integer-valued doubles (exact sums; the 1.1×avg threshold is
    identical across engines)."""
    li = table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    shipped = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .localCheckpoint(eager=False)
    )
    cut = shipped.agg((F.lit(1.1) * F.avg("qty")).alias("cut"))
    keys = shipped.crossJoin(F.broadcast(cut)).filter(
        F.col("qty") > F.col("cut")
    )
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        s.join(F.broadcast(keys), s.s_suppkey == keys.l_suppkey, "left_semi")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "tpch_q1_pricing_summary",
    extra=True,
    oracle="""
    WITH q AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 1000) AS BIGINT) AS qty_m,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(round(l_discount * 100) AS BIGINT) AS disc_p,
             CAST(round(l_tax * 100) AS BIGINT) AS tax_p
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(qty_m) AS DOUBLE) / 1e3, 6) AS sum_qty,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / 1e2, 6) AS sum_base_price,
           ROUND(CAST(SUM(price_c * (100 - disc_p)) AS DOUBLE) / 1e4, 6)
               AS sum_disc_price,
           ROUND(CAST(SUM(price_c * (100 - disc_p) * (100 + tax_p))
                 AS DOUBLE) / 1e6, 6) AS sum_charge,
           ROUND(CAST(SUM(qty_m) AS DOUBLE) / 1e3 / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / 1e2 / COUNT(*), 6)
               AS avg_price,
           ROUND(CAST(SUM(disc_p) AS DOUBLE) / 1e2 / COUNT(*), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM q GROUP BY 1, 2
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary — the canonical scan-heavy grouped
    aggregation (completes the 22/22 TPC-H adaptation set). All eight
    aggregates accumulate in exact integer units (milli-qty, cents,
    integer percent discounts/taxes — the repo's quantize-then-sum
    discipline), so the extended sums (price x (1-disc) x (1+tax))
    are order-independent bigint products; doubles appear only in the
    final per-group division.

    Scale: one pushed-down scan (shipdate predicate + 7-column
    pruning), partial aggregation before the 4-group exchange —
    Catalyst's textbook plan, nothing custom.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
    )
    q = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity") * 1000).cast("bigint").alias("qty_m"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_p"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("tax_p"),
    )
    cnt = F.count("*")
    return q.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("qty_m").cast("double") / 1e3, 6).alias("sum_qty"),
        F.round(F.sum("price_c").cast("double") / 1e2, 6).alias(
            "sum_base_price"
        ),
        F.round(
            F.sum(F.col("price_c") * (100 - F.col("disc_p"))).cast("double")
            / 1e4,
            6,
        ).alias("sum_disc_price"),
        F.round(
            F.sum(
                F.col("price_c")
                * (100 - F.col("disc_p"))
                * (100 + F.col("tax_p"))
            ).cast("double")
            / 1e6,
            6,
        ).alias("sum_charge"),
        F.round(F.sum("qty_m").cast("double") / 1e3 / cnt, 6).alias("avg_qty"),
        F.round(F.sum("price_c").cast("double") / 1e2 / cnt, 6).alias(
            "avg_price"
        ),
        F.round(F.sum("disc_p").cast("double") / 1e2 / cnt, 6).alias(
            "avg_disc"
        ),
        cnt.cast("bigint").alias("count_order"),
    )
