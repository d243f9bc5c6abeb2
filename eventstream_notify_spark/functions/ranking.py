"""Distributed global ordering primitives — the bucket-prefix pattern
as a reusable helper.

A bare ``row_number()/ntile() OVER (ORDER BY ...)`` funnels its whole
input through ONE task (Spark warns "Moving all data to a single
partition") — dead at 100 TB. The classic fix (same construction as
``llm_epoch_shuffle``'s per-epoch rank): range-bucket the leading
order key off one min/max row, count rows per bucket, fold the tiny
(≤ ``buckets``) count table into prefix offsets ON THE DRIVER (bounded
by a constant, independent of data size), broadcast the offsets back
as a literal map, and rank within each bucket in parallel:

    global pos = bucket offset + local row_number

The result is bit-identical to the single-partition window (the range
bucket is a monotone function of the leading key, so bucket-major
order IS the global order) with no unpartitioned window anywhere in
the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEFAULT_BUCKETS = 64


def global_row_number(
    df: DataFrame,
    key: Column | str,
    tiebreak: list[str],
    out: str = "pos",
    buckets: int = _DEFAULT_BUCKETS,
) -> tuple[DataFrame, int]:
    """Add a 1-based global dense row number ordered by
    ``(key ASC, *tiebreak ASC)`` without a global window. ``key`` must
    be numeric (for DESC semantics pass the negated column). Returns
    ``(df_with_out_column, total_row_count)`` — the count is free (it
    is the sum of the bucket counts this already collects).

    Cost: two tiny driver actions (min/max row; ≤ ``buckets`` count
    rows). At scale, cache the input if it is expensive to recompute.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    df = df.withColumn("_gr_key", kcol.cast("double"))
    lohi = df.agg(
        F.min("_gr_key").alias("lo"), F.max("_gr_key").alias("hi")
    ).first()
    if lohi["lo"] is None:  # empty input
        return df.withColumn(out, F.lit(None).cast("bigint")).drop("_gr_key"), 0
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / buckets if hi > lo else 1.0
    b = df.withColumn(
        "_gr_bucket",
        F.least(
            F.floor((F.col("_gr_key") - lo) / width), F.lit(buckets - 1)
        ).cast("int"),
    )
    counts = sorted(
        (int(r["_gr_bucket"]), int(r["n"]))
        for r in b.groupBy("_gr_bucket").agg(F.count("*").alias("n")).collect()
    )
    n_total = sum(c for _, c in counts)
    offsets: dict[int, int] = {}
    acc = 0
    for bk, c in counts:
        offsets[bk] = acc
        acc += c
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_gr_bucket"),
    )
    w_local = Window.partitionBy("_gr_bucket").orderBy(
        "_gr_key", *tiebreak
    )
    return (
        b.withColumn(out, off_expr + F.row_number().over(w_local))
        .drop("_gr_key", "_gr_bucket"),
        n_total,
    )


def ntile_from_pos(pos: str, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) computed from a precomputed global
    1-based position over n rows: the first ``n % k`` tiles carry
    ``n div k + 1`` rows, the rest ``n div k``."""
    q, r = divmod(n, k)
    p = F.col(pos)
    if q == 0:  # fewer rows than tiles: tile == position
        return p.cast("int")
    boundary = r * (q + 1)
    # integer `div`, not float division — a double quotient can land
    # one ulp under an exact integer and floor off by one at scale
    return (
        F.when(
            p <= boundary,
            F.expr(f"({pos} - 1) div {q + 1}"),
        )
        .otherwise(F.expr(f"{r} + (({pos} - {boundary}) - 1) div {q}"))
        .cast("int")
        + 1
    )


def bucket_prefix_expr(
    df: DataFrame,
    bucket_col: str,
    val_col: str,
    op: str = "sum",
    descending: bool = False,
) -> Column:
    """Strictly-before prefix aggregate over a BOUNDED bucket table,
    folded on the driver and returned as a literal-map lookup column —
    the unpartitioned-window-free form of
    ``agg(val) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING TO -1)``.

    ``df`` must already be the per-bucket aggregate (≤ a constant
    number of rows — bucket counts are chosen constants, never data-
    proportional). ``op`` is ``sum`` or ``max``; ``descending`` orders
    the fold by bucket DESC. Buckets absent from the prefix (the first
    bucket) yield NULL — callers coalesce to their identity.
    """
    rows = sorted(
        ((int(r[bucket_col]), r[val_col]) for r in df.collect()),
        reverse=descending,
    )
    prefix: dict[int, object] = {}
    acc = None
    for bk, v in rows:
        if acc is not None:
            prefix[bk] = acc
        if v is not None:
            if acc is None:
                acc = v
            elif op == "sum":
                acc = acc + v
            elif op == "max":
                acc = acc if acc >= v else v
            else:
                raise ValueError(f"unsupported op {op!r}")
    if not prefix:
        return F.lit(None)
    return F.element_at(
        F.create_map(*[F.lit(x) for kv in prefix.items() for x in kv]),
        F.col(bucket_col).cast("int"),
    )


def global_ntile(
    df: DataFrame,
    k: int,
    key: Column | str,
    tiebreak: list[str],
    out: str = "tile",
    buckets: int = _DEFAULT_BUCKETS,
) -> DataFrame:
    """NTILE(k) over a global ``(key ASC, *tiebreak ASC)`` order via
    the distributed rank — bit-identical to the single-window form."""
    ranked, n = global_row_number(
        df, key, tiebreak, out="_gn_pos", buckets=buckets
    )
    return ranked.withColumn(out, ntile_from_pos("_gn_pos", n, k)).drop(
        "_gn_pos"
    )
