"""Vector math as Column expressions — higher-order functions only.

Everything stays JVM-side inside whole-stage codegen: ``zip_with``
for elementwise products, ``aggregate`` for the fold. The fold is a
deterministic left-to-right sequence, which (with explicit double
casts) makes results bit-identical to DuckDB's ``list_sum`` fold —
that's what lets cosine scores be oracle-checked exactly.

A pandas-UDF kernel path exists for genuinely heavy math (matrix
ops), but dot/norm/cosine never need it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (left-to-right fold)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: str | Column) -> Column:
    return F.aggregate(
        F.transform(_c(a), lambda x: _d(x) * _d(x)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---- DuckDB oracle twins (SQL text generators) ----------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def l2_norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"
