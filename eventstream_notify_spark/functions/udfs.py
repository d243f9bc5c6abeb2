"""Arrow-batched pandas UDFs (the deliberate slow path — SURVEY §4.2).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves real type hints to pick the Arrow serialization strategy.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

# NOTE: return types are DataType objects, not DDL strings — string
# parsing requires an active SparkSession, and executor workers import
# this module while unpickling UDFs, where no session exists.


@pandas_udf(LongType())
def n_tokens(text: pd.Series) -> pd.Series:
    """Whitespace-token count (\\S+ runs) — vectorized over Arrow batches."""
    return text.str.count(r"\S+")


def _dtw(a, b) -> float:
    """Classic O(n·m) dynamic-time-warping distance (abs cost),
    vectorized by anti-diagonal sweep: cells on one anti-diagonal are
    mutually independent, so the DP runs n+m-1 numpy steps instead of
    n·m Python iterations. Each cell is still computed as
    ``d + min(up, left, diag)`` — one addition, one three-way min —
    so results are bit-identical to the naive double loop."""
    import numpy as np

    n, m = len(a), len(b)
    d = np.abs(np.asarray(a, dtype=float)[:, None] - np.asarray(b, dtype=float)[None, :])
    cost = np.full((n, m), np.inf)
    cost[0, 0] = d[0, 0]
    for k in range(1, n + m - 1):
        i = np.arange(max(0, k - m + 1), min(n - 1, k) + 1)
        j = k - i
        # np.where evaluates both branches; i-1/j-1 may be -1 there,
        # which indexes a valid (masked-out) cell — never read through
        up = np.where(i > 0, cost[i - 1, j], np.inf)
        left = np.where(j > 0, cost[i, j - 1], np.inf)
        diag = np.where((i > 0) & (j > 0), cost[i - 1, j - 1], np.inf)
        cost[i, j] = d[i, j] + np.minimum(np.minimum(up, left), diag)
    return float(cost[n - 1, m - 1])


@pandas_udf(DoubleType())
def dtw_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """DTW distance between two array<double> columns, one pair per
    row, Arrow-batched. This is the deliberate Python kernel slot
    (SURVEY §2.F X8): warping alignment has no relational form; the
    surrounding pair generation / blocking stays declarative."""
    import numpy as np

    return pd.Series(
        [
            _dtw(np.asarray(x, dtype=float), np.asarray(y, dtype=float))
            if x is not None and y is not None and len(x) and len(y)
            else None
            for x, y in zip(a, b)
        ]
    )
