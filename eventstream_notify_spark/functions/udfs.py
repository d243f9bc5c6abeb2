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
    """Classic O(n·m) dynamic-time-warping distance (abs cost)."""
    import numpy as np

    n, m = len(a), len(b)
    cost = np.full((n + 1, m + 1), np.inf)
    cost[0, 0] = 0.0
    for i in range(1, n + 1):
        d = np.abs(a[i - 1] - b)
        for j in range(1, m + 1):
            cost[i, j] = d[j - 1] + min(
                cost[i - 1, j], cost[i, j - 1], cost[i - 1, j - 1]
            )
    return float(cost[n, m])


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
