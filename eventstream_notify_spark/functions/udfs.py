"""Arrow-batched pandas UDFs (the deliberate slow path — SURVEY §4.2).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves real type hints to pick the Arrow serialization strategy.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def n_tokens(text: pd.Series) -> pd.Series:
    """Whitespace-token count (\\S+ runs) — vectorized over Arrow batches."""
    return text.str.count(r"\S+")
