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
    """Classic O(n·m) dynamic-time-warping distance (abs cost) —
    the scalar REFERENCE kernel. The hot path is ``_dtw_batch``; this
    stays as the property-tested ground truth it must match."""
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        # total on empty input (an empty series warps to nothing)
        return float("inf")
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


# Pairs per DP slab. Bounds kernel memory to one (128, n_max, m_max)
# float64 cost-matrix slab — ~140 MB at year-long daily series — while
# amortizing each anti-diagonal numpy step across 128 pairs. Measured
# sweet spot on 365-pt series: 128 beats 64 (less step overhead) and
# 256 (band arrays fall out of L2).
_DTW_CHUNK = 128


def _dtw_batch(pairs):
    """Batched DTW: one anti-diagonal DP sweep per slab of pairs.

    The per-pair sweep spends its time in numpy *call overhead*
    (n+m-1 tiny masked gathers per pair — measurably slower than the
    naive loop at ~365-point series). Two fixes compound here:
    (1) the sweep runs once per slab of ``_DTW_CHUNK`` pairs, so each
    step operates on a (pairs, diag_len) array; (2) only the two live
    anti-diagonals are kept, as contiguous (pairs, n_max+1) bands
    indexed by i+1 — the three predecessor reads become SLICES, and
    the only gather left per step is the d lookup. Cells outside a
    pair's true (n, m) extent carry inf and never influence in-range
    cells (every in-range cell's predecessors are in range).
    Results match ``_dtw`` bit-for-bit: same d + min(up, left, diag)
    recurrence, same float64 ops, same order. Measured ~4× over the
    per-pair sweep at 365-pt series."""
    import numpy as np

    out = np.empty(len(pairs), dtype=float)
    order = sorted(range(len(pairs)), key=lambda ix: (len(pairs[ix][0]), len(pairs[ix][1])))
    for c0 in range(0, len(order), _DTW_CHUNK):
        idx = order[c0 : c0 + _DTW_CHUNK]
        ns = np.array([len(pairs[ix][0]) for ix in idx])
        ms = np.array([len(pairs[ix][1]) for ix in idx])
        if ns.min() == 0 or ms.min() == 0:
            for ix in idx:
                out[ix] = _dtw(pairs[ix][0], pairs[ix][1])
            continue
        p, nmax, mmax = len(idx), int(ns.max()), int(ms.max())
        A = np.zeros((p, nmax))
        B = np.zeros((p, mmax))
        for r, ix in enumerate(idx):
            A[r, : ns[r]] = pairs[ix][0]
            B[r, : ms[r]] = pairs[ix][1]
        d = np.abs(A[:, :, None] - B[:, None, :])
        # mask padding: inf d keeps out-of-range cells at inf cost
        pad = (np.arange(nmax)[None, :, None] >= ns[:, None, None]) | (
            np.arange(mmax)[None, None, :] >= ms[:, None, None]
        )
        d = np.where(pad, np.inf, d)
        # Rolling anti-diagonal band: only diagonals k-1 and k-2 are
        # live. Stored as (p, nmax+1) arrays indexed by i+1 (leading
        # inf column stands in for the i-1 = -1 reads), so the three
        # predecessor reads are contiguous SLICES — the 3-D cost cube
        # and its per-step fancy-index gathers disappear.
        prev2 = np.full((p, nmax + 1), np.inf)
        prev = np.full((p, nmax + 1), np.inf)
        prev[:, 1] = d[:, 0, 0]
        chunk_out = np.empty(p)
        ends = ns + ms - 2  # diagonal where each pair's answer lands
        done0 = ends == 0
        chunk_out[done0] = prev[done0, 1]
        for k in range(1, nmax + mmax - 1):
            i0 = max(0, k - mmax + 1)
            i1 = min(nmax - 1, k)
            iv = np.arange(i0, i1 + 1)
            dk = d[:, iv, k - iv]  # the step's one gather
            up = prev[:, i0 : i1 + 1]  # (i-1, j)   = padded idx i
            left = prev[:, i0 + 1 : i1 + 2]  # (i, j-1) = padded idx i+1
            diag = prev2[:, i0 : i1 + 1]  # (i-1, j-1) = padded idx i
            cur = np.full((p, nmax + 1), np.inf)
            cur[:, i0 + 1 : i1 + 2] = dk + np.minimum(
                np.minimum(up, left), diag
            )
            prev2, prev = prev, cur
            done = ends == k
            if done.any():
                chunk_out[done] = cur[done, ns[done]]
        out[list(idx)] = chunk_out
    return out


@pandas_udf(DoubleType())
def dtw_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """DTW distance between two array<double> columns, one pair per
    row, Arrow-batched. This is the deliberate Python kernel slot
    (SURVEY §2.F X8): warping alignment has no relational form; the
    surrounding pair generation / blocking stays declarative. All
    pairs in the Arrow batch share one 3-D DP (``_dtw_batch``)."""
    import numpy as np

    pairs = []
    pos = []
    vals = [None] * len(a)
    for r, (x, y) in enumerate(zip(a, b)):
        if x is not None and y is not None and len(x) and len(y):
            pairs.append(
                (np.asarray(x, dtype=float), np.asarray(y, dtype=float))
            )
            pos.append(r)
    if pairs:
        for r, v in zip(pos, _dtw_batch(pairs)):
            vals[r] = float(v)
    return pd.Series(vals)
