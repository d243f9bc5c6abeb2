"""As-of join edge semantics on literal frames."""

from __future__ import annotations

import datetime as dt

from eventstream_notify_spark.operators.temporal import asof_join


def T(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, T(5)), (2, 1, T(10)), (3, 1, T(2)), (4, 2, T(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(5), 100.0), (1, T(8), 200.0), (2, T(9), 300.0)],
        "user_id long, rts timestamp, snap double",
    )
    out = {
        r.event_id: r.snap
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            value_cols=["snap"],
        ).collect()
    }
    assert out[1] == 100.0  # snapshot AT the event ts is visible (<=)
    assert out[2] == 200.0  # most recent of two earlier snapshots
    assert out[3] is None   # no snapshot at-or-before -> null (left join)
    assert out[4] is None   # user 2's snapshot is later than the event


def test_dtw_kernel_properties():
    import numpy as np

    from eventstream_notify_spark.functions.udfs import _dtw

    assert _dtw(np.array([1.0, 2, 3]), np.array([1.0, 2, 3])) == 0.0
    # warping absorbs a repeated sample at zero cost
    assert _dtw(np.array([1.0, 1, 2, 3]), np.array([1.0, 2, 3])) == 0.0
    assert _dtw(np.array([1.0]), np.array([5.0])) == 4.0
    # symmetry
    a, b = np.array([1.0, 3, 5]), np.array([2.0, 4])
    assert _dtw(a, b) == _dtw(b, a)
    # total on empty input (ADVICE r2): defined, not IndexError
    assert _dtw(np.array([]), np.array([1.0])) == float("inf")
    assert _dtw(np.array([1.0]), np.array([])) == float("inf")


def test_dtw_batch_matches_scalar():
    """The slab kernel the pandas UDF runs must be bit-identical to
    the scalar reference across ragged lengths, chunk boundaries,
    and degenerate (empty / single-point) series."""
    import numpy as np

    from eventstream_notify_spark.functions.udfs import (
        _DTW_CHUNK,
        _dtw,
        _dtw_batch,
    )

    rng = np.random.default_rng(42)
    pairs = [
        (rng.normal(size=rng.integers(1, 30)),
         rng.normal(size=rng.integers(1, 30)))
        for _ in range(_DTW_CHUNK + 17)  # spans a chunk boundary
    ]
    pairs += [
        (np.array([]), rng.normal(size=4)),
        (rng.normal(size=4), np.array([])),
        (np.array([2.0]), np.array([7.0])),
    ]
    got = _dtw_batch(pairs)
    ref = np.array([_dtw(x, y) for x, y in pairs])
    assert np.array_equal(got, ref)


def test_theilsen_robust_to_outlier_day(spark, monkeypatch):
    """Constructed corpus: one event type whose daily counts follow
    c = 10 + 3*dayidx exactly, except ONE corrupted day with a 1000-
    event bot flood. Theil-Sen must recover slope exactly 3.0 (the
    median pairwise slope is untouched by a single outlier); OLS on
    the same series would not."""
    import datetime as dt

    from eventstream_notify_spark.operators import timeseries as tsmod

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(11):
        n = 10 + 3 * day
        if day == 5:
            n = 1000  # corrupted day
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(days=day, minutes=eid % 600),
                 1, "click", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(tsmod, "table", lambda spark, sf_dir, name: ev)
    got = {
        r.event_type: r
        for r in tsmod.theilsen_trend(spark, "ignored").collect()
    }
    r = got["click"]
    assert r.n_days == 11
    assert r.n_pairs == 55
    assert r.sen_slope_per_day == 3.0
