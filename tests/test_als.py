"""zx_als_implicit: EXACT-equality numpy twin. The trainer is
engineered bit-deterministic (integer-quantized user factors make the
distributed item-step sums order-independent; per-user solves are
independent; driver solves are single-threaded numpy), so the twin
asserts full row equality — not a tolerance band."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from eventstream_notify_spark.operators.analytics import (
    ALS_ALPHA,
    ALS_ITERS,
    ALS_LAMBDA,
    ALS_RANK,
    ALS_SCALE,
    ALS_TOPK,
    _als_init_y,
)
from eventstream_notify_spark.registry import lookup

SF = "/root/testdata/sf0.001"


def _round6_like_spark(x: float) -> float:
    # Spark ROUND = BigDecimal.valueOf(double) (shortest decimal repr,
    # same as Python repr) + setScale(6, HALF_UP)
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _twin(sf_dir: str) -> set[tuple]:
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    r = (
        ev.groupby(["user_id", "event_type"])
        .size()
        .reset_index(name="r")
    )
    types = sorted(r["event_type"].unique())
    idx = {t: i for i, t in enumerate(types)}
    r["item"] = r["event_type"].map(idx)
    n_items = len(types)
    y = np.array(_als_init_y(n_items), dtype=np.float64)

    users = sorted(int(u) for u in r["user_id"].unique())
    uidx = {u: k for k, u in enumerate(users)}
    xs_by_user: dict[int, np.ndarray] = {}
    for _ in range(ALS_ITERS):
        # user step: the kernel's BATCHED formulation verbatim (dense
        # confidence scatter, naive einsum, batched LAPACK solve) —
        # every float op is per-output-cell independent, so one
        # all-users batch here equals the kernel's arbitrary Arrow
        # batching bit-for-bit
        base = y.T @ y + ALS_LAMBDA * np.eye(ALS_RANK)
        w_conf = np.zeros((len(users), len(types)))
        c_lin = np.zeros((len(users), len(types)))
        for u, it, rv in zip(r["user_id"], r["item"], r["r"]):
            k = uidx[int(u)]
            w_conf[k, int(it)] = ALS_ALPHA * float(rv)
            c_lin[k, int(it)] = 1.0 + ALS_ALPHA * float(rv)
        a = base[None, :, :] + np.einsum("ui,ik,il->ukl", w_conf, y, y)
        b = np.einsum("ui,ik->uk", c_lin, y)
        xs_all = np.rint(
            np.linalg.solve(a, b[:, :, None])[:, :, 0] * ALS_SCALE
        ).astype(np.int64)
        for u in users:
            xs_by_user[u] = xs_all[uidx[u]]
        # item step: exact integer moments (python ints, order-free)
        s2 = float(ALS_SCALE) ** 2
        xtx = np.zeros((ALS_RANK, ALS_RANK))
        for i in range(ALS_RANK):
            for j in range(i, ALS_RANK):
                g = sum(
                    int(xs[i]) * int(xs[j])
                    for xs in xs_by_user.values()
                )
                xtx[i, j] = xtx[j, i] = g / s2
        new_y = np.array(y)
        for it in range(n_items):
            sub = r[r["item"] == it]
            a = xtx + ALS_LAMBDA * np.eye(ALS_RANK)
            bvec = np.zeros(ALS_RANK)
            for i in range(ALS_RANK):
                for j in range(i, ALS_RANK):
                    s = sum(
                        int(rv)
                        * int(xs_by_user[int(u)][i])
                        * int(xs_by_user[int(u)][j])
                        for u, rv in zip(sub["user_id"], sub["r"])
                    )
                    v = ALS_ALPHA * s / s2
                    a[i, j] += v
                    if i != j:
                        a[j, i] += v
                bx = sum(
                    int(xs_by_user[int(u)][i]) for u in sub["user_id"]
                )
                br = sum(
                    int(rv) * int(xs_by_user[int(u)][i])
                    for u, rv in zip(sub["user_id"], sub["r"])
                )
                bvec[i] = bx / ALS_SCALE + ALS_ALPHA * br / ALS_SCALE
            new_y[it] = np.linalg.solve(a, bvec)
        y = new_y

    seen = {
        (int(u), int(i)) for u, i in zip(r["user_id"], r["item"])
    }
    out = set()
    for uid, xs in xs_by_user.items():
        scores = []
        for it in range(n_items):
            s = 0.0
            for i in range(ALS_RANK):
                # fixed order, matching the Spark expression chain
                s = s + float(xs[i]) * float(y[it][i])
            scores.append((s / float(ALS_SCALE), it))
        ranked = sorted(scores, key=lambda t: (-t[0], t[1]))
        for rank, (s, it) in enumerate(ranked[:ALS_TOPK], start=1):
            out.add(
                (
                    uid,
                    types[it],
                    _round6_like_spark(s),
                    (uid, it) in seen,
                    rank,
                )
            )
    return out


def test_als_implicit_exact_twin(spark):
    got = {
        (r.user_id, r.event_type, r.score, r.seen, r.rank)
        for r in lookup("als_implicit").fn(spark, SF).collect()
    }
    assert got == _twin(SF)
