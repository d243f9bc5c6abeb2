"""zx_als_implicit: EXACT-equality numpy twin. The trainer is
engineered bit-deterministic (both factor sides quantize to 1e-5
integers, so every Gram/moment sum is an integer-valued float64 under
2^53 — exact in any order; the 4x4 solves are the written-down
no-pivot elimination), so the twin asserts full row equality — not a
tolerance band. The DuckDB recursive-CTE oracle is the cross-engine
check; this twin is the fast in-process sanity at sf0.001."""

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
    _als_init_yq,
    elim_solve4,
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
    yq = np.array(_als_init_yq(n_items), dtype=np.float64)
    s2 = float(ALS_SCALE) ** 2

    users = sorted(int(u) for u in r["user_id"].unique())
    uidx = {u: k for k, u in enumerate(users)}
    xs_by_user: dict[int, np.ndarray] = {}
    for _ in range(ALS_ITERS):
        # user step: the kernel's BATCHED formulation verbatim (dense
        # confidence scatter, einsum over integer-valued float64,
        # batched no-pivot elimination) — one all-users batch here
        # equals the kernel's arbitrary Arrow batching bit-for-bit
        base_q = yq.T @ yq
        w_conf = np.zeros((len(users), len(types)))
        c_lin = np.zeros((len(users), len(types)))
        for u, it, rv in zip(r["user_id"], r["item"], r["r"]):
            k = uidx[int(u)]
            w_conf[k, int(it)] = ALS_ALPHA * float(rv)
            c_lin[k, int(it)] = 1.0 + ALS_ALPHA * float(rv)
        aq = base_q[None, :, :] + np.einsum("ui,ik,il->ukl", w_conf, yq, yq)
        a = aq / s2
        a[:, range(ALS_RANK), range(ALS_RANK)] += ALS_LAMBDA
        bq = np.einsum("ui,ik->uk", c_lin, yq)
        xs_all = np.floor(
            elim_solve4(a, bq / float(ALS_SCALE)) * ALS_SCALE
        ).astype(np.int64)
        for u in users:
            xs_by_user[u] = xs_all[uidx[u]]
        # item step: exact integer moments (python ints, order-free)
        xtx = np.zeros((ALS_RANK, ALS_RANK))
        for i in range(ALS_RANK):
            for j in range(i, ALS_RANK):
                g = sum(
                    int(xs[i]) * int(xs[j])
                    for xs in xs_by_user.values()
                )
                xtx[i, j] = xtx[j, i] = float(g) / s2
        new_yq = np.array(yq)
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
                    v = ALS_ALPHA * float(s) / s2
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
                bvec[i] = (
                    float(bx) / ALS_SCALE
                    + ALS_ALPHA * float(br) / ALS_SCALE
                )
            new_yq[it] = np.floor(elim_solve4(a, bvec) * ALS_SCALE)
        yq = new_yq

    seen = {
        (int(u), int(i)) for u, i in zip(r["user_id"], r["item"])
    }
    out = set()
    for uid, xs in xs_by_user.items():
        scores = []
        for it in range(n_items):
            dot = 0
            for i in range(ALS_RANK):
                dot += int(xs[i]) * int(yq[it][i])  # exact int dot
            scores.append((float(dot) / s2, it))
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


def test_elim_solve4_solves_spd_systems():
    """The written-down elimination must actually solve: random SPD
    systems (Gram + ridge, the only shape ALS feeds it) round-trip
    A @ x = b to float tolerance, batched and scalar alike."""
    rng = np.random.default_rng(3)
    G = rng.normal(size=(50, 6, 4))
    A = np.einsum("bik,bil->bkl", G, G) + 0.5 * np.eye(4)
    b = rng.normal(size=(50, 4))
    x = elim_solve4(A, b)
    assert np.allclose(np.einsum("bkl,bl->bk", A, x), b, atol=1e-9)
    x0 = elim_solve4(A[0], b[0])
    assert np.array_equal(x0, x[0])
