"""Tests for percentiles, correlation matrix, and bucketed skyline."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstream_notify_spark.registry import queries

SF = "/root/testdata/sf0.001"


def test_percentiles_are_monotone(spark, sf_dir):
    for r in queries()["zx_agg_percentiles"](spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p95 <= r.p99
        assert r.n > 0


def test_corr_matrix_bounds_and_symmetry_convention(spark, sf_dir):
    rows = queries()["zx_corr_matrix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.pearson_r <= 1.0
        assert r.type_a < r.type_b  # upper triangle only, no dupes
    assert len({(r.type_a, r.type_b) for r in rows}) == len(rows)


def test_skyline_bucketed_is_exact(spark, sf_dir):
    """The bucketed distributed sweep must return EXACTLY the dominance
    set — verified against a brute-force O(n^2) check in Python."""
    out = {
        r.o_orderkey
        for r in queries()["zx_skyline_pareto_bucketed"](spark, sf_dir).collect()
    }
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_orderdate").cast("timestamp_ntz").alias("d"),
        )
        .collect()
    )
    pts = [(r.o_orderkey, r.o_totalprice, r.d) for r in rows]

    def dominated(me):
        return any(
            o[1] >= me[1] and o[2] >= me[2] and (o[1] > me[1] or o[2] > me[2])
            for o in pts
        )

    brute = {k for k, p, d in pts if not dominated((k, p, d))}
    assert out == brute


def test_skyline_bucketed_no_global_window_over_fact(spark):
    """Every max window over the per-price group table must be
    partitioned by bucket; the only unpartitioned window allowed is
    the 64-row bucket-prefix table."""
    from eventstream_notify_spark.plans.explain import plan_str

    plan = plan_str(queries()["zx_skyline_pareto_bucketed"](spark, SF), "simple")
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    unpartitioned = [s for s in specs if "bucket" not in s.split("ASC")[0]]
    # the bucket-prefix window orders BY bucket (desc) without
    # partitioning — that one runs on a 64-row table and is fine
    for s in unpartitioned:
        assert "bucket" in s, f"window neither partitioned nor over buckets: {s}"


def test_pit_join_has_no_range_join(spark):
    """The PIT lookup must ride the union+carry-forward kernel — a
    range/theta join would plan a (BroadcastNestedLoop|Cartesian)
    join and die at scale."""
    from eventstream_notify_spark.plans.explain import plan_str

    plan = plan_str(queries()["zx_scd2_point_in_time"](spark, SF), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_pit_join_matches_python_reconstruction(spark, sf_dir):
    """Replay one user's timeline in Python: the state at probe time
    must be the last state change at or before probe_ts."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "unix_micros(cast(ts as timestamp)) AS ts_us",
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    got = {
        r.event_id: r.state_at
        for r in queries()["zx_scd2_point_in_time"](spark, sf_dir).collect()
    }
    checked = 0
    for user, evs in list(by_user.items())[:5]:
        evs.sort(key=lambda r: (r.ts_us, r.event_id))
        changes = []
        prev = None
        for e in evs:
            if e.event_type != prev:
                changes.append((e.ts_us, e.event_id, e.event_type))
                prev = e.event_type
        for e in evs:
            if e.event_type != "purchase":
                continue
            probe = e.ts_us - 3_600_000_000
            state = "none"
            for ts, eid, st in changes:
                if ts <= probe:
                    state = st
            assert got[e.event_id] == state
            checked += 1
    assert checked > 0


def test_fuzzy_lookup_every_probe_finds_origin(spark, sf_dir):
    """Each probe is one deletion away from its origin name, so every
    probe must report >= 1 match at distance <= 1."""
    res = {r.probe_id: r for r in queries()["zx_fuzzy_typo_lookup"](spark, sf_dir).collect()}
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert len(res) == n_parts
    for r in res.values():
        assert r.n_names >= 1
        assert r.min_dist <= 1


def test_fuzzy_lookup_blocked_not_cross_joined(spark):
    from eventstream_notify_spark.plans.explain import plan_str

    plan = plan_str(queries()["zx_fuzzy_typo_lookup"](spark, SF), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_sliding_dau_dominates_daily(spark, sf_dir):
    """dau7 >= dau1 everywhere, and dau7 never exceeds the 7-day sum
    of dailies; all days in output must carry data of their own."""
    rows = queries()["zx_sliding_dau"](spark, sf_dir).collect()
    assert rows
    daily = {r.day: r.dau1 for r in rows}
    for r in rows:
        assert r.dau7 >= r.dau1
        window_sum = sum(daily.get(r.day - o, 0) for o in range(7))
        assert r.dau7 <= window_sum


def test_ab_stats_recompute_from_pandas(spark, sf_dir):
    """Recompute one event type's z-score with numpy from the same
    quantized values and compare at 6 d.p."""
    import numpy as np

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "cast(user_id % 2 as int) AS variant",
            "event_type",
            "cast(round(value * 1000) as bigint) AS v",
        )
        .filter("event_type = 'click'")
        .toPandas()
    )
    a = pdf[pdf.variant == 0].v.to_numpy(dtype=np.float64)
    b = pdf[pdf.variant == 1].v.to_numpy(dtype=np.float64)
    lift = (b.mean() - a.mean()) / 1000.0
    z = (b.mean() - a.mean()) / np.sqrt(
        (np.mean(a * a) - a.mean() ** 2) / len(a)
        + (np.mean(b * b) - b.mean() ** 2) / len(b)
    )
    got = (
        queries()["zx_ab_test_stats"](spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .first()
    )
    assert abs(got.lift - lift) < 1e-5
    assert abs(got.z_score - z) < 1e-5


def test_acf_bounds_and_lag_domain(spark, sf_dir):
    rows = queries()["zx_ts_acf"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.lag <= 24
        assert -1.0 <= r.acf <= 1.0
        assert r.n > 1


def test_cusum_matches_python(spark, sf_dir):
    """Integer CUSUM argmax recomputed in pure Python must agree."""
    import collections

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "unix_micros(cast(ts as timestamp)) div 86400000000 AS day",
            "cast(round(value * 1000) as bigint) AS v",
        )
        .collect()
    )
    daily = collections.defaultdict(int)
    for r in rows:
        daily[r.day] += r.v
    days = sorted(daily)
    n, s = len(days), sum(daily.values())
    best, run = None, 0
    for d in days:
        run += n * daily[d] - s
        if best is None or abs(run) > abs(best[1]):
            best = (d, run)
    got = queries()["zx_change_point_cusum"](spark, sf_dir).first()
    assert (got.day, got.cusum) == best


def test_shard_pack_conserves_assets_and_bytes(spark, sf_dir):
    """Shards must partition the corpus: totals conserved, every shard
    except possibly the last reaches the target once it closes."""
    rows = queries()["zx_mm_shard_pack"](spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("sum(octet_length(encode(text, 'UTF-8'))) AS b", "count(*) AS n")
        .first()
    )
    assert sum(r.n_assets for r in rows) == docs.n
    assert sum(r.shard_bytes for r in rows) == docs.b
    ids = sorted(r.shard_id for r in rows)
    assert ids == list(range(len(ids)))  # contiguous shard ids


def test_bpe_pairs_match_python(spark, sf_dir):
    """Recount the top pair in pure Python."""
    import collections

    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    cnt: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.strip().split():
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    cnt[w[i : i + 2]] += 1
    rows = queries()["zx_llm_bpe_pair_counts"](spark, sf_dir).collect()
    assert len(rows) == 20
    top = rows[0]
    best = max(cnt.items(), key=lambda kv: (kv[1], ))
    assert top.cnt == cnt[top.pair] == max(cnt.values())
    for r in rows:
        assert r.cnt == cnt[r.pair]


def test_max_concurrent_matches_python_sweep(spark, sf_dir):
    """Recompute peak concurrency with a python sweep over the same
    session intervals."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "event_id",
            "unix_micros(cast(ts as timestamp)) AS ts_us",
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_id))
    deltas: dict[int, int] = {}
    for evs in by_user.values():
        evs.sort()
        start = prev = None
        for ts, _ in evs:
            if prev is None or ts - prev > 1_800_000_000:
                if start is not None:
                    deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
                start = ts
                deltas[ts] = deltas.get(ts, 0) + 1
            prev = ts
        deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
    run, best = 0, []
    for t in sorted(deltas):
        run += deltas[t]
        best.append((run, t))
    want = sorted(best, key=lambda x: (-x[0], x[1]))[:10]
    got = [
        (r.concurrent, r.ts_us)
        for r in queries()["zx_max_concurrent_sessions"](spark, sf_dir).collect()
    ]
    assert got == want


def test_stream_pit_enrich_states_partition_events(spark, sf_dir):
    """Every event lands in exactly one state bucket; totals conserve."""
    rows = queries()["zx_stream_pit_enrich"](spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
    states = {r.state_at for r in rows}
    assert "none" in states  # earliest probes precede any state
    assert states <= {"none", "click", "view", "purchase", "signup", "error"}


def test_mmr_rerank_matches_python_reference(spark, sf_dir):
    """Rebuild one query's MMR selection exactly in numpy."""
    import numpy as np

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    qid = 0
    qv = emb[qid]
    qn = np.sqrt((qv * qv).sum())
    cands = []
    for vid, v in emb.items():
        if vid == qid:
            continue
        n = np.sqrt((v * v).sum())
        cands.append((round(float(qv @ v / (qn * n)), 6), vid, v, n))
    cands.sort(key=lambda t: (-t[0], t[1]))
    cands = cands[:50]
    rel = np.array([c[0] for c in cands])
    ids = np.array([c[1] for c in cands])
    V = np.stack([c[2] for c in cands])
    # the kernel's quantized-sim spec: integer micro-unit Gram, IEEE
    # sqrt/divide — the discipline that makes the DuckDB oracle replay
    # the greedy loop exactly
    Q = np.floor(V * 1e6 + 0.5).astype(np.int64)
    gram = Q @ Q.T
    nq = np.sqrt(np.diag(gram).astype(np.float64))
    sims = gram.astype(np.float64) / np.outer(nq, nq)
    max_sim = np.zeros(len(cands))
    sel, want = [], []
    for rank in range(10):
        sc = 0.7 * rel - (1 - 0.7) * max_sim
        sc[sel] = -np.inf
        best = int(np.lexsort((ids, -sc))[0])
        sel.append(best)
        want.append((qid, rank + 1, int(ids[best]), float(sc[best])))
        max_sim = np.maximum(max_sim, sims[:, best])
    from pyspark.sql import functions as SF

    got = [
        (r.query_id, r.rank, r.vec_id, r.mmr_score)
        for r in queries()["zx_mmr_rerank"](spark, sf_dir)
        .filter(SF.col("query_id") == qid)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_mmr_first_pick_is_top_cosine_and_diverse(spark, sf_dir):
    """Rank-1 must equal the plain cosine top-1; selections distinct."""
    mmr = queries()["zx_mmr_rerank"](spark, sf_dir).collect()
    cos = queries()["sim_search_cosine"](spark, sf_dir).collect()
    top1 = {
        r.query_id: r.vec_id
        for r in cos
        if r.score == max(c.score for c in cos if c.query_id == r.query_id)
    }
    by_q: dict[int, list] = {}
    for r in mmr:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len({r.vec_id for r in rows}) == len(rows)
        if qid in top1:
            assert rows[0].vec_id == top1[qid]


def test_incremental_rollup_merge_reads_view_not_history(spark):
    """The merge plan must scan the materialized view plus a
    cutoff-FILTERED events scan — history reaches Spark only through
    the view. The events-side parquet scan must carry a pushed ts
    filter."""
    from eventstream_notify_spark.plans.explain import plan_str

    df = queries()["zx_incremental_rollup"](spark, SF)
    plan = plan_str(df, "formatted")
    assert "ivm_rollup_" in plan  # the standing view is a scan source
    # the events scan pushes the cutoff down to parquet
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan, plan


def test_sliding_dau_hll_accuracy_vs_exact(spark, sf_dir):
    """HLL lgK=14 must land within 2% of the exact 7-day distinct
    count on every window (theoretical rel. err ~0.8%)."""
    exact = {
        r.day: r.dau7 for r in queries()["zx_sliding_dau"](spark, sf_dir).collect()
    }
    est = {
        r.day: r.dau7_est
        for r in queries()["zx_sliding_dau_hll"](spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for day, v in exact.items():
        assert abs(est[day] - v) <= max(1, 0.02 * v), (day, v, est[day])


def test_rolling_median_kernel_batch_split_invariant():
    """Feeding the stateful kernel two chunks must equal one chunk —
    state carries exactly the 20-value frame across batches."""
    import pandas as pd

    from eventstream_notify_spark.streaming.state import rolling_median_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self._v, self.exists = None, False

        def setTimeoutTimestamp(self, ts):
            pass

    vals = [(i, 1_000_000 + i * 1000, (i * 37) % 500) for i in range(100)]
    pdf = pd.DataFrame(vals, columns=["event_id", "ts_us", "v"])

    def run(chunks):
        st = FakeState()
        out = []
        for c in chunks:
            out.extend(
                df for df in rolling_median_fn((7,), iter([c]), st)
            )
        return pd.concat(out, ignore_index=True)

    whole = run([pdf])
    split = run([pdf.iloc[:33], pdf.iloc[33:66], pdf.iloc[66:]])
    pd.testing.assert_frame_equal(whole, split)


def test_join_cardinality_estimate_accuracy(spark, sf_dir):
    """The KMV/theta intersection estimate must land within the
    sketch's statistical error of the exact intersection (~1/sqrt(K)
    = 6% at K=256; 15% is the regression floor), and the sketch
    bookkeeping must be consistent (k_common <= k_used <= K)."""
    from eventstream_notify_spark.operators.analytics import (
        _KMV_K,
        join_cardinality_est,
    )

    r = join_cardinality_est(spark, sf_dir).first()
    assert 0 < r.k_common <= r.k_used <= _KMV_K
    assert r.exact_intersection > 0
    rel = abs(r.est_intersection - r.exact_intersection) / r.exact_intersection
    assert rel < 0.15, (r.est_intersection, r.exact_intersection)
    assert r.est_union >= r.est_intersection


def test_hilbert_beats_morton_locality(spark, sf_dir):
    """The study's claim, pinned: on the shared grid and equal file
    count, Hilbert packing admits no MORE files than Morton on either
    probe dimension (strictly fewer on at least one at real sf)."""
    from eventstream_notify_spark.operators.analytics import (
        hilbert_layout_audit,
    )

    rows = {r.layout: r for r in hilbert_layout_audit(spark, sf_dir).collect()}
    hb, mo = rows["hilbert"], rows["morton"]
    assert hb.n_files == mo.n_files
    assert hb.cust_files_admitted <= mo.cust_files_admitted
    assert hb.day_files_admitted <= mo.day_files_admitted


def test_markov_attribution_constructed_corpus(spark, monkeypatch):
    """Hand-computable journeys: u1 view->click->purchase (converts),
    u2 view->error (no conversion). Removing view or click kills the
    only converting path (removal effect 1.0 each -> share 0.5);
    error carries nothing (0.0). Base CVR = 1/2 journeys."""
    import datetime as dt

    from eventstream_notify_spark.operators import analytics as an

    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    ev = spark.createDataFrame(
        [
            (1, ts(0), 1, "view", 1.0, "{}"),
            (2, ts(1), 1, "click", 1.0, "{}"),
            (3, ts(2), 1, "purchase", 1.0, "{}"),
            (4, ts(0), 2, "view", 1.0, "{}"),
            (5, ts(1), 2, "error", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(an, "table", lambda spark, sf_dir, name: ev)
    got = {
        r.channel: (r.removal_effect, r.attribution_share, r.base_cvr)
        for r in an.attribution_markov(spark, "ignored").collect()
    }
    assert got["view"] == (1.0, 0.5, 0.5)
    assert got["click"] == (1.0, 0.5, 0.5)
    assert got["error"] == (0.0, 0.0, 0.5)


def test_markov_attribution_invariants(spark, sf_dir):
    """On real data: removal effects in [0,1], shares sum to 1, one
    row per non-purchase channel present, base CVR in (0,1)."""
    from eventstream_notify_spark.operators.analytics import (
        attribution_markov,
    )

    rows = attribution_markov(spark, sf_dir).collect()
    assert rows
    shares = sum(r.attribution_share for r in rows)
    assert abs(shares - 1.0) < 1e-6
    for r in rows:
        assert 0.0 <= r.removal_effect <= 1.0
        assert 0.0 < r.base_cvr < 1.0


def test_decision_tree_structure(spark, sf_dir):
    """Tree invariants: 7 nodes, children partition their parent
    (counts and positives add up exactly), internal nodes carry a
    split, leaves don't, rates consistent."""
    from eventstream_notify_spark.operators.analytics import (
        decision_tree_gini,
    )

    nodes = {r.node_id: r for r in decision_tree_gini(spark, sf_dir).collect()}
    assert set(nodes) == set(range(7))
    for nid in (0, 1, 2):
        l, r = nodes.get(2 * nid + 1), nodes.get(2 * nid + 2)
        assert nodes[nid].split_feature is not None
        assert l.n + r.n == nodes[nid].n
        assert l.n_pos + r.n_pos == nodes[nid].n_pos
    for nid in (3, 4, 5, 6):
        assert nodes[nid].split_feature is None
        assert 0.0 <= nodes[nid].rate <= 1.0


def test_adaboost_error_decreases_and_valid(spark, sf_dir):
    """Boosting invariants: every round's weighted error < 0.5 (else
    the stump+polarity search failed), alphas positive, accuracy at
    least the majority-class rate."""
    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.analytics import (
        adaboost_stumps,
    )

    rows = sorted(
        adaboost_stumps(spark, sf_dir).collect(), key=lambda r: r.round
    )
    assert [r.round for r in rows] == [1, 2, 3]
    for r in rows:
        assert 0.0 < r.eps < 0.5
        assert r.alpha > 0
    # 3 stumps need not beat the majority rate (AdaBoost bounds the
    # EXPONENTIAL loss, not small-round accuracy) — but they must be
    # in its neighborhood, far above chance
    ev = table(spark, sf_dir, "events")
    n = ev.count()
    n_pos = ev.filter(F.col("event_type") == "purchase").count()
    majority = max(n_pos, n - n_pos) / n
    assert rows[-1].train_acc >= majority - 0.02
    assert rows[-1].train_acc > 0.5


def test_shapley_attribution_efficiency_and_symmetry(spark, sf_dir):
    """Game-theory invariants on real data: (a) EFFICIENCY — the x6
    credits sum to 6 * (v(full coalition) - v(empty)) = 6 * converted
    sessions with a non-empty pre-purchase touch set; (b) every
    channel's credit is non-negative (v is monotone by construction:
    adding a channel can only admit more subset-contained journeys);
    (c) the rounded share column derives from the integer."""
    from eventstream_notify_spark.operators.analytics import (
        attribution_shapley,
    )

    rows = attribution_shapley(spark, sf_dir).collect()
    assert {r.channel for r in rows} == {"click", "view", "signup"}
    for r in rows:
        assert r.shapley_x6 >= 0
        assert abs(r.shapley_conversions - round(r.shapley_x6 / 6.0, 6)) < 1e-9
    # efficiency: recompute v(N) - v(empty) independently
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.analytics import SESSION_GAP_US

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sess = (
        ev.withColumn("prev", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (F.col("ts_us") - F.col("prev") > SESSION_GAP_US)
            ).cast("int"),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn(
            "fp",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts_us"))
            ).over(Window.partitionBy("user_id", "sess_id")),
        )
    )
    pre = F.col("fp").isNull() | (F.col("ts_us") < F.col("fp"))
    j = sess.groupBy("user_id", "sess_id").agg(
        F.max(F.col("fp").isNotNull().cast("int")).alias("conv"),
        F.max(
            (
                F.col("event_type").isin("click", "view", "signup") & pre
            ).cast("int")
        ).alias("touched"),
    )
    v_full_minus_empty = j.filter(
        (F.col("conv") == 1) & (F.col("touched") == 1)
    ).count()
    assert sum(r.shapley_x6 for r in rows) == 6 * v_full_minus_empty


def test_bt_preference_fit_recovers_dominance_order(spark, monkeypatch):
    """Constructed corpus: over 6 user-days, 'click' out-logs 'view'
    every day and 'view' out-logs 'error' every day (click > view >
    error transitively). The fitted Bradley-Terry strengths must be a
    probability vector ranked click > view > error, and the win
    bookkeeping must match the construction (click 12 wins, error 0)."""
    import datetime as dt

    from eventstream_notify_spark.operators import analytics as an

    t0 = dt.datetime(2024, 5, 1)
    rows, eid = [], 0
    for day in range(6):
        for typ, n in (("click", 5), ("view", 3), ("error", 1)):
            for _ in range(n):
                eid += 1
                rows.append(
                    (eid, t0 + dt.timedelta(days=day, minutes=eid % 500),
                     1, typ, 1.0, "{}")
                )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(an, "table", lambda spark, sf_dir, name: ev)
    got = {
        r.item: r for r in an.bt_preference_fit(spark, "ignored").collect()
    }
    assert set(got) == {"click", "view", "error"}
    assert got["click"].bt_strength > got["view"].bt_strength
    assert got["view"].bt_strength > got["error"].bt_strength
    assert abs(sum(r.bt_strength for r in got.values()) - 1.0) < 1e-5
    assert got["click"].wins == 12 and got["error"].wins == 0
    assert all(r.comparisons == 12 for r in got.values())


def test_vopt_histogram_recovers_piecewise_constant():
    """A series that IS 8 constant segments must yield total SSE 0
    with boundaries exactly at the segment edges — V-optimal's
    defining property (equi-width would smear them)."""
    from eventstream_notify_spark.operators.analytics import vopt_dp

    vals = []
    edges = []
    levels = [5, 50, 9, 80, 13, 120, 7, 200]
    widths = [3, 5, 2, 7, 4, 6, 3, 8]
    d = 0
    for lv, wd in zip(levels, widths):
        vals.extend([lv] * wd)
        edges.append((d, d + wd - 1))
        d += wd
    buckets, total = vopt_dp(vals, 8)
    assert total == 0.0
    got = [(ds, de) for _b, ds, de, _n, _s, _e in buckets]
    assert got == edges
    for _b, ds, de, n_days, sum_count, sse in buckets:
        assert sse == 0.0
        assert n_days == de - ds + 1


def test_bt_preference_fit_empty_comparisons(spark, monkeypatch):
    """A corpus with a single event type yields zero comparisons; the
    fit must return an empty frame (the oracle's comp CTE is empty)
    instead of crashing in the MM fold (ADVICE r9)."""
    import datetime as dt

    from eventstream_notify_spark.operators import analytics as an

    t0 = dt.datetime(2024, 5, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i % 3, minutes=i), 1, "click", 1.0, "{}")
        for i in range(1, 10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(an, "table", lambda spark, sf_dir, name: ev)
    out = an.bt_preference_fit(spark, "ignored")
    assert out.count() == 0
    assert out.columns == ["item", "bt_strength", "wins", "comparisons"]


def test_vopt_dp_clamps_k_to_series_length():
    """Fewer points than buckets must degrade to k = n singleton
    buckets (SSE 0) rather than walking back through an unfilled DP
    row and emitting day_start = -1 (ADVICE r9)."""
    from eventstream_notify_spark.operators.analytics import vopt_dp

    buckets, total = vopt_dp([7, 3, 11], 8)
    assert total == 0.0
    assert [(ds, de) for _b, ds, de, _n, _s, _e in buckets] == [
        (0, 0), (1, 1), (2, 2),
    ]
    assert all(sse == 0.0 for *_x, sse in buckets)
    assert vopt_dp([], 8) == ([], 0.0)


def test_degenerate_corpus_never_crashes(spark, tmp_path):
    """r10 robustness sweep distilled: the six operators that crashed
    on a 1-row-per-table corpus (zero-variance strata, empty train
    folds, zero-cost k-means rounds, single-value histogram domains,
    perfect stumps, codebooks larger than the sample) must degrade
    gracefully — empty or closed-form output, never a divide-by-zero
    or index error. Mirrors each oracle's NULL-on-degenerate arm."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = str(tmp_path / "degen")
    (tmp_path / "degen").mkdir()
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
            f" ORDER BY 1 LIMIT 1) TO '{sf}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    qs = entrymod.queries()
    expect_rows = {
        "zx_adaboost_stumps": 0,   # perfect stump -> stop before r1
        "zx_eval_auc_roc": 1,      # (n_pos, n_neg, NULL auc)
        "zx_kmeans_parallel_init": 1,  # just the seed center
        "zx_profile_histogram": 1,     # single-value domain -> bucket 9
        "zx_sample_neyman": 0,     # zero-variance strata -> no alloc
        "zx_sim_search_ivfpq": 0,  # clamped 1-row codebook, no queries
    }
    for name, want in expect_rows.items():
        got = qs[name](spark, sf).count()
        assert got == want, f"{name}: {got} rows != {want}"
