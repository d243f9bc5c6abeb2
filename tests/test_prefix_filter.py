"""Exactness of the prefix-filtered Jaccard join (dedup_near): the
candidate pruning must introduce NO false negatives vs the naive
all-pairs computation."""

from __future__ import annotations

import duckdb

from eventstream_notify_spark.operators.text import JACCARD_T, TOKEN_RE, dedup_near

NAIVE_SQL = f"""
WITH tok AS (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
    FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY doc_id),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
    FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE common * 1.0 / (sa.sz + sb.sz - common) >= {JACCARD_T}
"""


def _naive(sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return {
        (int(a), int(b), float(j)) for a, b, j in con.sql(NAIVE_SQL).fetchall()
    }


def test_adaptive_join_matches_naive_all_pairs(spark, sf_dir):
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_near(spark, sf_dir).collect()
    }
    want = _naive(sf_dir)
    assert got == want
    assert len(want) > 0  # the corpus genuinely contains near-dups


def test_both_strategies_exact(spark, sf_dir):
    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.text import (
        _token_sets,
        jaccard_pairs_deletion,
        jaccard_pairs_prefix,
    )

    docsets = _token_sets(table(spark, sf_dir, "documents")).cache()
    want = _naive(sf_dir)
    for strategy in (jaccard_pairs_deletion, jaccard_pairs_prefix):
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in strategy(docsets).collect()
        }
        assert got == want, strategy.__name__


def test_profiling_is_one_action(spark, sf_dir):
    """Every build stage of the class-pair kernel runs in ONE pass (at
    100 TB, an extra pass over the token index is real money). Exactly
    four SQL executions are recorded at plan-build time:
    1. the lazy localCheckpoint registration of the token sets
       (0 jobs — the frame is shuffle-free, nothing to materialize);
    2. the fused profiling aggregate (max set size + vocabulary in one
       job), which also materializes the token-set checkpoint;
    3. the class-window checkpoint (the ONE set-keyed shuffle that
       assigns class rep + size — AQE materializes its stages when the
       checkpoint RDD is built);
    4. the class-level candidate-pair checkpoint (the deletion/prefix
       join over one row per distinct set).
    A fifth execution would mean the token-set pipeline, the profile,
    the class window or the candidate join runs twice."""
    store = spark._jsparkSession.sharedState().statusStore()
    # Two traps in counting SQL executions mid-suite:
    # - the status store is fed by the ASYNC listener bus — drain it
    #   on both sides of the measurement;
    # - executionsCount() counts RETAINED executions, and the UI store
    #   evicts past spark.sql.ui.retainedExecutions (1000) — deep into
    #   a full suite the count plateaus and the delta reads 0. The
    #   LATEST execution id is monotonic and eviction-proof; diff that.
    bus = spark.sparkContext._jsc.sc().listenerBus()

    def last_exec_id() -> int:
        bus.waitUntilEmpty()
        lst = store.executionsList()
        return lst.last().executionId() if lst.size() else -1

    before = last_exec_id()
    dedup_near(spark, sf_dir)  # builds the plan => runs profiling only
    ran = last_exec_id() - before
    assert ran == 4, f"kernel build ran {ran} SQL executions, want 4"


def test_containment_budget_preserves_coverage(spark, sf_dir):
    """The witness budget (first-B supers per sub_doc) must lose no
    SUBSUMED DOC — every sub_doc with >=1 qualifying super in the
    unbudgeted truth still appears, with exactly its first
    min(B, n_supers) witnesses by super id."""
    from collections import defaultdict

    from eventstream_notify_spark.operators.text import (
        CONTAIN_WITNESS_BUDGET,
    )
    from eventstream_notify_spark.registry import queries

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    truth = defaultdict(list)  # sub_doc -> sorted qualifying supers
    for sub, sup in con.sql(
        f"""
        WITH tok AS (
            SELECT doc_id,
                   list_distinct(
                       regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
            FROM documents
        ),
        sized AS (SELECT doc_id, toks, len(toks) AS sz FROM tok)
        SELECT a.doc_id AS sub_doc, b.doc_id AS super_doc
        FROM sized a JOIN sized b ON a.doc_id <> b.doc_id
        WHERE len(list_intersect(a.toks, b.toks)) * 1.0 / a.sz >= 0.9
          AND a.sz >= 5
        ORDER BY 1, 2
        """
    ).fetchall():
        truth[int(sub)].append(int(sup))
    got = defaultdict(list)
    for r in (
        queries()["zx_dedup_containment"](spark, sf_dir)
        .orderBy("sub_doc", "super_doc")
        .collect()
    ):
        got[r.sub_doc].append(r.super_doc)
    assert set(got) == set(truth), "budget dropped/invented sub_docs"
    for sub, sups in truth.items():
        assert got[sub] == sups[:CONTAIN_WITNESS_BUDGET], sub
    assert len(truth) > 0


def test_containment_strategies_agree(spark, sf_dir):
    """The bitmask-class containment path and the general inverted-
    index path are the same operator: identical (sub, super,
    containment) triples on the bounded-vocab corpus."""
    from pyspark.sql import functions as F

    from eventstream_notify_spark.catalog import table
    from eventstream_notify_spark.operators.text import (
        _containment_inverted,
        _token_sets,
    )
    from eventstream_notify_spark.registry import queries

    fast = {
        (r.sub_doc, r.super_doc, r.containment)
        for r in queries()["zx_dedup_containment"](spark, sf_dir).collect()
    }
    docsets = _token_sets(table(spark, sf_dir, "documents")).cache()
    try:
        slow = {
            (r.sub_doc, r.super_doc, r.containment)
            for r in _containment_inverted(docsets).collect()
        }
    finally:
        docsets.unpersist()
    assert fast == slow and len(fast) > 0
