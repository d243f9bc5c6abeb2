"""Registry/driver-contract invariants — guards for the round-1
finding that extras displaced SURVEY §2 contract rows out of the
driver's 50-entry correctness window."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.contract

from eventstream_notify_spark.registry import EXTRA_PREFIX, lookup, queries

# The 49 SURVEY §2 contract query names, verbatim (§2.A-§2.F).
CONTRACT = {
    "scan_events", "sink_keyed_upsert", "sink_pubsub", "scan_kv_all",
    "replay_last_n", "multi_topic_fanout",
    "dedup_ttl", "rate_limit_user", "filter_valid", "pipeline_e2e",
    "event_generator",
    "agg_total_count", "agg_user_counts", "agg_distinct_users",
    "agg_rate_per_min",
    "project_filter", "join_broadcast", "join_shuffle", "join_semi_anti",
    "join_outer", "join_range", "agg_hash", "agg_distinct",
    "agg_rollup_cube", "window_rank", "window_analytic", "sort_limit_topk",
    "set_ops", "scalar_string", "scalar_datetime", "scalar_math",
    "scalar_json", "scalar_array_map", "subquery_scalar_in", "udf_surface",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_late_data", "stream_foreach_sink",
    "dedup_exact", "dedup_near", "sim_search_cosine", "text_tokenize_tf",
    "text_lang_stats", "text_sentiment_lex", "multimodal_cols",
    "ts_similarity", "alert_rules",
}


def test_every_contract_name_registered_bare():
    names = set(queries())
    missing = CONTRACT - names
    assert not missing, f"contract queries missing/renamed: {missing}"


def test_contract_fills_the_driver_window():
    """The driver verifies the first 50 names in sorted order; every
    non-contract query must sort AFTER all 49 contract names."""
    names = sorted(queries())
    window = names[:50]
    displaced = CONTRACT - set(window)
    assert not displaced, f"contract rows outside the window: {displaced}"
    stray = [n for n in window[: len(CONTRACT)] if n not in CONTRACT]
    assert not stray, f"non-contract names inside contract slots: {stray}"
    extras = [n for n in names if n not in CONTRACT]
    bad = [n for n in extras if not n.startswith(EXTRA_PREFIX)]
    assert not bad, f"extras lacking the sort-late prefix: {bad}"


def test_lookup_is_prefix_agnostic():
    assert lookup("agg_pivot").name == "zx_agg_pivot"
    assert lookup("pipeline_e2e").name == "pipeline_e2e"


def test_coverage_md_matches_registry():
    """COVERAGE.md is generated from the registry; a query added
    without regenerating it (the r8 drift: zx_compaction_plan landed
    after the regen) must fail loudly. Names and verification modes
    are pinned; implementation line numbers are allowed to drift
    between regens (they carry no coverage information)."""
    import re
    from pathlib import Path

    from eventstream_notify_spark.registry import registered

    text = Path(__file__).resolve().parent.parent.joinpath(
        "COVERAGE.md"
    ).read_text()
    rows = re.findall(
        r"^\| `(\S+)` \| (contract|extra) \| `[^`]+` \| (oracle|rows-only) \|",
        text,
        re.M,
    )
    committed = {name: mode for name, _, mode in rows}
    live = {
        name: ("oracle" if reg.oracle else "rows-only")
        for name, reg in registered().items()
    }
    assert committed == live, (
        "COVERAGE.md is stale — regenerate: "
        "python tools/coverage_map.py > COVERAGE.md; "
        f"missing={set(live) - set(committed)} "
        f"extra={set(committed) - set(live)} "
        f"mode_flips={[n for n in set(live) & set(committed) if live[n] != committed[n]]}"
    )


def test_demoted_bench_set_is_consistent():
    """bench.py's reduced-cadence set (VERDICT r10 #7): every demoted
    query must still be REGISTERED (it stays oracle-checked and
    --full-benchable), its declared production sibling must be
    registered and must NOT itself be demoted, and no SURVEY §2
    contract query may ever be demoted."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import DEMOTED

    reg = queries()
    for loser, (winner, why) in DEMOTED.items():
        assert loser in reg, f"demoted {loser} not registered"
        assert winner in reg, f"{loser}'s production sibling {winner} missing"
        assert winner not in DEMOTED, f"{winner} is both production and demoted"
        assert loser.startswith(EXTRA_PREFIX), (
            f"{loser}: contract queries must never be demoted"
        )
        assert why  # a demotion carries its rationale


def test_bench_query_hang_guard():
    """bench.py's per-query timeout (the AQE final-plan-update hang
    defense): a wedged call records TimeoutError instead of stalling
    the suite; fast calls pass values and exceptions through."""
    import time

    import pytest as _pytest

    from bench import _exec_with_timeout

    assert _exec_with_timeout(lambda: 42, timeout_s=5.0) == 42
    with _pytest.raises(ValueError):
        _exec_with_timeout(lambda: (_ for _ in ()).throw(ValueError("x")),
                           timeout_s=5.0)
    t0 = time.time()
    with _pytest.raises(TimeoutError):
        _exec_with_timeout(lambda: time.sleep(30), timeout_s=0.5)
    assert time.time() - t0 < 5.0
