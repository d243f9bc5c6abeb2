"""Shuffle budgets: pin the Exchange count of headline queries so a
refactor that silently adds a shuffle (the dominant cost at 100 TB)
fails CI, not the cluster bill.

Budgets are CEILINGS observed from the current (reviewed) plans —
equality isn't required, a plan improvement that removes a shuffle
passes; adding one fails.
"""

import pytest

from eventstream_notify_spark.plans.explain import exchange_count
from eventstream_notify_spark.registry import lookup

SF = "/root/testdata/sf0.001"

# query -> max allowed shuffle Exchanges in its physical plan
BUDGETS = {
    "project_filter": 0,      # pure scan+filter: any shuffle is a bug
    "join_broadcast": 1,      # dims broadcast; only the final agg moves
    "join_shuffle": 3,        # two shuffled sides + agg
    "agg_hash": 1,            # one partial->final agg exchange
    "sort_limit_topk": 0,     # TakeOrdered: no exchange at all
    "replay_last_n": 1,       # latest-per-id compaction agg, then TakeOrdered
    "dedup_exact": 1,         # sha2-key shuffle only
    "sim_search_cosine": 1,   # corpus never shuffles; top-k window
    "agg_user_counts": 1,
    "pipeline_e2e": 3,        # dedup-key shuffle, rate-limit window, admission agg
    "join_bucketed": 1,       # bucket layout: join is exchange-free
    "join_bloom_prune": 3,    # bloom build agg + pruned join sides
    "cep_pattern_match": 1,   # one user_id shuffle builds sequences
    "quantile_exact_grouped": 2,  # fact->counts agg + domain window
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, name):
    df = lookup(name).fn(spark, SF)
    n = exchange_count(df)
    assert n <= BUDGETS[name], (
        f"{name}: {n} shuffle Exchanges > budget {BUDGETS[name]} — "
        "a shuffle crept into this plan"
    )
