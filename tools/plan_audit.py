"""Plan auditor — print the Catalyst physical plan for registered
queries, with the scale red-flags highlighted.

Usage:
    python tools/plan_audit.py [sf_dir] [query ...]   # default: headline set

For each query: the formatted plan plus a one-line audit — cartesian
products, row-at-a-time Python evals, missing pushed filters, and
exchange counts. This is the round-loop tool behind "explain, then
iterate until it's the plan you'd want".
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADLINE = [
    "pipeline_e2e",
    "dedup_near",
    "sim_search_cosine",
    "zx_dedup_minhash",
    "zx_tpch_q3_shipping_priority",
]


def audit(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("!! CartesianProduct (unbounded pair blowup)")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append(
            "BNLJ: fine iff the broadcast side is bounded (query sets, "
            "rule tables, 1-row aggregates, salt ranges); fatal if data-sized"
        )
    if "BatchEvalPython" in plan:
        flags.append("!! row-at-a-time Python UDF (use Arrow/pandas)")
    n_ex = len(re.findall(r"\bExchange\b", plan))
    flags.append(f"exchanges={n_ex}")
    n_bc = len(re.findall(r"BroadcastExchange", plan))
    if n_bc:
        flags.append(f"broadcasts={n_bc}")
    if "PushedFilters: []" in plan and "Scan parquet" in plan:
        flags.append("note: a scan has no pushed filters")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    if m:
        flags.append(f"codegen_subtrees={m.group(1)}")
    return flags


def main() -> None:
    from eventstream_notify_spark.plans.explain import (
        plan_str,
        unpartitioned_windows,
    )
    from eventstream_notify_spark.registry import lookup, queries
    from eventstream_notify_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a] or HEADLINE
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = queries()
    for name in names:
        fn = all_q.get(name) or lookup(name).fn
        df = fn(spark, sf_dir)
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(plan_str(df, "formatted"))
        combined = plan_str(df, "simple") + plan_str(df, "codegen")
        flags = audit(combined)
        # same detector the test gate uses (tree walk, not strings)
        for w in unpartitioned_windows(df):
            flags.insert(0, f"!! unpartitioned window: {w[:90]}")
        print("AUDIT:", "; ".join(flags))


if __name__ == "__main__":
    main()
