"""Physical-plan introspection and assertions.

The 100 TB posture isn't a comment — it's checkable: filters must
reach the parquet scan (PushedFilters), projections must prune the
read schema (ReadSchema), dimension joins must be broadcast, top-k
must be TakeOrdered, range joins must broadcast their small side
(never CartesianProduct). These helpers turn `.explain("formatted")`
into assertions so plan regressions fail tests instead of shipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def assert_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_str(df, mode)
    for needle in needles:
        assert needle in plan, f"plan lacks {needle!r}:\n{plan}"
    return plan


def assert_not_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_str(df, mode)
    for needle in needles:
        assert needle not in plan, f"plan contains {needle!r}:\n{plan}"
    return plan


def assert_pushed_filter(df: DataFrame, column: str) -> str:
    """A predicate on ``column`` reached the parquet scan."""
    plan = plan_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    assert any(column in ln for ln in pushed), (
        f"filter on {column!r} not pushed: {pushed}\n{plan}"
    )
    return plan


def assert_read_schema_only(df: DataFrame, table_marker: str, allowed: set[str]) -> str:
    """The scan whose ReadSchema line mentions ``table_marker`` reads
    no columns beyond ``allowed`` (column pruning happened)."""
    plan = plan_str(df)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Location" in ln and table_marker in ln:
            schema_lines = [x for x in lines[i - 3 : i + 4] if "ReadSchema" in x]
            for sl in schema_lines:
                cols = {
                    c.split(":")[0].strip()
                    for c in sl.split("struct<", 1)[-1].rstrip(">").split(",")
                    if c.strip()
                }
                extra = cols - allowed
                assert not extra, f"scan reads unpruned columns {extra}:\n{sl}"
            return plan
    raise AssertionError(f"no scan for {table_marker!r} found:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> str:
    return assert_contains(df, "BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> str:
    return assert_not_contains(df, "CartesianProduct")


def assert_take_ordered(df: DataFrame) -> str:
    """Global order+limit compiled to TakeOrdered (per-partition top-k
    + driver merge), not a full sort."""
    return assert_contains(df, "TakeOrderedAndProject")


def assert_whole_stage_codegen(df: DataFrame) -> str:
    """In simple mode codegen'd operators are starred: ``*(n) Project``."""
    return assert_contains(df, "*(", mode="simple")


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Logical ``Window`` nodes with an EMPTY partition spec — the
    plan shape that funnels its whole input through one task ("Moving
    all data to a single partition"). Walks the optimized logical
    plan tree and checks each Window node's partitionSpec directly
    (string parsing can't distinguish unpartitioned-with-order from
    partitioned-without-order). Bounded-input exceptions (bucket
    offset tables, day grids) are the CALLER's allowlist to grant."""
    bad = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            bad.append(node.simpleString(120))
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return bad


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan (broadcast
    exchanges excluded — those move dims, not facts). The per-query
    shuffle budget: every Exchange is a full materialize-and-
    redistribute of its input, the unit of cost that dominates at
    100 TB."""
    import re

    plan = plan_str(df, mode="simple")
    # whole-node match: a bare "Exchange <partitioning>" node only.
    # BroadcastExchange (moves dims, not facts) and ReusedExchange
    # (re-reads an exchange already counted — including reuses of a
    # broadcast) both carry letters before "Exchange" and are excluded.
    return len(re.findall(r"(?<![A-Za-z])Exchange\b", plan))
