"""Physical-plan introspection: assert your plan is the plan you want.

The scale rules this engine lives by — filters reach the scan,
projections prune columns, small dims broadcast, expressions stay in
whole-stage codegen, shuffles are counted — are all visible in the
executed plan string. ``plan_report`` extracts them as data so tests
and review tooling can assert on plan *shape*, not just results
(used by ``tests/test_plans.py`` to lock in the §2.8 queries' plans).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    join_strategies: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    has_codegen: bool = False
    top_k: bool = False

    def scans_only(self, *cols_per_scan: set[str]) -> bool:
        """True if each scan's ReadSchema is a subset of the given
        column sets (column pruning held)."""
        if len(cols_per_scan) != len(self.read_schemas):
            return False
        for schema, allowed in zip(self.read_schemas, cols_per_scan):
            got = set(re.findall(r"(\w+):", schema))
            if not got <= allowed:
                return False
        return True


_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def plan_report(df: DataFrame, execute: bool = True) -> PlanReport:
    """Extract plan facts. ``execute=True`` (default) runs the query
    first so AQE finalizes the plan — codegen spans, chosen join
    strategies, and coalesced exchanges only appear in the final
    plan."""
    if execute:
        # collect() executes THIS DataFrame's queryExecution, so AQE
        # finalizes it in place (count() would plan a different query
        # and leave this one isFinalPlan=false)
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanReport(
        pushed_filters=[
            m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if m
        ],
        partition_filters=[
            m
            for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if m
        ],
        # plan strings truncate long lines — capture to '>' or line end
        read_schemas=re.findall(r"ReadSchema: struct<([^>\n]*)", plan),
        join_strategies=_JOIN_RE.findall(plan),
        # adaptive plans print each Exchange in both the initial and
        # final subtree (with fresh plan_ids) — dedupe by the
        # partitioning expression, which is stable across subtrees
        n_exchanges=len(
            set(re.findall(r"Exchange (\w+partitioning\([^)]*\))", plan))
            or re.findall(r"\bExchange\b", plan)
        ),
        # codegen stages render as "*(n) Operator" in plan strings
        has_codegen=bool(re.search(r"\*\(\d+\)", plan)),
        top_k="TakeOrderedAndProject" in plan,
    )
