"""Plan auditing: programmatic plan-quality metrics for any DataFrame.

The scale contract of this engine (SURVEY §6) is enforced by reading
physical plans — filters reach scans, dims broadcast, aggregates
combine map-side, hot paths stay in codegen. This module turns that
from eyeballing ``explain()`` output into a queryable report, so

- tests assert on structured metrics instead of string-matching plans,
- pipelines can self-check before launching a 1000-executor job
  (``audit(df).warnings`` in a pre-flight step),
- regressions show up as metric diffs, not mysteriously slower runs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    exchanges: int = 0
    broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    partial_aggregates: int = 0
    final_aggregates: int = 0
    python_evals: int = 0
    scans: int = 0
    scans_with_pushed_filters: int = 0
    codegen_spans: int = 0
    reused_exchanges: int = 0
    warnings: list[str] = field(default_factory=list)


_PATTERNS = {
    "exchanges": r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition|Exchange RoundRobinPartitioning",
    "broadcast_exchanges": r"BroadcastExchange",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "sort_merge_joins": r"SortMergeJoin",
    "shuffled_hash_joins": r"ShuffledHashJoin",
    "nested_loop_joins": r"BroadcastNestedLoopJoin",
    "cartesian_products": r"CartesianProduct",
    "partial_aggregates": r"partial_",
    "python_evals": r"ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas|MapInPandas",
    "scans": r"FileScan|BatchScan|Scan ExistingRDD",
    "codegen_spans": r"\*\(\d+\)",
    "reused_exchanges": r"ReusedExchange",
}


def audit(df: DataFrame) -> PlanAudit:
    """Inspect the executed (AQE-initial) physical plan and return
    structured quality metrics plus scale warnings."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = PlanAudit()
    for attr, pat in _PATTERNS.items():
        setattr(a, attr, len(re.findall(pat, plan)))
    a.final_aggregates = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)) - a.partial_aggregates

    # plan toString truncates long field lists ("PushedFilters: [IsNotNull(x), Gre...")
    # so detect "non-empty list starts here" rather than requiring the closing bracket
    a.scans_with_pushed_filters = len(re.findall(r"PushedFilters: \[(?!\])", plan))

    if a.cartesian_products:
        a.warnings.append("CartesianProduct: O(n*m) pair blowup — add an equi-join key")
    if a.nested_loop_joins:
        a.warnings.append("BroadcastNestedLoopJoin: non-equi join — verify the broadcast side is small")
    if a.python_evals:
        a.warnings.append(
            f"{a.python_evals} Python eval node(s): Arrow-batched is tolerable for dense kernels, "
            "but keep them out of per-row hot paths"
        )
    full_scans = a.scans - a.scans_with_pushed_filters
    if full_scans > 0:
        a.warnings.append(
            f"{full_scans} scan(s) without pushed filters: fine for full-table ops, "
            "a red flag under a selective query"
        )
    return a
