"""Physical-plan inspection — make plan quality assertable.

The reference has no optimizer (SURVEY.md §4.1), so "the plan is
right" is a property this engine *inherits from Catalyst and must
not break*: a refactor that silently turns a pushed filter into a
post-scan filter, or a broadcast join into a shuffled one, is a
perf regression tests should catch. This module extracts the facts
that matter from an executed plan string so tests/test_plans.py can
pin them per query:

- which scans have pushed filters / pruned schemas,
- which join strategies were chosen,
- whether aggregates have a map-side partial phase,
- how many shuffle exchanges the plan contains.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Executed (pre-AQE-finalization) physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanFacts:
    text: str
    n_exchanges: int
    n_broadcast_exchanges: int
    n_roundrobin_exchanges: int
    join_strategies: tuple[str, ...]
    has_pushed_filters: bool
    has_partial_aggregate: bool
    scans_read_schemas: tuple[str, ...]

    def shuffle_exchanges(self) -> int:
        return self.n_exchanges - self.n_broadcast_exchanges

    def data_shuffle_exchanges(self) -> int:
        """Shuffles minus round-robin spreads: the r17 ``spread_table``
        helper inserts a RoundRobinPartitioning exchange ONLY when the
        input file undercuts the cluster's parallelism (absent at
        production scale), so plan gates pin the KEY-PARTITIONED
        shuffle count — the scale-bearing property — separately."""
        return self.shuffle_exchanges() - self.n_roundrobin_exchanges


_JOIN_RE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b"
)


def inspect_plan(df: DataFrame) -> PlanFacts:
    text = plan_string(df)
    return PlanFacts(
        text=text,
        n_exchanges=len(re.findall(r"\bExchange\b|\bBroadcastExchange\b", text)),
        n_broadcast_exchanges=len(re.findall(r"\bBroadcastExchange\b", text)),
        n_roundrobin_exchanges=len(
            re.findall(r"Exchange RoundRobinPartitioning", text)
        ),
        join_strategies=tuple(_JOIN_RE.findall(text)),
        has_pushed_filters=bool(
            re.search(r"PushedFilters: \[(?!\])", text)
        ),
        has_partial_aggregate=bool(
            re.search(r"HashAggregate\(keys=.*functions=\[partial_", text)
            or "partial_" in text
        ),
        scans_read_schemas=tuple(
            m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)
        ),
    )
