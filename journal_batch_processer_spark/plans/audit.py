"""Physical-plan introspection: the engine's scale-review primitives.

``plan_stats`` extracts the numbers a 100 TB review cares about —
shuffle count, join strategies, scan pruning — from a DataFrame's
formatted plan; ``audit_plan`` turns them into red flags. Used by
tools/explain_audit.py and available to tests to pin plan shapes
(e.g. "this join must stay broadcast").
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanStats:
    shuffles: int
    sort_merge_joins: int
    broadcast_hash_joins: int
    nested_loop_joins: int
    cartesian: int
    scans: int
    pushed_filters: bool
    plan: str = field(repr=False, default="")


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(df: DataFrame) -> PlanStats:
    plan = formatted_plan(df)
    return PlanStats(
        shuffles=plan.count("Exchange ("),
        sort_merge_joins=plan.count("SortMergeJoin"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian=plan.count("CartesianProduct"),
        scans=plan.count("Scan parquet"),
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        plan=plan,
    )


def audit_plan(df: DataFrame, allow_nested_loop: bool = False) -> list[str]:
    """Scale smells as human-readable flags (empty list = clean)."""
    s = plan_stats(df)
    flags = []
    if s.cartesian:
        flags.append("CartesianProduct present — unbounded pair blow-up at scale")
    if s.nested_loop_joins and not allow_nested_loop:
        flags.append(
            "BroadcastNestedLoopJoin present — fine only for tiny broadcast sides"
        )
    return flags
