"""Central registry: operator id → (Spark callable, DuckDB oracle SQL).

Keys are the stable operator ids from SURVEY.md §2; the driver runs
each Spark query and its oracle side-by-side at sf0.01 and compares
row count + schema + order-insensitive value hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    note: str = ""


def _build() -> dict[str, QuerySpec]:
    from journal_batch_processer_spark.queries import (
        llmops,
        ref_io,
        ref_surface,
        relational,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (ref_surface, relational, llmops, ref_io):
        for name, (fn, sql) in module.QUERIES.items():
            registry[name] = QuerySpec(fn=fn, oracle=sql)
    # SURVEY §2g names `push_partition` for the PUT routing the engine
    # exposes as rest_push_sink — same operator, both ids answer.
    registry["push_partition"] = registry["rest_push_sink"]
    return registry


REGISTRY: dict[str, QuerySpec] = _build()
