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
    # str, or a zero-arg callable producing the SQL at request time
    # (lazy — for oracles that must materialize side fixtures first);
    # None → non-SQL-expressible, rows-only check
    oracle: str | Callable[[], str] | None
    note: str = ""


def resolve_oracle(spec: QuerySpec) -> str | None:
    """Resolve a spec's oracle to concrete SQL (invoking lazy builders)."""
    return spec.oracle() if callable(spec.oracle) else spec.oracle


def _build() -> dict[str, QuerySpec]:
    from journal_batch_processer_spark.queries import (
        curation,
        lakehouse,
        llmops,
        media,
        ref_io,
        ref_surface,
        relational,
        streaming_q,
        trainprep,
        warehouse,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (
        ref_surface,
        relational,
        llmops,
        ref_io,
        streaming_q,
        media,
        trainprep,
        warehouse,
        curation,
        lakehouse,
    ):
        for name, (fn, sql) in module.QUERIES.items():
            registry[name] = QuerySpec(fn=fn, oracle=sql)
    # SURVEY §2g names `push_partition` for the PUT routing the engine
    # exposes as rest_push_sink — same operator, both ids answer.
    registry["push_partition"] = registry["rest_push_sink"]

    # Verification-priority order: the driver sweeps the registry
    # serially under a budget (~50 entries/round), so emit the
    # least-trusted queries FIRST. Round 12 (VERDICT r11 item 5):
    # freshness rotation — (a) the full 41-key r06 tier (now the
    # oldest driver rows anywhere), then (b) 9 r07-tier keys chosen
    # for code weight (dedup/join/pipeline/media hot paths) to fill
    # the 50-key budget, so after the r12 sweep nothing older than
    # r07 remains in the merged freshness map.
    priority = [
        # full r06 freshness tier (oldest driver rows)
        "agg_cube",
        "agg_grouping_sets",
        "agg_rollup",
        "agg_salted",
        "code_lookup",
        "code_validate",
        "dedup_exact",
        "dedup_exact_hash",
        "dedup_semantic",
        "dependent_columns",
        "dim_join_broadcast",
        "distinct_count",
        "embed_kmeans",
        "embed_quantize",
        "enrich_fetch",
        "ensure_columns",
        "error_route",
        "field_merge",
        "fill_blank_default",
        "flag_i_barcode",
        "flag_missing_barcode",
        "group_agg",
        "join_anti",
        "join_colocated",
        "join_range",
        "join_semi",
        "month_normalize",
        "natural_sort",
        "notes_append",
        "numeric_guard",
        "overwrite_constant",
        "project_columns",
        "python_udtf",
        "rest_fetch_source",
        "rest_push_sink",
        "row_count",
        "sample_temperature",
        "scalar_functions",
        "strip_guard_quote",
        "year_impute",
        "year_impute_window",
        # r07 overflow (heaviest code paths of that tier first)
        "dedup_minhash",
        "dedup_ngram",
        "pipeline_chain",
        "join_asof",
        "sim_search_ivfpq",
        "media_audio_decode",
        "window_rank",
        "xml_parse",
        "csv_scan",
        # further r07 overflow if the budget runs past 50
        "dedup_near",
        "join_asof_nearest",
        "window_running",
        "agg_pivot",
        # r07+ tiers follow in registry order after this list
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
