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
    # least-trusted queries FIRST. Round 11 (VERDICT r10 items 1+3):
    # (a) the 5 late-r10 keys that have NEVER had a driver row
    # (judge-verified green in the r10 review, but the hard driver
    # signal is still missing), then (b) the ENTIRE 43-key r05
    # freshness tier — 5+43 = 48 fits the budget, so after the r11
    # sweep nothing older than r06 remains — then (c) the oldest
    # r06-tier keys as overflow in case the budget runs past 48.
    priority = [
        # never driver-checked (landed after the r10 sweep sealed)
        "text_winnowing",        # MOSS winnowing fingerprint selection
        "text_winnowing_pairs",  # shared-fingerprint near-dup candidates
        "text_langid_ngram",     # Cavnar-Trenkle rank-order language ID
        "media_video_fingerprint",  # per-frame dHash via AVI+lossless JPEG
        "media_video_pairs",     # video near-dup by summed frame Hamming
        # full r05 freshness tier (retires the oldest driver rows)
        "corpus_mix",
        "sample_reservoir",
        "join_bloom",
        "stream_stats",
        "outlier_mad",
        "compact_plan",
        "join_interval",
        "stream_enrich",
        "tokenizer_train",
        "tokenizer_encode",
        "stream_session_native",
        "schema_evolution",
        "anonymize_k",
        "variant_extract",
        "lateral_join",
        "python_datasource",
        "curriculum_order",
        "python_stream_source",
        "xml_native",
        "dq_checks",
        "kmeans_distributed",
        "stream_stream_join",
        "python_datasink",
        "observe_metrics",
        "arrow_map",
        "pandas_api",
        "layout_zorder",
        "sim_search_pq",
        "stream_upsert",
        "orc_roundtrip",
        "partitioned_prune",
        "upsert_merge",
        "scd2_dim",
        "chunk_sliding",
        "seq_pack",
        "tfidf_topk",
        "text_bigrams",
        "graph_pagerank",
        "funnel_events",
        "dedup_chunks",
        "jsonl_scan_gz",
        "text_entropy",
        "dedup_url",
        # r06 overflow (oldest reference-surface keys)
        "desc_extract",
        "nomatch_count",
        "row_count",
        "project_columns",
        "numeric_guard",
        "strip_guard_quote",
        "ensure_columns",
        "dependent_columns",
        "fill_blank_default",
        "overwrite_constant",
        "code_lookup",
        "code_validate",
        # r06+ tiers follow in registry order after this list
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
