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
        streaming_q,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (ref_surface, relational, llmops, ref_io, streaming_q):
        for name, (fn, sql) in module.QUERIES.items():
            registry[name] = QuerySpec(fn=fn, oracle=sql)
    # SURVEY §2g names `push_partition` for the PUT routing the engine
    # exposes as rest_push_sink — same operator, both ids answer.
    registry["push_partition"] = registry["rest_push_sink"]

    # Verification-priority order. The round-1 driver sweep processed
    # the registry serially and stopped after 50 entries, leaving the
    # whole tail (sim-search / text / multimodal / pipeline families)
    # without a driver correctness row. Emit the least-recently-verified
    # queries FIRST so a budget-limited sweep always covers them;
    # queries with fresh green rows from CORRECTNESS_r01 go last.
    priority = [
        # new in r02 — never swept
        "agg_salted_skewed",
        "join_skew_hot",
        "stream_tumble",
        "dedup_incremental",
        "sample_stratified",
        "decontaminate",
        "corpus_pipeline",
        "window_session_ids",
        "window_session_native",
        "stream_dedup",
        "corpus_quantiles",
        "json_roundtrip",
        "jsonl_scan",
        "binary_ingest",
        "cogroup_conversion",
        "dedup_embed_lsh",
        "udtf_paragraphs",
        "pandas_udf_stats",
        # r02: converted from rows-only to full value oracles
        "dedup_minhash",
        "sim_search_ann",
        "sim_search_ivf",
        # no driver row in r01 (registry positions 51-80)
        "dedup_near",
        "dedup_simhash",
        "dedup_embed",
        "dedup_cluster",
        "sim_search",
        "sim_search_ann",
        "sim_search_ivf",
        "text_tokens",
        "text_quality",
        "text_langid",
        "text_fingerprint",
        "text_analysis",
        "text_tokens_bpe",
        "text_pii_scrub",
        "text_repetition",
        "quality_filter",
        "hash_split",
        "sample_stable",
        "corpus_stats",
        "multimodal_cols",
        "multimodal_resize",
        "multimodal_frames",
        "csv_scan",
        "csv_sink",
        "xml_serialize",
        "xml_parse",
        "pipeline_chain",
        "pipeline_update",
        "runtime_metric",
        "push_partition",
        # failed hash_match in r01; fixed this round — re-verify early
        "window_session",
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
