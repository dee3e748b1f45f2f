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
        llmops,
        media,
        ref_io,
        ref_surface,
        relational,
        streaming_q,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (ref_surface, relational, llmops, ref_io, streaming_q, media):
        for name, (fn, sql) in module.QUERIES.items():
            registry[name] = QuerySpec(fn=fn, oracle=sql)
    # SURVEY §2g names `push_partition` for the PUT routing the engine
    # exposes as rest_push_sink — same operator, both ids answer.
    registry["push_partition"] = registry["rest_push_sink"]

    # Verification-priority order: the driver sweeps the registry
    # serially under a budget (50 entries in r01/r03), so emit the
    # least-trusted queries FIRST. For round 4 that is (a) everything
    # fixed this round (NTZ normalization, HUGEINT oracle casts,
    # cogroup guard, bounded approx_distinct) and (b) every
    # events.ts consumer whose green row predates the fixture
    # regeneration to µs-NTZ; fresh r03 greens go last.
    priority = [
        # fixed in r04 — crashed or hash-failed in r03
        "window_session",
        "window_session_ids",
        "stream_tumble",
        "csv_sink",
        "jsonl_scan",
        "pandas_udf_stats",
        "text_repetition",
        "corpus_stats",
        "cogroup_conversion",
        "approx_distinct",
        "binary_ingest",
        # new in r04 — real media decode (PPM/WAV) and the stateful
        # sessionizer under a full oracle; never swept
        "media_image_decode",
        "media_audio_decode",
        "stream_session",
        "window_slide",
        "stream_slide",
        "agg_pivot",
        "approx_quantile",
        "agg_unpivot",
        "set_ops",
        "string_agg",
        "array_functions",
        "dedup_editdist",
        "outlier_zscore",
        "stream_join",
        "stream_dedup_watermarked",
        "time_gap_fill",
        "window_ntile",
        "join_full",
        "map_functions",
        # events.ts consumers last swept before the µs-NTZ fixture regen
        "window_lead_lag",
        "window_running",
        "window_tumble",
        "window_range_frame",
        "window_rank",
        "window_session_native",
        "join_asof",
        "json_extract",
        # r02/r03 families — keep a driver row current
        "agg_salted_skewed",
        "join_skew_hot",
        "dedup_incremental",
        "sample_stratified",
        "decontaminate",
        "corpus_pipeline",
        "stream_dedup",
        "corpus_quantiles",
        "json_roundtrip",
        "dedup_embed_lsh",
        "udtf_paragraphs",
        "dedup_minhash",
        "sim_search_ann",
        "sim_search_ivf",
        "dedup_near",
        "dedup_simhash",
        "dedup_embed",
        "dedup_cluster",
        "sim_search",
        "text_tokens",
        "text_quality",
        "text_langid",
        "text_fingerprint",
        "text_analysis",
        "text_tokens_bpe",
        "text_pii_scrub",
        "quality_filter",
        "hash_split",
        "sample_stable",
        "multimodal_cols",
        "multimodal_resize",
        "multimodal_frames",
        "csv_scan",
        "xml_serialize",
        "xml_parse",
        "pipeline_chain",
        "pipeline_update",
        "runtime_metric",
        "push_partition",
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
