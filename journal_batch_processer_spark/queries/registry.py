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
    # least-trusted queries FIRST. Round 8: (a) the NEW r08 lakehouse
    # keys, then (b) the 49 keys whose freshest driver row is still
    # r03/r04 tier (computed from the union of CORRECTNESS_r01–r07) —
    # together they fill the ~50-key budget exactly, discharging the
    # stale tier in one round (VERDICT r07 item 2).
    priority = [
        # NEW in r08 session 4 — write-audit-publish, incremental
        # dedup-index maintenance
        "table_wap_read",        # staged commits, audit view, publish/abort
        "dedup_index_incremental",  # CDF-maintained LSH band index + probe
        "table_stats_read",      # metadata-only COUNT/MIN/MAX answering
        # NEW in r08 session 3 — merge-on-read equality deletes,
        # h-index coreness
        "table_mor_read",        # stacked MOR deletes + re-insert rule
        "table_mor_apply",       # rewrite-deletes content identity
        "graph_kcore",           # coreness via h-index iteration
        "table_partition_read",  # hidden bucket partitioning + evolution
        "matview_join_incremental",  # delta-join view maintenance
        # NEW in r08 session 2 — never driver-checked yet, front of
        # the queue (supervised curation pair, shallow clone,
        # streaming MERGE), plus the media key whose fixture mix
        # changed (hierarchical slots now cycle SOF5/13/7/14)
        "quality_classifier",
        "dsir_select",
        "table_clone_read",
        "stream_table_merge",
        "text_watermark",
        "sim_recall_eval",
        "graph_triangles",
        "table_history_read",
        "media_image_decode_jpeg",
        # NEW in r08 — snapshot table format (operators/table_format.py)
        "table_snapshot_read",   # time travel v1..v6, both resolvers
        "table_merge_commit",    # copy-on-write MERGE, carried files
        "table_evolution_read",  # additive schema evolution on read
        "table_compact_read",    # compaction snapshot contract
        "table_prune_read",      # min/max stats data skipping
        "table_delete_commit",   # COW range delete + vacuum retention
        "stream_table_append",   # exactly-once streaming table ingest
        "table_cdc_read",        # change-data-feed between snapshots
        "table_restore_read",    # RESTORE as a new history-keeping commit
        "table_zorder_read",     # OPTIMIZE ZORDER maintenance commit
        "table_stream_read",     # the table as a streaming source
        "matview_incremental",   # CDC-applied materialized view
        "text_ngramlm",          # NEW r08: corpus bigram-LM scoring
        "dedup_substring",       # NEW r08: Lee-et-al substring spans
        "split_leakage_safe",    # NEW r08: near-dup-closed split
        "heavy_hitters",         # NEW r08: count-min top-k
        "trainprep_pipeline",    # NEW r08: shard-manifest capstone
        "table_cdf_read",        # NEW r08: write-time change feed
        "stream_table_cdc",      # NEW r08: streaming CDF consumption
        "stream_matview",        # NEW r08: streaming incremental view
        # stalest driver rows (freshest row <= r04), alphabetical
        "array_functions",
        "binary_ingest",
        "cogroup_conversion",
        "corpus_pipeline",
        "corpus_quantiles",
        "corpus_stats",
        "decontaminate",
        "dedup_cluster",
        "dedup_editdist",
        "dedup_embed",
        "dedup_embed_lsh",
        "dedup_simhash",
        "hash_split",
        "json_extract",
        "json_roundtrip",
        "jsonl_scan",
        "map_functions",
        "media_image_decode",
        "multimodal_cols",
        "multimodal_frames",
        "multimodal_resize",
        "outlier_zscore",
        "pandas_udf_stats",
        "quality_filter",
        "sample_stable",
        "sample_stratified",
        "set_ops",
        "sim_search",
        "sim_search_ann",
        "sim_search_ivf",
        "stream_dedup",
        "stream_dedup_watermarked",
        "stream_join",
        "stream_session",
        "stream_slide",
        "string_agg",
        "text_analysis",
        "text_fingerprint",
        "text_langid",
        "text_pii_scrub",
        "text_quality",
        "text_repetition",
        "text_tokens",
        "text_tokens_bpe",
        "time_gap_fill",
        "udtf_paragraphs",
        "window_session",
        "window_session_ids",
        "window_session_native",
        # r05+ tiers follow in registry order after this list
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
