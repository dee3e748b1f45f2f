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
    # least-trusted queries FIRST. Round 13 (VERDICT r12 item 5):
    # freshness rotation — (a) the full 39-key r07 tier (now the
    # oldest driver rows anywhere; includes dedup_near, whose verify
    # plan changed this round), then (b) 11 r09-tier keys chosen for
    # code weight (dedup/trainprep/table-format hot paths) to fill
    # the 50-key budget, so after the r13 sweep nothing older than
    # r09 remains in the merged freshness map.
    priority = [
        # full r07 freshness tier (oldest driver rows) — dedup_near
        # first: its verify-leg join strategy changed in r13
        "dedup_near",
        "agg_pivot",
        "agg_salted_skewed",
        "agg_unpivot",
        "anonymize_l",
        "approx_distinct",
        "approx_quantile",
        "avro_scan",
        "avro_sink",
        "csv_sink",
        "dedup_containment",
        "dedup_containment_prefix",
        "dedup_incremental",
        "dedup_ngram_capped",
        "dedup_ngram_prefix",
        "embed_gramian",
        "embed_pca_power",
        "graph_labelprop",
        "join_asof_nearest",
        "join_full",
        "join_skew_hot",
        "media_frames_decode",
        "media_image_decode_png",
        "media_video_decode",
        "multimodal_manifest",
        "pipeline_chain_strict",
        "pipeline_update",
        "push_partition",
        "python_stream_sink",
        "retention_cohorts",
        "stream_tumble",
        "text_bm25",
        "window_lead_lag",
        "window_ntile",
        "window_range_frame",
        "window_running",
        "window_slide",
        "window_tumble",
        "xml_serialize",
        # r09 overflow (heaviest code paths of that tier first)
        "dedup_cluster",
        "dedup_editdist",
        "dedup_embed_lsh",
        "trainprep_pipeline",
        "split_leakage_safe",
        "decontaminate",
        "table_mor_read",
        "quality_classifier",
        "matview_incremental",
        "graph_triangles",
        "dedup_substring",
        # r09+ tiers follow in registry order after this list
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
