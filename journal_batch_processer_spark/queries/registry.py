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
    ):
        for name, (fn, sql) in module.QUERIES.items():
            registry[name] = QuerySpec(fn=fn, oracle=sql)
    # SURVEY §2g names `push_partition` for the PUT routing the engine
    # exposes as rest_push_sink — same operator, both ids answer.
    registry["push_partition"] = registry["rest_push_sink"]

    # Verification-priority order: the driver sweeps the registry
    # serially under a budget (~50 entries/round), so emit the
    # least-trusted queries FIRST. Round 7: the 40-key pre-regen debt
    # was fully discharged in r06 (CORRECTNESS_r06 = 50/50 green), so
    # the head is (a) the six NEW r07 keys, (b) keys whose behavior or
    # fixtures CHANGED in r07 (the JPEG media mix gained 12-bit +
    # arithmetic + progressive-restart files; every dedup operator now
    # routes persists through the cache scope — plans unchanged,
    # re-swept as insurance), then (c) a rotation of the keys with the
    # OLDEST driver rows (r03 tier first, then the r04 tier) so rows
    # keep cycling fresh across rounds.
    priority = [
        # NEW in r07
        "dedup_containment_prefix",  # asymmetric prefix containment
        "text_bm25",                 # Okapi BM25 retrieval scoring
        "embed_gramian",             # distributed int8 gramian
        "embed_pca_power",           # integer power iteration
        "graph_labelprop",           # deterministic LPA communities
        "sim_search_ivfpq",          # IVF cells + PQ-ADC + re-rank
        "avro_scan",                 # pure-Python Avro DataSource
        "avro_sink",
        "media_video_decode",       # MJPEG-in-AVI container decode
        "join_asof_nearest",        # nearest-in-time as-of (r07)
        "multimodal_manifest",      # capstone all-modality manifest
        "python_stream_sink",       # DataSourceStreamWriter (avro_py)
        "anonymize_l",              # l-diversity privacy gate (r07)
        "retention_cohorts",        # cohort retention matrix (r07)
        # fixtures changed in r07 (12-bit SOF1 + arithmetic SOF9 +
        # progressive-with-restart JPEGs in the media mix)
        "media_image_decode_jpeg",
        "media_frames_decode",  # GIF LZW table freeze (ADVICE r06)
        "media_image_decode_png",  # palette/Adam7 fixture mix (r07)
        "media_audio_decode",      # PCM8/24/stereo fixture mix (r07)
        # cache-scope change touched every dedup/persist path
        "dedup_ngram",
        "dedup_ngram_prefix",
        "dedup_ngram_capped",
        "dedup_containment",
        "dedup_minhash",
        "dedup_near",
        "dedup_incremental",
        # oldest driver rows (r03 tier) — rotation
        "csv_scan",
        "csv_sink",
        "xml_serialize",
        "xml_parse",
        "pipeline_update",
        "push_partition",
        "pipeline_chain",
        "pipeline_chain_strict",
        "runtime_metric",
        # r04 tier rotation (window + streaming + scalar families)
        "window_rank",
        "window_lead_lag",
        "window_running",
        "window_range_frame",
        "window_ntile",
        "window_tumble",
        "window_slide",
        "agg_pivot",
        "agg_unpivot",
        "approx_distinct",
        "approx_quantile",
        "agg_salted_skewed",
        "join_asof",
        "join_full",
        "join_skew_hot",
        "stream_tumble",
        "stream_slide",
        "stream_join",
        "stream_dedup",
        "stream_dedup_watermarked",
        "stream_session",
        "dedup_editdist",
        "text_repetition",
        "corpus_pipeline",
        "decontaminate",
        "sample_stratified",
        # r05/r06 tiers follow in registry order after this list
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
