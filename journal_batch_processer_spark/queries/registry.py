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
    # least-trusted queries FIRST. For round 6 (VERDICT r05 next-round
    # #1): (a) embed_quantize — output shape changed this round AND its
    # r05 driver row was an err, so it goes first for its first-ever
    # green row; (b) the 40 keys whose most recent driver row predates
    # the r03 testdata regeneration (r01^/r02^ in the VERDICT coverage
    # table) — they come BEFORE any r6 additions so the post-regen
    # verification debt is finally discharged; (c) keys changed or new
    # in r6 (pipeline oracles re-modeled, JPEG decoder gained 4:2:0,
    # the GIF frames key); everything driver-green in r03-r05 goes
    # last. 1 + 40 + 4 ≈ 45 fits the ~50-key budget with margin.
    priority = [
        # changed in r06 + r05 driver err — first green row needed
        "embed_quantize",
        # last driver row r01 — reference surface
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
        "dim_join_broadcast",
        "enrich_fetch",
        "rest_fetch_source",
        "field_merge",
        "error_route",
        "flag_missing_barcode",
        "flag_i_barcode",
        "notes_append",
        "month_normalize",
        "natural_sort",
        "year_impute",
        "year_impute_window",
        # last driver row r01 — relational families
        "group_agg",
        "agg_rollup",
        "agg_cube",
        "distinct_count",
        "join_semi",
        "join_anti",
        "join_range",
        "join_colocated",
        "agg_salted",
        "agg_grouping_sets",
        "scalar_functions",
        "dedup_exact",
        "dedup_exact_hash",
        "dedup_ngram",
        "dedup_ngram_prefix",
        # last driver row r01 (keyed rest_push_sink; the r03 green row
        # ran under the push_partition alias)
        "rest_push_sink",
        # changed in r06: chron oracle re-modeled (algorithm, not
        # generator truth); JPEG decoder gained 4:2:0 + mixed fixtures
        "pipeline_chain",
        "pipeline_chain_strict",
        "media_image_decode_jpeg",
        # NEW in r06: stdlib GIF container decode, one row per frame;
        # containment (doc-in-doc) dedup; temperature (α=0.5) sampling
        "media_frames_decode",
        "dedup_containment",
        "sample_temperature",
        "python_udtf",
        # changed in r06: cluster count scales with corpus size
        # (identical output at the driver's sf0.01 where k stays 16 —
        # re-swept as cheap insurance; fills the ~50 budget exactly)
        "embed_kmeans",
        "dedup_semantic",
        # driver-green r02 but pre-regen — re-verified in SWEEP_r05 at
        # sf0.01 AND sf0.1; next tier after the r01 block
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
        # last driver row r03
        "csv_scan",
        "xml_serialize",
        "xml_parse",
        "pipeline_update",
        "push_partition",
        "runtime_metric",
    ]
    ordered = {name: registry[name] for name in priority if name in registry}
    ordered.update({n: s for n, s in registry.items() if n not in ordered})
    return ordered


REGISTRY: dict[str, QuerySpec] = _build()
