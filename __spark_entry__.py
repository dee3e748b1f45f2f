"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship format→split pipeline (the
reference's spine: scan → contract → regex extraction → natural sort →
year imputation → month normalization) on sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator registry
(journal_batch_processer_spark.queries) — one entry per implemented
operator from SURVEY.md §2; oracles are ANSI SQL for DuckDB over the
pre-registered parquet views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from journal_batch_processer_spark.queries import REGISTRY  # noqa: E402
from journal_batch_processer_spark.queries.registry import (  # noqa: E402
    resolve_oracle,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from journal_batch_processer_spark.queries.ref_io import q_pipeline_chain

    return q_pipeline_chain(spark, "/root/testdata/sf0.001")


def _scoped(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS key's pinned caches at fn entry.

    Operators pin shared relations (journal_batch_processer_spark.cache);
    the driver sweeps keys serially and collects each result before
    calling the next fn, so by the time fn N+1 is entered, fn N's
    output is materialized and its caches are releasable — without
    this, a ~170-key sweep pins every dedup shingle table for the
    whole session (ADVICE r06)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from journal_batch_processer_spark.cache import release_all

        release_all()
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _scoped(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate/hash-seeded ops
    (minhash, simhash, LSH ANN, HLL) are intentionally omitted →
    rows-only checks."""
    return {
        name: resolve_oracle(spec)
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
