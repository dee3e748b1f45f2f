"""Scoped DataFrame caching (ADVICE r06: persist-without-unpersist).

Operators that feed one relation into several branches of a plan
(`dedup.ngram_jaccard_pairs` uses the shingle table on both join sides
AND in the size aggregate) persist it so Spark computes it once. But
the operators return *lazy* DataFrames — unpersisting inside the
operator would evict the cache before the caller ever runs an action,
and never unpersisting pins the blocks for the whole session (on a
long-lived cluster session, every dedup invocation leaks executor
storage memory until eviction pressure).

The fix is a scope: operators register what they persist via
:func:`pin`, and whoever drives the action (bench harness, oracle
checker, a user's job runner) calls :func:`release_all` once the
output is materialized. Unreleased handles are weak-referenced only by
this registry, so a forgotten release degrades to today's behavior
(Spark LRU-evicts under pressure) rather than an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for scoped release."""
    df.persist()
    _PINNED.append(df)
    return df


def release_all() -> int:
    """Unpersist every pinned relation (non-blocking); returns count.

    Call after the consuming action has materialized its output —
    e.g. between bench queries, after an oracle check, or at the end
    of a user pipeline stage.
    """
    n = len(_PINNED)
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
    _PINNED.clear()
    return n
