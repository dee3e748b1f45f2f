"""Success/error routing (the update stage's pre-filter).

Reference: rows whose ``Notes`` contains ``Err`` or whose ``Pattern``
is ``N/A`` are diverted to the error output and skipped from upload
(BatchUpdate.py:439-442, 467-472); push failures join them later
(:558-561). In Spark this is a pair of complementary filters over one
cached/scanned plan — Catalyst pushes both predicates to the scan.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Routed(NamedTuple):
    good: DataFrame
    error: DataFrame


def error_condition(
    df: DataFrame, notes_col: str = "Notes", pattern_col: str = "Pattern"
) -> Column:
    cond = F.coalesce(F.col(notes_col), F.lit("")).contains("Err")
    if pattern_col in df.columns:
        cond = cond | (F.col(pattern_col) == "N/A")
    return cond


def error_route(
    df: DataFrame, notes_col: str = "Notes", pattern_col: str = "Pattern"
) -> Routed:
    """Complement filters (NOT subtract — no shuffle, one scan each)."""
    cond = error_condition(df, notes_col, pattern_col)
    return Routed(good=df.filter(~cond), error=df.filter(cond))
