"""Numeric guard-apostrophe lifecycle.

Long numeric identifiers round-trip through spreadsheets lossily
(11719123456789 → 1.171E13). The reference defends by prepending a
``'`` to 'n'-flagged columns in the format stage (BatchUpdate.py:159-168)
and stripping it when the value is used as a key (:474).

In Spark the header is never a data row, so the reference's O(n²)
``data.index(row) > 0`` guard disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_guard(col: Column) -> Column:
    """Prepend the guard apostrophe (idempotent: never double-guards)."""
    c = F.coalesce(col, F.lit(""))
    return F.when(c.startswith("'"), c).otherwise(F.concat(F.lit("'"), c))


def apply_numeric_guard(df: DataFrame, cols: set[str] | list[str]) -> DataFrame:
    present = [c for c in cols if c in df.columns]
    if not present:
        return df
    return df.withColumns({c: numeric_guard(F.col(c)) for c in present})


def strip_guard_quote(col: Column) -> Column:
    """Remove a leading ``'`` before key use (BatchUpdate.py:474)."""
    return F.regexp_replace(F.coalesce(col, F.lit("")), "^'", "")
