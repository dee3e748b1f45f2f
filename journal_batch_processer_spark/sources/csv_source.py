"""All-string CSV scan with the reference's split-on-comma semantics.

The reference reads a line, ``strip()``s it, and splits on ``","`` with
no quoting or escape handling (BatchUpdate.py:762-780). Spark's CSV
reader honors quotes by default; we disable quoting to mimic the raw
split, never infer types (everything is StringType, blank ``""`` is the
empty sentinel — SURVEY.md §1), and keep the header.

At scale this is a plain distributed text scan — splittable, predicate
pushdown applies to later filters via Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_items_csv(
    spark: SparkSession,
    path: str,
    strict_reference_mode: bool = False,
) -> DataFrame:
    """Header CSV → all-StringType DataFrame; NULLs normalized to ``""``.

    ``strict_reference_mode`` uses an unmatchable quote char so a ``"``
    in the data is just a character, exactly like split-on-comma.
    """
    reader = (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("emptyValue", "")
        .option("nullValue", "\x00\x01")  # sentinel that never appears -> nothing maps to null
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
    )
    if strict_reference_mode:
        reader = reader.option("quote", "\x00").option("escape", "\x00")
    df = reader.csv(path)
    # blank-not-null invariant for every column
    return df.select(
        [F.coalesce(F.col(f"`{c}`"), F.lit("")).alias(c) for c in df.columns]
    )
