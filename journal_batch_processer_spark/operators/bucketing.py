"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the single biggest join cost is the shuffle. Writing both
fact tables bucketed by the join key (``bucketBy`` + ``sortBy``) lets
Spark plan a SortMergeJoin with NO Exchange on either side — the
bucket files are the partitions. This module wraps the write/read
pattern and is pinned by a plan-shape test (tests/test_scale_plans.py)
asserting the join runs without a shuffle.

Bucket-count guidance: pick so each bucket is 100-500 MB at target
scale (e.g. 100 TB lineitem at 200 MB → ~500k buckets is too many
files; realistic: 8-16k buckets + partition columns by date).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed table (parquet). ``path`` makes it an
    external table — bucket files land there instead of the session
    warehouse dir (keeps repeated runs out of the working tree)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — planned without an Exchange."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=on, how=how)
