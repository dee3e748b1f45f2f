"""Data-lake parquet sink: partitioned, sorted, size-targeted files.

The reference writes one CSV per stage (BatchUpdate.py:782-816); at
100 TB the sink IS the next job's scan plan, so layout is a
first-class operator concern:

- ``partitionBy`` columns become directory partition pruning for every
  downstream reader (a filter on the partition column never touches
  excluded files).
- ``sortWithinPartitions`` gives parquet row-group min/max stats real
  selectivity — a range predicate on the sort column skips row groups
  (poor man's Z-order; true multi-column clustering would interleave).
- ``maxRecordsPerFile`` caps file size so a hot partition doesn't
  produce a single unsplittable multi-GB file; undersized-file
  pressure is handled upstream by AQE coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_lake(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a partitioned parquet layout tuned for downstream scans."""
    out = df
    if sort_cols:
        # repartition on the partition columns first so each task holds
        # whole partitions (one file per partition per task, not one
        # per task per partition), then order within for row-group stats
        out = out.repartition(*partition_cols).sortWithinPartitions(
            *partition_cols, *sort_cols
        )
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)
