"""Custom Python DataSource (the PySpark 4 DataSource API — the
sanctioned way to write a connector in pure Python, replacing the old
RDD/mapPartitions ingest hacks).

``ShardedLogSource`` models the connector shape that matters at scale:
`partitions()` declares N independent shards (here synthetic; in a real
connector: Kafka partitions, S3 prefixes, DB ranges), and `read()`
streams one shard's rows — executors pull shards in parallel, no
driver-side materialization. Rows are a pure function of (shard, seq)
via md5, so the source is deterministic across runs/partitionings and
the whole read is value-oracle-able: DuckDB regenerates the identical
rows from generate_series + md5.

Registered per-session with ``spark.dataSource.register``; read back
with ``spark.read.format("jbp_shardlog")``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

N_SHARDS = 8
ROWS_PER_SHARD = 1250

LEVELS = ["debug", "info", "warn", "error"]


def row_for(shard: int, seq: int) -> tuple[int, int, str, int]:
    """The deterministic row function shared by the reader and (in
    spirit) the oracle: level picks by md5 nibble, latency_us is a
    16-bit md5 slice. Any engine that can md5 a string reproduces it."""
    h = hashlib.md5(f"log:{shard}:{seq}".encode()).hexdigest()
    level = LEVELS[int(h[0], 16) % 4]
    latency_us = int(h[1:5], 16)
    return (shard, seq, level, latency_us)


class ShardedLogReader(DataSourceReader):
    def partitions(self):  # one InputPartition per shard
        return [InputPartition(i) for i in range(N_SHARDS)]

    def read(self, partition):
        shard = partition.value
        for seq in range(ROWS_PER_SHARD):
            yield row_for(shard, seq)


class ShardedLogSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jbp_shardlog"

    def schema(self) -> str:
        return "shard int, seq int, level string, latency_us int"

    def reader(self, schema):
        return ShardedLogReader()
