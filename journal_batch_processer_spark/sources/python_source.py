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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

N_SHARDS = 8
ROWS_PER_SHARD = 1250

# DuckDB-side md5-nibble decoding used by every oracle that regenerates
# these sources' rows — ONE copy so the load-bearing fragment can't
# drift between oracles (h is a 1-based-indexed md5 hex string)
HEXPOS_SQL = "strpos('0123456789abcdef', h[{i}]) - 1"


def register_once(spark, source_cls) -> None:
    """Register a Python DataSource, tolerating ONLY the
    already-registered case — any other failure (API missing, bad
    class) surfaces immediately instead of resurfacing later as a
    misleading 'data source not found'."""
    try:
        spark.dataSource.register(source_cls)
    except Exception as e:  # noqa: BLE001
        # 'exist' alone also matches 'does not exist' — require the
        # explicit already-registered phrasing (ADVICE r05).
        if "already" not in str(e).lower():
            raise

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


# ---------------------------------------------------------------------------
# writer half: custom sink via the same DataSource API
# ---------------------------------------------------------------------------


class _LogSinkCommitMessage(WriterCommitMessage):
    """Pickled executor→driver commit message: which file this task
    wrote and how many rows (the two-phase-commit unit)."""

    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class ShardedLogWriter(DataSourceWriter):
    """Per-partition JSONL writer with two-phase commit: tasks write
    to `<path>/_tmp_<partition>_<attempt>.jsonl` and report via commit message;
    the DRIVER's commit() renames all temp files into place and writes
    a `_SUCCESS` manifest — a failed/speculative task's temp file is
    never visible to readers (the exactly-once contract every real
    sink needs; abort() removes temp files)."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jbp_shardlog sink requires a 'path' option")

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        # the ATTEMPT id (globally unique), not just the partition id:
        # a retried or speculative attempt of the same partition must
        # write its own temp file — sharing one name would interleave
        # two concurrent writers and commit corrupted rows
        tmp = os.path.join(
            self.path,
            f"_tmp_{ctx.partitionId()}_{ctx.taskAttemptId()}.jsonl",
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _LogSinkCommitMessage(tmp, n)

    def commit(self, messages):
        import json
        import os
        import uuid

        # commit-unique job tag in the final names: a second append-mode
        # write to the same directory must not overwrite the previous
        # commit's part-00000..N (ADVICE r05) — same scheme as Hadoop
        # committers' per-job UUID part names
        job = uuid.uuid4().hex[:12]
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}-{job}.jsonl")
            os.replace(m.path, final)
            total += m.n_rows
        # losing attempts' temp files (task retried, message discarded)
        for leftover in os.listdir(self.path):
            if leftover.startswith("_tmp_"):
                try:
                    os.unlink(os.path.join(self.path, leftover))
                except OSError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"n_rows": total}))

    def abort(self, messages):
        import os

        # messages holds None for tasks that failed before reporting
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(m.path)
            except OSError:
                pass


class ShardedLogSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jbp_shardsink"

    def writer(self, schema, overwrite):
        return ShardedLogWriter(self.options)


# ---------------------------------------------------------------------------
# streaming half: custom micro-batch source via SimpleDataSourceStreamReader
# ---------------------------------------------------------------------------

TICK_BATCHES = 3  # each run costs a full query startup; 3 runs (2 restarts) prove the protocol
TICK_PER_BATCH = 200


def tick_row(batch: int, i: int) -> tuple[int, int, int]:
    """Deterministic tick row (the md5 trick again): any engine
    regenerates the stream's exact content."""
    h = hashlib.md5(f"tick:{batch}:{i}".encode()).hexdigest()
    return (batch, i, int(h[:4], 16))


class TickStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic micro-batch source: offset = {"batch": b};
    each read() returns one batch of rows and advances the offset,
    empty after TICK_BATCHES. readBetweenOffsets() replays any offset
    range — the REPLAY contract that gives a streaming source
    exactly-once semantics under failure/restart (Spark re-reads a
    committed-but-unprocessed range from the checkpointed offsets)."""

    def initialOffset(self):
        return {"batch": 0}

    def read(self, start):
        b = start["batch"]
        if b >= TICK_BATCHES:
            return iter([]), {"batch": b}
        return (
            iter([tick_row(b, i) for i in range(TICK_PER_BATCH)]),
            {"batch": b + 1},
        )

    def readBetweenOffsets(self, start, end):
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(tick_row(b, i) for i in range(TICK_PER_BATCH))
        return iter(rows)


class TickStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jbp_ticks"

    def schema(self) -> str:
        return "batch int, i int, value int"

    def simpleStreamReader(self, schema):
        return TickStreamReader()
