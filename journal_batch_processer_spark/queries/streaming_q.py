"""Driver-verifiable Structured Streaming queries.

Round 1 covered streaming only through pytest (stream == batch
equality); these registry entries put a REAL streaming execution —
file source → watermarked window aggregate → availableNow drain into
a memory sink — under the driver's DuckDB oracle, so the streaming
path has the same hard correctness signal as every batch operator.

Determinism: the whole fixture drains in one availableNow batch (one
file, maxFilesPerTrigger=1), so the watermark can never drop a row
mid-stream and the complete-mode output equals the batch aggregate —
which is exactly what the oracle SQL computes. At production scale
the same job runs unbounded (Kafka source, update mode) and the
watermark bounds state; the semantics under test are identical.

Reference: the reference engine (BatchUpdate.py) is pure batch; this
is EXT surface mandated by the streaming capability row in SURVEY §2h.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _stream_dir(sf_dir: str, table: str, prefix: str) -> str:
    """File-source streams list a DIRECTORY; expose the single parquet
    through a stable per-sf symlink dir. lexists + re-point handles a
    stale/broken symlink left by an earlier run against a since-
    removed sf_dir (exists() follows the link and would then let
    os.symlink raise FileExistsError)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    target = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.lexists(link):
        if not os.path.islink(link) or os.readlink(link) != target:
            os.unlink(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    return d


def _events_stream_dir(sf_dir: str) -> str:
    return _stream_dir(sf_dir, "events", "jbp_stream_events")


def q_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling counts, executed as a genuine
    Structured Streaming job and drained with availableNow into a
    memory sink; returns the sink table. Oracle = the batch tumble
    SQL (complete-mode output over fully-drained input is the batch
    aggregate by definition)."""
    from journal_batch_processer_spark.streaming.jobs import (
        read_events_stream,
        tumbling_counts,
    )

    name = "jbp_stream_tumble_mem"
    stream = tumbling_counts(read_events_stream(spark, _events_stream_dir(sf_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    if q.isActive:  # pragma: no cover - defensive against a hung drain
        q.stop()
        raise TimeoutError(
            f"stream {name!r} did not drain within 180s; a partial sink "
            "would be silently wrong — failing loud instead"
        )
    return spark.table(name)


SQL_STREAM_TUMBLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup: dropDuplicates on the content hash
    over a documents file stream, drained with availableNow. The
    surviving KEY SET is deterministic (which full row wins is not, so
    only the hash column is emitted), giving the streaming dedup state
    store a full value oracle: DISTINCT md5(text). At production scale
    the same query runs watermarked (dropDuplicatesWithinWatermark)
    to bound state."""
    d = _stream_dir(sf_dir, "documents", "jbp_stream_docs")

    from pyspark.sql import functions as F

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = (
        spark.readStream.schema(schema)
        .parquet(d)
        .select(F.md5("text").alias("content_hash"))
        .dropDuplicates(["content_hash"])
    )
    name = "jbp_stream_dedup_mem"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    if q.isActive:  # pragma: no cover - defensive against a hung drain
        q.stop()
        raise TimeoutError(
            f"stream {name!r} did not drain within 180s; a partial sink "
            "would be silently wrong — failing loud instead"
        )
    return spark.table(name)


SQL_STREAM_DEDUP = "SELECT DISTINCT md5(text) AS content_hash FROM documents"


QUERIES = {
    "stream_tumble": (q_stream_tumble, SQL_STREAM_TUMBLE),
    "stream_dedup": (q_stream_dedup, SQL_STREAM_DEDUP),
}
