"""Standalone worker for the cross-process snapshot-table race test
(tests/test_table_format.py::test_two_process_spark_writers_race).

Each invocation opens its OWN SparkSession in its own JVM and drives a
script of table ops against a shared table root, retrying the races
each op's contract makes retryable, and appends one JSON line per
COMMITTED op to its log file:

    python tests/race_worker.py <table_root> <worker_id> <log_path>

The parent replays the union of all workers' logs in committed-version
order through a dict model and compares with the final table read —
so a lost update, a double-applied op, or a carry bug under a
cross-process race shows up as a model mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    root, wid, log_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from pyspark.sql import functions as F

    from journal_batch_processer_spark.operators.table_format import (
        CommitConflictError,
        SnapshotTable,
    )
    from journal_batch_processer_spark.session import get_spark

    spark = get_spark(
        f"race-worker-{wid}", master="local[2]", shuffle_partitions=2
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = SnapshotTable(root)
    log = open(log_path, "w")

    def record(version: int, op: str, payload) -> None:
        log.write(json.dumps({"v": version, "op": op, "p": payload}) + "\n")
        log.flush()

    def retry(fn, max_tries: int = 40):
        for _ in range(max_tries):
            try:
                return fn()
            except CommitConflictError:
                continue
            except NotImplementedError:
                try:
                    v = t.apply_deletes(spark)
                    record(v, "noop", None)
                except (ValueError, CommitConflictError):
                    pass
                continue
            except ValueError as e:
                if "not in snapshot" in str(e):
                    continue  # pos addresses went stale; replan
                raise
        raise RuntimeError(f"worker {wid}: op starved after {max_tries} tries")

    def rows(lo, hi, mul=1):
        return [(k, k * 10 * mul) for k in range(lo, hi)]

    def df(pairs):
        return spark.createDataFrame(pairs, "k bigint, v bigint").repartition(2)

    B = 100_000 * (wid + 1)
    p1 = rows(B, B + 50)
    record(t.append(df(p1)), "insert", p1)
    p2 = rows(B, B + 10, mul=7) + rows(B + 200, B + 210)
    record(retry(lambda: t.merge_mor(df(p2), "k")), "upsert", p2)
    d3 = list(range(B + 20, B + 25))
    record(
        retry(
            lambda: t.delete_where(
                spark, f"k >= {B + 20} and k < {B + 25}"
            )
        ),
        "delete",
        d3,
    )
    p4 = rows(B + 300, B + 310)
    record(t.append(df(p4)), "insert", p4)
    try:
        record(retry(lambda: t.apply_deletes(spark)), "noop", None)
    except (ValueError, RuntimeError):
        pass
    log.close()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
